"""Classifier evaluation: precision/recall/F1/AUC/accuracy + confusion matrix.

Mirrors the sklearn metric suite and confusion-matrix JPEG dumps of the
reference (`pet_for_classification/train_atten_encoder_MCI.py:188-303`,
`test_MCI.py:141-186`), including the LaTeX-ish summary row (:154-159).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def classification_metrics(labels: np.ndarray, logits: np.ndarray) -> Dict[str, float]:
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    labels = np.asarray(labels)
    logits = np.asarray(logits, np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    preds = probs.argmax(-1)
    out = {
        "accuracy": float(accuracy_score(labels, preds)),
        "precision": float(precision_score(labels, preds, zero_division=0)),
        "recall": float(recall_score(labels, preds, zero_division=0)),
        "f1": float(f1_score(labels, preds, zero_division=0)),
    }
    try:
        out["auc"] = float(roc_auc_score(labels, probs[:, 1]))
    except ValueError:
        out["auc"] = float("nan")
    return out


def metrics_row(metrics: Dict[str, float]) -> str:
    """Compact table row: F1 / AUC / acc / precision / recall
    (test_MCI.py:154-159)."""
    keys = ("f1", "auc", "accuracy", "precision", "recall")
    return " & ".join(f"{metrics[k] * 100:.1f}" for k in keys)


def confusion_matrix(labels: np.ndarray, preds: np.ndarray, n_classes: int = 2) -> np.ndarray:
    cm = np.zeros((n_classes, n_classes), np.int64)
    for t, p in zip(np.asarray(labels), np.asarray(preds)):
        cm[int(t), int(p)] += 1
    return cm


def save_confusion_matrix_figure(
    labels: np.ndarray,
    preds: np.ndarray,
    path: str,
    class_names: Sequence[str] = ("sMCI", "pMCI"),
) -> Optional[str]:
    """Confusion-matrix image (train_atten_encoder_MCI.py:280-303).
    Returns the path, or None when matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    cm = confusion_matrix(labels, preds, n_classes=len(class_names))
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(len(class_names)), class_names)
    ax.set_yticks(range(len(class_names)), class_names)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, str(cm[i, j]), ha="center", va="center")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
