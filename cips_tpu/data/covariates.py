"""Tabular causal covariates: merge, encode, normalisation stats.

Re-implements the reference's covariate chain:
  * `preprocess/merge_csf.py` — join ADNIMERGE-style covariate tables onto
    pair manifests by nearest exam date (:60-84), encode Female->0 / Male->1,
    censored '<x' -> 0 and '>x' -> 2000 (:34-50), and correct Age for the
    days between exam and scan, Age += diff_days/365 (:84). Its scalar-argmin
    bug (:77-79) is fixed — the true nearest exam date is used.
  * `preprocess/compute_max_and_min.py` — per-covariate (min, max) over the
    *training* manifest (:10-17); stats saved as JSON (the reference pickles;
    `load_min_and_max` reads either).

Covariate sets per tracer match `unet/scripts/train_unet.py:64`:
  AV1451 -> TAU, PTAU, Age, Sex, APOE4, PTEDUCAT
  AV45   -> ABETA, Age, Sex, APOE4, PTEDUCAT
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Iterable, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from cips_tpu.data.manifest import PairRow, days_between

COVARIATES_BY_TRACER = {
    "AV1451": ["TAU", "PTAU", "Age", "Sex", "APOE4", "PTEDUCAT"],
    "AV45": ["ABETA", "Age", "Sex", "APOE4", "PTEDUCAT"],
}

# continuous covariates get min-max stats; Sex/APOE4 are already small codes
# (compute_max_and_min.py:8)
CONTINUOUS_COVARIATES = ("ABETA", "TAU", "PTAU", "Age", "PTEDUCAT")

CENSOR_LOW_VALUE = 0.0
CENSOR_HIGH_VALUE = 2000.0


def encode_value(key: str, raw: str) -> Optional[float]:
    """Encode one raw covariate cell to a float (merge_csf.py:34-50)."""
    if raw is None:
        return None
    s = str(raw).strip()
    if not s or s.lower() in ("nan", "na", ""):
        return None
    if key == "Sex":
        if s in ("Female", "F"):
            return 0.0
        if s in ("Male", "M"):
            return 1.0
    if s.startswith("<"):
        return CENSOR_LOW_VALUE
    if s.startswith(">"):
        return CENSOR_HIGH_VALUE
    try:
        return float(s)
    except ValueError:
        return None


def merge_covariates(
    rows: Sequence[PairRow],
    exam_records: Mapping[str, List[Dict[str, str]]],
    keys: Sequence[str],
    exam_date_key: str = "EXAMDATE",
    max_days: Optional[int] = None,
) -> List[PairRow]:
    """Attach covariates from per-subject exam records by nearest exam date.

    ``exam_records``: {subject: [{EXAMDATE: ..., TAU: ..., ...}, ...]}.
    Age is drift-corrected by the exam->scan gap. Rows with no usable exam
    or missing values are dropped (the reference's datasets skip such rows).
    """
    out: List[PairRow] = []
    for row in rows:
        records = exam_records.get(row.subject)
        if not records:
            continue
        dated = [r for r in records if r.get(exam_date_key)]
        if not dated:
            continue
        nearest = min(dated, key=lambda r: days_between(r[exam_date_key], row.pet_date))
        gap_days = days_between(nearest[exam_date_key], row.pet_date)
        if max_days is not None and gap_days > max_days:
            continue
        values: Dict[str, str] = dict(row.values)
        ok = True
        for k in keys:
            v = encode_value(k, nearest.get(k, ""))
            if v is None:
                ok = False
                break
            if k == "Age":
                v = v + gap_days / 365.0
            values[k] = repr(v) if isinstance(v, float) else str(v)
        if not ok:
            continue
        out.append(PairRow(row.subject, row.t1_date, row.pet_date, values))
    return out


def compute_min_and_max(
    rows: Sequence[PairRow], keys: Iterable[str] = CONTINUOUS_COVARIATES
) -> Dict[str, Tuple[float, float]]:
    stats: Dict[str, Tuple[float, float]] = {}
    for k in keys:
        vals = []
        for r in rows:
            if k in r.values:
                v = encode_value(k, r.values[k])
                if v is not None:
                    vals.append(v)
        if vals:
            stats[k] = (float(min(vals)), float(max(vals)))
    return stats


def save_min_and_max(path: str, stats: Mapping[str, Tuple[float, float]]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump({k: list(v) for k, v in stats.items()}, f, indent=2)


def load_min_and_max(path: str) -> Dict[str, Tuple[float, float]]:
    """Load stats from JSON (ours) or pickle (reference-format .pkl)."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            raw = pickle.load(f)
    else:
        with open(path, "r", encoding="utf-8") as f:
            raw = json.load(f)
    return {k: (float(v[0]), float(v[1])) for k, v in raw.items()}


def covariate_vector(
    row: PairRow,
    keys: Sequence[str],
    min_and_max: Mapping[str, Tuple[float, float]],
    invert_abeta: bool = False,
) -> np.ndarray:
    """Encode + min-max normalise a row's covariates (dataset.py:126-134).

    ``invert_abeta``: the classifier dataset flips ABETA after normalisation,
    `v = 1 - v` (pet_for_classification/dataset.py:155-156).
    """
    vec = []
    for k in keys:
        v = encode_value(k, row.values.get(k, ""))
        if v is None:
            raise ValueError(f"{row.subject} {row.pet_date}: missing covariate {k}")
        if k in min_and_max:
            lo, hi = min_and_max[k]
            v = (v - lo) / (hi - lo)
        if invert_abeta and k == "ABETA":
            v = 1.0 - v
        vec.append(v)
    return np.asarray(vec, dtype=np.float32)
