"""Shared trainer machinery: train states, optimisers, checkpoints, metrics.

Replaces the reference's hand-rolled per-script loops (SURVEY.md L4):
`requires_grad` gating becomes separate optimiser states updated by separate
grad computations inside ONE jitted step; `torch.save` dicts become Orbax
checkpoints of a train-state pytree; TensorBoard logging goes through
tensorboardX when available with a JSONL fallback.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    """Params + optimiser state for one network."""

    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(params=optax.apply_updates(self.params, updates), opt_state=new_opt)


def adam(lr: float) -> optax.GradientTransformation:
    """Adam with torch-default betas/eps, matching the reference's
    torch.optim.Adam (train_unet.py:94-105)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


# ---------------------------------------------------------------------------
# checkpointing (reference: torch.save dicts every save_every epochs +
# best-by-eval retention, train_unet.py:295-302, train_bmgan.py:280-305)
# ---------------------------------------------------------------------------


class CheckpointManager:
    """Orbax-backed checkpointing of arbitrary pytrees with best-metric tracking."""

    def __init__(self, ckpt_dir: str):
        import orbax.checkpoint as ocp

        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        self._best_path = os.path.join(self.ckpt_dir, "best")
        self._meta_path = os.path.join(self.ckpt_dir, "meta.json")

    def _meta(self) -> Dict[str, Any]:
        if os.path.exists(self._meta_path):
            with open(self._meta_path, encoding="utf-8") as f:
                return json.load(f)
        return {}

    def _write_meta(self, meta: Dict[str, Any]) -> None:
        with open(self._meta_path, "w", encoding="utf-8") as f:
            json.dump(meta, f)

    def save(self, tree: Any, epoch: int, eval_metric: Optional[float] = None) -> None:
        path = os.path.join(self.ckpt_dir, f"epoch_{epoch}")
        self._ckptr.save(path, tree, force=True)
        meta = self._meta()
        meta["last_epoch"] = epoch
        if eval_metric is not None and eval_metric < meta.get("best_metric", float("inf")):
            meta["best_metric"] = eval_metric
            meta["best_epoch"] = epoch
            self._ckptr.save(self._best_path, tree, force=True)
        self._write_meta(meta)

    def latest_epoch(self) -> Optional[int]:
        return self._meta().get("last_epoch")

    def restore(self, template: Any, epoch: Optional[int] = None, best: bool = False) -> Any:
        if best:
            path = self._best_path
        else:
            if epoch is None:
                epoch = self.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(f"no checkpoints in {self.ckpt_dir}")
            path = os.path.join(self.ckpt_dir, f"epoch_{epoch}")
        return self._ckptr.restore(path, item=template)


# ---------------------------------------------------------------------------
# metric logging (reference: rank-0 SummaryWriter, train_unet.py:59-60,197-204;
# the misspelled "trainig/*" tags are not replicated)
# ---------------------------------------------------------------------------


class MetricWriter:
    def __init__(self, log_dir: str, enabled: bool = True):
        self.enabled = enabled
        self._tb = None
        self._jsonl = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", encoding="utf-8")

    def scalars(self, prefix: str, metrics: Mapping[str, float], step: int) -> None:
        if not self.enabled:
            return
        clean = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": step, "prefix": prefix, **clean}) + "\n")
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


def guard_nonfinite(train_step: Callable, loss_key: str = "g_loss") -> Callable:
    """Failure-detection wrapper (SURVEY.md §5.3 — the reference has none):
    if the step produces a non-finite loss, the parameter update is discarded
    (the previous state is returned) and the metric dict gains
    ``skipped_nonfinite``. All inside jit via lax.cond-free select — no
    host round-trip."""

    def guarded(state, *args, **kwargs):
        new_state, metrics = train_step(state, *args, **kwargs)
        ok = jnp.isfinite(metrics[loss_key])
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(ok, x, y) if hasattr(x, "dtype") else x, a, b
        )
        metrics = dict(metrics)
        metrics["skipped_nonfinite"] = (~ok).astype(jnp.float32)
        return sel(new_state, state), metrics

    return guarded


class StepTimer:
    """Per-step wall-clock profiler — the tracing hook the reference lacks
    (SURVEY.md §5.1). Pairs with jax.profiler for deep traces."""

    def __init__(self):
        self._last = time.perf_counter()
        self.history: list = []

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.history.append(dt)
        return dt

    def mean(self, skip: int = 1) -> float:
        h = self.history[skip:] or self.history
        return sum(h) / max(len(h), 1)
