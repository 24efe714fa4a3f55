"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP runtime (SURVEY.md
§2.10: `dist.init_process_group`, DistributedDataParallel,
DistributedSampler, mp.spawn — train_unet.py:26-41,72-75,116-127,349):
one `jax.sharding.Mesh` with a ``data`` axis for batch parallelism and an
optional ``space`` axis for spatial-grid sharding of the volume (the 3-D
analogue of sequence parallelism, SURVEY.md §5.7). Parameters are
replicated; gradient reduction is the psum XLA inserts for pjit-sharded
batches — no explicit collectives in user code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous — replaces the reference's MASTER_ADDR/PORT env
    wiring (train_unet.py:26-28, with its per-script port collisions).

    With no arguments JAX auto-detects the TPU pod environment; explicit
    values cover GCE-less clusters. Call once, before device use. No-op if
    already initialised.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialised (or single-process run)
        if "already" not in str(e).lower():
            raise


def make_mesh(
    n_data: Optional[int] = None,
    n_space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data[, space]) mesh over the available devices.

    With ``n_space > 1`` the volume's depth axis is sharded over ``space``
    — lay the space axis innermost so its halo/collective traffic rides
    nearest-neighbour ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    if n_data * n_space > len(devices):
        raise ValueError(f"need {n_data * n_space} devices, have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None) -> NamedSharding:
    """Batch on ``data``; optionally one spatial axis on ``space``.

    ``spatial_axis``: index of the array axis to shard over ``space`` (e.g. 1
    for the depth axis of (B, D, H, W, C)); None replicates over ``space``.
    """
    ndim_spec: list = [DATA_AXIS]
    if spatial_axis is not None:
        ndim_spec += [None] * (spatial_axis - 1) + [SPACE_AXIS]
    return NamedSharding(mesh, P(*ndim_spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial_axis: Optional[int] = None):
    """Device-put a pytree of host arrays with batch sharded on ``data``.

    Spatial (``space``) sharding is applied per leaf only where it divides —
    volume tensors get it, small per-sample vectors (covariates) stay
    replicated over ``space``.
    """
    data_only = batch_sharding(mesh, None)
    data_size = mesh.shape.get(DATA_AXIS, 1)
    space_size = mesh.shape.get(SPACE_AXIS, 1)
    repl = replicated(mesh)

    def put(x):
        if x.ndim == 0 or x.shape[0] % data_size != 0:
            # batch not divisible by the data axis (e.g. eval batch 1):
            # replicate rather than fail — compute is redundant but correct.
            return jax.device_put(x, repl)
        if (
            spatial_axis is not None
            and space_size > 1
            and x.ndim > spatial_axis
            and x.shape[spatial_axis] % space_size == 0
        ):
            return jax.device_put(x, batch_sharding(mesh, spatial_axis))
        return jax.device_put(x, data_only)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def device_prefetch(iterator, mesh: Mesh, spatial_axis: Optional[int] = None, depth: int = 2):
    """Overlap host->device transfer with compute: keep ``depth`` batches
    in flight (device_put is async; consuming them a step later hides the
    transfer behind the previous step's execution). The TPU-side analogue
    of a prefetching DataLoader."""
    import collections

    queue = collections.deque()
    for batch in iterator:
        queue.append(shard_batch(mesh, batch, spatial_axis))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
