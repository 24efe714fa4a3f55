"""Space-axis sharding cost report on a simulated mesh.

Compiles the flagship training step over a (data x space) mesh with the
volume sharded along z at the REAL working shape (96,128,96) on a virtual
CPU mesh, and reports the collective operations XLA inserted (kind, count,
bytes) plus per-device HBM estimates. This makes spatial sharding a
measured capability: the halo exchanges of the conv stack and the gradient
reductions are visible before any multi-chip hardware exists.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/profile_space_axis.py [n_space]
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
from cips_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "f64": 8}


def collective_report(hlo_text: str):
    pat = re.compile(
        r"(\w[\w.\-]*) = (\w+)\[?([\d,]*)\]?\{?[^=]*?(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\("
    )
    counts = defaultdict(int)
    bytes_ = defaultdict(int)
    for line in hlo_text.splitlines():
        m = re.search(r"= (\S+?)\[([\d,]*)\][^=]*? (all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\(", line)
        if not m:
            m2 = re.search(r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)(?:-start)?\(", line)
            if m2 and "=" in line:
                kind = m2.group(1)
                shape = re.search(r"= (?:\()?(\w+)\[([\d,]*)\]", line)
                counts[kind] += 1
                if shape:
                    dt, dims = shape.group(1), shape.group(2)
                    n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
                    bytes_[kind] += n * DTYPE_BYTES.get(dt, 4)
            continue
        dt, dims, kind = m.group(1), m.group(2), m.group(3)
        counts[kind] += 1
        n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
        bytes_[kind] += n * DTYPE_BYTES.get(dt, 4)
    return counts, bytes_


def main():
    n_space = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_devices = len(jax.devices())
    n_data = n_devices // n_space
    mesh = make_mesh(n_data=n_data, n_space=n_space)
    print(f"mesh: data={n_data} x space={n_space} (virtual CPU devices)")

    batch = n_data
    shape = (batch, 96, 128, 96, 1)
    g, d, p = build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16)
    state = init_state(
        jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,) + shape[1:], n_covariates=N_COVARIATES
    )
    state = replicate(mesh, state)
    rng = np.random.default_rng(0)
    batch_data = {
        "t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "info": jnp.asarray(rng.random((batch, 1, N_COVARIATES), np.float32), jnp.bfloat16),
    }
    batch_data = shard_batch(mesh, batch_data, spatial_axis=1)
    step = jax.jit(make_train_step(g, d, p, TRAIN_CFG))
    lowered = step.lower(state, batch_data)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    counts, bytes_ = collective_report(hlo)
    total = 0
    print("collectives inserted by XLA (per step, whole mesh):")
    for kind in sorted(counts):
        mb = bytes_[kind] / 1e6
        total += bytes_[kind]
        print(f"  {kind:20s} x{counts[kind]:4d}   {mb:9.1f} MB")
    print(f"  total collective payload  {total/1e6:9.1f} MB/step")
    try:
        mem = compiled.memory_analysis()
        print(
            f"per-device memory: args {mem.argument_size_in_bytes/1e9:.2f} GB, "
            f"temps {mem.temp_size_in_bytes/1e9:.2f} GB, "
            f"total {(mem.argument_size_in_bytes + mem.temp_size_in_bytes + mem.output_size_in_bytes)/1e9:.2f} GB"
        )
    except Exception as e:  # memory analysis may be unavailable on CPU
        print(f"(memory analysis unavailable: {e})")

    if "--run" in sys.argv:
        # EXECUTE the full-volume multi-device step (not just compile): the
        # recorded evidence that space-axis sharding runs end to end. CPU
        # emulation wall time is not a TPU prediction — the collective
        # payload above against ICI rates is.
        import time

        state, metrics = step(state, batch_data)
        g0 = float(metrics["g_loss"])
        t0 = time.perf_counter()
        state, metrics = step(state, batch_data)
        g1 = float(metrics["g_loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(g0) and np.isfinite(g1)
        print(
            f"EXECUTED full-volume step on data={n_data} x space={n_space} virtual mesh: "
            f"batch {batch}, g_loss {g0:.4f} -> {g1:.4f}, "
            f"wall {dt:.1f} s/step (CPU emulation)"
        )


if __name__ == "__main__":
    main()
