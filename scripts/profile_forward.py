"""Cost-analysis + batch scaling of the flagship generator forward (TPU)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
from cips_tpu.training.unet_synthesis import build_models, init_state

g, d, p = build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16)
state = init_state(jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,96,128,96,1), n_covariates=N_COVARIATES)

def run(batch):
    shape=(batch,96,128,96,1)
    rng=np.random.default_rng(0)
    bd={"t1":jnp.asarray(rng.random(shape,np.float32),jnp.bfloat16),
        "info":jnp.asarray(rng.random((batch,1,N_COVARIATES),np.float32),jnp.bfloat16)}
    fwd = jax.jit(lambda prm, b: g.apply(prm, b["t1"], b["info"]))
    compiled = fwd.lower(state.g.params, bd).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    ca = ca or {}
    flops = ca.get("flops", 0); bytes_ = ca.get("bytes accessed", 0)
    o = compiled(state.g.params, bd); float(o.astype(jnp.float32).sum())
    t0=time.perf_counter()
    for _ in range(5):
        o = compiled(state.g.params, bd)
    float(o.astype(jnp.float32).sum())
    dt=(time.perf_counter()-t0)/5
    print(f"batch={batch} fwd={dt*1000:.1f}ms flops={flops/1e9:.1f}G bytes={bytes_/1e9:.2f}GB "
          f"=> {flops/dt/1e12:.2f} TFLOP/s, {bytes_/dt/1e9:.1f} GB/s", flush=True)
for b in (4, 1, 8):
    run(b)
