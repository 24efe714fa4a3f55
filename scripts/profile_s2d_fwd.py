"""Forward split at batch 8 with s2d (round-2 planning datum)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
from cips_tpu.training.unet_synthesis import build_models, init_state

batch=8; shape=(batch,96,128,96,1)
rng=np.random.default_rng(0)
bd={"t1":jnp.asarray(rng.random(shape,np.float32),jnp.bfloat16),
    "info":jnp.asarray(rng.random((batch,1,N_COVARIATES),np.float32),jnp.bfloat16)}
g, d, p = build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16)
state = init_state(jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,)+shape[1:], n_covariates=N_COVARIATES)
fwd = jax.jit(lambda prm, b: g.apply(prm, b["t1"], b["info"]))
compiled = fwd.lower(state.g.params, bd).compile()
ca = compiled.cost_analysis()
if isinstance(ca, list): ca = ca[0]
ca = ca or {}
o = compiled(state.g.params, bd); float(o.astype(jnp.float32).sum())
t0=time.perf_counter()
for _ in range(5): o = compiled(state.g.params, bd)
float(o.astype(jnp.float32).sum())
dt=(time.perf_counter()-t0)/5
print(f"s2d fwd batch=8: {dt*1000:.1f} ms, flops={ca.get('flops',0)/1e9:.0f}G "
      f"({ca.get('flops',0)/dt/1e12:.1f} TFLOP/s)", flush=True)
