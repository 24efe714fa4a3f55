"""s2d + remat=False at batch 4 — is remat still needed with s2d?"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time, sys
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
shape=(batch,96,128,96,1)
rng=np.random.default_rng(0)
bd={"t1":jnp.asarray(rng.random(shape,np.float32),jnp.bfloat16),
    "pet":jnp.asarray(rng.random(shape,np.float32),jnp.bfloat16),
    "info":jnp.asarray(rng.random((batch,1,N_COVARIATES),np.float32),jnp.bfloat16)}
g, d, p = build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16, remat=False)
state = init_state(jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,)+shape[1:], n_covariates=N_COVARIATES)
step = jax.jit(make_train_step(g, d, p, TRAIN_CFG), donate_argnums=0)
t0=time.time(); state, m = step(state, bd); float(m["g_loss"]); print(f"compile {time.time()-t0:.0f}s", flush=True)
t0=time.perf_counter()
for _ in range(5): state, m = step(state, bd)
float(m["g_loss"])
dt=(time.perf_counter()-t0)/5
print(f"noremat s2d batch={batch}: {dt*1000:.0f} ms -> {batch/dt:.2f} vol/s", flush=True)
