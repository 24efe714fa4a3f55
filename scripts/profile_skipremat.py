import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time, sys
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

skip = int(sys.argv[1]) if len(sys.argv) > 1 else 2
batch=8; shape=(batch,96,128,96,1)
rng=np.random.default_rng(0)
bd={"t1":jnp.asarray(rng.random(shape,np.float32),jnp.bfloat16),
    "pet":jnp.asarray(rng.random(shape,np.float32),jnp.bfloat16),
    "info":jnp.asarray(rng.random((batch,1,N_COVARIATES),np.float32),jnp.bfloat16)}
import copy
cfg = copy.deepcopy(dict(FLAGSHIP_CFG))
cfg["atten_unet_def"] = dict(cfg["atten_unet_def"])
cfg["atten_unet_def"]["remat_skip_coarsest"] = skip
g, d, p = build_models(cfg, n_covariates=N_COVARIATES, dtype=jnp.bfloat16)
state = init_state(jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,)+shape[1:], n_covariates=N_COVARIATES)
step = jax.jit(make_train_step(g, d, p, TRAIN_CFG), donate_argnums=0)
t0=time.time(); state, m = step(state, bd); float(m["g_loss"]); print(f"compile {time.time()-t0:.0f}s", flush=True)
t0=time.perf_counter()
for _ in range(5): state, m = step(state, bd)
float(m["g_loss"]); dt=(time.perf_counter()-t0)/5
print(f"skip={skip} batch=8: {dt*1000:.0f} ms -> {batch/dt:.2f} vol/s", flush=True)
