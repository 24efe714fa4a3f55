"""TPU smoke for the BMGAN baseline at full volume (reference batch 1/GPU)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from cips_tpu.training import bmgan_task

rng = np.random.default_rng(0)
shape = (1, 96, 128, 96, 1)
g, e, d, p = bmgan_task.build_models(dtype=jnp.bfloat16)
state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=0.0)
step = jax.jit(bmgan_task.make_train_step(g, e, d, p, lamda_perceptual=0.0), donate_argnums=0)
batch = {"t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
         "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)}
t0=time.time(); state, m = step(state, batch, jax.random.key(1)); v=float(m["l1_loss"])
print(f"bmgan compile+step {time.time()-t0:.0f}s l1={v:.4f}", flush=True)
t0=time.perf_counter()
for i in range(5): state, m = step(state, batch, jax.random.key(i))
float(m["l1_loss"]); dt=(time.perf_counter()-t0)/5
print(f"bmgan step: {dt*1000:.0f} ms -> {1/dt:.2f} vol/s (batch 1)", flush=True)
