"""Forward time with GroupNorm computed directly in bf16 (no f32 casts)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import flax.linen as nn
import cips_tpu.models.blocks as blocks

class GN_bf16(nn.Module):
    num_groups: int
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                            dtype=x.dtype, param_dtype=jnp.float32)(x)

if "gn_bf16" in sys.argv:
    blocks.GroupNorm = GN_bf16

from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
from cips_tpu.training.unet_synthesis import build_models, init_state

batch=4; shape=(batch,96,128,96,1)
rng=np.random.default_rng(0)
bd={"t1":jnp.asarray(rng.random(shape,np.float32),jnp.bfloat16),
    "info":jnp.asarray(rng.random((batch,1,N_COVARIATES),np.float32),jnp.bfloat16)}
g, d, p = build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16)
state = init_state(jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,)+shape[1:], n_covariates=N_COVARIATES)
fwd = jax.jit(lambda prm, b: g.apply(prm, b["t1"], b["info"]))
o = fwd(state.g.params, bd); float(o.astype(jnp.float32).sum())
t0=time.perf_counter()
for _ in range(5): o = fwd(state.g.params, bd)
float(o.astype(jnp.float32).sum())
print(f"fwd ({'gn_bf16' if 'gn_bf16' in sys.argv else 'baseline'}): {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)
