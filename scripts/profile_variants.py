"""Isolate forward-time contributors: GN fp32 casts, attention, dtype."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import flax.linen as nn
from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
import cips_tpu.models.blocks as blocks
from cips_tpu.training.unet_synthesis import build_models, init_state

batch=4; shape=(batch,96,128,96,1)
rng=np.random.default_rng(0)
bd={"t1":jnp.asarray(rng.random(shape,np.float32),jnp.bfloat16),
    "info":jnp.asarray(rng.random((batch,1,N_COVARIATES),np.float32),jnp.bfloat16)}

def timefwd(tag, model_builder):
    g, d, p = model_builder()
    state = init_state(jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,)+shape[1:], n_covariates=N_COVARIATES)
    fwd = jax.jit(lambda prm, b: g.apply(prm, b["t1"], b["info"]))
    o = fwd(state.g.params, bd); float(o.astype(jnp.float32).sum())
    t0=time.perf_counter()
    for _ in range(5): o = fwd(state.g.params, bd)
    float(o.astype(jnp.float32).sum())
    print(f"{tag}: {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)

# (a) baseline
timefwd("baseline bf16", lambda: build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16))

# (b) GroupNorm without fp32 casts
class GN_bf16(nn.Module):
    num_groups: int; epsilon: float = 1e-6; dtype: jnp.dtype = jnp.float32
    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                            dtype=x.dtype, param_dtype=jnp.float32)(x)
orig_gn = blocks.GroupNorm
blocks.GroupNorm = GN_bf16
import cips_tpu.models.atten_unet as au
au.GroupNorm = GN_bf16
timefwd("GN bf16 (no casts)", lambda: build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16))
blocks.GroupNorm = orig_gn
au.GroupNorm = orig_gn

# (c) attention disabled (no attn level)
import copy
cfg = copy.deepcopy(dict(FLAGSHIP_CFG))
cfg["atten_unet_def"] = dict(cfg["atten_unet_def"])
cfg["atten_unet_def"]["attention_levels"] = [False, False, False, False]
timefwd("no attention", lambda: build_models(cfg, n_covariates=N_COVARIATES, dtype=jnp.bfloat16))

# (d) fp32 everything
timefwd("fp32", lambda: build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.float32))
