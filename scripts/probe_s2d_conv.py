"""Is a packed (space-to-depth) conv faster than the small-channel original?

Compares, on TPU:
  (a) conv k3 s1, (B,96,128,96,16) -> 16ch     [level-0 shape, N=16 lanes]
  (b) conv k3 s1, (B,48,64,48,128) -> 128ch    [same voxels packed 2x2x2]
  (c) GN+SiLU+conv chain at both layouts
(b) does 8x the FLOPs of (a); if it is not ~8x slower, layout/bandwidth
dominates and the exact packed-level-0 transform is worth building.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 4
def timeit(tag, fn, *args):
    o = fn(*args); float(jnp.sum(o[..., :1].astype(jnp.float32)))
    t0=time.perf_counter()
    for _ in range(10): o = fn(*args)
    float(jnp.sum(o[..., :1].astype(jnp.float32)))
    print(f"{tag}: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)

rng = np.random.default_rng(0)
x_full = jnp.asarray(rng.random((B,96,128,96,16), np.float32), jnp.bfloat16)
w_full = jnp.asarray(rng.random((3,3,3,16,16), np.float32), jnp.bfloat16) * 0.1
x_pack = jnp.asarray(rng.random((B,48,64,48,128), np.float32), jnp.bfloat16)
w_pack = jnp.asarray(rng.random((3,3,3,128,128), np.float32), jnp.bfloat16) * 0.1

@jax.jit
def conv_full(x, w):
    return jax.lax.conv_general_dilated(x, w, (1,1,1), [(1,1)]*3,
        dimension_numbers=("NDHWC","DHWIO","NDHWC"), preferred_element_type=jnp.float32).astype(jnp.bfloat16)

@jax.jit
def conv_pack(x, w):
    return jax.lax.conv_general_dilated(x, w, (1,1,1), [(1,1)]*3,
        dimension_numbers=("NDHWC","DHWIO","NDHWC"), preferred_element_type=jnp.float32).astype(jnp.bfloat16)

timeit("conv full-res C16", conv_full, x_full, w_full)
timeit("conv packed C128 (8x FLOPs)", conv_pack, x_pack, w_pack)
