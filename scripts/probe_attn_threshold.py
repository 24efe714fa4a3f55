import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np, functools
from cips_tpu.ops.pallas.flash_attention import flash_attention
from cips_tpu.ops.attention import _reference_attention

rng = np.random.default_rng(0)
for L in (2304, 4608):
    B,H,D = 8, 4, 32
    q = jnp.asarray(rng.standard_normal((B,H,L,D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B,H,L,D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B,H,L,D)), jnp.bfloat16)
    fa = jax.jit(functools.partial(flash_attention, scale=0.1767767, block_q=256 if L%256==0 else 128, block_k=256))
    ref = jax.jit(functools.partial(_reference_attention, scale=0.1767767, upcast=False))
    for name, fn in (("pallas", fa), ("einsum", ref)):
        o = fn(q,k,v); float(jnp.abs(o.astype(jnp.float32)).mean())
        t0=time.perf_counter()
        for _ in range(20): o = fn(q,k,v)
        float(jnp.abs(o.astype(jnp.float32)).mean())
        print(f"L={L} {name}: {(time.perf_counter()-t0)/20*1000:.2f} ms", flush=True)
