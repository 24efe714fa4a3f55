"""Brain masking: threshold + morphology (ANTs get_mask / t1>0 replacements).

The reference brain-masks in two ways:
  * `pet * (t1 > 0)` against the skull-stripped baseline T1
    (preprocess/masked_PET_by_T1.py:26-43);
  * `ants.get_mask(img)` of a (real or synthesized) PET before metrics /
    writing (unet/scripts/output_predict.py:118-119,
    causal gen_test_unify_causal.py:133-136). ANTs get_mask = Otsu-like
    threshold + morphological cleanup + largest component.

Here: `otsu_threshold` (jit-friendly histogram Otsu), binary
erosion/dilation/closing as 3-D max/min pools, and `get_mask` composing
them. Largest-connected-component labelling is inherently sequential; the
iterative flood-fill here runs as a bounded lax.while_loop seeded from the
intensity maximum, which on brain volumes selects the head component.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def otsu_threshold(x: jax.Array, nbins: int = 256) -> jax.Array:
    """Otsu's threshold over positive intensities."""
    x = x.astype(jnp.float32)
    lo = x.min()
    hi = x.max()
    hist = jnp.histogram(x, bins=nbins, range=(lo, hi))[0].astype(jnp.float32)
    centers = lo + (jnp.arange(nbins, dtype=jnp.float32) + 0.5) * (hi - lo) / nbins

    w0 = jnp.cumsum(hist)
    w1 = w0[-1] - w0
    m = jnp.cumsum(hist * centers)
    mu0 = m / jnp.maximum(w0, 1e-12)
    mu1 = (m[-1] - m) / jnp.maximum(w1, 1e-12)
    between = w0 * w1 * (mu0 - mu1) ** 2
    return centers[jnp.argmax(between)]


def _pool(mask: jax.Array, op, size: int) -> jax.Array:
    pad = size // 2
    init = -jnp.inf if op is jax.lax.max else jnp.inf
    m = mask.astype(jnp.float32)
    return jax.lax.reduce_window(
        m,
        init,
        op,
        (size,) * 3,
        (1,) * 3,
        [(pad, pad)] * 3,
    )


def dilate(mask: jax.Array, size: int = 3) -> jax.Array:
    return _pool(mask, jax.lax.max, size) > 0.5


def erode(mask: jax.Array, size: int = 3) -> jax.Array:
    return _pool(mask, jax.lax.min, size) > 0.5


def closing(mask: jax.Array, size: int = 3) -> jax.Array:
    return erode(dilate(mask, size), size)


def opening(mask: jax.Array, size: int = 3) -> jax.Array:
    return dilate(erode(mask, size), size)


def largest_component_from_seed(mask: jax.Array, max_iters: int = 64) -> jax.Array:
    """Geodesic dilation (flood fill) from the mask's most interior voxel.

    Each iteration dilates the region by up to `growth` voxels (a dilated
    flood step), intersected with the mask — a parallel-friendly bounded
    loop instead of sequential CC labelling.
    """
    maskf = mask.astype(jnp.float32)
    # seed: maximum of the distance-ish transform approximated by erosion depth
    eroded = _pool(maskf, jax.lax.min, 5)
    seed_idx = jnp.unravel_index(jnp.argmax(eroded + maskf), mask.shape)
    seed = jnp.zeros_like(maskf).at[seed_idx].set(1.0)

    def body(_, region):
        grown = _pool(region, jax.lax.max, 7)
        return jnp.minimum(grown, maskf)

    region = jax.lax.fori_loop(0, max_iters, body, seed)
    return region > 0.5


def get_mask(img: jax.Array, cleanup: bool = True) -> jax.Array:
    """ANTs-style brain mask: Otsu threshold, closing, largest component."""
    thr = otsu_threshold(img)
    mask = img > thr
    if cleanup:
        mask = closing(mask, 3)
        mask = largest_component_from_seed(mask)
        mask = dilate(mask, 3)
    return mask


def mask_by_t1(pet: jax.Array, t1: jax.Array) -> jax.Array:
    """PET masked by the skull-stripped T1's support
    (masked_PET_by_T1.py:43: pet * (t1 > 0))."""
    return pet * (t1 > 0).astype(pet.dtype)
