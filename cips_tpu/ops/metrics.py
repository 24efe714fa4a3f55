"""Image-quality metrics: MAE, PSNR, SSIM, MS-SSIM (3-D, jit-friendly).

Definitions follow the reference's evaluation tools:
  * MAE — mean |a-b| (unet/scripts/metrics.py:62-63);
  * PSNR = 10*log10(1 / MSE) with data_range 1.0 (metrics.py:67-68,
    output_predict.py:132-133);
  * MS-SSIM — torchmetrics MultiScaleStructuralSimilarityIndexMeasure
    semantics with data_range=1.0 (metrics.py:27): gaussian kernel
    (default size 11, sigma 1.5; the inference script uses kernel 5,
    sigma 0.5 — output_predict.py:73), 5 scales with the standard weights,
    avg-pool 2 between scales.

Volumes are (D, H, W) or batched (..., D, H, W); computation is fp32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def mae(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).mean()


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return (d * d).mean()


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    return 10.0 * jnp.log10((data_range**2) / mse(a, b))


def _gaussian_kernel1d(size: int, sigma: float) -> jax.Array:
    half = (size - 1) / 2.0
    x = jnp.arange(size, dtype=jnp.float32) - half
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / g.sum()


def _filter3d(x: jax.Array, kernel1d: jax.Array) -> jax.Array:
    """Separable 'valid' gaussian filtering of (N, D, H, W, 1)."""
    k = kernel1d.shape[0]
    for axis in range(1, 4):
        shape = [1, 1, 1, 1, 1, 1]  # OIDHW-ish via conv_general_dilated
        win = [1, 1, 1]
        win[axis - 1] = k
        kern = kernel1d.reshape(win + [1, 1])
        x = jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    return x


def _ssim_and_cs(
    a: jax.Array, b: jax.Array, kernel_size: int, sigma: float, data_range: float
) -> Tuple[jax.Array, jax.Array]:
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kern = _gaussian_kernel1d(kernel_size, sigma)

    mu_a = _filter3d(a, kern)
    mu_b = _filter3d(b, kern)
    mu_aa = _filter3d(a * a, kern)
    mu_bb = _filter3d(b * b, kern)
    mu_ab = _filter3d(a * b, kern)

    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b

    cs = (2 * cov + c2) / (var_a + var_b + c2)
    ssim_map = ((2 * mu_a * mu_b + c1) / (mu_a * mu_a + mu_b * mu_b + c1)) * cs
    return ssim_map.mean(), cs.mean()


def _as_batched(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    if x.ndim == 3:
        x = x[None]
    if x.ndim == 4:
        x = x[..., None]
    return x


def ssim(
    a: jax.Array, b: jax.Array, kernel_size: int = 11, sigma: float = 1.5, data_range: float = 1.0
) -> jax.Array:
    s, _ = _ssim_and_cs(_as_batched(a), _as_batched(b), kernel_size, sigma, data_range)
    return s


def ms_ssim(
    a: jax.Array,
    b: jax.Array,
    kernel_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
    weights: Sequence[float] = MS_SSIM_WEIGHTS,
) -> jax.Array:
    a = _as_batched(a)
    b = _as_batched(b)
    # clamp the scale count so the gaussian window always fits: torchmetrics
    # raises on too-small inputs; we degrade gracefully and renormalise the
    # weights over the scales actually used.
    min_dim = min(a.shape[1:4])
    n_scales = len(weights)
    while n_scales > 1 and min_dim // (2 ** (n_scales - 1)) < kernel_size:
        n_scales -= 1
    weights_arr = jnp.asarray(weights[:n_scales], jnp.float32)
    weights_arr = weights_arr / weights_arr.sum() * sum(weights)

    values = []
    for i in range(n_scales):
        s, cs = _ssim_and_cs(a, b, kernel_size, sigma, data_range)
        values.append(s if i == n_scales - 1 else cs)
        if i != n_scales - 1:
            pool = (1, 2, 2, 2, 1)
            a = jax.lax.reduce_window(a, 0.0, jax.lax.add, pool, pool, "VALID") / 8.0
            b = jax.lax.reduce_window(b, 0.0, jax.lax.add, pool, pool, "VALID") / 8.0

    stacked = jnp.stack(values)
    # torchmetrics uses relu before the weighted geometric mean
    stacked = jnp.maximum(stacked, 0.0)
    return jnp.prod(stacked ** weights_arr)


def _filter2d(x: jax.Array, kernel1d: jax.Array) -> jax.Array:
    """Separable 'valid' gaussian filtering of (N, H, W, 1)."""
    k = kernel1d.shape[0]
    for axis in range(2):
        win = [1, 1]
        win[axis] = k
        kern = kernel1d.reshape(win + [1, 1])
        x = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return x


def _ssim_and_cs_2d(
    a: jax.Array, b: jax.Array, kernel_size: int, sigma: float, data_range: float
) -> Tuple[jax.Array, jax.Array]:
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kern = _gaussian_kernel1d(kernel_size, sigma)
    mu_a, mu_b = _filter2d(a, kern), _filter2d(b, kern)
    mu_aa, mu_bb, mu_ab = _filter2d(a * a, kern), _filter2d(b * b, kern), _filter2d(a * b, kern)
    var_a, var_b = mu_aa - mu_a * mu_a, mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b
    cs = (2 * cov + c2) / (var_a + var_b + c2)
    ssim_map = ((2 * mu_a * mu_b + c1) / (mu_a * mu_a + mu_b * mu_b + c1)) * cs
    return ssim_map.mean(), cs.mean()


def ms_ssim_2d_slicewise(
    a: jax.Array,
    b: jax.Array,
    kernel_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
    weights: Sequence[float] = MS_SSIM_WEIGHTS,
) -> jax.Array:
    """MS-SSIM of a (D, H, W) volume as torchmetrics computes it on a 4-D
    (1, D, H, W) input — the shape the reference's folder-metric tool feeds
    it (unet/scripts/metrics.py:53-66: `.unsqueeze(0)` yields 4-D, so
    torchmetrics runs its 2-D path with D as the channel axis): a grouped
    2-D gaussian window per slice, means over (C, H, W), and avg-pool-2
    downsampling of H and W ONLY between scales. This differs numerically
    from true 3-D MS-SSIM (`ms_ssim`), which the reference only uses at
    inference time on 5-D inputs (output_predict.py:73,125-130)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim != 3:
        raise ValueError(f"expected a (D, H, W) volume, got {a.shape}")
    a = a[..., None]  # slices as the batch axis: (D, H, W, 1)
    b = b[..., None]
    values = []
    # clamp the scale count so the window always fits (torchmetrics raises
    # on too-small inputs; we degrade gracefully, renormalising the weights
    # over the scales actually used — same policy as `ms_ssim`)
    min_dim = min(a.shape[1:3])
    n_scales = len(weights)
    while n_scales > 1 and min_dim // (2 ** (n_scales - 1)) < kernel_size:
        n_scales -= 1
    weights_arr = jnp.asarray(weights[:n_scales], jnp.float32)
    weights_arr = weights_arr / weights_arr.sum() * sum(weights)
    for i in range(n_scales):
        s, cs = _ssim_and_cs_2d(a, b, kernel_size, sigma, data_range)
        values.append(s if i == n_scales - 1 else cs)
        if i != n_scales - 1:
            pool = (1, 2, 2, 1)
            a = jax.lax.reduce_window(a, 0.0, jax.lax.add, pool, pool, "VALID") / 4.0
            b = jax.lax.reduce_window(b, 0.0, jax.lax.add, pool, pool, "VALID") / 4.0
    stacked = jnp.maximum(jnp.stack(values), 0.0)  # torchmetrics normalize="relu"
    return jnp.prod(stacked ** weights_arr)


def mean_intensity_match(sys: jax.Array, real: jax.Array) -> jax.Array:
    """Scale synthesized volume to the real volume's mean intensity
    (metrics.py:51-52: sys / mean(sys) * mean(real))."""
    return sys / jnp.maximum(sys.mean(), 1e-12) * real.mean()
