"""MS-SSIM cross-framework parity vs a torch implementation of torchmetrics
semantics.

The reference computes MS-SSIM through
`torchmetrics.MultiScaleStructuralSimilarityIndexMeasure`:
  * folder-metric tool: 4-D input (1, D, H, W) -> torchmetrics' 2-D path with
    D as channels, defaults kernel 11 / sigma 1.5 (unet/scripts/metrics.py:27,
    53-66);
  * inference: 5-D input (1, 1, D, H, W) -> true 3-D path, kernel 5 /
    sigma 0.5 (unet/scripts/output_predict.py:73,125-130).

torchmetrics is not installable here (zero egress), so the torch reference
below re-implements its published algorithm directly in torch ops:
  * gaussian window built from the outer product of the 1-D kernel centred
    on integer offsets, grouped conv per channel;
  * reflect-pad + border-crop of the SSIM/CS maps — which is numerically
    identical to a VALID (no-pad) convolution, since the cropped positions
    are exactly those whose window never touches the padding;
  * per-scale contrast sensitivity, full SSIM at the last scale;
  * avg_pool kernel-2 stride-2 (floor — torch default ceil_mode=False)
    between scales, pooling only the spatial axes;
  * normalize="relu" (the torchmetrics class default) before the weighted
    geometric mean with betas (0.0448, 0.2856, 0.3001, 0.2363, 0.1333).

Written against torch primitives (conv2d/conv3d/avg_pool) so that a
framework-semantics bug in the JAX version (kernel orientation, pooling
mode, padding) cannot cancel out.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cips_tpu.ops.metrics import MS_SSIM_WEIGHTS, ms_ssim, ms_ssim_2d_slicewise

K1, K2 = 0.01, 0.03


def _gauss1d(k: int, sigma: float) -> torch.Tensor:
    x = torch.arange(k, dtype=torch.float64) - (k - 1) / 2
    g = torch.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).float()


def _torch_ssim_cs(a, b, k, sigma, data_range):
    nd = a.dim() - 2
    g = _gauss1d(k, sigma)
    c = a.shape[1]
    if nd == 2:
        kern = torch.einsum("i,j->ij", g, g)[None, None].repeat(c, 1, 1, 1)
        conv = lambda x: F.conv2d(x, kern, groups=c)
    else:
        kern = torch.einsum("i,j,k->ijk", g, g, g)[None, None].repeat(c, 1, 1, 1, 1)
        conv = lambda x: F.conv3d(x, kern, groups=c)
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2
    mu_a, mu_b = conv(a), conv(b)
    va = conv(a * a) - mu_a**2
    vb = conv(b * b) - mu_b**2
    cov = conv(a * b) - mu_a * mu_b
    cs_map = (2 * cov + c2) / (va + vb + c2)
    ssim_map = ((2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)) * cs_map
    return ssim_map.mean(), cs_map.mean()


def torch_ms_ssim(a, b, k, sigma, data_range=1.0, betas=tuple(MS_SSIM_WEIGHTS)):
    pool = F.avg_pool2d if a.dim() == 4 else F.avg_pool3d
    vals = []
    for i in range(len(betas)):
        s, cs = _torch_ssim_cs(a, b, k, sigma, data_range)
        vals.append(s if i == len(betas) - 1 else cs)
        if i != len(betas) - 1:
            a, b = pool(a, 2), pool(b, 2)
    stacked = torch.relu(torch.stack(vals))
    return torch.prod(stacked ** torch.tensor(betas))


def _vol_pair(shape, seed):
    rng = np.random.default_rng(seed)
    real = rng.random(shape).astype(np.float32)
    rec = np.clip(real + 0.15 * rng.standard_normal(shape).astype(np.float32), 0, 1)
    return real, rec


@pytest.mark.parametrize(
    "shape,k,sigma",
    [
        # (D, H, W): H/W must fit kernel*2^4 for all five torchmetrics scales
        ((24, 224, 192), 11, 1.5),  # folder-tool defaults at the metric H/W
        ((24, 225, 191), 11, 1.5),  # odd dims exercise the floor downsample
        ((96, 128, 96), 5, 0.5),    # inference settings at the working volume
    ],
)
def test_ms_ssim_2d_slicewise_matches_torch(shape, k, sigma):
    """The reference folder tool's 4-D path: channels = slices, 2-D windows."""
    real, rec = _vol_pair(shape, 5)
    want = float(
        torch_ms_ssim(torch.from_numpy(rec)[None], torch.from_numpy(real)[None], k, sigma)
    )
    got = float(ms_ssim_2d_slicewise(jnp.asarray(rec), jnp.asarray(real), k, sigma))
    assert got == pytest.approx(want, abs=2e-5)


@pytest.mark.parametrize(
    "shape,k,sigma,betas",
    [
        ((96, 128, 96), 5, 0.5, tuple(MS_SSIM_WEIGHTS)),  # output_predict.py:73
        ((97, 127, 95), 5, 0.5, tuple(MS_SSIM_WEIGHTS)),  # odd dims
        # k=11 needs dims >= 176 for 5 scales (too slow on CPU in 3-D);
        # 3 betas still cross-check the algorithm at the default window
        ((48, 56, 48), 11, 1.5, tuple(MS_SSIM_WEIGHTS[:3])),
    ],
)
def test_ms_ssim_3d_matches_torch(shape, k, sigma, betas):
    """The reference inference path: true 3-D MS-SSIM on 5-D input."""
    real, rec = _vol_pair(shape, 6)
    want = float(
        torch_ms_ssim(
            torch.from_numpy(rec)[None, None], torch.from_numpy(real)[None, None],
            k, sigma, betas=betas,
        )
    )
    got = float(
        ms_ssim(jnp.asarray(rec), jnp.asarray(real), kernel_size=k, sigma=sigma, weights=betas)
    )
    assert got == pytest.approx(want, abs=2e-5)


def test_identical_volumes_score_one():
    x, _ = _vol_pair((72, 80, 72), 7)
    assert float(ms_ssim(jnp.asarray(x), jnp.asarray(x), 5, 0.5)) == pytest.approx(1.0, abs=1e-4)
    assert float(ms_ssim_2d_slicewise(jnp.asarray(x), jnp.asarray(x), 5, 0.5)) == pytest.approx(
        1.0, abs=1e-4
    )
