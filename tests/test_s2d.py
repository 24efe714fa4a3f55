"""Exactness tests for the space-to-depth packed level-0 arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips_tpu.ops.s2d import (
    depth_to_space,
    pack_conv_kernel,
    packed_conv,
    phase_mean,
    phase_tile,
    repack_pool,
    repack_tile,
    space_to_depth,
)


def _conv_full(x, w):
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 8, 6, 4, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


@pytest.mark.parametrize("k,cin,cout", [(3, 2, 5), (1, 4, 3)])
def test_packed_conv_exact(k, cin, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 6, 4, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)), jnp.float32) * 0.2
    want = _conv_full(x, w)
    got = depth_to_space(packed_conv(space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_phase_mean_equals_avgpool():
    import flax.linen as nn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 8, 6, 4, 3)), jnp.float32)
    want = nn.avg_pool(x, (2, 2, 2), (2, 2, 2))
    got = phase_mean(space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("k", [1, 3])
def test_packed_conv_pooled_exact(k):
    """conv(phase_mean(x), w) == packed_conv_pooled(x, w) — the fold that
    removes the down-transition's pooled temporary (blocks.ResnetBlock
    fuse_pool path)."""
    from cips_tpu.ops.s2d import packed_conv_pooled

    rng = np.random.default_rng(7)
    cin, cout = 3, 5
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 4, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)), jnp.float32) * 0.2
    packed = space_to_depth(x)
    want = _conv_full(phase_mean(packed), w)
    got = packed_conv_pooled(packed, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_phase_tile_equals_nearest_upsample():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 4, 3, 2, 5)), jnp.float32)
    want = x
    for axis in (1, 2, 3):
        want = jnp.repeat(want, 2, axis=axis)
    got = depth_to_space(phase_tile(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_packed_groupnorm_equivalence():
    """GN over channel groups on the full grid == GN on the packed rep with
    the phase axis reshaped to spatial."""
    import flax.linen as nn

    rng = np.random.default_rng(4)
    c, groups = 6, 3
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, c)), jnp.float32)
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6)
    params = gn.init(jax.random.key(0), x)
    want = gn.apply(params, x)

    xp = space_to_depth(x)  # (2, 2, 2, 2, 8c)
    b, z, y, w_, pc = xp.shape
    xr = xp.reshape(b, z, y, w_, 8, c)
    got_r = gn.apply(params, xr)
    got = depth_to_space(got_r.reshape(b, z, y, w_, pc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_atten_unet_s2d_equivalence():
    """s2d=True computes exactly the same function with the same params."""
    from cips_tpu.models.atten_unet import AttenUNet

    kwargs = dict(
        spatial_dims=3,
        num_res_blocks=1,
        num_channels=(8, 8, 16),
        norm_num_groups=8,
        attention_levels=(False, False, True),
        num_head_channels=(0, 0, 8),
        resblock_updown=True,
        with_conditioning=True,
        cross_attention_dim=3,
    )
    plain = AttenUNet(**kwargs)
    packed = AttenUNet(s2d=True, **kwargs)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8, 1)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 3)), jnp.float32)

    params = plain.init(jax.random.key(0), x, ctx)
    params2 = packed.init(jax.random.key(0), x, ctx)
    # identical parameter trees (same names, shapes, and init values)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(params2)}
    assert len(flat1) == len(flat2)
    for key, v in flat1:
        ks = jax.tree_util.keystr(key)
        assert ks in flat2, ks
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat2[ks]), err_msg=ks)

    y_plain = plain.apply(params, x, ctx)
    y_packed = packed.apply(params, x, ctx)
    np.testing.assert_allclose(
        np.asarray(y_packed), np.asarray(y_plain), atol=2e-5, rtol=2e-5
    )


def test_encoder_s2d_equivalence():
    from cips_tpu.models.encoder import DiffusionModelEncoder

    kwargs = dict(
        in_channels=2,
        out_channels=2,
        num_channels=(8, 8),
        num_res_blocks=1,
        attention_levels=(False, True),
        norm_num_groups=8,
        num_head_channels=(0, 4),
        resblock_updown=True,
        head="mlp",
    )
    plain = DiffusionModelEncoder(**kwargs)
    packed = DiffusionModelEncoder(s2d=True, **kwargs)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 2)), jnp.float32)
    params = plain.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, x)),
        np.asarray(plain.apply(params, x)),
        atol=2e-5, rtol=2e-5,
    )


def test_encoder_s2d_anisotropic_equivalence():
    """auto_factor packing for wide first levels: C=48 -> (2,1,1) (the
    causal encoder's 64-channel case at toy scale), spatial head."""
    from cips_tpu.models.encoder import DiffusionModelEncoder

    kwargs = dict(
        in_channels=1,
        out_channels=6,
        num_channels=(48, 48),
        num_res_blocks=1,
        attention_levels=(False, True),
        norm_num_groups=8,
        num_head_channels=(0, 4),
        resblock_updown=True,
        head="spatial",
        with_conditioning=True,
        cross_attention_dim=3,
    )
    plain = DiffusionModelEncoder(**kwargs)
    packed = DiffusionModelEncoder(s2d=True, **kwargs)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 3)), jnp.float32)
    params = plain.init(jax.random.key(0), x, ctx)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, x, ctx)),
        np.asarray(plain.apply(params, x, ctx)),
        atol=2e-5, rtol=2e-5,
    )


def test_diffusion_decoder_s2d_equivalence():
    from cips_tpu.models.decoder import DiffusionModelDecoder

    kwargs = dict(
        in_channels=3,
        out_channels=1,
        num_channels=(16, 16, 8),
        num_res_blocks=1,
        attention_levels=(True, False, False),
        norm_num_groups=8,
        num_head_channels=(8, 0, 0),
        with_conditioning=True,
        cross_attention_dim=4,
    )
    plain = DiffusionModelDecoder(**kwargs)
    packed = DiffusionModelDecoder(s2d=True, **kwargs)
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 2, 3)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 4)), jnp.float32)
    params = plain.init(jax.random.key(0), z, ctx)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, z, ctx)),
        np.asarray(plain.apply(params, z, ctx)),
        atol=2e-5, rtol=2e-5,
    )


def test_vae_decoder_s2d_equivalence():
    from cips_tpu.models.autoencoder_kl import Decoder

    kwargs = dict(num_channels=(8, 8, 8), num_res_blocks=1, norm_num_groups=8)
    plain = Decoder(**kwargs)
    packed = Decoder(s2d=True, **kwargs)
    rng = np.random.default_rng(12)
    z = jnp.asarray(rng.standard_normal((1, 2, 2, 2, 3)), jnp.float32)
    params = plain.init(jax.random.key(0), z)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, z)),
        np.asarray(plain.apply(params, z)),
        atol=2e-5, rtol=2e-5,
    )


@pytest.mark.parametrize("f", [(2, 2, 1), (2, 1, 2), (1, 2, 2), (2, 1, 1), (1, 1, 2)])
@pytest.mark.parametrize("k", [3, 1])
def test_packed_conv_exact_anisotropic(f, k):
    """Anisotropic packing factors compute the identical convolution."""
    rng = np.random.default_rng(5)
    cin, cout = 3, 4
    x = jnp.asarray(rng.standard_normal((1, 8, 6, 4, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)), jnp.float32) * 0.2
    want = _conv_full(x, w)
    got = depth_to_space(packed_conv(space_to_depth(x, f), w, f=f), f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("f_in", [None, (2, 2, 2), (2, 2, 1), (2, 1, 1), (1, 1, 2)])
@pytest.mark.parametrize("f_out", [None, (2, 2, 2), (2, 2, 1), (2, 1, 1)])
def test_repack_pool_tile_exact(f_in, f_out):
    """repack_pool == avg-pool 2x and repack_tile == nearest 2x on the full
    grids, for every packing combination of source and destination levels."""
    import flax.linen as nn

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 8, 4, 8, 3)), jnp.float32)

    pooled = repack_pool(space_to_depth(x, f_in) if f_in else x, f_in, f_out)
    want_pool = nn.avg_pool(x, (2, 2, 2), (2, 2, 2))
    got_pool = depth_to_space(pooled, f_out) if f_out else pooled
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(want_pool), atol=1e-6)

    tiled = repack_tile(space_to_depth(x, f_in) if f_in else x, f_in, f_out)
    want_tile = x
    for axis in (1, 2, 3):
        want_tile = jnp.repeat(want_tile, 2, axis=axis)
    got_tile = depth_to_space(tiled, f_out) if f_out else tiled
    np.testing.assert_allclose(np.asarray(got_tile), np.asarray(want_tile), atol=1e-6)


@pytest.mark.parametrize("f_in", [(2, 2, 2), (2, 2, 1), (2, 1, 1), (1, 2, 1)])
def test_repack_pool_compact_exact(f_in):
    """repack_pool_compact == _pool2(depth_to_space(x)) — the packed-domain
    pool (phase means + pairwise cell means) never touches the full grid."""
    from cips_tpu.ops.s2d import repack_pool_compact

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 4, 8, 3)), jnp.float32)
    xp = space_to_depth(x, f_in)
    import flax.linen as nn

    want = nn.avg_pool(x, (2, 2, 2), (2, 2, 2))
    got = repack_pool_compact(xp, f_in)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_atten_unet_two_level_s2d_equivalence():
    """Packing levels 0 (2,2,2) and 1 (2,2,1) computes exactly the same
    function with the same parameter tree (the flagship configuration)."""
    from cips_tpu.models.atten_unet import AttenUNet

    kwargs = dict(
        spatial_dims=3,
        num_res_blocks=1,
        num_channels=(8, 8, 16),
        norm_num_groups=8,
        attention_levels=(False, False, True),
        num_head_channels=(0, 0, 8),
        resblock_updown=True,
        with_conditioning=True,
        cross_attention_dim=3,
    )
    plain = AttenUNet(**kwargs)
    packed = AttenUNet(s2d=True, s2d_factors=((2, 2, 2), (2, 2, 1), None), **kwargs)

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8, 1)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 3)), jnp.float32)

    params = plain.init(jax.random.key(0), x, ctx)
    params2 = packed.init(jax.random.key(0), x, ctx)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(params2)}
    assert len(flat1) == len(flat2)
    for key, v in flat1:
        ks = jax.tree_util.keystr(key)
        assert ks in flat2, ks
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat2[ks]), err_msg=ks)

    y_plain = plain.apply(params, x, ctx)
    y_packed = packed.apply(params, x, ctx)
    np.testing.assert_allclose(
        np.asarray(y_packed), np.asarray(y_plain), atol=2e-5, rtol=2e-5
    )


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas phase conv targets real TPU Mosaic (interpret mode unsupported ops)",
)
def test_pallas_phase_conv_exact_tpu():
    from cips_tpu.ops.pallas.phase_conv import phase_conv

    rng = np.random.default_rng(0)
    c = 16
    x_full = jnp.asarray(rng.standard_normal((1, 16, 32, 16, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.2, jnp.float32)
    xp = space_to_depth(x_full)
    want = np.asarray(jax.jit(packed_conv)(xp, w))
    got = np.asarray(phase_conv(xp, w, tz=4))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_diffusion_decoder_s2d_32ch_equivalence():
    """32-channel finest level packs with the (2,2,1) auto factor exactly
    (the causal decoders' configuration)."""
    from cips_tpu.models.decoder import DiffusionModelDecoder

    kwargs = dict(
        in_channels=3,
        out_channels=1,
        num_channels=(64, 64, 32),
        num_res_blocks=1,
        attention_levels=(True, False, False),
        norm_num_groups=16,
        num_head_channels=(16, 0, 0),
        with_conditioning=True,
        cross_attention_dim=4,
    )
    plain = DiffusionModelDecoder(**kwargs)
    packed = DiffusionModelDecoder(s2d=True, **kwargs)
    rng = np.random.default_rng(21)
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 2, 3)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 4)), jnp.float32)
    params = plain.init(jax.random.key(0), z, ctx)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, z, ctx)),
        np.asarray(plain.apply(params, z, ctx)),
        atol=2e-5, rtol=2e-5,
    )


def test_groupnorm_custom_vjp_grad_parity():
    """Hand-written GN VJP == autodiff of the plain normalisation formula,
    for packed/unpacked, single/dual-part (incl. a group straddling the part
    boundary), for dx, dscale, dbias."""
    from cips_tpu.models.blocks import _gn_core

    def ref_gn(parts, scale, bias, p, g, eps):
        # plain formula on the channel-concat, phase folded into spatial
        cat = jnp.concatenate(
            [pt.reshape(pt.shape[0], -1, p, pt.shape[-1] // p) for pt in parts], axis=-1
        )  # (B, S, P, C)
        b, s, _, c = cat.shape
        gs = c // g
        xg = cat.reshape(b, s, p, g, gs)
        mu = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = jnp.square(xg - mu).mean(axis=(1, 2, 4), keepdims=True)
        y = (xg - mu) / jnp.sqrt(var + eps)
        y = y.reshape(b, s, p, c) * scale[None, None, None] + bias[None, None, None]
        return y

    rng = np.random.default_rng(7)
    cases = [
        # (part channel splits, phases, groups)
        ([8], 1, 4),
        ([8], 4, 4),
        ([6, 2], 1, 4),   # group straddles the 6|2 boundary (gs=2)
        ([4, 4], 2, 2),
    ]
    for cs, p, g in cases:
        c = sum(cs)
        parts = tuple(
            jnp.asarray(rng.standard_normal((2, 3, 4, 2, p * ci)), jnp.float32) for ci in cs
        )
        scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
        cotan = tuple(
            jnp.asarray(rng.standard_normal(pt.shape), jnp.float32) for pt in parts
        )

        def loss_custom(parts, scale, bias):
            outs = _gn_core(parts, scale, bias, p, g, 1e-6)
            return sum(jnp.vdot(o, ct) for o, ct in zip(outs, cotan))

        def loss_ref(parts, scale, bias):
            y = ref_gn(parts, scale, bias, p, g, 1e-6)
            ct = jnp.concatenate(
                [t.reshape(t.shape[0], -1, p, t.shape[-1] // p) for t in cotan], axis=-1
            )
            return jnp.vdot(y, ct)

        out_c = [np.asarray(o) for o in _gn_core(parts, scale, bias, p, g, 1e-6)]
        y_ref = np.asarray(ref_gn(parts, scale, bias, p, g, 1e-6))
        off = 0
        for o, ci in zip(out_c, cs):
            o4 = o.reshape(o.shape[0], -1, p, ci)
            np.testing.assert_allclose(o4, y_ref[..., off : off + ci], atol=1e-5, rtol=1e-5)
            off += ci

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(parts, scale, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(parts, scale, bias)
        for a, b_ in zip(gc[0], gr[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gr[1]), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gc[2]), np.asarray(gr[2]), atol=1e-4, rtol=1e-4)


def test_diffusion_decoder_s2d_all_levels_equivalence():
    """s2d_levels="all" packs the attention-free MIDDLE level too
    ((2,1,1) at the causal pet-decoder's 64-channel middle level, here 48ch
    at toy scale) — identical function, identical parameter tree."""
    from cips_tpu.models.decoder import DiffusionModelDecoder

    kwargs = dict(
        in_channels=3,
        out_channels=1,
        num_channels=(16, 48, 8),
        num_res_blocks=1,
        attention_levels=(True, False, False),
        norm_num_groups=8,
        num_head_channels=(8, 0, 0),
        with_conditioning=True,
        cross_attention_dim=4,
    )
    plain = DiffusionModelDecoder(**kwargs)
    packed = DiffusionModelDecoder(s2d=True, s2d_levels="all", **kwargs)
    rng = np.random.default_rng(14)
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 2, 3)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 4)), jnp.float32)
    params = plain.init(jax.random.key(0), z, ctx)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, z, ctx)),
        np.asarray(plain.apply(params, z, ctx)),
        atol=2e-5, rtol=2e-5,
    )


def test_diffusion_decoder_s2d_all_levels_resblock_updown():
    """Mixed-factor up transitions through ResnetBlock(up=True):
    None -> (2,1,1) -> (2,2,2) across the three levels."""
    from cips_tpu.models.decoder import DiffusionModelDecoder

    kwargs = dict(
        in_channels=3,
        out_channels=1,
        num_channels=(16, 48, 8),
        num_res_blocks=1,
        attention_levels=(True, False, False),
        norm_num_groups=8,
        num_head_channels=(8, 0, 0),
        resblock_updown=True,
        with_conditioning=True,
        cross_attention_dim=4,
    )
    plain = DiffusionModelDecoder(**kwargs)
    packed = DiffusionModelDecoder(s2d=True, s2d_levels="all", **kwargs)
    rng = np.random.default_rng(15)
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 2, 3)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 4)), jnp.float32)
    params = plain.init(jax.random.key(0), z, ctx)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, z, ctx)),
        np.asarray(plain.apply(params, z, ctx)),
        atol=2e-5, rtol=2e-5,
    )


def test_vae_decoder_s2d_all_levels_equivalence():
    """Decoder (t1 VAE side): reversed channels [48, 48, 8] -> middle level
    packs (2,1,1), finest (2,2,2)."""
    from cips_tpu.models.autoencoder_kl import Decoder

    kwargs = dict(num_channels=(8, 48, 48), num_res_blocks=1, norm_num_groups=8)
    plain = Decoder(**kwargs)
    packed = Decoder(s2d=True, s2d_levels="all", **kwargs)
    rng = np.random.default_rng(16)
    z = jnp.asarray(rng.standard_normal((1, 2, 2, 2, 3)), jnp.float32)
    params = plain.init(jax.random.key(0), z)
    np.testing.assert_allclose(
        np.asarray(packed.apply(params, z)),
        np.asarray(plain.apply(params, z)),
        atol=2e-5, rtol=2e-5,
    )


@pytest.mark.parametrize("f", [(2, 2, 2), (2, 2, 1), (2, 1, 1)])
def test_packed_conv_halo_exact(f):
    """Halo-output packed conv == full-grid conv, values AND grads.

    The halo formulation (one k-2 conv + output-side slice/concat realign,
    ops/s2d.packed_conv_halo) issues prod(K)/27 of the dense scattered
    kernel's MACs; exactness covers borders (the zero halo must reproduce
    the full grid's SAME-padding zeros)."""
    from cips_tpu.ops.s2d import packed_conv_dense, packed_conv_halo

    rng = np.random.default_rng(7)
    p = f[0] * f[1] * f[2]
    cin, cout = 3, 4
    x = jnp.asarray(rng.standard_normal((2, 4 * f[0], 6 * f[1], 2 * f[2], cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)), jnp.float32) * 0.2
    xp = space_to_depth(x, f)

    y_full = _conv_full(x, w)
    y_halo = depth_to_space(packed_conv_halo(xp, w, f), f)
    np.testing.assert_allclose(np.asarray(y_halo), np.asarray(y_full), atol=2e-5)

    # gradient exactness vs the dense scattered-kernel path
    def loss_dense(xp_, w_):
        return jnp.sum(jnp.sin(packed_conv_dense(xp_, w_, f)))

    def loss_halo(xp_, w_):
        return jnp.sum(jnp.sin(packed_conv_halo(xp_, w_, f)))

    gx_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(xp, w)
    gx_h, gw_h = jax.grad(loss_halo, argnums=(0, 1))(xp, w)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_d), atol=2e-4)


@pytest.mark.parametrize("f", [(2, 2, 2), (2, 2, 1)])
def test_packed_conv_halo_dots_exact(f):
    """Taps-as-dots halo conv == dense packed conv, values and grads."""
    from cips_tpu.ops.s2d import packed_conv_dense, packed_conv_halo_dots

    rng = np.random.default_rng(3)
    cin, cout = 3, 4
    x = jnp.asarray(rng.standard_normal((2, 4 * f[0], 6 * f[1], 2 * f[2], cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)), jnp.float32) * 0.2
    xp = space_to_depth(x, f)
    np.testing.assert_allclose(
        np.asarray(packed_conv_halo_dots(xp, w, f)),
        np.asarray(packed_conv_dense(xp, w, f)),
        atol=2e-5,
    )

    def loss(fn, xp_, w_):
        return jnp.sum(jnp.sin(fn(xp_, w_, f)))

    gx_d, gw_d = jax.grad(lambda a, b: loss(packed_conv_dense, a, b), argnums=(0, 1))(xp, w)
    gx_h, gw_h = jax.grad(lambda a, b: loss(packed_conv_halo_dots, a, b), argnums=(0, 1))(xp, w)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_d), atol=2e-4)


@pytest.mark.parametrize("f", [(2, 2, 2), (2, 2, 1), (2, 1, 1)])
def test_packed_conv_tiled_halo_exact(f):
    """Fold-tile conv through the halo formulation == the dense fold-tile."""
    from cips_tpu.ops.s2d import packed_conv_tiled, packed_conv_tiled_halo

    rng = np.random.default_rng(8)
    cin, cout = 3, 2
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 2, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)), jnp.float32) * 0.2
    y_ref = packed_conv_tiled(x, w, f)
    y_halo = packed_conv_tiled_halo(x, w, f)
    np.testing.assert_allclose(np.asarray(y_halo), np.asarray(y_ref), atol=2e-5)


def test_packed_conv_module_halo_multipart(monkeypatch):
    """PackedConv under CIPS_PACKED_CONV=halo sums RAW halo grids across
    tuple parts and realigns once (models/blocks.PackedConv); values must
    match the dense path for both packed and fold-tile inputs."""
    from cips_tpu.models.blocks import PackedConv
    from cips_tpu.ops import s2d

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((1, 4, 3, 2, 3 * 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 4, 3, 2, 2 * 8)), jnp.float32)
    m = PackedConv(features=4)
    params = m.init(jax.random.key(0), (a, b))

    monkeypatch.setattr(s2d, "_PACKED_CONV_IMPL", "dense")
    y_dense = m.apply(params, (a, b))
    monkeypatch.setattr(s2d, "_PACKED_CONV_IMPL", "halo")
    y_halo = m.apply(params, (a, b))
    np.testing.assert_allclose(np.asarray(y_halo), np.asarray(y_dense), atol=2e-5)

    # taps-as-dots halo impl and the masked (full-lane select) realign
    monkeypatch.setattr(s2d, "_PACKED_CONV_IMPL", "halo_dots")
    y_dots = m.apply(params, (a, b))
    np.testing.assert_allclose(np.asarray(y_dots), np.asarray(y_dense), atol=2e-5)
    monkeypatch.setattr(s2d, "_HALO_REALIGN", "masked")
    y_masked = m.apply(params, (a, b))
    np.testing.assert_allclose(np.asarray(y_masked), np.asarray(y_dense), atol=2e-5)
    monkeypatch.setattr(s2d, "_HALO_REALIGN", "slice")

    # fold-tile (unpacked pre-tile) input through the module
    xt = jnp.asarray(rng.standard_normal((1, 4, 3, 2, 5)), jnp.float32)
    mt = PackedConv(features=4, tiled_input=True)
    pt = mt.init(jax.random.key(1), xt)
    monkeypatch.setattr(s2d, "_PACKED_CONV_IMPL", "dense")
    yt_dense = mt.apply(pt, xt)
    monkeypatch.setattr(s2d, "_PACKED_CONV_IMPL", "halo")
    yt_halo = mt.apply(pt, xt)
    np.testing.assert_allclose(np.asarray(yt_halo), np.asarray(yt_dense), atol=2e-5)


@pytest.mark.parametrize("f", [(2, 2, 2), (2, 2, 1), (2, 1, 1)])
def test_halo_realign_impl_equivalence(f):
    """All three realign implementations (slice-concat, full-lane masked
    select, one-hot depthwise conv) agree on random halo grids at every
    packing factor — the masked path's phase-index/lane-select interplay
    and the dwconv kernel differ per factor-1 axis (ADVICE round 3)."""
    from cips_tpu.ops.s2d import (
        _halo_realign_dwconv,
        _halo_realign_masked,
        _halo_realign_slices,
        phase_count,
    )

    rng = np.random.default_rng(21)
    cout = 3
    out_shape = (4, 6, 2)
    halo = tuple(s + ff - 1 for s, ff in zip(out_shape, f))
    v = jnp.asarray(
        rng.standard_normal((2, *halo, phase_count(f) * cout)), jnp.float32
    )
    ref = _halo_realign_slices(v, out_shape, cout, f)
    np.testing.assert_allclose(
        np.asarray(_halo_realign_masked(v, out_shape, cout, f)), np.asarray(ref), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(_halo_realign_dwconv(v, out_shape, cout, f)), np.asarray(ref), atol=2e-6
    )


def test_packed_conv_halo_switch(monkeypatch):
    """CIPS_PACKED_CONV=halo routes k=3 sites to the halo path and leaves
    k=1 convs (no halo formulation) on the dense path."""
    from cips_tpu.ops import s2d

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 8, 6, 4, 2)), jnp.float32)
    xp = space_to_depth(x)
    monkeypatch.setattr(s2d, "_PACKED_CONV_IMPL", "halo")
    for k in (3, 1):
        w = jnp.asarray(rng.standard_normal((k, k, k, 2, 2)), jnp.float32) * 0.2
        y = depth_to_space(s2d.packed_conv(xp, w))
        np.testing.assert_allclose(np.asarray(y), np.asarray(_conv_full(x, w)), atol=2e-5)


@pytest.mark.parametrize("f", [(2, 2, 2), (2, 2, 1), (2, 1, 1)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_s2d_conv_impl_exact(f, dtype):
    """The one-hot strided-conv s2d and its transposed-conv inverse are
    bit-exact against the reshape path (0/1 kernel, one term per output;
    HIGHEST precision so f32 operands are not rounded to bf16 on the MXU)."""
    from cips_tpu.ops.s2d import _d2s_conv, _d2s_reshape, _s2d_conv, _s2d_reshape, phase_count

    rng = np.random.default_rng(7)
    for c in (1, 3, 16):
        x = jnp.asarray(rng.standard_normal((2, 8, 6, 4, c)), dtype)
        np.testing.assert_array_equal(np.asarray(_s2d_conv(x, f)), np.asarray(_s2d_reshape(x, f)))
        y = jnp.asarray(rng.standard_normal((2, 4, 3, 4, phase_count(f) * c)), dtype)
        np.testing.assert_array_equal(np.asarray(_d2s_conv(y, f)), np.asarray(_d2s_reshape(y, f)))


def test_gn_sum_pair_vreduce_equivalence(monkeypatch):
    """The opt-in variadic-reduce fusion (CIPS_GN_VREDUCE=1; measured slower
    on v5e, default OFF — blocks._sum_pair docstring) computes the same
    fp32 sums, fwd and grad, as the default plain-sum pair."""
    from cips_tpu.models import blocks

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((2, 6, 5, 4, 8)), jnp.float32)

    def run():
        def loss(x):
            s1, s2 = blocks._sum_pair(x, jnp.square(x), (1, 2, 3))
            return jnp.sum(s1 * 0.3 + s2)

        return jax.value_and_grad(loss)(a)

    monkeypatch.delenv("CIPS_GN_VREDUCE", raising=False)
    v_plain, g_plain = run()
    monkeypatch.setenv("CIPS_GN_VREDUCE", "1")
    v_vr, g_vr = run()
    np.testing.assert_allclose(float(v_plain), float(v_vr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_vr), rtol=1e-6)


@pytest.mark.parametrize(
    "f_in,f_out",
    [
        (None, (2, 2, 2)),
        (None, (2, 2, 1)),
        (None, (2, 1, 1)),
        ((2, 2, 1), (2, 2, 2)),
        ((2, 1, 1), (2, 2, 1)),
        ((2, 1, 1), (2, 2, 2)),
    ],
)
def test_repack_tile_compact_identity(f_in, f_out):
    """repack_tile(x, f_in, f_out) == phase_tile(repack_tile_compact(...)):
    the algebra that lets packed->packed up transitions fold their tile into
    the conv kernel (all P phase blocks of the tile are identical)."""
    from cips_tpu.ops.s2d import (
        _s2d_reshape, _d2s_reshape, _tile2, phase_count, phase_tile, repack_tile_compact,
    )

    rng = np.random.default_rng(5)
    shape = (2, 4, 6, 4, 8 if f_in is None else 4 * phase_count(f_in))
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    full = _d2s_reshape(x, f_in) if f_in else x
    ref = _s2d_reshape(_tile2(full), f_out)
    got = phase_tile(repack_tile_compact(x, f_in, f_out), f_out)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv_transpose_k4s2_exact():
    """conv_transpose_k4s2 == nn.ConvTranspose(k4, s2, SAME) bit-for-bit:
    the subpixel decomposition (k2 conv + halo realign + d2s) that keeps
    the BMGAN up path off the input-dilated k4 MXU lowering."""
    import flax.linen as nn_

    from cips_tpu.ops.s2d import conv_transpose_k4s2

    rng = np.random.default_rng(1)
    for cin, cout, shp in [(3, 5, (2, 4, 6, 4)), (8, 8, (1, 6, 4, 6))]:
        x = jnp.asarray(rng.standard_normal((shp[0], *shp[1:], cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((4, 4, 4, cin, cout)) * 0.2, jnp.float32)
        mod = nn_.ConvTranspose(
            cout, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding="SAME", use_bias=False
        )
        ref = mod.apply({"params": {"kernel": w}}, x)
        got = conv_transpose_k4s2(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("f", [(2, 2, 2), (2, 2, 1), (2, 1, 1)])
def test_packed_conv_strided_exact(f):
    """packed_conv_strided(s2d(x)) == stride-2 SAME k-3 conv on x, values
    and grads: the stride-2 output grid coincides with the packing cell
    grid on packed axes (no output phases, no realign)."""
    from cips_tpu.ops.s2d import packed_conv_strided

    rng = np.random.default_rng(11)
    cin, cout = 3, 4
    x = jnp.asarray(rng.standard_normal((2, 4 * f[0], 6 * f[1], 4, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)), jnp.float32) * 0.2

    def ref(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    xp = space_to_depth(x, f)
    got = packed_conv_strided(xp, w, f)
    want = ref(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    gx_r, gw_r = jax.grad(lambda a, b: jnp.sum(jnp.sin(ref(a, b))), argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.grad(
        lambda a, b: jnp.sum(jnp.sin(packed_conv_strided(space_to_depth(a, f), b, f))),
        argnums=(0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r), atol=2e-4)


@pytest.mark.parametrize("s2d_depth", [1, 2])
def test_resnet_encoder_s2d_equivalence(s2d_depth):
    """ResNetEncoder(s2d=True) == ResNetEncoder(s2d=False) on the SAME
    parameters (the packed stem + strided res_0 — and at depth 2 the
    (2,2,2)-repacked strided res_1 — share the unpacked tree), values and
    parameter grads."""
    from cips_tpu.models.bmgan import ResNetEncoder

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 8, 1)), jnp.float32)
    kw = dict(input_layer_channel=4, channels=(6, 8), latent_dim=3)
    enc_u = ResNetEncoder(s2d=False, **kw)
    enc_p = ResNetEncoder(s2d=True, s2d_depth=s2d_depth, **kw)
    params = enc_u.init(jax.random.key(0), x)
    params_p = enc_p.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_p)

    mu_u, lv_u = enc_u.apply(params, x)
    mu_p, lv_p = enc_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv_p), np.asarray(lv_u), atol=1e-4)

    def loss(mod, p_):
        mu, lv = mod.apply(p_, x)
        return jnp.sum(jnp.sin(mu)) + jnp.sum(jnp.cos(lv))

    g_u = jax.grad(lambda p_: loss(enc_u, p_))(params)
    g_p = jax.grad(lambda p_: loss(enc_p, p_))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
