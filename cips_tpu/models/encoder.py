"""DiffusionModelEncoder — attention encoder for classification and causal latents.

Re-design of the reference's encoder (`unet/utils/atten_unet_model.py:1863-2032`)
which serves two roles:

  * **classifier head** (`head="mlp"`): sMCI/pMCI MCI-converter classifier
    (`pet_for_classification/train_atten_encoder_MCI.py:80-87`) — down blocks
    at every level, flatten, Dense(512) -> ReLU -> Dropout(0.1) -> Dense(out).
    The reference hardcodes Linear(4096, 512); we size the flatten dynamically
    (the hardcode is a latent shape bug, SURVEY.md §7).
  * **causal spatial latent** (`head="spatial"`): the T1 encoder of the causal
    generator (`causal_synthesis/scripts/train_unify_causal_gen.py:213-215`)
    emits a 2*z-channel spatial map split into (z_mu, z_sigma). Here the final
    level does NOT downsample so a 3-level encoder yields a 1/4-resolution
    latent that composes exactly with the 3-level decoders.

The reference's timestep-embedding path is vestigial (callers pass zero
timesteps; `get_timestep_embedding` is undefined in the vendored file,
atten_unet_model.py:2004) and is dropped here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips_tpu.models.blocks import DownBlock, GroupNorm, PackedConv, attention_mode, conv
from cips_tpu.ops.s2d import auto_factor, space_to_depth


def _tuplify(v, n: int) -> Tuple:
    if isinstance(v, (int, float, bool)):
        return (v,) * n
    return tuple(v)


class DiffusionModelEncoder(nn.Module):
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    num_res_blocks: Sequence[int] | int = (2, 2, 2, 2)
    num_channels: Sequence[int] = (32, 64, 64, 64)
    attention_levels: Sequence[bool] = (False, False, True, True)
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    resblock_updown: bool = False
    num_head_channels: Sequence[int] | int = 8
    with_conditioning: bool = False
    transformer_num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    head: str = "mlp"  # "mlp" -> logits (classifier) | "spatial" -> latent map (causal)
    head_hidden: int = 512
    head_dropout: float = 0.1
    s2d: bool = False  # space-to-depth level 0 (exact; needs resblock_updown, no L0 attention);
    # the packing factor is auto_factor(num_channels[0]) — (2,2,2) for <=16
    # channels, (2,2,1) for 32, (2,1,1) for 64 (the causal encoder's case)
    remat: bool = False  # jax.checkpoint each down block
    remat_policy: str = "conv"  # "conv" | "conv12" | "conv2" | "conv_all" —
    # "conv_all" additionally saves unpacked conv outputs: for mostly
    # unpacked models (the causal trio) "conv" saves nothing and the
    # backward re-runs whole blocks (measured 3.9-4.9x fwd; conv_all ~3x)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if context is not None and not self.with_conditioning:
            raise ValueError("context requires with_conditioning=True")
        n = len(self.num_channels)
        res_blocks = _tuplify(self.num_res_blocks, n)
        head_channels = _tuplify(self.num_head_channels, n)

        f0 = auto_factor(self.num_channels[0]) if self.s2d else None
        if self.s2d:
            if self.attention_levels[0] or not self.resblock_updown or self.spatial_dims != 3:
                raise ValueError("s2d needs resblock_updown=True, no level-0 attention, 3-D")
            if f0 is None:
                raise ValueError("s2d level 0 needs a 128-lane-compatible channel count")
            x = space_to_depth(x, f0)
            h = PackedConv(self.num_channels[0], 3, factors=f0, dtype=self.dtype, name="conv_in")(x)
        else:
            h = conv(self.num_channels[0], 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_in")(x)

        for i in range(n):
            # mlp head: downsample at every level (reference behaviour,
            # atten_unet_model.py:1966). spatial head: keep the final level's
            # resolution so encoder/decoder scale factors compose.
            # remat is applied INSIDE the block (resnets only): attention
            # must stay outside remat or its exp-roofline flash kernel
            # re-runs in the backward pass (blocks.DownBlock.remat_policy).
            add_down = True if self.head == "mlp" else (i != n - 1)
            h, _ = DownBlock(
                remat_policy=self.remat_policy if self.remat else None,
                spatial_dims=self.spatial_dims,
                out_channels=self.num_channels[i],
                num_res_blocks=res_blocks[i],
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                add_downsample=add_down,
                resblock_updown=self.resblock_updown,
                attention_mode=attention_mode(self.attention_levels[i], self.with_conditioning),
                num_head_channels=head_channels[i],
                transformer_num_layers=self.transformer_num_layers,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                factors=f0 if i == 0 else None,
                factors_down=None,
                dtype=self.dtype,
                name=f"down_{i}",
            )(h, context, deterministic)

        if self.head == "spatial":
            h = GroupNorm(self.norm_num_groups, self.norm_eps, name="out_norm")(h)
            h = nn.silu(h)
            return conv(
                self.out_channels, 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_out"
            )(h)

        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.head_hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.head_dropout)(h, deterministic=deterministic)
        return nn.Dense(self.out_channels, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)


def _conv_save_policy(mode: str = "conv"):
    """named conv-save checkpoint policy (see models/blocks.py)."""
    from cips_tpu.models.blocks import conv_save_policy

    return conv_save_policy(mode)
