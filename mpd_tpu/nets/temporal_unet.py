"""Temporal U-Net epsilon-predictor (flax.linen), channels-last.

Same topology as the reference's TemporalUnet
(reference: mpd/models/diffusion_models/temporal_unet.py:20-171):
per level 2x ResidualTemporalBlock (+ optional self-attention) then a
stride-2 downsample (except the deepest level); mid res-attn-res; mirrored
up path with skip concatenation; final Conv1dBlock(k=5) + 1x1 conv back to
state_dim. Horizon must be divisible by 2^(levels-1).

Trajectories are [B, H, D] (channels-last throughout, no transposes).
The live reference configuration is conditioning_type=None (time embedding
only); context conditioning hooks are kept for parity of API surface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mpd_tpu.nets.layers import (
    Conv1dBlock,
    Downsample1d,
    PreNormResidualAttention,
    ResidualTemporalBlock,
    TimeEncoder,
    Upsample1d,
)

# Reference naming: UNET_DIM_MULTS (ref temporal_unet.py:14-17)
UNET_DIM_MULTS = {
    0: (1, 2, 4),
    1: (1, 2, 4, 8),
}


class _StateEncoderMLP(nn.Module):
    """State encoder for the 'concatenate' conditioning mode when the
    conditioning embedding dwarfs the state
    (ref temporal_unet.py:44-52: MLP(state_dim, out_dim,
    hidden_dim=out_dim//2, n_layers=1, act='mish')).

    Mirrors the reference MLP's affine/mish structure
    (ref layers/layers.py:12-35: Linear->mish, n_layers x [Linear->norm->
    mish], Linear) minus the block's BatchNorm1d: torch's BatchNorm1d reads
    dim 1 — the HORIZON on the [B, H, C] tensor this encoder is applied to
    (ref forward, temporal_unet.py:127-130) — so the reference branch is
    shape-invalid as written whenever H != hidden_dim; the norm is dropped
    here (documented in PARITY.md)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mpd_tpu.nets.layers import mish

        hidden = self.out_dim // 2
        x = mish(nn.Dense(hidden, dtype=self.dtype)(x))
        x = mish(nn.Dense(hidden, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class TemporalUnet(nn.Module):
    """Conditioning modes (ref temporal_unet.py:41-59):
    - None (live reference config): time embedding only
    - 'default': context vector concatenated into the per-block conditioning
    - 'attention': cross-attention to the context at every level
    - 'concatenate': context broadcast along the horizon and concatenated to
      the state input channels
    """

    state_dim: int
    n_support_points: int = 64
    unet_input_dim: int = 32
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    time_emb_dim: int = 32
    self_attention: bool = False
    conditioning_type: Optional[str] = None
    conditioning_embed_dim: int = 4
    attention_num_heads: int = 2
    attention_dim_head: int = 32
    # computation dtype (params stay float32; bfloat16 here runs the convs
    # and matmuls MXU-native). The final 1x1 projection always emits float32.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, H, D]
        time: jnp.ndarray,  # [B] int timesteps
        context: Optional[jnp.ndarray] = None,  # [B, C]
    ) -> jnp.ndarray:
        from mpd_tpu.nets.attention import SpatialTransformer

        cond_type = self.conditioning_type
        if cond_type in (None, "None"):
            cond_type = None
            context = None

        input_dim = self.state_dim
        if cond_type == "concatenate":
            assert context is not None
            # ref temporal_unet.py:44-52: when the conditioning embedding is
            # much larger than the state (state_dim < embed_dim // 4), embed
            # the state into a latent of embed_dim // 4 channels first so
            # the context doesn't drown it in the concatenation
            state_emb_dim = self.state_dim
            x_emb = x
            if self.state_dim < self.conditioning_embed_dim // 4:
                state_emb_dim = self.conditioning_embed_dim // 4
                x_emb = _StateEncoderMLP(state_emb_dim, dtype=self.dtype)(x)
            ctx_h = jnp.broadcast_to(
                context[:, None, :], (x.shape[0], x.shape[1], context.shape[-1])
            )
            x = jnp.concatenate([x_emb, ctx_h], axis=-1)
            input_dim = state_emb_dim + context.shape[-1]

        dims = [input_dim] + [self.unet_input_dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_levels = len(in_out)

        x = x.astype(self.dtype)
        c_emb = TimeEncoder(32, self.time_emb_dim, dtype=self.dtype)(time)
        if cond_type == "default":
            assert context is not None
            c_emb = jnp.concatenate([c_emb, context], axis=-1)
        ctx_seq = context[:, None, :] if (cond_type == "attention" and context is not None) else None

        def attn(dim, h):
            if self.self_attention:
                h = PreNormResidualAttention(dim)(h)
            if cond_type == "attention":
                h = SpatialTransformer(
                    dim, self.attention_num_heads, self.attention_dim_head,
                    context_dim=self.conditioning_embed_dim,
                )(h, context=ctx_seq)
            return h

        skips = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_levels - 1
            x = ResidualTemporalBlock(dim_out, dtype=self.dtype)(x, c_emb)
            x = ResidualTemporalBlock(dim_out, dtype=self.dtype)(x, c_emb)
            x = attn(dim_out, x)
            skips.append(x)
            if not is_last:
                x = Downsample1d(dim_out, dtype=self.dtype)(x)

        mid_dim = dims[-1]
        x = ResidualTemporalBlock(mid_dim, dtype=self.dtype)(x, c_emb)
        x = attn(mid_dim, x)
        x = ResidualTemporalBlock(mid_dim, dtype=self.dtype)(x, c_emb)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResidualTemporalBlock(dim_in, dtype=self.dtype)(x, c_emb)
            x = ResidualTemporalBlock(dim_in, dtype=self.dtype)(x, c_emb)
            x = attn(dim_in, x)
            x = Upsample1d(dim_in, dtype=self.dtype)(x)

        x = Conv1dBlock(self.unet_input_dim, kernel_size=5, dtype=self.dtype)(x)
        x = nn.Conv(self.state_dim, kernel_size=(1,), dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return x
