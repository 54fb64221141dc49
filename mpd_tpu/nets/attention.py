"""Cross-attention conditioning stack.

Counterpart of the reference's layers_attention
(reference: mpd/models/layers/layers_attention.py:38-194 — GEGLU,
FeedForward, CrossAttention, BasicTransformerBlock, SpatialTransformer).
Compiled into the reference U-Net but inactive in the live pipelines
(conditioning_type=None); provided here for API/capability parity with
context-conditioned variants. Channels-last [B, H, C]; attention matmuls
land on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2)(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    glu: bool = True

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.glu:
            x = GEGLU(inner)(x)
        else:
            x = jax.nn.gelu(nn.Dense(inner)(x))
        return nn.Dense(self.dim)(x)


class CrossAttention(nn.Module):
    """Multi-head attention; context==None degrades to self-attention."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context: Optional[jnp.ndarray] = None):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False)(x)
        k = nn.Dense(inner, use_bias=False)(ctx)
        v = nn.Dense(inner, use_bias=False)(ctx)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, h, dh)
        k = k.reshape(b, m, h, dh)
        v = v.reshape(b, m, h, dh)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (dh**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(self.query_dim)(out)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context: Optional[jnp.ndarray] = None):
        x = CrossAttention(self.dim, self.heads, self.dim_head)(nn.LayerNorm()(x)) + x
        x = CrossAttention(self.dim, self.heads, self.dim_head)(
            nn.LayerNorm()(x), context=context
        ) + x
        x = FeedForward(self.dim)(nn.LayerNorm()(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """Project in -> transformer blocks with cross-attn -> zero-init project
    out + residual (ref layers_attention.py:148-194)."""

    channels: int
    heads: int = 2
    dim_head: int = 32
    depth: int = 1
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context: Optional[jnp.ndarray] = None):
        inner = self.heads * self.dim_head
        residual = x
        h = nn.GroupNorm(num_groups=min(32, self.channels))(x)
        h = nn.Dense(inner)(h)
        for _ in range(self.depth):
            h = BasicTransformerBlock(inner, self.heads, self.dim_head, self.context_dim)(
                h, context=context
            )
        h = nn.Dense(self.channels, kernel_init=nn.initializers.zeros)(h)
        return h + residual
