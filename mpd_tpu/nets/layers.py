"""Temporal NN building blocks (flax.linen), channels-last [B, H, C].

Functional re-design of the reference layer zoo
(reference: mpd/models/layers/layers.py:174-395). The reference uses
torch [B, C, H] layout; here everything is [B, H, C] so 1-D convolutions map
onto XLA's native NHWC conv path and matmuls hit the MXU without transposes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def group_norm_n_groups(n_channels: int, target_n_groups: int = 8) -> int:
    """Group count rule matching ref layers.py:389-395."""
    if n_channels < target_n_groups:
        return 1
    for n_groups in range(target_n_groups, target_n_groups + 10):
        if n_channels % n_groups == 0:
            return n_groups
    return 1


class SinusoidalPosEmb(nn.Module):
    """Transformer-style sinusoidal embedding (ref layers.py:243-255)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.dim // 2
        scale = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
        emb = x.astype(jnp.float32)[:, None] * freqs[None, :]
        out = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        return out.astype(self.dtype)


class TimeEncoder(nn.Module):
    """SinPosEmb -> Dense(4*dim) -> mish -> Dense(dim_out) (ref layers.py:229-240)."""

    dim: int = 32
    dim_out: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = SinusoidalPosEmb(self.dim, dtype=self.dtype)(t)
        emb = nn.Dense(self.dim * 4, dtype=self.dtype)(emb)
        emb = mish(emb)
        return nn.Dense(self.dim_out, dtype=self.dtype)(emb)


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm -> mish (ref layers.py:276-293)."""

    out_channels: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, kernel_size=(self.kernel_size,),
                    padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=group_norm_n_groups(self.out_channels),
                         dtype=self.dtype)(x)
        return mish(x)


class Downsample1d(nn.Module):
    """Strided conv halving the horizon (ref layers.py:258-264)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.channels, kernel_size=(3,), strides=(2,),
                       padding="SAME", dtype=self.dtype)(x)


class Upsample1d(nn.Module):
    """Transposed conv doubling the horizon (ref layers.py:267-273)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(self.channels, kernel_size=(4,), strides=(2,),
                                padding="SAME", dtype=self.dtype)(x)


class ResidualTemporalBlock(nn.Module):
    """Two conv blocks with a FiLM-style additive time bias and a 1x1 residual
    (ref layers.py:323-355)."""

    out_channels: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        h = Conv1dBlock(self.out_channels, self.kernel_size, dtype=self.dtype)(x)
        cond_bias = nn.Dense(self.out_channels, dtype=self.dtype)(mish(cond))
        h = h + cond_bias[:, None, :]
        h = Conv1dBlock(self.out_channels, self.kernel_size, dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, kernel_size=(1,), dtype=self.dtype)(x)
        else:
            res = x
        return h + res


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention over the horizon (ref layers.py:207-226)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h_len, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False)(x)  # [B, H, 3*hidden]
        qkv = qkv.reshape(b, h_len, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, H, heads, dh]
        q = q * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=1)  # softmax over sequence positions
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, h_len, hidden)
        return nn.Dense(self.dim)(out)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels with biased variance (ref layers.py:194-204)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * g + b


class PreNormResidualAttention(nn.Module):
    """Residual(PreNorm(LinearAttention)) (ref layers.py:174-191)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x + LinearAttention(self.dim)(ChannelLayerNorm(self.dim)(x))


class MLP(nn.Module):
    """Simple MLP head (ref layers.py:12-36)."""

    out_dim: int
    hidden_dim: int = 32
    n_layers: int = 1
    act: str = "mish"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = {"mish": mish, "relu": jax.nn.relu, "identity": lambda y: y}[self.act]
        for _ in range(self.n_layers):
            x = act(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.out_dim)(x)
