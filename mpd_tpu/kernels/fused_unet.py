"""Pallas mega-kernels for the temporal U-Net forward pass.

Why: the eps-model forward is ~150 tiny XLA ops (convs over [B, 64, 32-256]
tensors); at these sizes per-op overhead dominates — a forward costs the
same wall-clock at B=8 as at B=64 (measured ~0.86 ms/forward fixed). Each
`fused_residual_temporal_block` collapses one ResidualTemporalBlock
(conv k5 -> GroupNorm -> mish -> +FiLM time bias -> conv k5 -> GroupNorm ->
mish -> +1x1 residual; 10-15 XLA ops) into a single Pallas kernel: the k=5
convolution runs as 5 shifted MXU matmuls accumulated in VMEM, the GroupNorm
reductions and mish stay on the VPU without round-tripping HBM.

`pallas_unet_apply(variables, x, t, ...)` runs the whole TemporalUnet
forward consuming the *flax* parameter pytree (training stays in flax; this
is an inference fast path), with down/upsample convs and the time encoder
left to XLA (few ops). Numerical parity with `TemporalUnet.apply` is
asserted in tests/test_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mpd_tpu.nets.layers import group_norm_n_groups, mish

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def pallas_available() -> bool:
    return _HAS_PALLAS and jax.default_backend() in ("tpu",)


_GN_EPS = 1e-6  # flax.linen.GroupNorm default


def _group_norm(h: jnp.ndarray, n_groups: int, gamma: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """GroupNorm over (H, C/G) per sample, matching flax semantics.

    Group statistics are computed with a one-hot [C, G] membership matmul
    instead of reshaping channels into (G, C/G): Mosaic cannot shape-cast the
    minormost (lane) dimension, and the tiny matmuls ride the MXU anyway.
    """
    tb, H, C = h.shape
    cg = C // n_groups
    # membership matrix built in-kernel via iota (pallas kernels cannot
    # capture array constants)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, n_groups), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (C, n_groups), 1)
    M = (cidx // cg == gidx).astype(jnp.float32)

    h2 = h.reshape(tb * H, C)
    s = jnp.dot(h2, M, preferred_element_type=jnp.float32).reshape(tb, H, n_groups)
    ssq = jnp.dot(h2 * h2, M, preferred_element_type=jnp.float32).reshape(tb, H, n_groups)
    cnt = float(H * cg)
    mean_g = jnp.sum(s, axis=1) / cnt  # [tb, G]
    var_g = jnp.sum(ssq, axis=1) / cnt - mean_g**2
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)  # [tb, C]
    var_c = jnp.dot(var_g, M.T, preferred_element_type=jnp.float32)
    out = (h - mean_c[:, None, :]) * jax.lax.rsqrt(var_c[:, None, :] + _GN_EPS)
    return out * gamma + beta


def _conv5(xp: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, H: int) -> jnp.ndarray:
    """k=5 'SAME' conv as 5 shifted matmuls. xp: [TB, H+4, Cin] pre-padded,
    w: [5, Cin, Co]."""
    tb = xp.shape[0]
    cin = xp.shape[-1]
    co = w.shape[-1]
    acc = jnp.zeros((tb * H, co), jnp.float32)
    for k in range(5):
        xs = xp[:, k : k + H, :].reshape(tb * H, cin)
        acc = acc + jnp.dot(xs, w[k], preferred_element_type=jnp.float32)
    return acc.reshape(tb, H, co) + b


def _rtb_kernel(
    x_ref, bias_ref, w1_ref, b1_ref, g1_ref, be1_ref,
    w2_ref, b2_ref, g2_ref, be2_ref, wres_ref, bres_ref, o_ref,
    *, H: int, n_groups: int, has_res_conv: bool,
):
    x = x_ref[:].astype(jnp.float32)
    tb = x.shape[0]

    zeros = jnp.zeros((tb, 2, x.shape[-1]), jnp.float32)
    xp = jnp.concatenate([zeros, x, zeros], axis=1)  # SAME padding for k=5

    h = _conv5(xp, w1_ref[:], b1_ref[:], H)
    h = _group_norm(h, n_groups, g1_ref[:], be1_ref[:])
    h = mish(h)
    h = h + bias_ref[:][:, None, :]  # FiLM-style time bias

    zeros2 = jnp.zeros((tb, 2, h.shape[-1]), jnp.float32)
    hp = jnp.concatenate([zeros2, h, zeros2], axis=1)
    h2 = _conv5(hp, w2_ref[:], b2_ref[:], H)
    h2 = _group_norm(h2, n_groups, g2_ref[:], be2_ref[:])
    h2 = mish(h2)

    if has_res_conv:
        res = (
            jnp.dot(
                x.reshape(tb * H, -1), wres_ref[:],
                preferred_element_type=jnp.float32,
            ).reshape(tb, H, -1)
            + bres_ref[:]
        )
    else:
        res = x
    o_ref[:] = h2 + res


def fused_residual_temporal_block(
    x: jnp.ndarray,  # [B, H, Cin]
    cond_bias: jnp.ndarray,  # [B, Co] (already Dense(mish(c_emb)))
    w1: jnp.ndarray,  # [5, Cin, Co]
    b1: jnp.ndarray,
    g1: jnp.ndarray,
    be1: jnp.ndarray,
    w2: jnp.ndarray,  # [5, Co, Co]
    b2: jnp.ndarray,
    g2: jnp.ndarray,
    be2: jnp.ndarray,
    wres: Optional[jnp.ndarray],  # [Cin, Co] or None (identity residual)
    bres: Optional[jnp.ndarray],
    block_b: int = 16,
) -> jnp.ndarray:
    B, H, cin = x.shape
    co = w1.shape[-1]
    n_groups = group_norm_n_groups(co)
    has_res = wres is not None
    if not has_res:
        wres = jnp.zeros((1, 1), jnp.float32)
        bres = jnp.zeros((1,), jnp.float32)

    tb = min(block_b, B)
    while B % tb:
        tb //= 2
    tb = max(tb, 1)

    kernel = functools.partial(
        _rtb_kernel, H=H, n_groups=n_groups, has_res_conv=has_res
    )
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, H, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, co), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(5, cin, co),
            full(co),
            full(co),
            full(co),
            full(5, co, co),
            full(co),
            full(co),
            full(co),
            full(*wres.shape),
            full(*bres.shape),
        ],
        out_specs=pl.BlockSpec((tb, H, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, co), jnp.float32),
    )(x, cond_bias, w1, b1, g1, be1, w2, b2, g2, be2, wres, bres)


# ---------------------------------------------------------------------------
# Whole-U-Net forward on the flax param tree
# ---------------------------------------------------------------------------


def _rtb_params(p):
    """Extract one ResidualTemporalBlock's arrays from its flax subtree."""
    c1 = p["Conv1dBlock_0"]
    c2 = p["Conv1dBlock_1"]
    w1 = c1["Conv_0"]["kernel"]  # [5, Cin, Co]
    b1 = c1["Conv_0"]["bias"]
    g1 = c1["GroupNorm_0"]["scale"]
    be1 = c1["GroupNorm_0"]["bias"]
    w2 = c2["Conv_0"]["kernel"]
    b2 = c2["Conv_0"]["bias"]
    g2 = c2["GroupNorm_0"]["scale"]
    be2 = c2["GroupNorm_0"]["bias"]
    dense_w = p["Dense_0"]["kernel"]  # cond bias projection
    dense_b = p["Dense_0"]["bias"]
    if "Conv_0" in p:  # residual 1x1
        wres = p["Conv_0"]["kernel"][0]  # [1, Cin, Co] -> [Cin, Co]
        bres = p["Conv_0"]["bias"]
    else:
        wres = bres = None
    return (w1, b1, g1, be1, w2, b2, g2, be2, wres, bres, dense_w, dense_b)


def _apply_rtb(p, x, c_emb, block_b):
    (w1, b1, g1, be1, w2, b2, g2, be2, wres, bres, dw, db) = _rtb_params(p)
    cond_bias = jnp.dot(mish(c_emb), dw) + db
    return fused_residual_temporal_block(
        x, cond_bias, w1, b1, g1, be1, w2, b2, g2, be2, wres, bres,
        block_b=block_b,
    )


def pallas_unet_apply(
    variables,
    x: jnp.ndarray,  # [B, H, D]
    t: jnp.ndarray,  # [B]
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8),
    block_b: int = 16,
) -> jnp.ndarray:
    """TemporalUnet forward (conditioning=None, self_attention=False) with
    fused RTB kernels. Consumes the exact flax param pytree of
    mpd_tpu.nets.temporal_unet.TemporalUnet."""
    p = variables["params"]
    n_levels = len(dim_mults)

    # time encoder (XLA; 3 small matmuls)
    te = p["TimeEncoder_0"]
    half = 16
    scale = np.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
    emb = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    emb = jnp.dot(emb, te["Dense_0"]["kernel"]) + te["Dense_0"]["bias"]
    emb = mish(emb)
    c_emb = jnp.dot(emb, te["Dense_1"]["kernel"]) + te["Dense_1"]["bias"]

    rtb_idx = 0
    down_idx = 0
    up_idx = 0

    skips = []
    for level in range(n_levels):
        is_last = level == n_levels - 1
        x = _apply_rtb(p[f"ResidualTemporalBlock_{rtb_idx}"], x, c_emb, block_b); rtb_idx += 1
        x = _apply_rtb(p[f"ResidualTemporalBlock_{rtb_idx}"], x, c_emb, block_b); rtb_idx += 1
        skips.append(x)
        if not is_last:
            d = p[f"Downsample1d_{down_idx}"]["Conv_0"]; down_idx += 1
            x = jax.lax.conv_general_dilated(
                x, d["kernel"], window_strides=(2,), padding="SAME",
                dimension_numbers=("NHC", "HIO", "NHC"),
            ) + d["bias"]

    x = _apply_rtb(p[f"ResidualTemporalBlock_{rtb_idx}"], x, c_emb, block_b); rtb_idx += 1
    x = _apply_rtb(p[f"ResidualTemporalBlock_{rtb_idx}"], x, c_emb, block_b); rtb_idx += 1

    for _ in range(n_levels - 1):
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = _apply_rtb(p[f"ResidualTemporalBlock_{rtb_idx}"], x, c_emb, block_b); rtb_idx += 1
        x = _apply_rtb(p[f"ResidualTemporalBlock_{rtb_idx}"], x, c_emb, block_b); rtb_idx += 1
        u = p[f"Upsample1d_{up_idx}"]["ConvTranspose_0"]; up_idx += 1
        x = jax.lax.conv_transpose(
            x, u["kernel"], strides=(2,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + u["bias"]

    # final Conv1dBlock + 1x1 conv (XLA)
    fb = p["Conv1dBlock_0"]
    x = jax.lax.conv_general_dilated(
        x, fb["Conv_0"]["kernel"], window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + fb["Conv_0"]["bias"]
    C = x.shape[-1]
    ng = group_norm_n_groups(C)
    x = _group_norm(x, ng, fb["GroupNorm_0"]["scale"], fb["GroupNorm_0"]["bias"])
    x = mish(x)
    fc = p["Conv_0"]
    x = jnp.dot(x, fc["kernel"][0]) + fc["bias"]
    return x
