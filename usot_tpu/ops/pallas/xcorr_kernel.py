"""Pallas TPU kernel: depthwise cross-correlation.

One fused kernel per video (grid over batch): the (Hx, Wx, C) search block
and the tiny (Hk, Wk, C) kernel block live in VMEM; the correlation is an
unrolled sum of Hk*Wk shifted elementwise multiply-adds on the VPU.

Why a kernel at all: the grouped-conv formulation's compile time explodes
once feature_group_count = B*C grows (see PERF_NOTES.md), and the XLA
shift-multiply formulation costs ~Hk*Wk separate HLO ops — on a backend
that taxes op count, one Pallas op per correlation is the stable point.
Padded to the (8, 128) f32 tile grid internally; the wrapper slices the
valid region back out.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xcorr_kernel(hk: int, wk: int, ho: int, wo: int, x_ref, k_ref, o_ref):
    x = x_ref[0]            # (Hx, Wx_pad, C_pad)
    k = k_ref[0]            # (Hk, Wk_pad, C_pad)
    acc = jnp.zeros(o_ref.shape[1:], jnp.float32)
    for u in range(hk):
        for v in range(wk):
            acc += x[u:u + ho, v:v + wo, :].astype(jnp.float32) \
                * k[u, v, :][None, None, :].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def xcorr_depthwise_pallas(x, kernel, interpret: bool = False):
    """x: (B, Hx, Wx, C); kernel: (B, Hk, Wk, C) -> (B, Ho, Wo, C) VALID.

    interpret=True runs the kernel in the Pallas interpreter (CPU tests).
    """
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    ho, wo = hx - hk + 1, wx - wk + 1

    # Tile-align the lane (C) and sublane (W) dims for f32 (8, 128) tiles
    c_pad = _round_up(c, 128)
    wo_pad = _round_up(wo, 8)
    # slices of width wo_pad at offsets up to wk-1 must stay in bounds
    wx_pad = _round_up(max(wx, wo_pad + wk - 1), 8)
    wk_pad = _round_up(wk, 8)

    x_p = jnp.pad(x, ((0, 0), (0, 0), (0, wx_pad - wx), (0, c_pad - c)))
    k_p = jnp.pad(kernel, ((0, 0), (0, 0), (0, wk_pad - wk),
                           (0, c_pad - c)))

    kern = functools.partial(_xcorr_kernel, hk, wk, ho, wo_pad)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hx, wx_pad, c_pad),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hk, wk_pad, c_pad),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wo_pad, c_pad),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo_pad, c_pad), x.dtype),
        interpret=interpret,
    )(x_p, k_p)
    return out[:, :, :wo, :c]
