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
    # Row-blocked accumulation (see _groupdw_multi_kernel): the per-row
    # accumulator stays in vector registers across all hk*wk taps.
    k = k_ref[0].astype(jnp.float32)   # (Hk, Wk_pad, C_pad)
    c = o_ref.shape[-1]

    def body(i, carry):
        acc = jnp.zeros((wo, c), jnp.float32)
        for u in range(hk):
            row = x_ref[0, i + u].astype(jnp.float32)  # (Wx_pad, C_pad)
            for v in range(wk):
                acc += row[v:v + wo] * k[u, v][None, :]
        o_ref[0, i] = acc.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, ho, body, 0)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _xcorr_multi_kernel(hk: int, wk: int, ho: int, wo: int,
                        x_ref, k_ref, o_ref):
    # Row-blocked accumulation (see _groupdw_multi_kernel); the x block
    # is shared across the M grid axis.
    k = k_ref[0, 0].astype(jnp.float32)  # (Hk, Wk_pad, C_pad)
    c = o_ref.shape[-1]

    def body(i, carry):
        acc = jnp.zeros((wo, c), jnp.float32)
        for u in range(hk):
            row = x_ref[0, i + u].astype(jnp.float32)
            for v in range(wk):
                acc += row[v:v + wo] * k[u, v][None, :]
        o_ref[0, 0, i] = acc.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, ho, body, 0)


def xcorr_depthwise_multi_pallas(x, kernel, interpret: bool = False):
    """Multi-kernel depthwise xcorr (one search map vs M kernels).

    x: (B, Hx, Wx, C); kernel: (B, M, Hk, Wk, C) -> (B, M, Ho, Wo, C).

    Grid (B, M) with the search block's index map ignoring m: consecutive
    grid steps over m reuse the VMEM-resident x block (Pallas skips the
    DMA when the block index repeats), so each batch's search map is
    fetched from HBM once while M outputs stream out — the repeat tensor
    the XLA route materializes (B*M, Hx, Wx, C) never exists."""
    b, hx, wx, c = x.shape
    _, m, hk, wk, _ = kernel.shape
    ho, wo = hx - hk + 1, wx - wk + 1

    c_pad = _round_up(c, 128)
    wo_pad = _round_up(wo, 8)
    wx_pad = _round_up(max(wx, wo_pad + wk - 1), 8)
    wk_pad = _round_up(wk, 8)

    x_p = jnp.pad(x, ((0, 0), (0, 0), (0, wx_pad - wx), (0, c_pad - c)))
    k_p = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, wk_pad - wk),
                           (0, c_pad - c)))

    kern = functools.partial(_xcorr_multi_kernel, hk, wk, ho, wo_pad)
    out = pl.pallas_call(
        kern,
        grid=(b, m),
        in_specs=[
            pl.BlockSpec((1, hx, wx_pad, c_pad),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hk, wk_pad, c_pad),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ho, wo_pad, c_pad),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, ho, wo_pad, c_pad), x.dtype),
        interpret=interpret,
    )(x_p, k_p)
    return out[:, :, :, :wo, :c]


def _groupdw_multi_kernel(geom, x0_ref, x1_ref, x2_ref, k0_ref, k1_ref,
                          k2_ref, o_ref):
    """Row-blocked accumulation: one output ROW's accumulator (Wo_pad, C)
    is small enough to live in vector registers across all 55 taps, so
    each tap is a single FMA — the whole-block `acc += ...` formulation
    streamed the (Ho, Wo, C) f32 accumulator through VMEM on every tap
    (load+store per FMA) and measured 1.85x slower (5.4 -> 2.9 ms at
    B=32, M=7; PERF_NOTES.md)."""
    ks = [r[0, 0].astype(jnp.float32) for r in (k0_ref, k1_ref, k2_ref)]
    xs = (x0_ref, x1_ref, x2_ref)
    ho, wo = o_ref.shape[2], o_ref.shape[3]
    c = o_ref.shape[-1]

    def body(i, carry):
        acc = jnp.zeros((wo, c), jnp.float32)
        for x_ref, k, (hk, wk) in zip(xs, ks, geom):
            for u in range(hk):
                row = x_ref[0, i + u].astype(jnp.float32)  # (Wx_pad, C)
                for v in range(wk):
                    acc += row[v:v + wo] * k[u, v][None, :]
        o_ref[0, 0, i] = acc.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, ho, body, 0)


def xcorr_groupdw_pallas(xs, ks, interpret: bool = False):
    """Fused GroupDW: sum of three multi-kernel depthwise correlations.

    xs: 3 search encodings (B, Hx_s, Wx_s, C) (the three dilation scales
    have different spatial sizes); ks: 3 kernel stacks (B, M, Hk_s,
    Wk_s, C), softmax weights already folded in (w*xcorr(x,k) ==
    xcorr(x, w*k)). Returns (B, M, Ho, Wo, C) with Ho/Wo common to all
    scales (ref: GroupDW fusion, lib/models/connect.py:147-176).

    One grid cell per (b, m): the three search blocks' index maps ignore
    m, so they stay VMEM-resident across the M inner steps; each cell
    writes one fused output block — the (B*M, Hx, Wx, C) repeat and the
    three separate correlation maps of the XLA route never exist."""
    b, _, _, c = xs[0].shape
    m = ks[0].shape[1]
    geom = tuple((k.shape[2], k.shape[3]) for k in ks)
    ho = xs[0].shape[1] - geom[0][0] + 1
    wo = xs[0].shape[2] - geom[0][1] + 1
    for x_s, (hk, wk) in zip(xs, geom):
        assert x_s.shape[1] - hk + 1 == ho and x_s.shape[2] - wk + 1 == wo

    c_pad = _round_up(c, 128)
    wo_pad = _round_up(wo, 8)

    x_specs, k_specs, x_ops, k_ops = [], [], [], []
    for x_s, k_s, (hk, wk) in zip(xs, ks, geom):
        hx, wx = x_s.shape[1], x_s.shape[2]
        wx_pad = _round_up(max(wx, wo_pad + wk - 1), 8)
        wk_pad = _round_up(wk, 8)
        x_ops.append(jnp.pad(x_s, ((0, 0), (0, 0), (0, wx_pad - wx),
                                   (0, c_pad - c))))
        k_ops.append(jnp.pad(k_s, ((0, 0), (0, 0), (0, 0),
                                   (0, wk_pad - wk), (0, c_pad - c))))
        x_specs.append(pl.BlockSpec((1, hx, wx_pad, c_pad),
                                    lambda i, j: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM))
        k_specs.append(pl.BlockSpec((1, 1, hk, wk_pad, c_pad),
                                    lambda i, j: (i, j, 0, 0, 0),
                                    memory_space=pltpu.VMEM))

    kern = functools.partial(_groupdw_multi_kernel, geom)
    out = pl.pallas_call(
        kern,
        grid=(b, m),
        in_specs=x_specs + k_specs,
        out_specs=pl.BlockSpec((1, 1, ho, wo_pad, c_pad),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, ho, wo_pad, c_pad),
                                       xs[0].dtype),
        interpret=interpret,
    )(*x_ops, *k_ops)
    return out[:, :, :, :wo, :c]


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
