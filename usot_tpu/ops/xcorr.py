"""Depthwise cross-correlation between per-sample kernels and search features.

TPU-native equivalent of the reference's grouped-conv trick
(ref: lib/models/connect.py:147-157). Each batch element correlates its own
C-channel kernel with its own search feature map, per channel:

    out[b, i, j, c] = sum_{u,v} x[b, i+u, j+v, c] * k[b, u, v, c]

Two formulations:

* grouped-conv (batch folded into feature groups) — a single conv op;
  fastest at small batch on the current backend (which taxes op count),
  but its compile time explodes once feature_group_count = B*C reaches
  ~8192.

* shift-and-multiply — a static unrolled sum of hk*wk shifted elementwise
  products (<=25 fused VPU ops for the 5x5/3x5/5x3 encoded kernels);
  compile-stable at any batch.

`xcorr_depthwise` picks per-shape: grouped conv while B*C stays under the
measured compile cliff, shift-multiply beyond (see PERF_NOTES.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


_GROUPED_CONV_MAX_GROUPS = 4096  # measured compile cliff ~8192


def _effective_platform() -> str:
    """Platform the current computation actually lowers for.

    `jax.default_backend()` alone is wrong inside a
    `jax.default_device(cpu)` scope on a TPU host (used by
    init_variables to keep weight init off the tunnel): the global
    backend still reads "tpu" while ops lower for CPU, which crashes a
    non-interpret Pallas call. Honor the default_device override first."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def xcorr_depthwise(x, kernel):
    """x: (B, Hx, Wx, C); kernel: (B, Hk, Wk, C) -> (B, Ho, Wo, C), VALID."""
    b, c = x.shape[0], x.shape[3]
    if b * c <= _GROUPED_CONV_MAX_GROUPS:
        return xcorr_depthwise_conv(x, kernel)
    return xcorr_depthwise_shift(x, kernel)


def xcorr_depthwise_shift(x, kernel):
    """Unrolled shift-and-multiply formulation."""
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    acc = jnp.zeros((b, ho, wo, c), jnp.float32)
    for u in range(hk):
        for v in range(wk):
            acc = acc + x[:, u:u + ho, v:v + wo, :].astype(jnp.float32) \
                * kernel[:, u, v, :].astype(jnp.float32)[:, None, None, :]
    return acc.astype(x.dtype)


def xcorr_depthwise_conv(x, kernel):
    """Grouped-conv formulation (feature_group_count = B*C)."""
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    x_f = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, hx, wx, b * c)
    k_f = jnp.transpose(kernel, (1, 2, 0, 3)).reshape(hk, wk, 1, b * c)
    # No preferred_element_type=f32 here: the conv VJP would build its
    # transposed conv with an f32 cotangent against bf16 operands and
    # fail ("requires arguments to have the same dtypes"). The TPU MXU
    # accumulates in f32 internally either way, and the result is cast
    # to x.dtype below, so this changes nothing numerically.
    out = lax.conv_general_dilated(
        x_f, k_f,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    ho, wo = out.shape[1], out.shape[2]
    out = out.reshape(ho, wo, b, c)
    return jnp.transpose(out, (2, 0, 1, 3)).astype(x.dtype)


def xcorr_groupdw(xs, ks, use_pallas: bool | None = None):
    """Fused GroupDW: sum_s multi-xcorr(xs[s], ks[s]).

    xs: 3 search encodings (B, Hx_s, Wx_s, C); ks: 3 kernel stacks
    (B, M, Hk_s, Wk_s, C) with the softmax scale weights already folded
    in. Returns (B, M, Ho, Wo, C).

    use_pallas=None resolves by backend: the Pallas kernel on TPU
    (measured 5.45 ms vs 12.1 ms for repeat+shift at B=32, M=7 —
    PERF_NOTES.md); elsewhere the XLA repeat+pairwise route (Pallas
    interpret mode is orders of magnitude slower — pass use_pallas=True
    explicitly in parity tests that exercise the kernel on CPU)."""
    if use_pallas is None:
        use_pallas = _effective_platform() == "tpu"
    if use_pallas:
        from usot_tpu.ops.pallas.xcorr_kernel import xcorr_groupdw_pallas
        interpret = _effective_platform() != "tpu"
        return xcorr_groupdw_pallas(xs, ks, interpret=interpret)
    out = None
    b, m = ks[0].shape[0], ks[0].shape[1]
    for x, k in zip(xs, ks):
        rep = jnp.repeat(x[:, None], m, axis=1).reshape((b * m,)
                                                        + x.shape[1:])
        kf = k.reshape((b * m,) + k.shape[2:])
        res = xcorr_depthwise(rep, kf)
        res = res.reshape((b, m) + res.shape[1:])
        out = res if out is None else out + res
    return out


def xcorr_depthwise_multi(x, kernel):
    """Multi-kernel depthwise xcorr: one search map vs M kernels per batch.

    x: (B, Hx, Wx, C); kernel: (B, M, Hk, Wk, C) -> (B, M, Ho, Wo, C).

    The memory head correlates ONE search encoding against the M=7 queue
    kernels; the naive route (jnp.repeat the search map to B*M lanes,
    then pairwise xcorr) materializes and re-reads the repeated tensor —
    measured 12 ms of the 24 ms frame step at B=32. This broadcast
    shift-multiply never materializes the repeat: each of the Hk*Wk
    fused terms reads the (B, Ho, Wo, C) window slice once and a
    per-kernel scalar vector (ref semantics: lib/models/connect.py:
    memory branch repeat at connect.py:228-236 + grouped-conv xcorr)."""
    b, hx, wx, c = x.shape
    _, m, hk, wk, _ = kernel.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    acc = jnp.zeros((b, m, ho, wo, c), jnp.float32)
    for u in range(hk):
        for v in range(wk):
            acc = acc + x[:, None, u:u + ho, v:v + wo, :] \
                .astype(jnp.float32) \
                * kernel[:, :, u, v, None, None, :].astype(jnp.float32)
    return acc.astype(x.dtype)


# Naive reference for tests (independent formulation)
def xcorr_depthwise_ref(x, kernel):
    import numpy as np

    x = np.asarray(x, np.float64)
    kernel = np.asarray(kernel, np.float64)
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    out = np.zeros((b, ho, wo, c))
    for bi in range(b):
        for i in range(ho):
            for j in range(wo):
                patch = x[bi, i:i + hk, j:j + wk, :]
                out[bi, i, j, :] = np.sum(patch * kernel[bi], axis=(0, 1))
    return out
