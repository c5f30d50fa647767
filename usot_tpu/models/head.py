"""Correlation heads: multi-scale encoders, depthwise xcorr fusion,
confidence-value memory fusion, and the cls/reg towers.

Functional NHWC re-design of the reference head
(ref: lib/models/connect.py:12-281). The three "scales" are three
differently-dilated 3x3 VALID convs applied to the SAME input; kernel (z)
and search (x) sides have independent weights. Depthwise correlation of the
three pairs is fused with a softmax-weighted learnable 3-vector.
"""
from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

import numpy as np

from usot_tpu.ops.xcorr import xcorr_depthwise, xcorr_groupdw


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    padding: int = 0
    dilation: tuple = (1, 1)
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bn_train: bool):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=self.dilation,
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class MatrixBranch(nn.Module):
    """One side (kernel or search) of the multi-scale correlation encoder:
    three dilated 3x3 VALID convs on the same input."""
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bn_train: bool) -> List[jnp.ndarray]:
        b11 = ConvBNRelu(self.out_channels, 3, dilation=(1, 1),
                         dtype=self.dtype, name="m11")(x, bn_train)
        b12 = ConvBNRelu(self.out_channels, 3, dilation=(2, 1),
                         dtype=self.dtype, name="m12")(x, bn_train)
        b21 = ConvBNRelu(self.out_channels, 3, dilation=(1, 2),
                         dtype=self.dtype, name="m21")(x, bn_train)
        return [b11, b12, b21]


class GroupDW(nn.Module):
    """Softmax-weighted fusion of the three depthwise correlations."""
    dtype: Any = jnp.float32
    fused: bool = False

    def setup(self):
        self.weight = self.param("weight", nn.initializers.ones, (3,),
                                 jnp.float32)

    def __call__(self, zs: List[jnp.ndarray], xs: List[jnp.ndarray]):
        w = jax.nn.softmax(self.weight, axis=0)
        if self.fused:
            # one Pallas kernel: weights folded into the kernels
            # (w * xcorr(x, k) == xcorr(x, w * k))
            ks = [(z[:, None] * w[i].astype(z.dtype)) for i, z
                  in enumerate(zs)]
            return xcorr_groupdw(xs, ks)[:, 0]
        res = 0.0
        for i in range(3):
            res = res + w[i].astype(self.dtype) * xcorr_depthwise(xs[i], zs[i])
        return res

    def multi(self, zs: List[jnp.ndarray], xs: List[jnp.ndarray],
              mem_size: int):
        """Memory-queue variant: UNREPEATED search encodings vs M kernels.

        zs: 3 x (B*M, Hk_s, Wk_s, C) encoded queue kernels;
        xs: 3 x (B, Hx_s, Wx_s, C). Returns (B, M, Ho, Wo, C) — the
        (B*M)-lane repeat of the naive route never materializes
        (measured 12.1 -> 5.45 ms at B=32, M=7; PERF_NOTES.md)."""
        w = jax.nn.softmax(self.weight, axis=0)
        ks = []
        for i, z in enumerate(zs):
            k = z.reshape((xs[i].shape[0], mem_size) + z.shape[1:])
            ks.append(k * w[i].astype(k.dtype))
        return xcorr_groupdw(xs, ks)


class ConfFusion(nn.Module):
    """Confidence-value fusion over the memory dimension
    (ref: lib/models/connect.py:104-144). Input (B, M, H, W, C)."""
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bn_train: bool):
        b, m, h, w, c = x.shape
        flat = x.reshape(b * m, h, w, c)
        conf = ConvBNRelu(self.out_channels, 3, padding=1, use_bias=True,
                          dtype=self.dtype, name="conf_gen")(flat, bn_train)
        conf = jnp.clip(conf, -6.0, 4.0)
        conf = jnp.exp(conf).reshape(b, m, h, w, self.out_channels)
        conf = conf / jnp.sum(conf, axis=1, keepdims=True)
        value = ConvBNRelu(self.out_channels, 3, padding=1, use_bias=True,
                           dtype=self.dtype, name="value_gen")(flat, bn_train)
        value = value.reshape(b, m, h, w, self.out_channels)
        return jnp.sum(conf * value, axis=1)


class Tower(nn.Module):
    """Stack of conv3x3(pad 1, bias)+BN+ReLU blocks."""
    out_channels: int = 256
    num: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bn_train: bool):
        for i in range(self.num):
            x = ConvBNRelu(self.out_channels, 3, padding=1, use_bias=True,
                           dtype=self.dtype, name=f"block{i}")(x, bn_train)
        return x


class BoxTowerReg(nn.Module):
    """Offline cls/reg head + online memory cls head.

    Methods (call with nn.apply(..., method=...)):
      encode_search  -> (cls_x list, reg_x list) caches
      offline        -> (bbox, cls, cls_x, reg_x)
      memory_cls     -> cls_mem from cached cls_x + memory kernels
    """
    out_channels: int = 256
    tower_num: int = 4
    dtype: Any = jnp.float32
    fused_xcorr: bool = False

    def setup(self):
        self.cls_encode_k = MatrixBranch(self.out_channels, self.dtype)
        self.cls_encode_s = MatrixBranch(self.out_channels, self.dtype)
        self.reg_encode_k = MatrixBranch(self.out_channels, self.dtype)
        self.reg_encode_s = MatrixBranch(self.out_channels, self.dtype)
        self.cls_dw = GroupDW(self.dtype, fused=self.fused_xcorr)
        self.reg_dw = GroupDW(self.dtype, fused=self.fused_xcorr)
        self.conf_fusion = ConfFusion(self.out_channels, self.dtype)
        self.bbox_tower = Tower(self.out_channels, self.tower_num, self.dtype)
        self.cls_tower = Tower(self.out_channels, self.tower_num, self.dtype)
        self.cls_memory_tower = Tower(self.out_channels, self.tower_num, self.dtype)
        self.bbox_pred = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                                 dtype=self.dtype, name="bbox_pred")
        self.cls_pred = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, name="cls_pred")
        self.cls_memory_pred = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                                       dtype=self.dtype, name="cls_memory_pred")
        self.adjust = self.param(
            "adjust", lambda k, s: 0.1 * jnp.ones(s, jnp.float32), (1,))
        self.bias = self.param(
            "bias", nn.initializers.ones, (1, 1, 1, 4), jnp.float32)

    def _adjust_bias(self):
        return self.adjust.astype(self.dtype), self.bias.astype(self.dtype)

    def encode_search(self, search, bn_train: bool = False):
        """Cache the search-side encodings (cls_x, reg_x)."""
        return (self.cls_encode_s(search, bn_train),
                self.reg_encode_s(search, bn_train))

    def encode_kernel(self, kernel, bn_train: bool = False):
        """Kernel-side encodings of a pooled 7x7 feature: (cls_z, reg_z),
        each a list of 3 multi-scale tensors. Pure functions of the
        kernel — inference engines compute them ONCE per template /
        memory frame and cache them (the reference re-encodes the whole
        queue every frame; ref caching idea: lib/models/connect.py:243-255)."""
        return (self.cls_encode_k(kernel, bn_train),
                self.reg_encode_k(kernel, bn_train))

    def offline(self, search, kernel, bn_train: bool = False,
                cls_x=None, reg_x=None):
        """Offline Siamese branch: bbox (B,Ho,Wo,4), cls (B,Ho,Wo,1)."""
        cls_z = self.cls_encode_k(kernel, bn_train)
        reg_z = self.reg_encode_k(kernel, bn_train)
        return self.offline_preenc(search, cls_z, reg_z, bn_train,
                                   cls_x=cls_x, reg_x=reg_x)

    def offline_preenc(self, search, cls_z, reg_z, bn_train: bool = False,
                       cls_x=None, reg_x=None):
        """Offline branch with PRE-ENCODED kernel sides (see encode_kernel)."""
        if cls_x is None:
            cls_x = self.cls_encode_s(search, bn_train)
        if reg_x is None:
            reg_x = self.reg_encode_s(search, bn_train)

        cls_dw = self.cls_dw(cls_z, cls_x)
        reg_dw = self.reg_dw(reg_z, reg_x)

        x_reg = self.bbox_tower(reg_dw, bn_train)
        adjust, bias = self._adjust_bias()
        x_bbox = jnp.exp(adjust * self.bbox_pred(x_reg) + bias)

        c = self.cls_tower(cls_dw, bn_train)
        cls = 0.1 * self.cls_pred(c)
        return x_bbox, cls, cls_x, reg_x

    def memory_cls(self, cls_x, memory_kernel, mem_size: int,
                   bn_train: bool = False):
        """Online memory branch.

        cls_x: list of 3 cached search encodings, each (B, h_i, w_i, C).
        memory_kernel: (B*mem_size, 7, 7, C_in) pooled memory features.
        Returns cls_mem (B, Ho, Wo, 1).
        """
        cls_mem_zs = self.cls_encode_k(memory_kernel, bn_train)
        return self.memory_cls_preenc(cls_x, cls_mem_zs, mem_size, bn_train)

    def memory_cls_preenc(self, cls_x, cls_mem_zs, mem_size: int,
                          bn_train: bool = False):
        """Online memory branch with PRE-ENCODED queue kernels:
        cls_mem_zs is a list of 3 (B*mem_size, h_i, w_i, C) tensors
        (see encode_kernel — cached per memory frame by the engine)."""
        batch = cls_x[0].shape[0]
        if self.fused_xcorr:
            # fused multi-kernel path: never repeats cls_x to B*M lanes
            cls_mem_dw = self.cls_dw.multi(cls_mem_zs, cls_x, mem_size)
        else:
            store_repeat = []
            for x in cls_x:
                b, h, w, c = x.shape
                rep = jnp.repeat(x[:, None], mem_size, axis=1).reshape(
                    b * mem_size, h, w, c)
                store_repeat.append(rep)
            dw = self.cls_dw(cls_mem_zs, store_repeat)  # (B*M, Ho, Wo, C)
            bm, ho, wo, c = dw.shape
            cls_mem_dw = dw.reshape(batch, mem_size, ho, wo, c)

        fused = self.conf_fusion(cls_mem_dw, bn_train)  # (B, Ho, Wo, C)
        c_mem = self.cls_memory_tower(fused, bn_train)
        return 0.1 * self.cls_memory_pred(c_mem)

    # -- folded-weight inference fast path (see fold_inference_head) --

    def offline_fused_enc(self, xf, zf_enc, fused):
        """Offline branch using FOLDED search-encoder weights.

        The six search-side ConvBNRelu blocks (cls + reg x 3 dilations)
        become three 512-wide convs with BatchNorm folded into the
        kernels (inference-only; one conv op per dilation instead of
        two, wider MXU tiles, no separate BN affine). Identical math to
        offline_preenc up to f32 rounding of the fold.
        """
        cls_x, reg_x = _apply_fused_encoders(xf, fused)
        cls_z, reg_z = zf_enc
        bbox, cls, _, _ = self.offline_preenc(
            xf, list(cls_z), list(reg_z), cls_x=cls_x, reg_x=reg_x)
        return bbox, cls, cls_x

    def memory_cls_fused(self, cls_x, cls_mem_zs, mem_size: int, fused):
        """Memory branch with ConfFusion's two convs FOLDED into one
        512-wide conv (conf||value; BN folded). Post-conv arithmetic
        (relu, clamp [-6,4], exp, mem-dim normalize, weighted sum) is
        unchanged from ConfFusion."""
        if self.fused_xcorr:
            cls_mem_dw = self.cls_dw.multi(cls_mem_zs, cls_x, mem_size)
        else:
            store_repeat = []
            for x in cls_x:
                b, h, w, c = x.shape
                rep = jnp.repeat(x[:, None], mem_size, axis=1).reshape(
                    b * mem_size, h, w, c)
                store_repeat.append(rep)
            dw = self.cls_dw(cls_mem_zs, store_repeat)
            bm, ho, wo, c = dw.shape
            cls_mem_dw = dw.reshape(
                cls_x[0].shape[0], mem_size, ho, wo, c)

        b, m, h, w, c = cls_mem_dw.shape
        flat = cls_mem_dw.reshape(b * m, h, w, c)
        w_cv, b_cv = fused["conf_value"]
        y = _conv_nhwc(flat, w_cv.astype(flat.dtype), padding=1)
        y = nn.relu(y + b_cv.astype(flat.dtype))
        conf = jnp.clip(y[..., :c], -6.0, 4.0)
        conf = jnp.exp(conf).reshape(b, m, h, w, c)
        conf = conf / jnp.sum(conf, axis=1, keepdims=True)
        value = y[..., c:].reshape(b, m, h, w, c)
        fused_map = jnp.sum(conf * value, axis=1)

        c_mem = self.cls_memory_tower(fused_map, False)
        return 0.1 * self.cls_memory_pred(c_mem)


def _conv_nhwc(x, w, padding=0, dilation=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(padding, padding)] * 2, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


_ENC_DILATIONS = (("m11", (1, 1)), ("m12", (2, 1)), ("m21", (1, 2)))


def _apply_fused_encoders(xf, fused):
    """xf -> (cls_x, reg_x) lists via the three folded 512-wide convs."""
    cls_x, reg_x = [], []
    for (w, b), (_, dil) in zip(fused["encoders"], _ENC_DILATIONS):
        y = _conv_nhwc(xf, w.astype(xf.dtype), padding=0, dilation=dil)
        y = nn.relu(y + b.astype(xf.dtype))
        half = y.shape[-1] // 2
        cls_x.append(y[..., :half])
        reg_x.append(y[..., half:])
    return cls_x, reg_x


def _fold_conv_bn(params, stats, eps=1e-5):
    """Fold ConvBNRelu's BatchNorm (inference affine) into the conv:
    W' = W * gamma/sqrt(var+eps), b' = beta - mean*gamma/sqrt(var+eps)
    (+ conv bias scaled, when present). Exact in f32."""
    w = np.asarray(params["conv"]["kernel"], np.float32)
    s = np.asarray(params["bn"]["scale"], np.float32) / np.sqrt(
        np.asarray(stats["bn"]["var"], np.float32) + eps)
    b = np.asarray(params["bn"]["bias"], np.float32) \
        - np.asarray(stats["bn"]["mean"], np.float32) * s
    if "bias" in params["conv"]:
        b = b + np.asarray(params["conv"]["bias"], np.float32) * s
    return w * s, b


def fold_inference_head(variables):
    """Precompute the folded/fused inference-head weights (host numpy).

    Returns {"encoders": [(W(3,3,C,2C), b(2C)) x 3 dilations],
             "conf_value": (W(3,3,C,2C), b(2C))} where each W is the
    out-channel concatenation [cls||reg] / [conf||value] of the two
    original ConvBNRelu blocks with their BatchNorm affines folded in.
    Engines compute this ONCE per checkpoint; the per-frame step then
    runs 3 encoder convs instead of 6 and 1 ConfFusion conv instead of
    2, each at double width (better MXU aspect), with zero BN ops."""
    params = variables["params"]["connect"]
    stats = variables["batch_stats"]["connect"]
    encoders = []
    for name, _ in _ENC_DILATIONS:
        wc, bc = _fold_conv_bn(params["cls_encode_s"][name],
                               stats["cls_encode_s"][name])
        wr, br = _fold_conv_bn(params["reg_encode_s"][name],
                               stats["reg_encode_s"][name])
        encoders.append((np.concatenate([wc, wr], axis=-1),
                         np.concatenate([bc, br])))
    wconf, bconf = _fold_conv_bn(params["conf_fusion"]["conf_gen"],
                                 stats["conf_fusion"]["conf_gen"])
    wval, bval = _fold_conv_bn(params["conf_fusion"]["value_gen"],
                               stats["conf_fusion"]["value_gen"])
    return {"encoders": encoders,
            "conf_value": (np.concatenate([wconf, wval], axis=-1),
                           np.concatenate([bconf, bval]))}

