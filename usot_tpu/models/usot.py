"""USOT model: backbone + neck + correlation heads, train & inference paths.

TPU-first re-design of the reference model core (ref: lib/models/models.py).
Everything is a pure function of (variables, inputs); the cycle-memory
training forward — forward-track into N_mem memory frames with both the
offline and online modules, pool the best boxes, backward-track to the
template frame — is expressed with static-shape reshapes/gathers only, so
the whole training step compiles to one XLA program.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from usot_tpu.core.geometry import feature_axis, score_grid
from usot_tpu.models.backbone import ResNetPlus2
from usot_tpu.models.head import BoxTowerReg
from usot_tpu.models.neck import AdjustLayer
from usot_tpu.ops.prroi import prroi_pool_same_batch
from usot_tpu.train.losses import iou_loss, weighted_bce


def pred_offset_to_image_bbox(bbox_pred, search_size: int, score_size: int,
                              stride: int = 8):
    """ltrb offsets (N, S, S, 4) -> image-axis corners (N, S, S, 4)."""
    gx, gy = score_grid(score_size, stride, search_size)
    gx = jnp.asarray(gx)[None]
    gy = jnp.asarray(gy)[None]
    x1 = gx - bbox_pred[..., 0]
    y1 = gy - bbox_pred[..., 1]
    x2 = gx + bbox_pred[..., 2]
    y2 = gy + bbox_pred[..., 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def image_bbox_to_prpool_bbox(image_bbox, search_size: int, sf_size: int,
                              stride: int = 8):
    """Image-axis bbox -> search-feature-axis bbox with the reference's
    2-cell overshoot clamp (ref: lib/models/models.py:150-162)."""
    axis = feature_axis(sf_size, stride, search_size)
    reg_min = float(axis[0])
    reg_max = float(axis[-1])
    sz = 2 * (sf_size // 2)
    gap = (reg_max - reg_min) / sz
    clipped = jnp.clip(image_bbox, reg_min - 2 * gap, reg_max + 2 * gap)
    return (clipped - reg_min) / gap


class USOTNet(nn.Module):
    """Flagship single-object tracker.

    Inference methods: `template_features`, `search_features`,
    `track_offline`, `track_memory`, `pool_memory_feature`.
    Training method: `forward_train`.
    """
    mem_size: int = 4
    search_size: int = 255
    score_size: int = 25
    sf_size: int = 25
    stride: int = 8
    dtype: Any = jnp.float32
    # Fused Pallas GroupDW correlation (inference-only: the kernel has no
    # VJP). TPU engine builders flip this on; training keeps it off.
    fused_xcorr: bool = False
    # Exact space-to-depth stem rewrite (backbone.StemConvBN): same params,
    # same math, TPU-friendlier layout.
    s2d_stem: bool = False
    # Exact space-to-batch rewrite of layer3's dilation-2 convs
    # (backbone._dilated2_conv_s2b): same params, same math.
    s2b_dilated: bool = False
    # Model scale: backbone stage width base (reference: 64) and
    # neck/head channel count (reference: 256). Reduced values give
    # dev/test-scale models — e.g. build_usot(width=16, channels=32) is
    # ~0.5M params, small enough to train once and COMMIT the trained
    # checkpoint as a full-step parity fixture (tests/fixtures/).
    width: int = 64
    channels: int = 256

    def setup(self):
        self.features = ResNetPlus2(dtype=self.dtype, s2d_stem=self.s2d_stem,
                                    s2b_dilated=self.s2b_dilated,
                                    width=self.width)
        self.neck = AdjustLayer(out_channels=self.channels, dtype=self.dtype)
        self.connect = BoxTowerReg(out_channels=self.channels, tower_num=4,
                                   dtype=self.dtype,
                                   fused_xcorr=self.fused_xcorr)

    # ---------------- inference API ----------------

    def template_features(self, z, template_bbox):
        """z: (B, 127, 127, 3); template_bbox: (B, 4) on the 15x15 axis.
        Returns zf (B, 7, 7, 256) PrPooled by the pseudo bbox."""
        zf_raw = self.features(z)
        _, zf = self.neck(zf_raw, crop=True, pr_pool=True, bbox=template_bbox)
        return zf

    def search_features(self, x):
        """x: (B, S, S, 3) -> xf (B, s, s, 256)."""
        return self.neck(self.features(x), crop=False)

    def track_offline(self, xf, zf):
        """Returns (cls (B,S,S,1), bbox (B,S,S,4))."""
        bbox, cls, _, _ = self.connect.offline(xf, zf)
        return cls, bbox

    def track_memory(self, xf, zf, template_mem):
        """Track with offline + online modules.

        template_mem: (N_q, 7, 7, 256) memory queue (batch size must be 1).
        Returns (cls, bbox, cls_mem).
        """
        bbox, cls, cls_x, _ = self.connect.offline(xf, zf)
        n_q = template_mem.shape[0]
        cls_mem = self.connect.memory_cls(cls_x, template_mem, mem_size=n_q)
        return cls, bbox, cls_mem

    # -- pre-encoded-kernel variants (engine fast path) --
    #
    # The kernel-side multi-scale encodings (3 dilated convs) of the
    # template and of every pooled memory frame are pure functions of
    # those features. The scan engines compute them once (template at
    # init; each memory frame when written to the ring) and carry the
    # ENCODED tensors, removing the per-frame re-encode of the template
    # + 7 queue kernels that the reference performs every frame
    # (ref: lib/models/connect.py:229-255).

    def encode_memory_kernels(self, feat):
        """cls-side encodings of pooled memory features.
        feat: (N, 7, 7, C) -> tuple of 3 tensors (N, h_i, w_i, C)."""
        cls_z, _ = self.connect.encode_kernel(feat)
        return tuple(cls_z)

    def encode_template(self, zf):
        """Both kernel-side encodings of the template feature.
        zf: (B, 7, 7, C) -> (cls_z 3-tuple, reg_z 3-tuple)."""
        cls_z, reg_z = self.connect.encode_kernel(zf)
        return tuple(cls_z), tuple(reg_z)

    def track_memory_encoded(self, xf, zf_enc, queue_enc):
        """track_memory with cached kernel encodings (batch size 1).

        zf_enc: (cls_z, reg_z) 3-tuples of (1, h, w, C);
        queue_enc: 3-tuple of (N_q, h_i, w_i, C).
        Returns (cls, bbox, cls_mem)."""
        cls_z, reg_z = zf_enc
        bbox, cls, cls_x, _ = self.connect.offline_preenc(
            xf, list(cls_z), list(reg_z))
        n_q = queue_enc[0].shape[0]
        cls_mem = self.connect.memory_cls_preenc(
            cls_x, list(queue_enc), mem_size=n_q)
        return cls, bbox, cls_mem

    def track_memory_encoded_batched(self, xf, zf_enc, queue_enc):
        """Batched variant: xf (B, s, s, C); zf_enc tensors (B, h, w, C);
        queue_enc 3-tuple of (B, N_q, h_i, w_i, C)."""
        cls_z, reg_z = zf_enc
        bbox, cls, cls_x, _ = self.connect.offline_preenc(
            xf, list(cls_z), list(reg_z))
        b, n_q = queue_enc[0].shape[0], queue_enc[0].shape[1]
        flat = [q.reshape((b * n_q,) + q.shape[2:]) for q in queue_enc]
        cls_mem = self.connect.memory_cls_preenc(cls_x, flat, mem_size=n_q)
        return cls, bbox, cls_mem

    def track_memory_encoded_fused(self, xf, zf_enc, queue_enc, fused):
        """track_memory_encoded with FOLDED inference-head weights.

        `fused` is the output of head.fold_inference_head (engines
        precompute it once per checkpoint and pass it through the jit):
        the 6 search-encoder ConvBNRelu blocks collapse to 3 double-wide
        convs and ConfFusion's 2 convs to 1, with all BatchNorm affines
        folded into the kernels. Batched variant: queue_enc tensors are
        (B, N_q, h_i, w_i, C); also accepts the batch-1 engine layout.
        """
        cls_z, reg_z = zf_enc
        bbox, cls, cls_x = self.connect.offline_fused_enc(
            xf, (list(cls_z), list(reg_z)), fused)
        if queue_enc[0].ndim == 5:
            b, n_q = queue_enc[0].shape[0], queue_enc[0].shape[1]
            flat = [q.reshape((b * n_q,) + q.shape[2:]) for q in queue_enc]
            m = n_q
        else:  # (N_q, h, w, C) batch-1 engine layout
            flat = list(queue_enc)
            m = queue_enc[0].shape[0]
        cls_mem = self.connect.memory_cls_fused(cls_x, flat, m, fused)
        return cls, bbox, cls_mem

    def track_memory_batched(self, xf, zf, template_mem):
        """Batched variant of track_memory: B videos at once.

        xf: (B, s, s, 256); zf: (B, 7, 7, 256);
        template_mem: (B, N_q, 7, 7, 256).
        Returns (cls (B,S,S,1), bbox (B,S,S,4), cls_mem (B,S,S,1)).
        """
        bbox, cls, cls_x, _ = self.connect.offline(xf, zf)
        b, n_q = template_mem.shape[0], template_mem.shape[1]
        mem_flat = template_mem.reshape((b * n_q,) + template_mem.shape[2:])
        cls_mem = self.connect.memory_cls(cls_x, mem_flat, mem_size=n_q)
        return cls, bbox, cls_mem

    def pool_memory_feature(self, xf, search_bbox):
        """PrPool (B,7,7,256) memory features from search features by a
        feature-axis bbox (ref: models.py:200-206)."""
        return prroi_pool_same_batch(xf, search_bbox, pooled=7)

    # ---------------- training ----------------

    def forward_train(self, template, search, label, reg_target, reg_weight,
                      template_bbox, search_memory=None, search_bbox=None,
                      cls_ratio=0.4, stage_bn_train: bool = False):
        """Returns (cls_loss_ori, cls_loss_memory | None, reg_loss).

        template: (B, 127, 127, 3); search: (B, 255, 255, 3)
        label: (B, 25, 25); reg_target: (B, 25, 25, 4); reg_weight: (B, 25, 25)
        template_bbox: (B, 4) on the template feature axis (15x15)
        search_memory: (B, M, 255, 255, 3) or None (naive Siamese phase)
        search_bbox: (B, 4) on the search feature axis (25-axis)
        """
        bn = True  # neck/head BN are always in train mode during training
        zf_raw = self.features(template, stage_bn_train=stage_bn_train)
        xf_raw = self.features(search, stage_bn_train=stage_bn_train)
        _, zf = self.neck(zf_raw, bn_train=bn, crop=True, pr_pool=True,
                          bbox=template_bbox)
        xf = self.neck(xf_raw, bn_train=bn, crop=False)

        bbox_pred, cls_pred, cls_x, _ = self.connect.offline(
            xf, zf, bn_train=bn)

        reg_loss = iou_loss(bbox_pred, reg_target, reg_weight)
        cls_loss_ori = weighted_bce(cls_pred, label)

        if search_memory is None:
            return cls_loss_ori, None, reg_loss

        # ---- cycle memory branch (ref: models.py:232-286) ----
        b, m = search_memory.shape[0], search_memory.shape[1]
        mem_flat = search_memory.reshape((b * m,) + search_memory.shape[2:])
        xf_mem = self.neck(
            self.features(mem_flat, stage_bn_train=stage_bn_train),
            bn_train=bn, crop=False)

        # Online kernel: template-frame search feature pooled by pseudo bbox
        spf = prroi_pool_same_batch(xf, search_bbox, pooled=7)  # (B,7,7,C)
        spf_rep = jnp.repeat(spf[:, None], m, axis=1).reshape(
            (b * m,) + spf.shape[1:])
        zf_rep = jnp.repeat(zf[:, None], m, axis=1).reshape(
            (b * m,) + zf.shape[1:])

        # Forward-track into memory frames with the offline module
        off_bbox, off_cls, fwd_x_store, _ = self.connect.offline(
            xf_mem, zf_rep, bn_train=bn)
        # ... and with the online module (each memory frame sees 1 kernel)
        mem_cls = self.connect.memory_cls(
            fwd_x_store, spf_rep, mem_size=1, bn_train=bn)

        s = off_cls.shape[1]  # score size
        off_cls_flat = off_cls.reshape(b, m, s * s)
        mem_cls_flat = mem_cls.reshape(b, m, s * s)
        forward_res = cls_ratio * off_cls_flat + (1.0 - cls_ratio) * mem_cls_flat

        best_idx = jnp.argmax(forward_res, axis=2)            # (B, M)
        best_score = jnp.max(forward_res, axis=2)             # (B, M)
        best_score = jax.lax.stop_gradient(best_score)

        img_bbox = pred_offset_to_image_bbox(
            off_bbox, self.search_size, s, self.stride)        # (B*M,s,s,4)
        img_bbox = img_bbox.reshape(b, m, s * s, 4)
        best_bbox = jnp.take_along_axis(
            img_bbox, best_idx[..., None, None], axis=2)[:, :, 0]  # (B,M,4)
        pool_bbox = image_bbox_to_prpool_bbox(
            best_bbox.reshape(b * m, 4), self.search_size, self.sf_size,
            self.stride)
        pool_bbox = jax.lax.stop_gradient(pool_bbox)

        pooled_mem = prroi_pool_same_batch(xf_mem, pool_bbox, pooled=7)
        # Backward-track to the template-frame search area
        backward_res = self.connect.memory_cls(
            cls_x, pooled_mem, mem_size=m, bn_train=bn)

        cls_loss_mem = weighted_bce(backward_res, label)
        return cls_loss_ori, cls_loss_mem, reg_loss

    def __call__(self, template, search, label, reg_target, reg_weight,
                 template_bbox):
        """Default apply path (naive Siamese) — used for init."""
        return self.forward_train(template, search, label, reg_target,
                                  reg_weight, template_bbox)


def build_usot(mem_size: int = 4, dtype=jnp.float32, **kwargs) -> USOTNet:
    return USOTNet(mem_size=mem_size, dtype=dtype, **kwargs)


def init_variables(model: USOTNet, rng, batch: int = 1):
    """Initialize variables cheaply on the CPU backend.

    Two tiny inference-method inits cover the complete parameter tree
    (template_features touches backbone+neck; track_memory touches the
    whole correlation head incl. the memory branch), so we never trace the
    full training graph just to draw weights — that costs minutes on a
    single host core or a remote-compile accelerator.
    """
    del batch  # parameter shapes are batch-independent
    try:
        init_dev = jax.devices("cpu")[0]
    except RuntimeError:
        # Tunneled TPU runtimes may expose no CPU backend at all; init on
        # the default device instead (still cheap — tiny shapes).
        init_dev = jax.devices()[0]
    # The fused Pallas correlation can't lower for a CPU init device;
    # the parameter tree is identical either way, so init a plain clone.
    if model.fused_xcorr and init_dev.platform != "tpu":
        model = model.clone(fused_xcorr=False)
    with jax.default_device(init_dev):
        z = jnp.zeros((1, 63, 63, 3), model.dtype)
        tb = jnp.asarray([[1.0, 1.0, 5.0, 5.0]], model.dtype)
        v_backbone = model.init(rng, z, tb,
                                method=USOTNet.template_features)
        c = model.channels
        xf = jnp.zeros((1, 13, 13, c), model.dtype)
        zf = jnp.zeros((1, 7, 7, c), model.dtype)
        mem = jnp.zeros((2, 7, 7, c), model.dtype)
        v_head = model.init(rng, xf, zf, mem, method=USOTNet.track_memory)

        variables = {
            "params": {**v_backbone["params"], **v_head["params"]},
            "batch_stats": {**v_backbone["batch_stats"],
                            **v_head["batch_stats"]},
        }
    # Return uncommitted host arrays so downstream jits place them on
    # whatever backend they run on.
    return jax.tree.map(np.asarray, variables)
