"""Jitted model entry points used by the trackers.

Wraps a USOTNet + variables into a set of fixed-shape jitted callables
(one per search size), so the host tracker code never retraces.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from usot_tpu.models.usot import USOTNet


class ModelRunner:
    """Host-facing handle: jitted template/track/memory-extract functions."""

    def __init__(self, model: USOTNet, variables, mem_queue_size: int = 7):
        self.model = model
        # Commit once to device: host-numpy variable trees would otherwise
        # re-upload the full parameter set on every jitted call.
        self.variables = jax.device_put(dict(variables))
        self.mem_queue_size = mem_queue_size

        # Image inputs travel channel-flat (B, H, W*3): an (.., 3) minor
        # dim pads 3 -> 128 lanes in the TPU tiled layout — a 42x
        # transfer blowup through the host link (see core/crop.py).
        def _unflat(x_flat):
            b, h = x_flat.shape[0], x_flat.shape[1]
            return x_flat.reshape(b, h, x_flat.shape[2] // 3, 3)

        @jax.jit
        def _template(variables, z_flat, tb):
            return model.apply(variables, _unflat(z_flat), tb,
                               method=USOTNet.template_features)

        @jax.jit
        def _search_features(variables, x_flat):
            return model.apply(variables, _unflat(x_flat),
                               method=USOTNet.search_features)

        @jax.jit
        def _track_offline(variables, xf, zf):
            cls, bbox = model.apply(variables, xf, zf,
                                    method=USOTNet.track_offline)
            return jax.nn.sigmoid(cls[0, :, :, 0]), \
                jnp.transpose(bbox[0], (2, 0, 1))

        @jax.jit
        def _track_memory(variables, xf, zf, mem):
            cls, bbox, cls_mem = model.apply(
                variables, xf, zf, mem, method=USOTNet.track_memory)
            return (jax.nn.sigmoid(cls[0, :, :, 0]),
                    jnp.transpose(bbox[0], (2, 0, 1)),
                    jax.nn.sigmoid(cls_mem[0, :, :, 0]))

        @jax.jit
        def _pool_memory(variables, xf, sb):
            return model.apply(variables, xf, sb,
                               method=USOTNet.pool_memory_feature)

        @jax.jit
        def _encode_template(variables, zf):
            return model.apply(variables, zf,
                               method=USOTNet.encode_template)

        @jax.jit
        def _encode_memory_kernels(variables, feat):
            return model.apply(variables, feat,
                               method=USOTNet.encode_memory_kernels)

        self._encode_template_fn = _encode_template
        self._encode_memory_kernels_fn = _encode_memory_kernels
        self._template = _template
        self._search_features = _search_features
        self._track_offline = _track_offline
        self._track_memory = _track_memory
        self._pool_memory = _pool_memory

    # -- host API (numpy in / numpy-or-device out) --

    @staticmethod
    def _flat(x_bhwc: np.ndarray):
        x = np.ascontiguousarray(x_bhwc, dtype=np.float32)
        return jnp.asarray(x.reshape(x.shape[0], x.shape[1], -1))

    def template(self, z_hwc: np.ndarray, template_bbox):
        tb = jnp.asarray(template_bbox, jnp.float32).reshape(1, 4)
        return self._template(self.variables,
                              self._flat(np.asarray(z_hwc)[None]), tb)

    def search_features(self, x_hwc: np.ndarray):
        return self._search_features(self.variables,
                                     self._flat(np.asarray(x_hwc)[None]))

    def track_offline(self, xf, zf):
        cls, bbox = self._track_offline(self.variables, xf, zf)
        return np.asarray(cls, np.float64), np.asarray(bbox, np.float64)

    def track_memory(self, xf, zf, mem):
        cls, bbox, cls_mem = self._track_memory(self.variables, xf, zf, mem)
        return (np.asarray(cls, np.float64), np.asarray(bbox, np.float64),
                np.asarray(cls_mem, np.float64))

    def encode_template(self, zf):
        """Kernel-side encodings of zf: (cls_z 3-tuple, reg_z 3-tuple).
        Scan engines cache these in the carry (see EngineState)."""
        return self._encode_template_fn(self.variables, zf)

    def encode_memory_kernels(self, feat):
        """cls-side encodings of pooled memory features (N, 7, 7, C) ->
        3-tuple of (N, h_i, w_i, C)."""
        return self._encode_memory_kernels_fn(self.variables, feat)

    def extract_memory_feature(self, x_hwc=None, xf=None, search_bbox=None):
        if xf is None:
            xf = self.search_features(x_hwc)
        sb = jnp.asarray(search_bbox, jnp.float32).reshape(1, 4)
        return self._pool_memory(self.variables, xf, sb)

    # -- batched variants (one dispatch per lockstep group, not per video) --

    def template_batch(self, z_bhwc: np.ndarray, template_bbox_b4):
        tb = jnp.asarray(template_bbox_b4, jnp.float32)
        return self._template(self.variables, self._flat(z_bhwc), tb)

    def extract_memory_feature_batch(self, x_bhwc: np.ndarray,
                                     search_bbox_b4):
        sb = jnp.asarray(search_bbox_b4, jnp.float32)
        xf = self._search_features(self.variables, self._flat(x_bhwc))
        return self._pool_memory(self.variables, xf, sb)
