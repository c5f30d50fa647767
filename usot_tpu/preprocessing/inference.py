"""Flow inference driver: adaptive frame-interval flow estimation + box
mining for whole videos (ref: preprocessing/flow_module/inference.py).

The PWCLite forward is one jitted XLA program at a fixed test shape
(384x640 by default); the adaptive T_f loop re-invokes it with different
frame triples (interval in [1, 7], shrinking when max|flow| > 16 and
growing when < 8, one direction switch per frame).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from usot_tpu.preprocessing.flow2box import (calc_corner_bbox_freq,
                                             calc_nearby_bbox_freq,
                                             flow_to_bbox, smooth_bbox_dp)
from usot_tpu.preprocessing.pwclite import PWCLite, resize_flow


def zoom_to(img: np.ndarray, h: int, w: int) -> np.ndarray:
    import cv2

    if img.shape[0] == h and img.shape[1] == w:
        return img
    return cv2.resize(img, (w, h))


class FlowHelper:
    """Holds PWCLite variables + the jitted 3-frame forward."""

    def __init__(self, variables=None, test_shape=(384, 640), seed=0):
        self.test_shape = tuple(test_shape)
        self.model = PWCLite(n_frames=3, reduce_dense=True, upsample=True)
        if variables is None:
            h, w = self.test_shape
            variables = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 9)))
        self.variables = variables

        model = self.model

        @jax.jit
        def forward(variables, triple):
            out = model.apply(variables, triple)
            return out["flows_fw"][0]

        self._forward = forward

    def preprocess(self, img: np.ndarray) -> np.ndarray:
        h, w = self.test_shape
        return zoom_to(img, h, w).astype(np.float32) / 255.0

    def run_sequence(self, imgs: List[np.ndarray], size: Tuple[int, int],
                     gap: int = 3, init_adjacent: int = 4):
        """imgs: RGB float arrays; size: (H, W) original resolution for the
        output flow maps. Returns list of (H, W, 2) flows per sampled frame."""
        pre = [self.preprocess(im) for im in imgs]
        flows = []
        adjacent = init_adjacent
        H, W = size
        for i in range(gap, len(pre) - gap, gap):
            direction = 0
            while True:
                lo = max(0, i - adjacent)
                hi = min(i + adjacent, len(pre) - 1)
                triple = np.concatenate([pre[lo], pre[i], pre[hi]], axis=-1)
                flow = self._forward(self.variables,
                                     jnp.asarray(triple)[None])
                flow = resize_flow(flow, H, W)
                flow = np.asarray(flow[0])
                abs_max = max(abs(float(flow.max())), abs(float(flow.min())))
                if abs_max > 16 and adjacent >= 2 and direction <= 0:
                    adjacent -= 1
                    direction = -1
                elif abs_max < 8 and adjacent <= 6 and direction >= 0:
                    adjacent += 1
                    direction = 1
                else:
                    break
            flows.append(flow)
        return flows


def load_arflow_checkpoint(path: str, helper: FlowHelper):
    """Convert the reference's pwclite_ar_mv.tar torch weights to our tree."""
    from usot_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(path)
    params = jax.tree.map(np.asarray, helper.variables["params"])

    def conv_t(w):
        return np.transpose(w, (2, 3, 1, 0))

    def put(scope, conv_key):
        node = params
        for s in scope[:-1]:
            node = node[s]
        node[scope[-1]]["conv"]["kernel"] = conv_t(sd[conv_key + ".weight"])
        node[scope[-1]]["conv"]["bias"] = sd[conv_key + ".bias"]

    # feature pyramid: convs.{l}.{0,1}.0
    for lvl in range(6):
        put(["feature_pyramid_extractor", f"level{lvl}_a"],
            f"feature_pyramid_extractor.convs.{lvl}.0.0")
        put(["feature_pyramid_extractor", f"level{lvl}_b"],
            f"feature_pyramid_extractor.convs.{lvl}.1.0")
    # reduce estimator
    for name in ["conv1", "conv2", "conv3", "conv4", "conv5"]:
        put(["flow_estimators", name], f"flow_estimators.{name}.0")
    if "flow_estimators.predict_flow.0.weight" in sd:
        put(["flow_estimators", "predict_flow"],
            "flow_estimators.predict_flow.0")
    else:
        put(["flow_estimators", "conv_last"], "flow_estimators.conv_last.0")
    # context network convs.{i}.0
    for i in range(7):
        key = f"context_networks.convs.{i}.0"
        put(["context_networks", f"c{i}" if i < 6 else "c6"], key)
    # 1x1 reducers
    for i in range(5):
        put([f"conv1x1_{i}"], f"conv_1x1.{i}.0")

    return {"params": params}


def inference_sequence(helper: FlowHelper, image_list, gap=3,
                       init_adjacent=4):
    """Full pseudo-label mining for one video (ref: inference.py:117-170)."""
    import cv2

    imgs = []
    for path in image_list:
        im = cv2.imread(path)
        imgs.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB).astype(np.float32))
    h, w = imgs[0].shape[:2]

    flows = helper.run_sequence(imgs, size=(h, w), gap=gap,
                                init_adjacent=init_adjacent)
    cut_ratio = 1 / 32
    bboxs = [flow_to_bbox(flow, cut_ratio=cut_ratio) for flow in flows]
    bboxs, picked_frame_index, bbox_found_freq, bbox_picked_freq, aver_vary = \
        smooth_bbox_dp(bboxs, length=len(imgs), gap=gap)
    freq_dict = calc_nearby_bbox_freq(picked_frame_index,
                                      video_length=len(bboxs),
                                      search_range=[3, 10], gap=gap)
    corner_bbox_freq = calc_corner_bbox_freq(bboxs, img_shape=(h, w),
                                             cut_ratio=cut_ratio)
    return bboxs, picked_frame_index, (freq_dict, bbox_found_freq,
                                       bbox_picked_freq, aver_vary,
                                       corner_bbox_freq)
