"""PyTorch checkpoint -> flax variables converter.

The published `USOT.pth` / `USOT_star.pth` checkpoints are the parity
anchors (ref: README.md:88-90, lib/utils/train_utils.py:92-128). This maps
the reference's torch state_dict key layout onto our NHWC flax tree:

  torch OIHW conv weight      -> HWIO kernel (transpose 2,3,1,0)
  BatchNorm weight/bias       -> bn scale/bias (params)
  BatchNorm running_mean/var  -> bn mean/var   (batch_stats)

Also supports backbone-only ImageNet/MoCo-v2 pretrains, including the
reference's zero-padding of canonical 1x1 downsample weights into this
architecture's 3x3 downsamples (ref: train_utils.py:109-124).
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _strip_prefix(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        for pre in ("module.", "model.", "feature_extractor."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return _strip_prefix({k: v.cpu().numpy() for k, v in ckpt.items()})


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


_LAYER_BLOCKS = {"layer1": 3, "layer2": 4, "layer3": 6}


def _set(tree: dict, path: list, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _map_convbn(params, stats, torch_sd, conv_key, bn_key, flax_path):
    """Map torch conv weight + BN 4-tuple onto a ConvBN flax scope."""
    _set(params, flax_path + ["conv", "kernel"], _conv(torch_sd[conv_key]))
    _set(params, flax_path + ["bn", "scale"], torch_sd[bn_key + ".weight"])
    _set(params, flax_path + ["bn", "bias"], torch_sd[bn_key + ".bias"])
    _set(stats, flax_path + ["bn", "mean"], torch_sd[bn_key + ".running_mean"])
    _set(stats, flax_path + ["bn", "var"], torch_sd[bn_key + ".running_var"])


def _map_backbone(params, stats, sd, prefix="features.features."):
    _map_convbn(params, stats, sd, prefix + "conv1.weight", prefix + "bn1",
                ["features", "stem"])
    for layer, blocks in _LAYER_BLOCKS.items():
        for i in range(blocks):
            tb = f"{prefix}{layer}.{i}."
            fp = ["features", f"{layer}_{i}"]
            for j in (1, 2, 3):
                _map_convbn(params, stats, sd, tb + f"conv{j}.weight",
                            tb + f"bn{j}", fp + [f"cb{j}"])
            if tb + "downsample.0.weight" in sd:
                _map_convbn(params, stats, sd, tb + "downsample.0.weight",
                            tb + "downsample.1", fp + ["downsample"])


def _map_matrix(params, stats, sd, torch_base, side, flax_path):
    """torch matrix module (matrix11_k etc.) -> MatrixBranch scope."""
    for t_name, f_name in (("matrix11", "m11"), ("matrix12", "m12"),
                           ("matrix21", "m21")):
        tb = f"{torch_base}.{t_name}_{side}."
        _map_convbn(params, stats, sd, tb + "0.weight", tb + "1",
                    flax_path + [f_name])


def _map_tower(params, stats, sd, torch_base, flax_path, num=4):
    for i in range(num):
        tb = f"{torch_base}.{3 * i}"
        _set(params, flax_path + [f"block{i}", "conv", "kernel"],
             _conv(sd[tb + ".weight"]))
        _set(params, flax_path + [f"block{i}", "conv", "bias"],
             sd[tb + ".bias"])
        bn = f"{torch_base}.{3 * i + 1}"
        _set(params, flax_path + [f"block{i}", "bn", "scale"], sd[bn + ".weight"])
        _set(params, flax_path + [f"block{i}", "bn", "bias"], sd[bn + ".bias"])
        _set(stats, flax_path + [f"block{i}", "bn", "mean"],
             sd[bn + ".running_mean"])
        _set(stats, flax_path + [f"block{i}", "bn", "var"],
             sd[bn + ".running_var"])


def convert_usot_checkpoint(sd: Dict[str, np.ndarray]):
    """Full USOT torch state_dict -> {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    stats: dict = {}

    _map_backbone(params, stats, sd)

    # Neck
    _map_convbn(params, stats, sd, "neck.downsample.0.weight",
                "neck.downsample.1", ["neck"])

    cm = "connect_model"
    for enc, fname in (("cls_encode", "cls_encode"), ("reg_encode", "reg_encode")):
        _map_matrix(params, stats, sd, f"{cm}.{enc}", "k",
                    ["connect", f"{fname}_k"])
        _map_matrix(params, stats, sd, f"{cm}.{enc}", "s",
                    ["connect", f"{fname}_s"])

    _set(params, ["connect", "cls_dw", "weight"], sd[f"{cm}.cls_dw.weight"])
    _set(params, ["connect", "reg_dw", "weight"], sd[f"{cm}.reg_dw.weight"])

    for gen in ("conf_gen", "value_gen"):
        tb = f"{cm}.conf_fusion.{gen}."
        _set(params, ["connect", "conf_fusion", gen, "conv", "kernel"],
             _conv(sd[tb + "0.weight"]))
        _set(params, ["connect", "conf_fusion", gen, "conv", "bias"],
             sd[tb + "0.bias"])
        _set(params, ["connect", "conf_fusion", gen, "bn", "scale"],
             sd[tb + "1.weight"])
        _set(params, ["connect", "conf_fusion", gen, "bn", "bias"],
             sd[tb + "1.bias"])
        _set(stats, ["connect", "conf_fusion", gen, "bn", "mean"],
             sd[tb + "1.running_mean"])
        _set(stats, ["connect", "conf_fusion", gen, "bn", "var"],
             sd[tb + "1.running_var"])

    _map_tower(params, stats, sd, f"{cm}.bbox_tower", ["connect", "bbox_tower"])
    _map_tower(params, stats, sd, f"{cm}.cls_tower", ["connect", "cls_tower"])
    _map_tower(params, stats, sd, f"{cm}.cls_memory_tower",
               ["connect", "cls_memory_tower"])

    for head in ("bbox_pred", "cls_pred", "cls_memory_pred"):
        _set(params, ["connect", head, "kernel"], _conv(sd[f"{cm}.{head}.weight"]))
        _set(params, ["connect", head, "bias"], sd[f"{cm}.{head}.bias"])

    _set(params, ["connect", "adjust"], sd[f"{cm}.adjust"].reshape(1))
    _set(params, ["connect", "bias"],
         sd[f"{cm}.bias"].reshape(1, 4, 1, 1).transpose(0, 2, 3, 1))

    return {"params": params, "batch_stats": stats}


def _get(tree, path: list) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def _iconv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (3, 2, 0, 1))  # HWIO -> OIHW


def _inv_convbn(sd, params, stats, conv_key, bn_key, flax_path):
    sd[conv_key] = _iconv(_get(params, flax_path + ["conv", "kernel"]))
    sd[bn_key + ".weight"] = _get(params, flax_path + ["bn", "scale"])
    sd[bn_key + ".bias"] = _get(params, flax_path + ["bn", "bias"])
    sd[bn_key + ".running_mean"] = _get(stats, flax_path + ["bn", "mean"])
    sd[bn_key + ".running_var"] = _get(stats, flax_path + ["bn", "var"])


def invert_usot_checkpoint(variables) -> Dict[str, np.ndarray]:
    """flax variables -> reference torch state_dict layout: the exact
    inverse of convert_usot_checkpoint (key names from
    lib/models/models.py / connect.py / modules.py). Lets OUR trained
    weights drive the ACTUAL reference tracker loop
    (tests/test_reference_tracker_e2e.py), closing the parity anchor in
    the direction the forward converter can't. Returns numpy arrays;
    `num_batches_tracked` entries are omitted (load with strict=False —
    they don't affect eval-mode BN)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    pre = "features.features."
    _inv_convbn(sd, params, stats, pre + "conv1.weight", pre + "bn1",
                ["features", "stem"])
    for layer, blocks in _LAYER_BLOCKS.items():
        for i in range(blocks):
            tb = f"{pre}{layer}.{i}."
            fp = ["features", f"{layer}_{i}"]
            for j in (1, 2, 3):
                _inv_convbn(sd, params, stats, tb + f"conv{j}.weight",
                            tb + f"bn{j}", fp + [f"cb{j}"])
            if "downsample" in params["features"][f"{layer}_{i}"]:
                _inv_convbn(sd, params, stats,
                            tb + "downsample.0.weight",
                            tb + "downsample.1", fp + ["downsample"])

    _inv_convbn(sd, params, stats, "neck.downsample.0.weight",
                "neck.downsample.1", ["neck"])

    cm = "connect_model"
    for enc in ("cls_encode", "reg_encode"):
        for side in ("k", "s"):
            for t_name, f_name in (("matrix11", "m11"),
                                   ("matrix12", "m12"),
                                   ("matrix21", "m21")):
                tb = f"{cm}.{enc}.{t_name}_{side}."
                _inv_convbn(sd, params, stats, tb + "0.weight", tb + "1",
                            ["connect", f"{enc}_{side}", f_name])

    sd[f"{cm}.cls_dw.weight"] = _get(params, ["connect", "cls_dw",
                                              "weight"])
    sd[f"{cm}.reg_dw.weight"] = _get(params, ["connect", "reg_dw",
                                              "weight"])

    for gen in ("conf_gen", "value_gen"):
        tb = f"{cm}.conf_fusion.{gen}."
        fp = ["connect", "conf_fusion", gen]
        sd[tb + "0.weight"] = _iconv(_get(params, fp + ["conv", "kernel"]))
        sd[tb + "0.bias"] = _get(params, fp + ["conv", "bias"])
        sd[tb + "1.weight"] = _get(params, fp + ["bn", "scale"])
        sd[tb + "1.bias"] = _get(params, fp + ["bn", "bias"])
        sd[tb + "1.running_mean"] = _get(stats, fp + ["bn", "mean"])
        sd[tb + "1.running_var"] = _get(stats, fp + ["bn", "var"])

    for tower in ("bbox_tower", "cls_tower", "cls_memory_tower"):
        for i in range(4):
            fp = ["connect", tower, f"block{i}"]
            tb = f"{cm}.{tower}.{3 * i}"
            sd[tb + ".weight"] = _iconv(_get(params, fp + ["conv",
                                                           "kernel"]))
            sd[tb + ".bias"] = _get(params, fp + ["conv", "bias"])
            bn = f"{cm}.{tower}.{3 * i + 1}"
            sd[bn + ".weight"] = _get(params, fp + ["bn", "scale"])
            sd[bn + ".bias"] = _get(params, fp + ["bn", "bias"])
            sd[bn + ".running_mean"] = _get(stats, fp + ["bn", "mean"])
            sd[bn + ".running_var"] = _get(stats, fp + ["bn", "var"])

    for head in ("bbox_pred", "cls_pred", "cls_memory_pred"):
        sd[f"{cm}.{head}.weight"] = _iconv(_get(params, ["connect", head,
                                                         "kernel"]))
        sd[f"{cm}.{head}.bias"] = _get(params, ["connect", head, "bias"])

    sd[f"{cm}.adjust"] = _get(params, ["connect", "adjust"]).reshape(1)
    sd[f"{cm}.bias"] = _get(params, ["connect", "bias"]).transpose(
        0, 3, 1, 2)  # (1,1,1,4) NHWC -> (1,4,1,1)

    return sd


def convert_backbone_pretrain(sd: Dict[str, np.ndarray], variables):
    """Backbone-only ImageNet / MoCo-v2 pretrain -> merged variables.

    MoCo keys look like `encoder_q.conv1.weight`; canonical torchvision
    keys like `conv1.weight`. 1x1 downsample weights are zero-padded into
    3x3 where this architecture uses 3x3 (ref: train_utils.py:109-124).
    Only matching backbone entries are replaced; everything else in
    `variables` is kept (head stays at init).
    """
    import jax

    remapped = {}
    for k, v in sd.items():
        k = re.sub(r"^(encoder_q\.|backbone\.)", "", k)
        remapped["features.features." + k] = v
    sd = remapped

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    def try_convbn(conv_key, bn_key, flax_path):
        if conv_key not in sd:
            return
        w = sd[conv_key]
        # zero-pad canonical 1x1 downsample into our 3x3 slot if needed
        target = params
        for p in flax_path + ["conv"]:
            target = target[p]
        kh = target["kernel"].shape[0]
        if w.shape[2] == 1 and kh == 3:
            w_pad = np.zeros(w.shape[:2] + (3, 3), w.dtype)
            w_pad[:, :, 1:2, 1:2] = w
            w = w_pad
        _map_convbn(params, stats, {**sd, conv_key: w}, conv_key, bn_key,
                    flax_path)

    try_convbn("features.features.conv1.weight", "features.features.bn1",
               ["features", "stem"])
    for layer, blocks in _LAYER_BLOCKS.items():
        for i in range(blocks):
            tb = f"features.features.{layer}.{i}."
            fp = ["features", f"{layer}_{i}"]
            for j in (1, 2, 3):
                try_convbn(tb + f"conv{j}.weight", tb + f"bn{j}",
                           fp + [f"cb{j}"])
            try_convbn(tb + "downsample.0.weight", tb + "downsample.1",
                       fp + ["downsample"])

    return {"params": params, "batch_stats": stats}


def load_pretrain(variables, path: str):
    """Load either a full USOT checkpoint or a backbone pretrain into
    flax variables (ref: train_utils.py:92-128)."""
    sd = load_torch_state_dict(path)
    if any(k.startswith("connect_model.") for k in sd):
        return convert_usot_checkpoint(sd)
    return convert_backbone_pretrain(sd, variables)
