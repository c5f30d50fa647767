"""Checkpoint-converter structural test.

Builds a synthetic torch-layout state dict by enumerating the reference
architecture's key schema by hand (independent of the converter code), then
checks the converted tree has exactly the structure/shapes of a freshly
initialized flax model.
"""
import numpy as np
import jax
import pytest

from usot_tpu.models.convert import convert_usot_checkpoint
from usot_tpu.models.usot import build_usot, init_variables


def synthetic_torch_sd(rng):
    sd = {}

    def conv(key, cout, cin, k):
        sd[key] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)

    def bn(key, c):
        for suffix, val in (("weight", np.ones(c)), ("bias", np.zeros(c)),
                            ("running_mean", np.zeros(c)),
                            ("running_var", np.ones(c))):
            sd[f"{key}.{suffix}"] = val.astype(np.float32)
        sd[f"{key}.num_batches_tracked"] = np.array(0)

    # --- backbone ---
    conv("features.features.conv1.weight", 64, 3, 7)
    bn("features.features.bn1", 64)
    specs = [("layer1", 3, 64, 64), ("layer2", 4, 256, 128),
             ("layer3", 6, 512, 256)]
    for layer, blocks, cin0, planes in specs:
        cin = cin0
        for i in range(blocks):
            base = f"features.features.{layer}.{i}"
            conv(f"{base}.conv1.weight", planes, cin, 1)
            bn(f"{base}.bn1", planes)
            conv(f"{base}.conv2.weight", planes, planes, 3)
            bn(f"{base}.bn2", planes)
            conv(f"{base}.conv3.weight", planes * 4, planes, 1)
            bn(f"{base}.bn3", planes * 4)
            if i == 0:
                dk = 1 if layer == "layer1" else 3
                conv(f"{base}.downsample.0.weight", planes * 4, cin, dk)
                bn(f"{base}.downsample.1", planes * 4)
            cin = planes * 4

    # --- neck ---
    conv("neck.downsample.0.weight", 256, 1024, 1)
    bn("neck.downsample.1", 256)

    # --- head ---
    cm = "connect_model"
    for enc in ("cls_encode", "reg_encode"):
        for m in ("matrix11", "matrix12", "matrix21"):
            for side in ("k", "s"):
                conv(f"{cm}.{enc}.{m}_{side}.0.weight", 256, 256, 3)
                bn(f"{cm}.{enc}.{m}_{side}.1", 256)
    sd[f"{cm}.cls_dw.weight"] = np.ones(3, np.float32)
    sd[f"{cm}.reg_dw.weight"] = np.ones(3, np.float32)
    for gen in ("conf_gen", "value_gen"):
        conv(f"{cm}.conf_fusion.{gen}.0.weight", 256, 256, 3)
        sd[f"{cm}.conf_fusion.{gen}.0.bias"] = np.zeros(256, np.float32)
        bn(f"{cm}.conf_fusion.{gen}.1", 256)
    for tower in ("bbox_tower", "cls_tower", "cls_memory_tower"):
        for i in range(4):
            conv(f"{cm}.{tower}.{3*i}.weight", 256, 256, 3)
            sd[f"{cm}.{tower}.{3*i}.bias"] = np.zeros(256, np.float32)
            bn(f"{cm}.{tower}.{3*i+1}", 256)
    conv(f"{cm}.bbox_pred.weight", 4, 256, 3)
    sd[f"{cm}.bbox_pred.bias"] = np.zeros(4, np.float32)
    conv(f"{cm}.cls_pred.weight", 1, 256, 3)
    sd[f"{cm}.cls_pred.bias"] = np.zeros(1, np.float32)
    conv(f"{cm}.cls_memory_pred.weight", 1, 256, 3)
    sd[f"{cm}.cls_memory_pred.bias"] = np.zeros(1, np.float32)
    sd[f"{cm}.adjust"] = np.array([0.1], np.float32)
    sd[f"{cm}.bias"] = np.ones((1, 4, 1, 1), np.float32)
    return sd


def flatten_with_paths(tree):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf).shape
    return flat


def test_converted_tree_matches_init_structure(rng):
    sd = synthetic_torch_sd(rng)
    converted = convert_usot_checkpoint(sd)

    model = build_usot(mem_size=2)
    ref_vars = init_variables(model, jax.random.PRNGKey(0))

    got_p = flatten_with_paths(converted["params"])
    want_p = flatten_with_paths(ref_vars["params"])
    assert got_p == want_p

    got_s = flatten_with_paths(converted["batch_stats"])
    want_s = flatten_with_paths(ref_vars["batch_stats"])
    assert got_s == want_s


def test_conv_layout_torch_vs_flax(rng):
    """OIHW->HWIO transposition gives identical conv outputs."""
    import torch
    import torch.nn.functional as F
    import jax.numpy as jnp
    from jax import lax

    x = rng.normal(size=(1, 3, 9, 9)).astype(np.float32)
    w = rng.normal(size=(5, 3, 3, 3)).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    out = lax.conv_general_dilated(
        x_nhwc, w_hwio, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, atol=1e-4)


def test_invert_roundtrips_exactly():
    """invert_usot_checkpoint is the exact inverse of
    convert_usot_checkpoint: flax -> torch layout -> flax is bit-equal
    on every leaf (the committed trained fixture exercises every scope
    incl. downsamples and the adjust/bias reshapes)."""
    import os

    import jax
    from flax import serialization

    from usot_tpu.models.convert import (convert_usot_checkpoint,
                                         invert_usot_checkpoint)

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "tiny_usot_w8c32.msgpack")
    with open(fixture, "rb") as f:
        fx = serialization.msgpack_restore(f.read())
    variables = {"params": fx["params"], "batch_stats": fx["batch_stats"]}

    back = convert_usot_checkpoint(invert_usot_checkpoint(variables))
    for coll in ("params", "batch_stats"):
        a = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        b = jax.tree_util.tree_flatten_with_path(back[coll])[0]
        assert len(a) == len(b)
        for (pa, va), (pb, vb) in zip(a, b):
            assert pa == pb
            va, vb = np.asarray(va), np.asarray(vb)
            assert va.shape == vb.shape and np.array_equal(va, vb), pa
