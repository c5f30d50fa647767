"""Numerical parity of the flax backbone vs a test-only torch mirror.

Builds the same modified-ResNet architecture in plain torch (from the
architectural contract: pad-0 stem, 3x3 downsamples in strided/dilated
stages, halved dilation in layer3's first block), loads OUR flax weights
into it through the inverse of the checkpoint converter's mapping, and
compares forward activations. This pins the exact conv/BN/pool semantics
the published-checkpoint conversion depends on.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from usot_tpu.models.backbone import ResNetPlus2

BLOCKS = {"layer1": (3, 64, 64), "layer2": (4, 256, 128),
          "layer3": (6, 512, 256)}


def _to_t(x):
    return torch.from_numpy(np.asarray(x))


def _conv_w(params):
    # HWIO -> OIHW
    return _to_t(np.transpose(np.asarray(params["kernel"]), (3, 2, 0, 1)))


def _convbn(x, params, stats, stride=1, padding=0, dilation=1):
    x = F.conv2d(x, _conv_w(params["conv"]), stride=stride, padding=padding,
                 dilation=dilation)
    bn = params["bn"]
    st = stats["bn"]
    return F.batch_norm(x, _to_t(st["mean"]), _to_t(st["var"]),
                        _to_t(bn["scale"]), _to_t(bn["bias"]),
                        training=False, eps=1e-5)


def _bottleneck(x, params, stats, stride, conv2_padding, conv2_dilation,
                has_down, down_stride, down_padding):
    res = x
    out = F.relu(_convbn(x, params["cb1"], stats["cb1"]))
    out = F.relu(_convbn(out, params["cb2"], stats["cb2"], stride=stride,
                         padding=conv2_padding, dilation=conv2_dilation))
    out = _convbn(out, params["cb3"], stats["cb3"])
    if has_down:
        res = _convbn(x, params["downsample"], stats["downsample"],
                      stride=down_stride, padding=down_padding)
    return F.relu(out + res)


def torch_backbone(x_nchw, params, stats):
    x = F.relu(_convbn(x_nchw, params["stem"], stats["stem"], stride=2,
                       padding=0))
    x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)

    specs = {
        # layer: (first_stride, first_c2pad, first_c2dil, down_k_stride,
        #         down_pad, rest_pad, rest_dil)
        "layer1": (1, 1, 1, 1, 0, 1, 1),
        "layer2": (2, 0, 1, 2, 0, 1, 1),
        "layer3": (1, 1, 1, 1, 1, 2, 2),
    }
    for layer, (blocks, _, _) in BLOCKS.items():
        s, c2p, c2d, ds, dp, rp, rd = specs[layer]
        x = _bottleneck(x, params[f"{layer}_0"], stats[f"{layer}_0"],
                        stride=s, conv2_padding=c2p, conv2_dilation=c2d,
                        has_down=True, down_stride=ds, down_padding=dp)
        for i in range(1, blocks):
            x = _bottleneck(x, params[f"{layer}_{i}"], stats[f"{layer}_{i}"],
                            stride=1, conv2_padding=rp, conv2_dilation=rd,
                            has_down=False, down_stride=1, down_padding=0)
    return x


@pytest.mark.parametrize("size", [127, 255])
def test_backbone_matches_torch_mirror(rng, size):
    bb = ResNetPlus2()
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 63, 63, 3)))
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    x = rng.normal(size=(1, size, size, 3)).astype(np.float32) * 50

    ours = bb.apply(variables, jnp.asarray(x))
    ref = torch_backbone(_to_t(np.transpose(x, (0, 3, 1, 2))), params, stats)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-2, rtol=1e-3)
