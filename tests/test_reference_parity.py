"""Golden-activation parity vs the ACTUAL reference torch modules.

The reference model code (`/root/reference/lib/models/{modules,connect,
models}.py`) runs on CPU torch (only PrRoIPool is CUDA-bound, ref:
functional.py:63). These tests push identical randomized weights through
the real reference modules and our flax model via the production
checkpoint converter (`usot_tpu/models/convert.py`), and assert matching
activations — backbone, neck (center-crop mode), offline matrix/GroupDW
head with the exp(adjust*x+bias) bbox decode, and the ConfFusion memory
head. This anchors parity to the reference itself, not to a hand-written
mirror (the mirror test in test_torch_parity.py remains as the weight
round-trip check).
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from usot_tpu.models.convert import convert_usot_checkpoint
from usot_tpu.models.usot import USOTNet, build_usot

REF = "/root/reference"
N_Q = 7


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def assert_close(ours, ref, tol=1e-4):
    """Scale-aware closeness: XLA and torch reduce convs in different
    orders, so f32 activation noise is proportional to activation scale."""
    ours, ref = np.asarray(ours), np.asarray(ref)
    atol = tol * max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=atol)


def _to_t(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(np.asarray(x_nhwc, np.float32), (0, 3, 1, 2))))


@pytest.fixture(scope="module")
def ref_net():
    """The reference USOT model on CPU with randomized weights/BN stats.
    (`grids()` and the head bias call .cuda() at construction —
    ref models.py:119, connect.py:220 — patched to identity for CPU.)"""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        torch.manual_seed(0)
        from lib.models import models as ref_models

        net = ref_models.USOT(settings={"mem_size": 4, "pr_pool": True})
    finally:
        torch.Tensor.cuda = orig_cuda
    net.eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                # non-trivial eval-mode normalization: catches swapped
                # scale/bias or mean/var in the converter mapping
                m.running_mean.uniform_(-0.2, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.2, 0.2, generator=g)
    return net


@pytest.fixture(scope="module")
def ours(ref_net):
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_net.state_dict().items()}
    variables = convert_usot_checkpoint(sd)
    variables = jax.tree.map(jnp.asarray, variables)
    model = build_usot(mem_size=4)
    return model, variables


@pytest.fixture(scope="module")
def search_pair(ref_net, ours):
    """Shared (xf_ref NCHW torch, xf_ours NHWC jax) search features."""
    model, variables = ours
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, size=(1, 255, 255, 3)).astype(np.float32)
    with torch.no_grad():
        _, p3 = ref_net.feature_extractor(_to_t(x))
        xf_ref = ref_net.neck(p3, crop=False)
    xf_ours = model.apply(variables, jnp.asarray(x),
                          method=USOTNet.search_features)
    return xf_ref, xf_ours


class TestReferenceParity:
    def test_backbone_and_neck(self, ref_net, ours, search_pair):
        """features -> neck(crop=False): the full search-feature path
        (ref: models.py:181-184)."""
        xf_ref, xf_ours = search_pair
        a = _nhwc(xf_ref)
        b = np.asarray(xf_ours)
        assert a.shape == b.shape == (1, 31, 31, 256)
        assert_close(b, a)

    def test_neck_center_crop(self, ref_net, ours):
        """Template neck in center-crop mode (ref: connect.py:296-306)."""
        model, variables = ours
        rng = np.random.default_rng(1)
        zf_raw = rng.normal(size=(2, 15, 15, 1024)).astype(np.float32)
        with torch.no_grad():
            _, crop_ref = ref_net.neck(_to_t(zf_raw), crop=True,
                                       pr_pool=False)
        from usot_tpu.models.neck import AdjustLayer

        neck = AdjustLayer(out_channels=256)
        sub = {"params": variables["params"]["neck"],
               "batch_stats": variables["batch_stats"]["neck"]}
        _, crop_ours = neck.apply(sub, jnp.asarray(zf_raw), crop=True,
                                  pr_pool=False)
        assert_close(np.asarray(crop_ours), _nhwc(crop_ref))

    def test_offline_head(self, ref_net, ours, search_pair):
        """matrix encoders + GroupDW + towers + exp(adjust*pred+bias)
        decode + 0.1-scaled cls logits (ref: connect.py:224-245)."""
        model, variables = ours
        xf_ref, xf_ours = search_pair
        rng = np.random.default_rng(2)
        zf = rng.normal(size=(1, 7, 7, 256)).astype(np.float32)
        with torch.no_grad():
            bbox_ref, cls_ref, _, _, _ = ref_net.connect_model(
                xf_ref, kernel=_to_t(zf))
        cls_ours, bbox_ours = model.apply(variables, xf_ours,
                                          jnp.asarray(zf),
                                          method=USOTNet.track_offline)
        assert_close(np.asarray(cls_ours), _nhwc(cls_ref))
        assert_close(np.asarray(bbox_ours), _nhwc(bbox_ref))

    def test_memory_head(self, ref_net, ours, search_pair):
        """Memory-queue correlation + ConfFusion (clamp [-6,4], exp,
        mem-normalize) + memory cls tower (ref: connect.py:248-280,
        104-144)."""
        model, variables = ours
        xf_ref, xf_ours = search_pair
        rng = np.random.default_rng(3)
        zf = rng.normal(size=(1, 7, 7, 256)).astype(np.float32)
        mem = rng.normal(size=(N_Q, 7, 7, 256)).astype(np.float32)
        conf = torch.ones(1, N_Q)
        with torch.no_grad():
            _, _, _, _, cls_mem_ref = ref_net.connect_model(
                xf_ref, kernel=_to_t(zf), memory_kernel=_to_t(mem),
                memory_confidence=conf)
        _, _, cls_mem_ours = model.apply(variables, xf_ours,
                                         jnp.asarray(zf), jnp.asarray(mem),
                                         method=USOTNet.track_memory)
        assert_close(np.asarray(cls_mem_ours),
                                   _nhwc(cls_mem_ref))

    def test_track_memory_full(self, ref_net, ours, search_pair):
        """The whole per-frame device step output triple matches the
        reference `track` composition (ref: models.py:179-193)."""
        model, variables = ours
        xf_ref, xf_ours = search_pair
        rng = np.random.default_rng(4)
        zf = rng.normal(size=(1, 7, 7, 256)).astype(np.float32)
        mem = rng.normal(size=(N_Q, 7, 7, 256)).astype(np.float32)
        with torch.no_grad():
            bbox_ref, cls_ref, _, _, cls_mem_ref = ref_net.connect_model(
                xf_ref, kernel=_to_t(zf), memory_kernel=_to_t(mem),
                memory_confidence=torch.ones(1, N_Q))
        cls_o, bbox_o, cls_mem_o = model.apply(
            variables, xf_ours, jnp.asarray(zf), jnp.asarray(mem),
            method=USOTNet.track_memory)
        assert_close(np.asarray(cls_o), _nhwc(cls_ref))
        assert_close(np.asarray(bbox_o), _nhwc(bbox_ref))
        assert_close(np.asarray(cls_mem_o),
                                   _nhwc(cls_mem_ref))
