"""End-to-end trajectory parity vs the ACTUAL reference tracker loop.

Runs `/root/reference/lib/tracker/usot_tracker.py` — the real
init/track/memory-queue/penalty composition, not a re-implementation —
on CPU torch with:
  - `torch.Tensor.cuda` / `nn.Module.cuda` patched to identity (the
    container has no CUDA),
  - the CUDA PrRoIPool patched with a channel-vectorized form of the
    repo's NumPy closed-form oracle (tests/test_ops.py pins that oracle
    against the CUDA kernel math,
    ref: prroi_pool/src/prroi_pooling_gpu_impl.cu:150-212),
  - a minimal imgaug stub (the tracker only uses Fliplr(1.0) + its bbox
    transform, ref: usot_tracker.py:18-20,109-116),
and compares the produced trajectory frame by frame against
tracker/tracker.py (host parity path) and the scan engine, all driven by
the SAME converted weights. This anchors the COMPOSED tracking loop —
crop geometry, queue sampling, penalties, EMA — to the reference itself,
the strongest parity anchor available without the published checkpoints
(VERDICT r3 missing #2 / next #3).
"""
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from usot_tpu.models.convert import convert_usot_checkpoint
from usot_tpu.models.usot import build_usot
from usot_tpu.tracker.runner import ModelRunner
from usot_tpu.tracker.tracker import USOTTracker

from test_tracker import synthetic_video

REF = "/root/reference"
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_usot_w8c32.msgpack")


# ---------------------------------------------------------------------
# Channel-vectorized NumPy PrRoIPool oracle (same closed form as
# tests/test_ops.prroi_closed_form, vectorized over C for speed).
# ---------------------------------------------------------------------

def _prroi_multi(F, roi, ph, pw):
    """F: (C, H, W) f64; roi: (x1, y1, x2, y2). Returns (C, ph, pw)."""
    C, H, W = F.shape

    def get(h, w):
        if 0 <= h < H and 0 <= w < W:
            return F[:, h, w]
        return np.zeros((C,), F.dtype)

    def K(alpha, lim):
        return lim - 0.5 * lim * lim - alpha + 0.5 * alpha * alpha

    x1r, y1r, x2r, y2r = [float(v) for v in roi]
    roi_w = max(x2r - x1r, 0.0)
    roi_h = max(y2r - y1r, 0.0)
    bw, bh = roi_w / pw, roi_h / ph
    out = np.zeros((C, ph, pw), F.dtype)
    win_size = max(0.0, bw * bh)
    if win_size == 0:
        return out
    for i in range(ph):
        for j in range(pw):
            ws_w, ws_h = x1r + bw * j, y1r + bh * i
            we_w, we_h = ws_w + bw, ws_h + bh
            s_w, e_w = int(np.floor(ws_w)), int(np.ceil(we_w))
            s_h, e_h = int(np.floor(ws_h)), int(np.ceil(we_h))
            acc = np.zeros((C,), F.dtype)
            for w_it in range(s_w, e_w):
                for h_it in range(s_h, e_h):
                    y0 = max(ws_h, float(h_it))
                    x0 = max(ws_w, float(w_it))
                    y1 = min(we_h, float(h_it) + 1.0)
                    x1 = min(we_w, float(w_it) + 1.0)
                    kx_s = K(x0 - w_it, x1 - w_it)
                    kx_e = K((w_it + 1) - x1, (w_it + 1) - x0)
                    ky_s = K(y0 - h_it, y1 - h_it)
                    ky_e = K((h_it + 1) - y1, (h_it + 1) - y0)
                    acc = acc + (get(h_it, w_it) * kx_s * ky_s
                                 + get(h_it, w_it + 1) * kx_e * ky_s
                                 + get(h_it + 1, w_it) * kx_s * ky_e
                                 + get(h_it + 1, w_it + 1) * kx_e * ky_e)
            out[:, i, j] = acc / win_size
    return out


def _prroi_pool2d_stub(features, rois, ph, pw, spatial_scale=1.0):
    """Drop-in for lib.models.prroi_pool.functional.prroi_pool2d."""
    F = features.detach().cpu().numpy().astype(np.float64)
    R = rois.detach().cpu().numpy().astype(np.float64)
    outs = []
    for r in R:
        b = int(r[0])
        outs.append(_prroi_multi(F[b], r[1:] * spatial_scale, ph, pw))
    return torch.from_numpy(np.stack(outs).astype(np.float32))


def _install_imgaug_stub():
    """The reference tracker needs exactly Fliplr(1.0) over an image +
    BoundingBoxesOnImage (ref: usot_tracker.py:18-20,109-116)."""
    if "imgaug" in sys.modules:
        return

    class BoundingBox:
        def __init__(self, x1, y1, x2, y2):
            self.x1, self.y1, self.x2, self.y2 = x1, y1, x2, y2

    class BoundingBoxesOnImage:
        def __init__(self, bounding_boxes, shape):
            self.bounding_boxes = bounding_boxes
            self.shape = shape

        def __getitem__(self, i):
            return self.bounding_boxes[i]

    class Fliplr:
        def __init__(self, p=1.0):
            assert p == 1, "stub supports deterministic flip only"

    class Sequential:
        def __init__(self, ops):
            assert all(isinstance(o, Fliplr) for o in ops), \
                "stub supports Fliplr-only pipelines"

        def __call__(self, image=None, bounding_boxes=None):
            flipped = image[:, ::-1].copy()
            w = image.shape[1]
            out = [BoundingBox(w - b.x2, b.y1, w - b.x1, b.y2)
                   for b in bounding_boxes.bounding_boxes]
            return flipped, BoundingBoxesOnImage(out, bounding_boxes.shape)

    imgaug = types.ModuleType("imgaug")
    augmenters = types.ModuleType("imgaug.augmenters")
    augmenters.Sequential = Sequential
    augmenters.Fliplr = Fliplr
    augmentables = types.ModuleType("imgaug.augmentables")
    bbs = types.ModuleType("imgaug.augmentables.bbs")
    bbs.BoundingBox = BoundingBox
    bbs.BoundingBoxesOnImage = BoundingBoxesOnImage
    imgaug.augmenters = augmenters
    imgaug.augmentables = augmentables
    augmentables.bbs = bbs
    sys.modules["imgaug"] = imgaug
    sys.modules["imgaug.augmenters"] = augmenters
    sys.modules["imgaug.augmentables"] = augmentables
    sys.modules["imgaug.augmentables.bbs"] = bbs


@pytest.fixture(scope="module")
def ref_env():
    """Reference import environment: path, imgaug stub, cuda-to-identity,
    PrRoIPool oracle. Restores torch patches on teardown."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_imgaug_stub()
    orig_t = torch.Tensor.cuda
    orig_m = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from lib.models import models as ref_models
    from lib.models.prroi_pool import prroi_pool as ref_prroi
    orig_fn = ref_models.prroi_pool2d
    orig_fn2 = ref_prroi.prroi_pool2d
    ref_models.prroi_pool2d = _prroi_pool2d_stub
    ref_prroi.prroi_pool2d = _prroi_pool2d_stub
    yield ref_models
    ref_models.prroi_pool2d = orig_fn
    ref_prroi.prroi_pool2d = orig_fn2
    torch.Tensor.cuda = orig_t
    torch.nn.Module.cuda = orig_m


@pytest.fixture(scope="module")
def nets(ref_env):
    """(reference net, our model, converted variables) — same weights.

    The torch net's BN running stats are CALIBRATED with train-mode
    passes on image-scale inputs before conversion (the torch-side
    mirror of models/calibrate.py): fresh mean-0/var-1 stats meet raw
    0-255 activations and overflow the exp() bbox decode into NaN
    responses, where the two postprocess argmaxes legitimately differ
    (ours guards NaN cells; numpy argmax returns the first NaN)."""
    ref_models = ref_env
    torch.manual_seed(0)
    net = ref_models.USOT(settings={"mem_size": 4, "pr_pool": True})
    rng = np.random.default_rng(0)
    net.train()
    with torch.no_grad():
        for _ in range(10):
            x = torch.from_numpy(
                (rng.random((2, 3, 255, 255)) * 255).astype(np.float32))
            z = torch.from_numpy(
                (rng.random((2, 3, 127, 127)) * 255).astype(np.float32))
            _, px = net.feature_extractor(x)
            xf = net.neck(px, crop=False)
            _, pz = net.feature_extractor(z)
            _, zf = net.neck(pz, crop=True, pr_pool=False)
            mem = zf[:1].repeat(7, 1, 1, 1)
            net.connect_model(xf[:1], kernel=zf[:1], memory_kernel=mem,
                              memory_confidence=torch.ones(1, 7))
    net.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_usot_checkpoint(sd))
    model = build_usot(mem_size=4)
    return net, model, variables


def _divergence_frame(a, b, tol=0.5):
    """First frame index where |a-b| (center distance) exceeds tol."""
    err = np.linalg.norm(np.asarray(a) - np.asarray(b), axis=1)
    bad = np.nonzero(err > tol)[0]
    return (len(err) if len(bad) == 0 else int(bad[0])), err


class TestReferenceTrackerEndToEnd:
    def test_trajectory_parity(self, ref_env, nets):
        from lib.tracker.usot_tracker import USOTTracker as RefTracker

        ref_net, model, variables = nets
        frames, centers = synthetic_video(n_frames=12)
        init_pos = np.array(centers[0], np.float64)
        init_sz = np.array([48.0, 48.0])

        # --- the ACTUAL reference loop (usot_tracker.py:22-265)
        ref_tracker = RefTracker(SimpleNamespace(arch="USOT"))
        ref_pos, ref_sz = [], []
        with torch.no_grad():
            st = ref_tracker.init(frames[0], init_pos.copy(),
                                  init_sz.copy(), ref_net)
            for im in frames[1:]:
                st = ref_tracker.track(st, im)
                ref_pos.append(np.array(st["target_pos"], np.float64))
                ref_sz.append(np.array(st["target_sz"], np.float64))
        ref_pos, ref_sz = np.stack(ref_pos), np.stack(ref_sz)

        # --- our host parity tracker, same converted weights
        runner = ModelRunner(model, variables)
        ours = USOTTracker()
        st = ours.init(frames[0], init_pos.copy(), init_sz.copy(), runner)
        our_pos, our_sz = [], []
        for im in frames[1:]:
            st = ours.track(st, im)
            our_pos.append(np.array(st["target_pos"], np.float64))
            our_sz.append(np.array(st["target_sz"], np.float64))
        our_pos, our_sz = np.stack(our_pos), np.stack(our_sz)

        # Identical crops (both paths use the cv2 crop on the host) and
        # f64 postprocess on both sides: the only noise source is
        # torch-vs-XLA conv reduction order (~1e-4 * activation scale),
        # so the trajectories must agree to sub-pixel until a response
        # near-tie flips an argmax (if ever, on this clip).
        n_agree, err = _divergence_frame(our_pos, ref_pos, tol=0.5)
        assert n_agree >= 5, (
            f"diverged from the reference tracker at frame {n_agree}: "
            f"err={err[:n_agree + 1]}")
        np.testing.assert_allclose(our_sz[:n_agree], ref_sz[:n_agree],
                                   atol=1.0)
        assert len(err) == 11

    def test_memory_queue_contents_match(self, ref_env, nets):
        """After N frames, the reference's unbounded memory-confidence
        list and our parity tracker's must agree elementwise (same
        pooled-feature scores), pinning the queue bookkeeping."""
        from lib.tracker.usot_tracker import USOTTracker as RefTracker

        ref_net, model, variables = nets
        frames, centers = synthetic_video(n_frames=8)
        init_pos = np.array(centers[0], np.float64)
        init_sz = np.array([48.0, 48.0])

        ref_tracker = RefTracker(SimpleNamespace(arch="USOT"))
        with torch.no_grad():
            st_r = ref_tracker.init(frames[0], init_pos.copy(),
                                    init_sz.copy(), ref_net)
            for im in frames[1:]:
                st_r = ref_tracker.track(st_r, im)

        runner = ModelRunner(model, variables)
        ours = USOTTracker()
        st_o = ours.init(frames[0], init_pos.copy(), init_sz.copy(), runner)
        for im in frames[1:]:
            st_o = ours.track(st_o, im)

        conf_r = np.asarray(st_r["memory_confidences"], np.float64)
        conf_o = np.asarray(st_o["memory_confidences"], np.float64)
        assert conf_r.shape == conf_o.shape
        # confidences are sigmoid scores in [0,1]; 1e-3 absorbs the
        # conv-backend noise while still catching any indexing slip
        np.testing.assert_allclose(conf_o, conf_r, atol=1e-3)

    def test_scan_engine_tracks_same_video(self, nets):
        """The scan engine on the same converted weights stays in the
        same search neighborhood as the reference loop. (Sub-pixel
        scan-vs-parity agreement is pinned separately with the TRAINED
        tiny fixture — random-weight argmaxes are chaotic under f32/f64
        crop differences, see tests/test_engine.py.)"""
        from usot_tpu.tracker.config import TrackerConfig
        from usot_tpu.tracker.engine import ScanEngine

        ref_net, model, variables = nets
        frames, centers = synthetic_video(n_frames=6)
        runner = ModelRunner(model, variables)
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        engine = ScanEngine(model, variables, p, im_h=frames[0].shape[0],
                            im_w=frames[0].shape[1], max_frames=32, chunk=4)
        est = engine.init_state(frames[0], np.array(centers[0], float),
                                np.array([48.0, 48.0]), runner)
        _, pos, sz, score = engine.track_frames(est, np.stack(frames[1:]))
        assert np.all(np.isfinite(pos)) and np.all(np.isfinite(sz))
        assert np.all(sz >= 10)


@pytest.fixture(scope="module")
def tiny_ref(ref_env):
    """The reference net at the committed TRAINED fixture's tiny geometry
    (width 8, channels 32), built with the reference's OWN constructors —
    ResNet_plus2._make_layer re-invoked at width 8 (so the 1x1-vs-3x3
    downsample rules and the first-block dilation quirk are the
    reference's own, modules.py:103-135), AdjustLayer / box_tower_reg at
    32 channels (connect.py) — and loaded with OUR trained weights
    through the inverse converter (models/convert.invert_usot_checkpoint).
    Returns (ref net, our model, flax variables): same trained weights on
    both sides, so response maps are PEAKED and full-clip sub-pixel
    agreement is demanded (retires the random-weight n_agree>=5 floor)."""
    import torch.nn as nn
    from flax import serialization

    from lib.models.backbones import ResNet50
    from lib.models.connect import AdjustLayer, box_tower_reg
    from lib.models.modules import Bottleneck

    from usot_tpu.models.convert import invert_usot_checkpoint

    ref_models = ref_env
    with open(FIXTURE, "rb") as f:
        fx = serialization.msgpack_restore(f.read())
    w, c = int(fx["width"]), int(fx["channels"])
    mem = int(fx["mem_size"])
    variables = {"params": fx["params"], "batch_stats": fx["batch_stats"]}

    net = ref_models.USOT(settings={"mem_size": mem, "pr_pool": True})
    feat = ResNet50(used_layers=[3])
    rp = feat.features
    rp.inplanes = w
    rp.conv1 = nn.Conv2d(3, w, kernel_size=7, stride=2, padding=0,
                         bias=False)
    rp.bn1 = nn.BatchNorm2d(w)
    rp.layer1 = rp._make_layer(Bottleneck, w, 3)
    rp.layer2 = rp._make_layer(Bottleneck, 2 * w, 4, stride=2)
    rp.layer3 = rp._make_layer(Bottleneck, 4 * w, 6, stride=1, dilation=2)
    net.features = feat
    net.neck = AdjustLayer(in_channels=4 * w * Bottleneck.expansion,
                           out_channels=c, pr_pool=True)
    net.connect_model = box_tower_reg(in_channels=c, out_channels=c,
                                      tower_num=4)

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in invert_usot_checkpoint(variables).items()}
    res = net.load_state_dict(sd, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    assert all(k.endswith("num_batches_tracked") for k in
               res.missing_keys), res.missing_keys
    net.eval()

    model = build_usot(mem_size=mem, width=w, channels=c)
    return net, model, jax.tree.map(jnp.asarray, variables)


class TestTrainedReferenceParity:
    """The trained-weights anchor: the ACTUAL reference loop vs our host
    parity tracker, both driven by the committed TRAINED tiny fixture.
    Peaked responses remove the argmax near-ties that forced the
    random-weight test's soft n_agree floor — here the FULL clip must
    agree to sub-pixel."""

    def _run_both(self, tiny_ref, n_frames=12):
        from lib.tracker.usot_tracker import USOTTracker as RefTracker

        ref_net, model, variables = tiny_ref
        frames, centers = synthetic_video(n_frames=n_frames)
        init_pos = np.array(centers[0], np.float64)
        init_sz = np.array([48.0, 48.0])

        ref_tracker = RefTracker(SimpleNamespace(arch="USOT"))
        ref_pos, ref_sz = [], []
        with torch.no_grad():
            st_r = ref_tracker.init(frames[0], init_pos.copy(),
                                    init_sz.copy(), ref_net)
            for im in frames[1:]:
                st_r = ref_tracker.track(st_r, im)
                ref_pos.append(np.array(st_r["target_pos"], np.float64))
                ref_sz.append(np.array(st_r["target_sz"], np.float64))

        runner = ModelRunner(model, variables)
        ours = USOTTracker()
        st_o = ours.init(frames[0], init_pos.copy(), init_sz.copy(),
                         runner)
        our_pos, our_sz = [], []
        for im in frames[1:]:
            st_o = ours.track(st_o, im)
            our_pos.append(np.array(st_o["target_pos"], np.float64))
            our_sz.append(np.array(st_o["target_sz"], np.float64))
        return (np.stack(ref_pos), np.stack(ref_sz), st_r,
                np.stack(our_pos), np.stack(our_sz), st_o)

    def test_full_clip_subpixel(self, ref_env, tiny_ref):
        ref_pos, ref_sz, _, our_pos, our_sz, _ = self._run_both(tiny_ref)
        err = np.linalg.norm(our_pos - ref_pos, axis=1)
        assert err.shape[0] == 11
        assert np.all(err <= 0.5), f"center err per frame: {err}"
        np.testing.assert_allclose(our_sz, ref_sz, atol=0.5)

    def test_memory_confidences_tight(self, ref_env, tiny_ref):
        _, _, st_r, _, _, st_o = self._run_both(tiny_ref, n_frames=9)
        conf_r = np.asarray(st_r["memory_confidences"], np.float64)
        conf_o = np.asarray(st_o["memory_confidences"], np.float64)
        assert conf_r.shape == conf_o.shape
        np.testing.assert_allclose(conf_o, conf_r, atol=1e-5)
