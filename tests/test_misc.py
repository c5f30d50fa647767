"""Tests for config merge, geometry helpers, polygon IoU, backbone-pretrain
conversion and the crop implementations."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from usot_tpu.config.defaults import default_config, update_config
from usot_tpu.core.crop import get_subwindow, subwindow_jax
from usot_tpu.core.geometry import (aug_apply, Corner, corner2center,
                                    center2corner, get_axis_aligned_bbox,
                                    python2round, image_bbox_to_pool_bbox,
                                    feature_axis)
from usot_tpu.eval.polygon import poly_iou


class TestConfig:
    def test_yaml_merge(self, tmp_path):
        cfg = default_config()
        yml = {"USOT": {"TRAIN": {"BATCH": 99},
                        "DATASET": {"SHIFT": 7, "GOT10K": {"USE": 5}}}}
        path = tmp_path / "c.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(yml, f)
        update_config(cfg, str(path))
        assert cfg.USOT.TRAIN.BATCH == 99
        assert cfg.USOT.DATASET.SHIFT == 7
        assert cfg.USOT.DATASET.GOT10K.USE == 5
        # untouched defaults survive
        assert cfg.USOT.TRAIN.END_EPOCH == 30

    def test_unknown_key_rejected(self, tmp_path):
        cfg = default_config()
        path = tmp_path / "bad.yaml"
        with open(path, "w") as f:
            yaml.safe_dump({"USOT": {"BOGUS_KEY": 1}}, f)
        with pytest.raises(ValueError):
            update_config(cfg, str(path))


class TestGeometry:
    def test_corner_center_roundtrip(self):
        c = corner2center(Corner(10, 20, 50, 80))
        assert (c.x, c.y, c.w, c.h) == (30, 50, 40, 60)
        back = center2corner(c)
        assert tuple(back) == (10, 20, 50, 80)

    def test_python2round_half_away(self):
        assert python2round(2.5) == 3
        assert python2round(3.5) == 4
        assert python2round(-2.5) == -3
        assert python2round(2.4) == 2

    def test_axis_aligned_bbox_polygon(self):
        # axis-aligned rectangle as polygon: area-preserving scale == 1
        poly = np.array([10, 20, 50, 20, 50, 80, 10, 80], float)
        cx, cy, w, h = get_axis_aligned_bbox(poly)
        assert cx == pytest.approx(30) and cy == pytest.approx(50)
        assert w == pytest.approx(41) and h == pytest.approx(61)

    def test_aug_apply_shift_clamped(self):
        bbox = Corner(10, 10, 50, 50)
        out, real = aug_apply(bbox, {"shift": (1000, 0)}, (100, 100))
        assert out.x2 <= 99  # clamped inside image
        assert real["shift"][0] < 1000

    def test_pool_bbox_affine(self):
        axis = feature_axis(15, 8, 127)
        out = image_bbox_to_pool_bbox([7.0, 7.0, 119.0, 119.0], axis, 15)
        np.testing.assert_allclose(out, [0, 0, 14, 14], atol=1e-5)
        # clipped outside
        out = image_bbox_to_pool_bbox([-50.0, 0.0, 500.0, 119.0], axis, 15)
        assert out[0] == 0 and out[2] == 14


class TestPolyIoU:
    def test_rect_rect(self):
        a = [0, 0, 10, 10]
        b = [5, 0, 10, 10]
        assert poly_iou(a, b) == pytest.approx(50 / 150)

    def test_identical_quad(self):
        q = [0, 0, 10, 2, 8, 12, -1, 9]
        assert poly_iou(q, q) == pytest.approx(1.0)

    def test_disjoint(self):
        assert poly_iou([0, 0, 5, 5], [100, 100, 5, 5]) == 0.0

    def test_bound_clipping(self):
        # box half outside the bound: clipped before IoU
        a = [-5, 0, 10, 10]   # rect extends left of image
        b = [0, 0, 5, 10]
        iou = poly_iou(a, b, bound=(100, 100))
        assert iou == pytest.approx(1.0)


class TestSubwindowParity:
    def test_host_vs_jax_inside_image(self, rng):
        im = (rng.random((200, 300, 3)) * 255).astype(np.uint8)
        avg = im.mean(axis=(0, 1))
        pos = np.array([150.0, 100.0])
        host, _ = get_subwindow(im, pos, 127, 80, avg)
        dev = subwindow_jax(jnp.asarray(im, jnp.float32), 150.0, 100.0,
                            80.0, jnp.asarray(avg, jnp.float32), 127)
        diff = np.abs(np.asarray(dev) - np.asarray(host, np.float32))
        assert diff.mean() < 1.0  # cv2 fixed-point vs float bilinear

    def test_host_vs_jax_with_padding(self, rng):
        im = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
        avg = im.mean(axis=(0, 1))
        pos = np.array([5.0, 5.0])  # window leaves the image
        host, _ = get_subwindow(im, pos, 127, 90, avg)
        dev = subwindow_jax(jnp.asarray(im, jnp.float32), 5.0, 5.0, 90.0,
                            jnp.asarray(avg, jnp.float32), 127)
        diff = np.abs(np.asarray(dev) - np.asarray(host, np.float32))
        assert diff.mean() < 4.0


class TestPretrainConversion:
    def test_backbone_pretrain_zero_pad(self, rng):
        """Canonical torchvision 1x1 downsample weights must be zero-padded
        into this architecture's 3x3 slots (ref: train_utils.py:109-124)."""
        from usot_tpu.models.convert import convert_backbone_pretrain
        from usot_tpu.models.usot import build_usot, init_variables

        model = build_usot(mem_size=1)
        variables = init_variables(model, jax.random.PRNGKey(0))

        w11 = rng.normal(size=(512, 256, 1, 1)).astype(np.float32)
        sd = {
            "encoder_q.layer2.0.downsample.0.weight": w11,
            "encoder_q.layer2.0.downsample.1.weight": np.ones(512, np.float32),
            "encoder_q.layer2.0.downsample.1.bias": np.zeros(512, np.float32),
            "encoder_q.layer2.0.downsample.1.running_mean":
                np.zeros(512, np.float32),
            "encoder_q.layer2.0.downsample.1.running_var":
                np.ones(512, np.float32),
        }
        merged = convert_backbone_pretrain(sd, variables)
        k = merged["params"]["features"]["layer2_0"]["downsample"]["conv"][
            "kernel"]
        assert k.shape == (3, 3, 256, 512)
        # center tap carries the 1x1 weights, the rest is zero
        np.testing.assert_allclose(k[1, 1], w11[:, :, 0, 0].T, atol=1e-6)
        assert np.all(k[0, 0] == 0) and np.all(k[2, 2] == 0)
        # untouched layers keep their init values
        stem = merged["params"]["features"]["stem"]["conv"]["kernel"]
        ref_stem = np.asarray(
            variables["params"]["features"]["stem"]["conv"]["kernel"])
        np.testing.assert_allclose(np.asarray(stem), ref_stem)


class TestVOT2020Masks:
    def test_mask_rect_roundtrip(self):
        from usot_tpu.cli.vot_wrapper import (make_full_size, mask_from_rect,
                                              rect_from_mask)

        rect = [10, 20, 30, 40]
        mask = mask_from_rect(rect, (100, 120))
        assert mask.shape == (120, 100)
        cx, cy, w, h = rect_from_mask(mask)
        assert (w, h) == (30, 40)
        assert cx == pytest.approx(10 + 15) and cy == pytest.approx(20 + 20)

        small = np.ones((50, 60), np.uint8)
        full = make_full_size(small, (100, 120))
        assert full.shape == (120, 100)
        assert full[:50, :60].all() and not full[60:, 70:].any()

    def test_trax_mask_report_path(self, monkeypatch):
        """VOT2020 protocol: a mask init region arrives as an ndarray and
        ndarray reports go out as trax Masks (ref vot.py:52-53,84-85)."""
        import sys
        import types

        statuses = []

        class FakeMask:
            @staticmethod
            def create(arr):
                return ("mask", np.asarray(arr))

        class FakeMaskRegion(FakeMask):
            # subclass so `isinstance(request.region, trax.Mask)` holds
            def array(self, full):
                assert full is True
                return np.ones((4, 5), np.uint8)

        class FakeRect:
            @staticmethod
            def create(x, y, w, h):
                return ("rect", (x, y, w, h))

        class FakeServer:
            def __init__(self, formats, images, channels):
                assert formats == ["mask"]

            def wait(self):
                req = types.SimpleNamespace()
                req.type = "initialize"
                req.region = FakeMaskRegion()
                req.image = {"color": types.SimpleNamespace(
                    path=lambda: "/tmp/f0.jpg")}
                return req

            def status(self, region, properties=None):
                statuses.append((region, properties))

        fake = types.SimpleNamespace(
            Region=types.SimpleNamespace(RECTANGLE="rectangle",
                                         POLYGON="polygon", MASK="mask"),
            Image=types.SimpleNamespace(PATH="path"),
            Polygon=type("P", (), {}), Mask=FakeMask, Rectangle=FakeRect,
            Server=FakeServer)
        monkeypatch.setitem(sys.modules, "trax", fake)

        from usot_tpu.cli.vot_wrapper import VOT
        handle = VOT("mask")
        region = handle.region()
        assert isinstance(region, np.ndarray) and region.shape == (4, 5)

        mask = np.zeros((6, 7), np.uint8)
        mask[1:3, 2:5] = 1
        handle.report(mask, confidence=0.7)
        kind, payload = statuses[-1][0]
        assert kind == "mask"
        np.testing.assert_array_equal(payload, mask)
        assert statuses[-1][1] == {"confidence": 0.7}


class TestProhibitAndWindowing:
    def test_prohibit_filter(self, tmp_path):
        from usot_tpu.preprocessing.crop_gen import build_train_json

        raw = {}
        for v in ("keep_me", "drop_me"):
            raw[v] = {"00": {
                "frames": [[10, 10, 60, 60]] * 4,
                "freq": [[0.9, 0.8]] * 4,
                "meta": {"bbox_picked_freq": 0.9, "corner_bbox_freq": 0.05,
                         "frame_sz": [320, 240]},
            }}
        plist = tmp_path / "prohibit.txt"
        plist.write_text("drop_me\n")
        out = build_train_json(raw, prohibit_file=str(plist))
        assert "keep_me" in out and "drop_me" not in out

    def test_lasot_windowing(self, tmp_path):
        import cv2

        from usot_tpu.cli.parse_flow import video_frame_lists

        vdir = tmp_path / "vid-1"
        vdir.mkdir()
        im = np.zeros((8, 8, 3), np.uint8)
        for f in range(450):
            cv2.imwrite(str(vdir / f"{f:08d}.jpg"), im)
        pieces = list(video_frame_lists(str(tmp_path), "lasot", 2000))
        # 450 frames -> windows [0,220], [200,420], [229,449]
        assert len(pieces) == 3
        assert all(len(fr) == 221 for _, fr in pieces)
        names = [n for n, _ in pieces]
        assert names[0].endswith("-01")


class TestSubwindowMatmul:
    """The MXU (sparse-matmul) crop matches the gather crop bit-for-bit-ish
    (HIGHEST-precision matmuls; identical geometry and avg-padding)."""

    def test_matches_gather(self, rng):
        import functools

        import jax

        from usot_tpu.core.crop import subwindow_matmul

        im = jnp.asarray(rng.integers(0, 255, (97, 131 * 3),
                                      dtype=np.uint8))
        avg = jnp.asarray([101.0, 99.5, 120.25])
        fa = jax.jit(functools.partial(subwindow_jax, model_sz=63,
                                       channels=3))
        fb = jax.jit(functools.partial(subwindow_matmul, model_sz=63,
                                       channels=3))
        cases = [(50., 40., 80., 97., 131.),    # interior
                 (5., 5., 90., 97., 131.),      # off the top-left corner
                 (120., 90., 60., 77., 100.),   # valid < canvas
                 (65.3, 48.7, 33., 97., 131.),  # fractional pos, upsample
                 (-10., 200., 140., 97., 131.)]  # mostly outside
        for px, py, s, vh, vw in cases:
            a = fa(im, px, py, s, avg, valid_h=vh, valid_w=vw)
            b = fb(im, px, py, s, avg, valid_h=vh, valid_w=vw)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)


class TestCompileWatch:
    def test_phase_attributes_compiles(self, capsys):
        """CompileWatch counts persistent-cache requests/hits and cold
        backend-compile seconds per phase (utils/compile_watch.py; the
        bench.py tail uses this to distinguish compile from tunnel)."""
        import jax
        import jax.numpy as jnp

        from usot_tpu.utils.compile_watch import get_watch

        watch = get_watch()
        before = watch.snapshot()

        lines = []
        with watch.phase("toy", log=lines.append):
            f = jax.jit(lambda x: (jnp.sin(x) * 3).sum())
            f(jnp.arange(7.0)).block_until_ready()
        assert len(lines) == 1 and lines[0].startswith("compile[toy]:")

        after = watch.snapshot()
        d = watch._delta(before, after)
        # a fresh jit must have spent backend-compile time (cache may or
        # may not be configured in the test env; requests-hits >= 0)
        assert d["backend_compile_s"] > 0.0
        assert d["requests"] >= d["hits"] >= 0
        # a second identical call is a tracing cache hit: no new compile
        before2 = watch.snapshot()
        f(jnp.arange(7.0)).block_until_ready()
        d2 = watch._delta(before2, watch.snapshot())
        assert d2["backend_compile_s"] == 0.0


class TestVotBenchCompare:
    """compare_results in tools/vot_protocol_bench.py: the two-regime
    batch-vs-scan agreement characterization (identical-skeleton delta
    percentiles; per-video divergence points)."""

    def _mk(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from vot_protocol_bench import compare_results
        return compare_results

    def test_identical(self):
        compare = self._mk()
        rows = [1, [1.0, 2.0, 3.0, 4.0], 2, 0, 1, [5.0, 6.0, 7.0, 8.0]]
        out = compare({"a": rows}, {"a": [r for r in rows]})
        assert out["skeleton_identical_videos"] == 1
        assert out["identical_prefix_frames_pct"] == 100.0
        assert out["skeleton_divergences"] == []
        d = out["bbox_delta_px_on_identical_skeletons"]
        assert d["max"] == 0.0 and d["frames"] == 2

    def test_divergence_bookkeeping(self):
        compare = self._mk()
        # video 'v': agree for 4 rows (incl. one restart), then batch
        # declares failure where scan keeps a bbox
        a = {"v": [1, [0.0] * 4, 2, 1, 2, 0],
             "w": [1, [1.0] * 4, [2.0] * 4]}
        b = {"v": [1, [0.0] * 4, 2, 1, [9.0] * 4, [9.0] * 4],
             "w": [1, [1.0] * 4, [2.5] * 4]}
        out = compare(a, b)
        assert out["skeleton_identical_videos"] == 1
        div = out["skeleton_divergences"]
        assert len(div) == 1 and div[0]["video"] == "v"
        assert div[0]["first_mismatch_frame"] == 4
        assert div[0]["identical_restarts_before"] == 1
        # 3 frames in w + 4-frame identical prefix of v, of 9 total
        assert out["identical_prefix_frames_pct"] == round(
            100 * (3 + 4) / (6 + 3), 2)
        d = out["bbox_delta_px_on_identical_skeletons"]
        assert d["max"] == 0.5 and d["frames_over_1px"] == 0
