import numpy as np
import jax
import jax.numpy as jnp
import pytest

from usot_tpu.preprocessing.correlation import correlation
from usot_tpu.preprocessing.flow2box import (calc_corner_bbox_freq,
                                             calc_nearby_bbox_freq,
                                             diou_modify, flow_to_bbox,
                                             remove_small_holes,
                                             remove_small_objects,
                                             smooth_bbox_dp)
from usot_tpu.preprocessing.pwclite import (PWCLite, flow_warp, resize_flow,
                                            resize_bilinear_align_corners)


class TestCorrelation:
    def test_matches_naive(self, rng):
        x1 = rng.normal(size=(2, 10, 12, 8)).astype(np.float32)
        x2 = rng.normal(size=(2, 10, 12, 8)).astype(np.float32)
        d = 2
        out = np.asarray(correlation(jnp.asarray(x1), jnp.asarray(x2), d))
        assert out.shape == (2, 10, 12, 25)
        # naive check at a few positions
        for (b, y, x) in [(0, 5, 6), (1, 2, 3)]:
            k = 0
            for dy in range(-d, d + 1):
                for dx in range(-d, d + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < 10 and 0 <= xx < 12:
                        expect = np.mean(x1[b, y, x] * x2[b, yy, xx])
                    else:
                        expect = 0.0
                    np.testing.assert_allclose(out[b, y, x, k], expect,
                                               atol=1e-5)
                    k += 1

    def test_center_channel_is_self_correlation(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
        out = correlation(x, x, 4)
        center = np.asarray(out)[0, :, :, 40]  # (0,0) displacement
        expect = np.mean(np.asarray(x)[0] ** 2, axis=-1)
        np.testing.assert_allclose(center, expect, atol=1e-5)


class TestWarp:
    def test_zero_flow_identity(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 9, 3)).astype(np.float32))
        out = flow_warp(x, jnp.zeros((1, 8, 9, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_integer_shift(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
        flow = jnp.ones((1, 8, 8, 2)) * jnp.asarray([1.0, 0.0])
        out = flow_warp(x, flow)
        np.testing.assert_allclose(np.asarray(out)[0, :, :-1, 0],
                                   np.asarray(x)[0, :, 1:, 0], atol=1e-6)

    def test_resize_align_corners_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        x = rng.normal(size=(1, 5, 7, 3)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            (10, 14), mode="bilinear", align_corners=True)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        out = resize_bilinear_align_corners(jnp.asarray(x), 10, 14)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestPWCLite:
    def test_3_frame_forward_shapes(self, rng):
        model = PWCLite(n_frames=3)
        h, w = 64, 96
        x = jnp.asarray(rng.normal(size=(1, h, w, 9)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert "flows_fw" in out and "flows_bw" in out
        # finest level (1/4 res) upsampled 4x -> full resolution
        assert out["flows_fw"][0].shape == (1, h, w, 2)

    def test_2_frame_forward(self, rng):
        model = PWCLite(n_frames=2)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 6)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x, with_bk=True)
        assert out["flows_fw"][0].shape == (1, 64, 64, 2)
        assert out["flows_bw"][0].shape == (1, 64, 64, 2)


class TestFlow2Box:
    def test_morphology(self):
        mask = np.zeros((20, 20), bool)
        mask[2:4, 2:4] = True           # 4 px: removed (<80)
        mask[5:17, 5:17] = True         # 144 px: kept
        mask[8, 8] = False              # small hole: filled
        out = remove_small_objects(mask, 80)
        assert not out[2, 2]
        assert out[6, 6]
        out = remove_small_holes(out, 80)
        assert out[8, 8]

    def test_flow_to_bbox_detects_moving_region(self):
        flow = np.zeros((128, 128, 2), np.float32)
        flow[40:80, 50:100] = [6.0, 3.0]  # moving block
        boxes = flow_to_bbox(flow)
        assert len(boxes) >= 1
        x1, y1, x2, y2 = boxes[0]
        assert 40 <= x1 <= 60 and 30 <= y1 <= 50
        assert 90 <= x2 <= 110 and 70 <= y2 <= 90

    def test_diou_identical_and_disjoint(self):
        b = (10, 10, 50, 50)
        assert diou_modify(b, b) == pytest.approx(1.0)
        far = (200, 200, 240, 240)
        assert diou_modify(b, far) < 0

    def test_smooth_bbox_dp(self):
        length = 30
        gap = 3
        # one candidate per sampled frame, drifting slowly
        bboxes = []
        for i, f in enumerate(range(gap, length - gap, gap)):
            bboxes.append([(10 + f, 10 + f, 60 + f, 60 + f)])
        out, picked, found_freq, picked_freq, vary = smooth_bbox_dp(
            bboxes, length, gap=gap)
        assert len(out) == length
        assert picked_freq == pytest.approx(1.0)
        assert found_freq == pytest.approx(1.0)
        assert len(picked) == len(bboxes)

    def test_nearby_freq_and_corner(self):
        freq = calc_nearby_bbox_freq([3, 6, 9], 30, gap=3)
        assert len(freq) == 30 and len(freq[0]) == 2
        assert freq[6][0] > 0
        corner = calc_corner_bbox_freq(
            [(0, 0, 30, 30), (100, 100, 150, 150)], img_shape=(256, 256))
        assert corner == pytest.approx(0.5)


class TestPipelineEndToEnd:
    def test_inference_sequence_and_train_json(self, tmp_path, rng):
        """Synthetic moving-square video -> flow -> candidate boxes -> DP ->
        crop511 + train.json: the whole pseudo-label factory end to end
        (random-init PWCLite at a tiny test shape; mechanics, not quality)."""
        import cv2

        from usot_tpu.preprocessing.crop_gen import (build_train_json,
                                                     crop_video_frames)
        from usot_tpu.preprocessing.inference import (FlowHelper,
                                                      inference_sequence)

        vdir = tmp_path / "video0"
        vdir.mkdir()
        paths = []
        for f in range(14):
            im = (rng.random((96, 128, 3)) * 60).astype(np.uint8)
            x0 = 30 + 3 * f
            im[30:70, x0:x0 + 36] = [200, 160, 90]
            p = str(vdir / f"{f:04d}.jpg")
            cv2.imwrite(p, im)
            paths.append(p)

        helper = FlowHelper(test_shape=(64, 96))
        try:
            bboxs, picked, stats = inference_sequence(helper, paths, gap=3)
        except ValueError:
            pytest.skip("random-init flow net found no candidate boxes")
        freq_dict, found_freq, picked_freq, aver_vary, corner_freq = stats
        assert len(bboxs) == 14
        assert 0 <= picked_freq <= 1

        crop_dir = tmp_path / "crop511" / "video0"
        crop_video_frames(paths, bboxs, 0, str(crop_dir), instance_size=127)
        assert (crop_dir / "000000.00.x.jpg").exists()

        raw = {"video0": {"00": {
            "frames": [list(map(float, b)) for b in bboxs],
            "freq": [[float(a), float(b)] for a, b in freq_dict],
            "meta": {"bbox_picked_freq": max(float(picked_freq), 0.5),
                     "corner_bbox_freq": min(float(corner_freq), 0.1),
                     "frame_sz": [128, 96]},
        }}}
        ann = build_train_json(raw)
        assert "video0" in ann
        track = ann["video0"]["00"]
        frame0 = track["0"]
        assert len(frame0) == 9  # bbox4 + freq2 + [T_l, T_u, corner]
        assert frame0[6] <= 0 <= frame0[7]
