"""Full-loop integration: synthetic benchmark datasets -> test CLI (result
files) -> evaluate CLI (metrics). Exercises load_dataset, both tracking
engines' result writing (incl. the VOT restart protocol), and the OPE/AR/EAO
benchmarks on our own outputs."""
import json
import os

import numpy as np
import pytest


def _write_video_frames(vdir, n=8, size=320, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(vdir, exist_ok=True)
    names = []
    for f in range(n):
        im = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        cx, cy = 100 + 5 * f, 120 + 3 * f
        im[cy - 24:cy + 24, cx - 24:cx + 24] = [200, 180, 60]
        name = f"{f + 1:04d}.jpg"
        cv2.imwrite(os.path.join(vdir, name), im)
        names.append(name)
    return names


@pytest.fixture(scope="module")
def runner_setup():
    import jax

    from usot_tpu.models.calibrate import calibrate_batch_stats
    from usot_tpu.models.usot import build_usot, init_variables
    from usot_tpu.tracker.runner import ModelRunner

    model = build_usot(mem_size=2)
    variables = init_variables(model, jax.random.PRNGKey(3))
    variables = calibrate_batch_stats(model, variables, n_iter=6)
    return model, variables, ModelRunner(model, variables)


class TestOTBLoop:
    def test_track_then_evaluate(self, tmp_path, runner_setup):
        from usot_tpu.cli.evaluate import evaluate
        from usot_tpu.cli.test import parse_args, track_video
        from usot_tpu.data.benchmark import load_dataset
        from usot_tpu.tracker.tracker import USOTTracker

        model, variables, runner = runner_setup
        root = tmp_path / "datasets_test"
        base = root / "OTB2015"
        meta = {}
        for vid in ("Car1",):
            names = _write_video_frames(str(base / vid / "img"), n=6)
            gt = [[88, 108, 48, 48]] * 6  # 1-indexed x,y,w,h
            meta[vid] = {
                "video_dir": vid,
                "init_rect": gt[0],
                "img_names": [f"{vid}/img/{n}" for n in names],
                "gt_rect": gt,
                "attr": [],
            }
        with open(root / "OTB2015.json", "w") as f:
            json.dump(meta, f)

        dataset = load_dataset("OTB2015", str(root))
        args = parse_args(["--dataset", "OTB2015",
                           "--result_dir", str(tmp_path / "result")])
        tracker = USOTTracker()
        for name in dataset:
            track_video(tracker, runner, dataset[name], args)

        result_file = tmp_path / "result" / "OTB2015" / "USOT" / "Car1.txt"
        assert result_file.exists()
        lines = result_file.read_text().splitlines()
        assert len(lines) == 6
        assert len(lines[0].split(",")) == 4

        out = evaluate("OTB2015", str(root),
                       str(tmp_path / "result" / "OTB2015"), ["USOT"])
        success = list(out["success"]["USOT"].values())[0]
        assert success.shape == (21,)
        assert np.all((success >= 0) & (success <= 1))
        assert success[0] > 0  # frame 0 repeats gt, so some IoU>0 exists


class TestVOTLoop:
    def test_restart_protocol_and_eao(self, tmp_path, runner_setup):
        from usot_tpu.cli.evaluate import evaluate
        from usot_tpu.cli.test import parse_args, track_video
        from usot_tpu.data.benchmark import load_dataset
        from usot_tpu.tracker.tracker import USOTTracker

        model, variables, runner = runner_setup
        root = tmp_path / "datasets_test"
        base = root / "VOT2018"
        vid = "ball1"
        names = _write_video_frames(str(base / vid / "color"), n=6)
        gts = []
        for f in range(6):
            cx, cy = 100 + 5 * f, 120 + 3 * f
            gts.append([cx - 24, cy - 24, cx + 24, cy - 24,
                        cx + 24, cy + 24, cx - 24, cy + 24])
        os.makedirs(base / vid / "color", exist_ok=True)
        with open(base / vid / "color" / "groundtruth.txt", "w") as f:
            for g in gts:
                f.write(",".join(str(v) for v in g) + "\n")
        with open(base / "list.txt", "w") as f:
            f.write(vid + "\n")

        dataset = load_dataset("VOT2018", str(root))
        args = parse_args(["--dataset", "VOT2018",
                           "--result_dir", str(tmp_path / "result")])
        tracker = USOTTracker()
        for name in dataset:
            track_video(tracker, runner, dataset[name], args)

        result_file = (tmp_path / "result" / "VOT2018" / "USOT" / "baseline"
                       / vid / f"{vid}_001.txt")
        assert result_file.exists()
        lines = result_file.read_text().splitlines()
        assert lines[0] == "1"  # init flag
        # every line is an init flag, a rect, a failure flag or a skip flag
        for ln in lines[1:]:
            parts = ln.split(",")
            assert len(parts) in (1, 4)

        # ----- eval side: needs the VOT json with attribute tags -----
        meta = {vid: {
            "video_dir": vid,
            "init_rect": [76, 96, 48, 48],
            "img_names": [f"{vid}/color/{n}" for n in names],
            "gt_rect": gts,
            "camera_motion": [0] * 6,
            "illum_change": [0] * 6,
            "motion_change": [0] * 6,
            "size_change": [0] * 6,
            "occlusion": [0] * 6,
        }}
        with open(root / "VOT2018.json", "w") as f:
            json.dump(meta, f)

        out = evaluate("VOT2018", str(root),
                       str(tmp_path / "result" / "VOT2018"), ["USOT"])
        assert "eao" in out and "ar" in out
        # EAO averages expected overlap over frames 100..356: with a 6-frame
        # toy video the interval is empty and EAO is NaN by definition
        # (the reference computes the same). AR must be well-defined.
        overlaps = list(out["ar"]["USOT"]["overlaps"].values())[0]
        assert len(overlaps) == 6
        failures = list(out["ar"]["USOT"]["failures"].values())[0]
        assert all(f >= 0 for f in failures)


class TestBatchedEvalLoop:
    def test_track_dataset_batched(self, tmp_path, runner_setup):
        """engine=batch over a 2-video synthetic OTB benchmark: grouping,
        canvas padding, lockstep tracking and result writing."""
        from usot_tpu.cli.test import parse_args, track_dataset_batched
        from usot_tpu.data.benchmark import load_dataset

        model, variables, runner = runner_setup
        root = tmp_path / "datasets_test"
        base = root / "OTB2015"
        meta = {}
        for i, vid in enumerate(("Walk1", "Walk2")):
            n = 5 + i  # ragged lengths
            names = _write_video_frames(str(base / vid / "img"), n=n,
                                        seed=i)
            gt = [[88, 108, 48, 48]] * n
            meta[vid] = {"video_dir": vid, "init_rect": gt[0],
                         "img_names": [f"{vid}/img/{x}" for x in names],
                         "gt_rect": gt, "attr": []}
        with open(root / "OTB2015.json", "w") as f:
            json.dump(meta, f)

        dataset = load_dataset("OTB2015", str(root))
        args = parse_args(["--dataset", "OTB2015", "--engine", "batch",
                           "--batch", "2", "--chunk", "3",
                           "--result_dir", str(tmp_path / "result")])
        track_dataset_batched(model, variables, runner, dataset, args)

        for vid, n in (("Walk1", 5), ("Walk2", 6)):
            path = tmp_path / "result" / "OTB2015" / "USOT" / f"{vid}.txt"
            assert path.exists()
            lines = path.read_text().splitlines()
            assert len(lines) == n
            for ln in lines:
                vals = [float(v) for v in ln.split(",")]
                assert len(vals) == 4 and all(np.isfinite(vals))


class TestScanCLILoop:
    def test_track_video_scan_otb(self, tmp_path, runner_setup):
        """engine=scan CLI path: on-device scan per video + OTB result file."""
        from usot_tpu.cli.test import parse_args, track_video_scan
        from usot_tpu.data.benchmark import load_dataset

        model, variables, runner = runner_setup
        root = tmp_path / "datasets_test"
        base = root / "OTB2015"
        names = _write_video_frames(str(base / "Run1" / "img"), n=5)
        gt = [[88, 108, 48, 48]] * 5
        meta = {"Run1": {"video_dir": "Run1", "init_rect": gt[0],
                         "img_names": [f"Run1/img/{n}" for n in names],
                         "gt_rect": gt, "attr": []}}
        with open(root / "OTB2015.json", "w") as f:
            json.dump(meta, f)

        dataset = load_dataset("OTB2015", str(root))
        args = parse_args(["--dataset", "OTB2015", "--engine", "scan",
                           "--chunk", "4",
                           "--result_dir", str(tmp_path / "result")])
        engines = {}
        for name in dataset:
            track_video_scan(model, variables, runner, dataset[name], args,
                             engines)

        path = tmp_path / "result" / "OTB2015" / "USOT" / "Run1.txt"
        assert path.exists()
        lines = path.read_text().splitlines()
        assert len(lines) == 5
        for ln in lines:
            vals = [float(v) for v in ln.split(",")]
            assert len(vals) == 4 and all(np.isfinite(vals))


class TestBatchedROICLILoop:
    def test_track_dataset_batched_roi(self, tmp_path, runner_setup):
        """engine=batch with --roi: ROI-streamed CLI results must equal
        the full-frame CLI results (exactness replay end to end)."""
        from usot_tpu.cli.test import parse_args, track_dataset_batched
        from usot_tpu.data.benchmark import load_dataset

        model, variables, runner = runner_setup
        root = tmp_path / "datasets_test"
        base = root / "OTB2015"
        meta = {}
        for i, vid in enumerate(("Roi1", "Roi2")):
            names = _write_video_frames(str(base / vid / "img"), n=6,
                                        seed=i)
            gt = [[88, 108, 48, 48]] * 6
            meta[vid] = {"video_dir": vid, "init_rect": gt[0],
                         "img_names": [f"{vid}/img/{x}" for x in names],
                         "gt_rect": gt, "attr": []}
        with open(root / "OTB2015.json", "w") as f:
            json.dump(meta, f)

        dataset = load_dataset("OTB2015", str(root))
        for tag, extra in (("full", []), ("roi", ["--roi", "312"])):
            args = parse_args(["--dataset", "OTB2015", "--engine", "batch",
                               "--batch", "2", "--chunk", "3",
                               "--result_dir",
                               str(tmp_path / f"result_{tag}")] + extra)
            track_dataset_batched(model, variables, runner, dataset, args)

        for vid in ("Roi1", "Roi2"):
            a = (tmp_path / "result_full" / "OTB2015" / "USOT" /
                 f"{vid}.txt").read_text().splitlines()
            b = (tmp_path / "result_roi" / "OTB2015" / "USOT" /
                 f"{vid}.txt").read_text().splitlines()
            ra = np.array([[float(v) for v in ln.split(",")] for ln in a])
            rb = np.array([[float(v) for v in ln.split(",")] for ln in b])
            np.testing.assert_allclose(ra, rb, atol=1e-2)
