import numpy as np
import pytest

from usot_tpu.eval.region import (_build_and_load, _overlap_np, _to_polygon,
                                  _bounds_tuple, vot_overlap,
                                  vot_overlap_traj, vot_float2str)
from usot_tpu.eval.statistics import (calculate_accuracy,
                                      calculate_expected_overlap,
                                      calculate_failures, overlap_ratio,
                                      success_error, success_overlap)


class TestRegion:
    def test_identical_rects(self):
        assert vot_overlap([10, 10, 20, 20], [10, 10, 20, 20]) == pytest.approx(1.0)

    def test_disjoint(self):
        assert vot_overlap([0, 0, 5, 5], [100, 100, 5, 5]) == 0.0

    def test_special_frame_nan(self):
        assert np.isnan(vot_overlap([2], [10, 10, 5, 5]))
        assert np.isnan(vot_overlap([10, 10, 5, 5], [0]))

    def test_half_overlap_rects(self):
        # [0,0,10,10] vs [5,0,10,10]: rasterized IoU on integer grid
        ov = vot_overlap([0, 0, 10, 10], [5, 0, 10, 10])
        # masks are 11x11 wide rasterizations; expect around 1/3
        assert 0.25 < ov < 0.45

    def test_polygon_rect_equivalence(self):
        rect = [3, 4, 8, 6]
        poly = [3, 4, 11, 4, 11, 10, 3, 10]
        assert vot_overlap(rect, poly) == pytest.approx(1.0)

    def test_native_matches_numpy(self, rng):
        lib = _build_and_load()
        assert lib is not None, "C++ region library must build"
        for _ in range(40):
            # random convex-ish quadrilaterals
            cx, cy = rng.uniform(10, 50, 2)
            ang = np.sort(rng.uniform(0, 2 * np.pi, 4))
            r = rng.uniform(3, 20, 4)
            p1 = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                          axis=1).ravel()
            cx2, cy2 = rng.uniform(10, 50, 2)
            r2 = rng.uniform(3, 20, 4)
            p2 = np.stack([cx2 + r2 * np.cos(ang), cy2 + r2 * np.sin(ang)],
                          axis=1).ravel()
            bounds = None
            native = vot_overlap(p1, p2, bounds)
            mirror = _overlap_np(_to_polygon(p1), _to_polygon(p2),
                                 _bounds_tuple(bounds))
            assert native == pytest.approx(mirror, abs=1e-6), (p1, p2)

    def test_traj_and_float2str(self):
        ovs = vot_overlap_traj([[0, 0, 5, 5], [2]], [[0, 0, 5, 5], [0, 0, 5, 5]])
        assert ovs[0] == pytest.approx(1.0)
        assert np.isnan(ovs[1])
        assert vot_float2str("%.3f", 0.12345) == "0.123"


class TestStatistics:
    def test_failures(self):
        traj = [[1], [10, 10, 5, 5], [2], [0], [10, 10, 5, 5], [2]]
        n, idx = calculate_failures(traj)
        assert n == 2 and idx == [2, 5]

    def test_overlap_ratio(self):
        r1 = np.array([[0, 0, 10, 10]])
        r2 = np.array([[5, 5, 10, 10]])
        iou = overlap_ratio(r1, r2)
        assert iou[0] == pytest.approx(25 / 175)

    def test_success_overlap_perfect(self):
        gt = np.array([[10, 10, 20, 20]] * 5, float)
        success = success_overlap(gt, gt.copy(), 5)
        assert success[0] == 1.0 and success[-1] == 0.0  # iou>1.0 is false

    def test_success_error(self):
        gt = np.array([[5.0, 5.0], [10.0, 10.0]])
        res = np.array([[5.0, 5.0], [13.0, 14.0]])  # dist 0 and 5
        th = np.array([0, 1, 5, 10])
        out = success_error(gt, res, th, 2)
        np.testing.assert_allclose(out, [0.5, 0.5, 1.0, 1.0])

    def test_expected_overlap_single_fragment(self):
        frag = np.array([[1.0, 0.5, 0.5, 0.5]])
        w = np.array([1.0])
        eo = calculate_expected_overlap(frag, w)
        assert eo[0] == 1.0
        assert eo[1] == pytest.approx(0.5)
        assert eo[3] == pytest.approx(0.5)

    def test_accuracy_burnin(self):
        gt = [[0, 0, 10, 10]] * 4
        pred = [[1], [0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10]]
        acc, overlaps = calculate_accuracy(pred, gt, burnin=2,
                                           bound=(100, 100))
        # frames 0,1 burned (nan), 2,3 overlap 1
        assert np.isnan(overlaps[0]) and np.isnan(overlaps[1])
        assert overlaps[2] == pytest.approx(1.0)
        assert acc == pytest.approx(1.0)


class TestVOTLT:
    def test_f1_benchmark_from_disk(self, tmp_path):
        """VOT-LT loop: longterm result + confidence files -> F1."""
        import json
        import os

        from usot_tpu.eval.benchmarks import F1Benchmark
        from usot_tpu.eval.datasets import create_dataset

        root = tmp_path
        name = "VOT2018-LT"
        vid = "person1"
        n = 150  # determine_thresholds assumes >~100 confidence scores
        gts = [[10.0 + i, 20.0 + i, 40.0, 60.0] for i in range(n)]
        meta = {vid: {"video_dir": vid, "init_rect": gts[0],
                      "img_names": [f"{vid}/{i:08d}.jpg" for i in range(n)],
                      "gt_rect": gts}}
        with open(root / f"{name}.json", "w") as f:
            json.dump(meta, f)
        # first frame must exist: Video reads width/height from it
        import cv2
        os.makedirs(root / name / vid)
        cv2.imwrite(str(root / name / vid / "00000000.jpg"),
                    np.zeros((240, 320, 3), np.uint8))

        result_dir = root / "results" / "USOT" / "longterm" / vid
        os.makedirs(result_dir)
        with open(result_dir / f"{vid}_001.txt", "w") as f:
            f.write("1\n")
            for g in gts[1:]:
                f.write(",".join(str(v) for v in g) + "\n")
        with open(result_dir / f"{vid}_001_confidence.value", "w") as f:
            f.write("\n")  # header line skipped by the loader
            for i in range(n - 1):
                f.write(f"{0.5 + 0.04 * i:.4f}\n")

        dataset = create_dataset(name, str(root))
        dataset.set_tracker(str(root / "results"), ["USOT"])
        f1 = F1Benchmark(dataset)
        out = f1.eval(["USOT"])
        fs = list(out["USOT"]["f1"].values())[0]
        # predictions == gt -> precision 1 at permissive thresholds
        assert np.nanmax(fs) > 0.8


class TestReportingPolish:
    """Round-2 parity polish: sorted/video-level tables, attr grouping,
    EAO attribute radar (ref: ope_benchmark.py:124-195, ar_benchmark.py,
    visualization/draw_eao.py)."""

    def test_ope_show_video_level(self, capsys):
        from usot_tpu.eval.benchmarks import OPEBenchmark

        ope = OPEBenchmark.__new__(OPEBenchmark)  # show_result is static-ish
        success = {"trk": {"vid1": np.linspace(1, 0, 21),
                           "vid2": np.linspace(0.5, 0, 21)}}
        precision = {"trk": {"vid1": np.linspace(0, 1, 51),
                             "vid2": np.linspace(0, 0.4, 51)}}
        ope.show_result(success, precision, show_video_level=True)
        out = capsys.readouterr().out
        assert "Tracker name" in out and "Video name" in out
        assert "vid1" in out and "vid2" in out
        assert "\033[31m" in out  # sub-threshold cells highlighted red

    def test_attr_grouping(self, tmp_path):
        import json

        from usot_tpu.eval.datasets import _build_attr

        class V:
            def __init__(self, attr):
                self.attr = attr

        vids = {"a": V(["IV", "OCC"]), "b": V(["IV"]), "c": V(None)}
        attr = _build_attr(vids)
        assert attr["ALL"] == ["a", "b", "c"]
        assert attr["IV"] == ["a", "b"] and attr["OCC"] == ["a"]

    def test_got10k_trackingnet_datasets(self, tmp_path):
        import json

        from usot_tpu.eval.datasets import (GOT10kDataset,
                                            TrackingNetDataset,
                                            create_dataset)

        meta = {"seq-1": {
            "video_dir": "seq-1",
            "init_rect": [10, 10, 30, 30],
            "img_names": ["seq-1/00000001.jpg", "seq-1/00000002.jpg"],
            "gt_rect": [[10, 10, 30, 30], [12, 11, 30, 30]],
        }}
        for name, cls in (("GOT10KVAL", GOT10kDataset),
                          ("TRACKINGNET", TrackingNetDataset)):
            (tmp_path / f"{name}.json").write_text(json.dumps(meta))
            ds = create_dataset(name, str(tmp_path))
            assert isinstance(ds, cls)
            assert len(ds) == 1 and ds["seq-1"].gt_traj[1] == [12, 11, 30, 30]
            assert ds.attr["ALL"] == ["seq-1"]

    def test_eval_parallel_matches_sequential(self, tmp_path):
        """--num N fans per-tracker evals over threads; results must merge
        to exactly the sequential output (ref bin/eval.py:39-48)."""
        import json

        from usot_tpu.cli.evaluate import _eval_parallel
        from usot_tpu.eval.benchmarks import OPEBenchmark
        from usot_tpu.eval.datasets import create_dataset

        rng = np.random.default_rng(5)
        gt = rng.uniform(5, 40, (12, 2)).tolist()
        meta = {"v1": {
            "video_dir": "v1",
            "init_rect": [10, 10, 30, 30],
            "img_names": [f"v1/{i:04d}.jpg" for i in range(12)],
            "gt_rect": [[g[0], g[1], 30, 30] for g in gt],
        }}
        (tmp_path / "OTBmini.json").write_text(json.dumps(meta))
        results = tmp_path / "results"
        for trk in ("trkA", "trkB", "trkC"):
            d = results / trk
            d.mkdir(parents=True)
            noise = rng.uniform(-3, 3, (12, 2))
            lines = [",".join(f"{v:.2f}" for v in
                              [g[0] + n[0], g[1] + n[1], 30, 30])
                     for g, n in zip(gt, noise)]
            (d / "v1.txt").write_text("\n".join(lines))

        ds = create_dataset("OTBmini", str(tmp_path))
        ds.set_tracker(str(results), ["trkA", "trkB", "trkC"])
        ope = OPEBenchmark(ds)
        seq = ope.eval_success(["trkA", "trkB", "trkC"])
        par = _eval_parallel(ope.eval_success, ["trkA", "trkB", "trkC"], 3)
        assert set(par) == set(seq)
        for t in seq:
            np.testing.assert_array_equal(par[t]["v1"], seq[t]["v1"])

    def test_eao_matches_toolkit_loop(self):
        """The restructured fragment bookkeeping must produce EAO
        identical to the VOT toolkit's per-tag loop (ref:
        pysot/evaluation/eao_benchmark.py:89-162), including the
        last-video seq_weight quirk and the NaN-handling asymmetry
        between broken and unbroken trajectories."""
        from usot_tpu.eval.benchmarks import EAOBenchmark

        rng = np.random.default_rng(11)

        class FakeVideo:
            def __init__(self, n):
                self.tags = {"all": [1] * n,
                             "occlusion": rng.integers(0, 2, n).tolist()}

            def select_tag(self, tag, start=0, end=0):
                return self.tags[tag][start:end]

        class FakeDataset(dict):
            pass

        n_frames = [40, 25, 33]
        videos = {f"v{i}": FakeVideo(n) for i, n in enumerate(n_frames)}
        ds = FakeDataset(videos)
        bench = EAOBenchmark.__new__(EAOBenchmark)
        bench.dataset = ds
        bench.skipping = 5
        bench.low, bench.high, bench.peak = 3, 30, 10
        bench.tags = ["all", "occlusion"]

        # synthetic overlaps with NaNs (burnin) and failures
        all_overlaps, all_failures, names, lens = [], [], [], []
        for i, n in enumerate(n_frames):
            ov = rng.uniform(0, 1, n)
            ov[:2] = np.nan
            all_overlaps.append(ov.tolist())
            all_failures.append([7, 20] if i != 1 else [])
            names.append(f"v{i}")
            lens.append(n)

        got = bench._eao_from_parts(names, lens, all_failures, all_overlaps,
                                    1, ["all", "occlusion"])
        want = self._toolkit_oracle(bench, names, lens, all_failures,
                                    all_overlaps, ["all", "occlusion"])
        for tag in ("all", "occlusion"):
            assert got[tag] == pytest.approx(want[tag], abs=1e-12)

    @staticmethod
    def _toolkit_oracle(bench, names, lens, fails, ovs, tags):
        """Literal transcription of the VOT toolkit per-tag fragment loop
        (ref: pysot/evaluation/eao_benchmark.py:89-162) as the numeric
        oracle for the restructured implementation."""
        fragment_num = sum(len(x) + 1 for x in fails)
        max_len = max(len(x) for x in ovs)
        seq_weight = 1.0  # one repetition per video
        eao = {}
        for tag in tags:
            fweights = np.full(fragment_num, np.nan)
            fragments = np.full((fragment_num, max_len), np.nan)
            seg = 0
            for name, traj_len, failures, overlaps in zip(names, lens,
                                                          fails, ovs):
                if len(failures) > 0:
                    points = [0] + [f + bench.skipping for f in failures
                                    if f + bench.skipping <= len(overlaps)]
                    for i in range(len(points)):
                        last = i == len(points) - 1
                        if not last:
                            frag = np.array(
                                overlaps[points[i]:points[i + 1] + 1])
                            fragments[seg, :] = 0
                        else:
                            frag = np.array(overlaps[points[i]:])
                        frag[np.isnan(frag)] = 0
                        fragments[seg, :len(frag)] = frag
                        if not last:
                            tv = bench.dataset[name].select_tag(
                                tag, points[i], points[i + 1] + 1)
                            w = sum(tv) / (points[i + 1] - points[i] + 1)
                        else:
                            tv = bench.dataset[name].select_tag(
                                tag, points[i], len(overlaps))
                            w = sum(tv) / (traj_len - points[i] + 1e-16)
                        fweights[seg] = seq_weight * w
                        seg += 1
                else:
                    m = min(len(overlaps), max_len)
                    fragments[seg, :m] = overlaps[:m]
                    tv = bench.dataset[name].select_tag(tag, 0, m)
                    fweights[seg] = seq_weight * sum(tv) / m
                    seg += 1
            from usot_tpu.eval.statistics import calculate_expected_overlap
            exp = calculate_expected_overlap(fragments, fweights)
            weight = np.zeros(len(exp))
            weight[bench.low - 1:bench.high] = 1
            ok = np.logical_not(np.isnan(exp))
            eao[tag] = np.sum(exp[ok] * weight[ok]) / np.sum(weight[ok])
        return eao

    def test_eao_radar(self, tmp_path):
        from usot_tpu.eval.visualization import draw_eao

        result = {"trk1": {"all": 0.3, "camera_motion": 0.25,
                           "occlusion": 0.2, "empty": 0.31},
                  "trk2": {"all": 0.2, "camera_motion": 0.22,
                           "occlusion": 0.1, "empty": 0.15}}
        out = tmp_path / "radar.png"
        draw_eao(result, str(out))
        assert out.exists() and out.stat().st_size > 0
        # bar-chart fallback for 'all'-only results
        out2 = tmp_path / "bar.png"
        draw_eao({"t": {"all": 0.3}}, str(out2))
        assert out2.exists()
