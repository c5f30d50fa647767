"""TraX protocol + VOT wrapper tests.

Unit-tests the in-repo TraX v3 speaker (region encodings, message
framing), then drives `cli/vot_wrapper.run(region_format="mask")` END TO
END over real pipes: a stub toolkit server (this test) performs the
hello/initialize/frame/state/quit exchange with the wrapper running as a
subprocess — the full loop the vot-toolkit would exercise
(ref: scripts/vot.py:26-121; VERDICT r3 next #6)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from usot_tpu.eval import trax_protocol as tp


class TestRegionEncodings:
    def test_rectangle_roundtrip(self):
        r = tp.Rectangle.create(1.5, 2.0, 30.0, 40.0)
        d = tp.decode_region(tp.encode_region(r))
        assert isinstance(d, tp.Rectangle)
        assert d.bounds() == (1.5, 2.0, 30.0, 40.0)

    def test_polygon_roundtrip(self):
        p = tp.Polygon.create([(1, 2), (3, 4), (5, 6)])
        d = tp.decode_region(tp.encode_region(p))
        assert isinstance(d, tp.Polygon)
        assert list(d) == [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]

    def test_mask_rle_roundtrip(self):
        rng = np.random.default_rng(0)
        m = (rng.random((13, 17)) > 0.6).astype(np.uint8)
        d = tp.decode_region(tp.encode_region(tp.Mask.create(m)))
        assert isinstance(d, tp.Mask)
        np.testing.assert_array_equal(d.mask, m)

    def test_mask_offset_full_array(self):
        m = np.ones((2, 3), np.uint8)
        d = tp.Mask.create(m, offset=(4, 5))
        full = d.array(full=True, size=(10, 9))   # (w, h)
        assert full.shape == (9, 10)
        assert full[5:7, 4:7].all() and full.sum() == 6

    def test_mask_all_zero_and_all_one(self):
        for m in (np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8)):
            d = tp.decode_region(tp.encode_region(tp.Mask.create(m)))
            np.testing.assert_array_equal(d.mask, m)


class TestMessageFraming:
    def test_roundtrip_with_quotes_and_props(self):
        line = tp.format_message(
            "state", ("10,20,30,40",), {"confidence": 0.75})
        mtype, args, props = tp.parse_message(line)
        assert mtype == "state"
        assert args == ["10,20,30,40"]
        assert props == {"confidence": "0.75"}

    def test_escaped_path(self):
        line = tp.format_message("frame", ('/tmp/a "b"/img.jpg',))
        _, args, _ = tp.parse_message(line)
        assert args == ['/tmp/a "b"/img.jpg']

    def test_non_trax_line_ignored(self):
        assert tp.parse_message("some stray stdout noise") is None


class _StubToolkit:
    """Minimal toolkit side of the TraX exchange over a subprocess's
    stdio (what vot-toolkit does when it launches a tracker)."""

    def __init__(self, proc):
        self.proc = proc

    def expect(self, mtype):
        while True:
            line = self.proc.stdout.readline()
            assert line, f"tracker closed the pipe awaiting {mtype}"
            msg = tp.parse_message(line)
            if msg is None:
                continue        # tracker's own prints are tolerated
            assert msg[0] == mtype, f"expected {mtype}, got {msg}"
            return msg

    def send(self, mtype, args=(), props=None):
        self.proc.stdin.write(tp.format_message(mtype, args, props) + "\n")
        self.proc.stdin.flush()


@pytest.mark.slow
class TestWrapperEndToEnd:
    def test_mask_protocol_loop(self, tmp_path):
        import cv2

        from test_tracker import synthetic_video

        frames, centers = synthetic_video(n_frames=4)
        paths = []
        for i, im in enumerate(frames):
            fp = str(tmp_path / f"{i:04d}.jpg")
            cv2.imwrite(fp, im)
            paths.append(fp)
        H, W = frames[0].shape[:2]
        cx, cy = centers[0]
        init_mask = np.zeros((H, W), np.uint8)
        init_mask[cy - 24:cy + 24, cx - 24:cx + 24] = 1

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("JAX_PLATFORM_NAME", None)
        stderr_log = open(tmp_path / "wrapper.err", "w")
        proc = subprocess.Popen(
            [sys.executable, "-m", "usot_tpu.cli.vot_wrapper",
             "nonexistent.ckpt", "mask", "--width", "8",
             "--channels", "32", "--mem_size", "2"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=stderr_log, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        try:
            toolkit = _StubToolkit(proc)
            _, _, hello = toolkit.expect("hello")
            assert "mask" in hello.get("trax.region", "")
            assert hello.get("trax.image", "").startswith("path")

            toolkit.send("initialize",
                         (paths[0],
                          tp.encode_region(tp.Mask.create(init_mask))))
            # wrapper echoes the init region as its first status
            toolkit.expect("state")

            reports = []
            for fp in paths[1:]:
                toolkit.send("frame", (fp,))
                _, args, props = toolkit.expect("state")
                region = tp.decode_region(args[0])
                assert isinstance(region, tp.Mask)
                full = region.array(full=True, size=(W, H))
                assert full.shape == (H, W)
                assert full.sum() > 0, "empty mask report"
                assert "confidence" in props
                reports.append(full)
            toolkit.send("quit")
            toolkit.expect("quit")
            assert proc.wait(timeout=120) == 0
        finally:
            stderr_log.close()
            if proc.poll() is None:
                proc.kill()
