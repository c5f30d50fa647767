"""Benchmark test CLI (ref: scripts/test_usot.py).

Runs the tracker over a benchmark and writes raw result files in formats
bit-compatible with the reference:
  VOT:  var/result/<ds>/<arch>/baseline/<video>/<video>_001.txt with the
        1/poly/2 restart protocol and 5-frame skip
  GOT:  per-video dir + <video>_001.txt + <video>_time.txt
  else: var/result/<ds>/<arch>/<video>.txt (1-indexed x,y)
"""
from __future__ import annotations

import argparse
import os
import time
from os.path import join

import numpy as np

from usot_tpu.core.geometry import cxy_wh_2_rect, get_axis_aligned_bbox
from usot_tpu.data.benchmark import load_dataset
from usot_tpu.eval.polygon import poly_iou


def str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes", "y"):
        return True
    if v.lower() in ("false", "0", "no", "n"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="USOT-TPU testing")
    parser.add_argument("--arch", default="USOT")
    parser.add_argument("--resume", default="var/snapshot/USOT_star.pth")
    parser.add_argument("--dataset", default="VOT2018")
    parser.add_argument("--dataset_root", default=None)
    # NOT the reference's `type=bool` (scripts/test_usot.py:33), which
    # parses any non-empty string — including "False" — as True.
    parser.add_argument("--epoch_test", default=False, type=str2bool)
    parser.add_argument("--result_dir", default="var/result")
    parser.add_argument("--mem_size", default=4, type=int)
    parser.add_argument("--engine", default="parity",
                        choices=["parity", "scan", "batch"],
                        help="parity: host loop (reference-exact); "
                             "scan: on-device lax.scan fast path; "
                             "batch: multiple videos in lockstep (non-VOT)")
    parser.add_argument("--chunk", default=32, type=int)
    parser.add_argument("--roi", default="0",
                        help="ROI streaming side length for the batch "
                        "engine (0 = full frames, 'auto' = sized from "
                        "the group's search windows); uploads only a "
                        "window around each target with exactness replay "
                        "— cuts H2D bytes ~3x+ on slow host links")
    parser.add_argument("--roi-chunk", default=0, type=int,
                        help="ROI dispatch granularity (0 = --chunk). "
                        "Shorter chunks shrink the drift headroom the "
                        "ROI must cover, hence bytes on the wire")
    parser.add_argument("--batch", default=8, type=int,
                        help="videos per lockstep group (engine=batch)")
    parser.add_argument("--refill", default=1, type=int,
                        help="engine=batch, non-VOT: refill finished "
                        "lanes with pending videos at chunk boundaries "
                        "(longest-first scheduling); 0 = fixed padded "
                        "groups (required for --roi)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="model compute dtype (scan/batch engines)")
    parser.add_argument("--width", default=64, type=int,
                        help="backbone stage width base (dev-scale models)")
    parser.add_argument("--channels", default=256, type=int,
                        help="neck/head channels (dev-scale models)")
    return parser.parse_args(argv)


def track_video(tracker, runner, video, args):
    start_frame, toc = 0, 0.0

    if args.epoch_test:
        suffix = os.path.splitext(os.path.basename(args.resume))[0]
        tracker_path = join(args.result_dir, args.dataset, args.arch + suffix)
    else:
        tracker_path = join(args.result_dir, args.dataset, args.arch)
    os.makedirs(tracker_path, exist_ok=True)

    if "VOT" in args.dataset:
        video_path = join(tracker_path, "baseline", video["name"])
        os.makedirs(video_path, exist_ok=True)
        result_path = join(video_path, video["name"] + "_001.txt")
    elif "GOT" in args.dataset:
        video_path = join(tracker_path, video["name"])
        os.makedirs(video_path, exist_ok=True)
        result_path = join(video_path, video["name"] + "_001.txt")
        time_path = join(video_path, f"{video['name']}_time.txt")
    else:
        result_path = join(tracker_path, f"{video['name']}.txt")

    if os.path.exists(result_path):
        return

    import cv2

    regions = []
    track_times = []
    image_files, gt = video["image_files"], video["gt"]
    state = None
    for f, image_file in enumerate(image_files):
        im = cv2.imread(image_file)
        if im is None:
            continue
        if len(im.shape) == 2:
            im = cv2.cvtColor(im, cv2.COLOR_GRAY2BGR)

        tic = time.perf_counter()
        if f == start_frame:
            cx, cy, w, h = get_axis_aligned_bbox(np.asarray(gt[f]))
            target_pos = np.array([cx, cy])
            target_sz = np.array([w, h])
            state = tracker.init(im, target_pos, target_sz, runner)
            location = cxy_wh_2_rect(state["target_pos"], state["target_sz"])
            regions.append(1 if "VOT" in args.dataset else gt[f])
        elif f > start_frame:
            state = tracker.track(state, im)
            location = cxy_wh_2_rect(state["target_pos"], state["target_sz"])
            b_overlap = poly_iou(np.asarray(gt[f]), location) \
                if "VOT" in args.dataset else 1
            if b_overlap > 0:
                regions.append(location)
            else:
                regions.append(2)
                start_frame = f + 5
        else:
            regions.append(0)
        dt = time.perf_counter() - tic
        toc += dt
        if "GOT" in args.dataset:
            track_times.append(dt)

    with open(result_path, "w") as fin:
        if "VOT" in args.dataset:
            for x in regions:
                if isinstance(x, int):
                    fin.write("{:d}\n".format(x))
                else:
                    fin.write(",".join(str(i) for i in x) + "\n")
        else:
            for x in regions:
                bbox = list(np.asarray(x).ravel())
                fin.write(",".join(
                    str(i + 1) if idx in (0, 1) else str(i)
                    for idx, i in enumerate(bbox)) + "\n")

    if "GOT" in args.dataset:
        with open(time_path, "w") as fh:
            for x in track_times:
                fh.write(f"{x:.6f}\n")

    print("Video: {:12s} Time: {:2.1f}s Speed: {:3.1f}fps".format(
        video["name"], toc, f / max(toc, 1e-9)))


def _get_scan_engine(engines, model, variables, args, canvas_h, canvas_w,
                     im_h, im_w, target_sz):
    """Per-(canvas bucket, instance size) ScanEngine cache. The instance
    size is re-chosen at every init from the target area, as the
    reference does (ref: lib/tracker/usot_tracker.py init)."""
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import ScanEngine

    p = TrackerConfig()
    small = ((target_sz[0] * target_sz[1])
             / float(im_h * im_w)) >= 0.004
    p.instance_size = p.small_sz if small else p.big_sz
    p.renew()
    p.sf_size = p.score_size
    key = (canvas_h, canvas_w, p.instance_size)
    if key not in engines:
        # fixed carry capacity: one compile per (bucket, instance)
        engines[key] = ScanEngine(
            model, variables, p, im_h=canvas_h, im_w=canvas_w,
            max_frames=4096, chunk=args.chunk)
    return engines[key]


def _scan_vot_loop(model, variables, runner, engines, args, frames, padded,
                   gt, regions, start_frame, is_vot):
    """The scan-engine restart loop over one video, writing into
    `regions` from `start_frame` onward (restart protocol: ref
    test_usot.py:85-103). Shared by track_video_scan (start_frame=0) and
    by the batched VOT path's instance-size spills (a restart whose
    re-chosen big/small search size differs from the lockstep group's is
    finished here)."""
    n = len(frames)
    im_h, im_w = frames[0].shape[:2]
    canvas_h, canvas_w = padded.shape[1:3]
    while start_frame < n:
        cx, cy, w, h = get_axis_aligned_bbox(np.asarray(gt[start_frame]))
        engine = _get_scan_engine(engines, model, variables, args,
                                  canvas_h, canvas_w, im_h, im_w, (w, h))
        state = engine.init_state(frames[start_frame],
                                  np.array([cx, cy]), np.array([w, h]),
                                  _runner_of(engine, model, variables))
        regions[start_frame] = 1 if is_vot else gt[start_frame]
        if start_frame + 1 >= n:
            break

        def consume(chunk):
            """D2H + overlap-check one chunk; returns failure frame or
            None. Fills `regions` as a side effect."""
            off, nb, outs = chunk
            pos = np.asarray(outs[0][:nb])
            sz = np.asarray(outs[1][:nb])
            for i in range(nb):
                f = start_frame + 1 + off + i
                location = np.array([pos[i][0] - sz[i][0] / 2,
                                     pos[i][1] - sz[i][1] / 2,
                                     sz[i][0], sz[i][1]], np.float64)
                if is_vot and poly_iou(np.asarray(gt[f]), location) <= 0:
                    regions[f] = 2
                    return f
                regions[f] = location
            return None

        # Chunked early-exit with one-chunk lookahead: chunk i+1 is
        # dispatched before chunk i is read back (upload overlaps
        # compute), so a VOT failure wastes at most one chunk instead of
        # the whole remaining video (restart protocol:
        # ref test_usot.py:85-103).
        failure_at = None
        pending = None
        for off, nb, state, outs in engine.iter_chunks(
                state, padded[start_frame + 1:], im_hw=(im_h, im_w)):
            if pending is not None:
                failure_at = consume(pending)
                pending = None
                if failure_at is not None:
                    break
            pending = (off, nb, outs)
        if failure_at is None and pending is not None:
            failure_at = consume(pending)
        if failure_at is None:
            break
        for f in range(failure_at + 1, min(failure_at + 5, n)):
            regions[f] = 0
        start_frame = failure_at + 5


def _write_regions(result_path, regions, is_vot):
    with open(result_path, "w") as fin:
        for x in regions:
            if x is None:
                fin.write("0\n")
            elif isinstance(x, int):
                fin.write("{:d}\n".format(x))
            elif is_vot:
                fin.write(",".join(str(i) for i in np.asarray(x).ravel())
                          + "\n")
            else:
                bbox = list(np.asarray(x).ravel())
                fin.write(",".join(
                    str(i + 1) if idx in (0, 1) else str(i)
                    for idx, i in enumerate(bbox)) + "\n")


def _load_frames_padded(image_files):
    """Decode a video and pad onto a 128-px canvas bucket. The engine
    treats the valid image size as a traced input, so one compile serves
    every resolution in the bucket."""
    import cv2

    frames = []
    for f in image_files:
        im = cv2.imread(f)
        if im is not None and len(im.shape) == 2:
            im = cv2.cvtColor(im, cv2.COLOR_GRAY2BGR)
        frames.append(im)
    n = len(frames)
    im_h, im_w = frames[0].shape[:2]
    canvas_h = (im_h + 127) // 128 * 128
    canvas_w = (im_w + 127) // 128 * 128
    padded = np.zeros((n, canvas_h, canvas_w, 3), np.uint8)
    for fi, im in enumerate(frames):
        padded[fi, :im.shape[0], :im.shape[1]] = im
    # frames as zero-copy views into the canvas
    frames = [padded[fi, :frames[fi].shape[0], :frames[fi].shape[1]]
              for fi in range(n)]
    return frames, padded


def track_video_scan(model, variables, runner, video, args, engines):
    """Fast path: whole-video on-device scan; VOT restarts re-enter the
    scan from frame f+5 with a fresh init (host checks overlaps)."""
    if args.epoch_test:
        suffix = os.path.splitext(os.path.basename(args.resume))[0]
        tracker_path = join(args.result_dir, args.dataset, args.arch + suffix)
    else:
        tracker_path = join(args.result_dir, args.dataset, args.arch)
    os.makedirs(tracker_path, exist_ok=True)
    is_vot = "VOT" in args.dataset
    is_got = "GOT" in args.dataset
    if is_vot:
        video_path = join(tracker_path, "baseline", video["name"])
        os.makedirs(video_path, exist_ok=True)
        result_path = join(video_path, video["name"] + "_001.txt")
    elif is_got:
        video_path = join(tracker_path, video["name"])
        os.makedirs(video_path, exist_ok=True)
        result_path = join(video_path, video["name"] + "_001.txt")
    else:
        result_path = join(tracker_path, f"{video['name']}.txt")
    if os.path.exists(result_path):
        return

    frames, padded = _load_frames_padded(video["image_files"])
    n = len(frames)
    t0 = time.perf_counter()
    regions = [None] * n
    _scan_vot_loop(model, variables, runner, engines, args, frames, padded,
                   video["gt"], regions, 0, is_vot)
    _write_regions(result_path, regions, is_vot)
    toc = time.perf_counter() - t0
    if is_got:
        # GOT-10k layout wants per-frame times; the chunked scan has no
        # per-frame host timing, so record the amortized per-frame time
        with open(join(video_path, f"{video['name']}_time.txt"), "w") as fh:
            for _ in range(n):
                fh.write(f"{toc / max(n, 1):.6f}\n")
    print("Video: {:12s} Time: {:2.1f}s Speed: {:3.1f}fps".format(
        video["name"], toc, (n - 1) / max(toc, 1e-9)))


def _probe_groups(dataset, tracker_path, result_of):
    """Group pending benchmark videos by (canvas bucket, instance size):
    one compiled lockstep program per group."""
    import cv2

    from usot_tpu.tracker.config import TrackerConfig

    def bucket_of(h, w):
        # round canvas up to 128-px buckets to bound recompiles
        return ((h + 127) // 128 * 128, (w + 127) // 128 * 128)

    groups: dict = {}
    for name in dataset:
        video = dataset[name]
        if os.path.exists(result_of(video)):
            continue
        im0 = cv2.imread(video["image_files"][0])
        cx, cy, w, h = get_axis_aligned_bbox(np.asarray(video["gt"][0]))
        p_probe = TrackerConfig()
        small = ((w * h) / float(im0.shape[0] * im0.shape[1])) >= 0.004
        instance = p_probe.small_sz if small else p_probe.big_sz
        key = bucket_of(im0.shape[0], im0.shape[1]) + (instance,)
        groups.setdefault(key, []).append(name)
    return groups


def _make_batch_engine(engines, model, variables, instance, ch, cw, b,
                       args, max_frames=4096):
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.engine import BatchScanEngine

    ekey = (ch, cw, instance, b)
    if ekey not in engines:
        p = TrackerConfig()
        p.instance_size = instance
        p.renew()
        p.sf_size = p.score_size
        engines[ekey] = BatchScanEngine(
            model, variables, p, canvas_h=ch, canvas_w=cw, batch=b,
            max_frames=max_frames, chunk=args.chunk)
    return engines[ekey]


def _load_group_canvases(dataset, names, ch, cw):
    """Decode + pad every video of a group. Returns (canvases, hws)
    where canvases[v] is (n_v, ch, cw, 3) uint8 with the real frames
    top-left and hws[v] = (h, w)."""
    import cv2

    canvases, hws = [], []
    for name in names:
        video = dataset[name]
        frames = []
        for fpath in video["image_files"]:
            im = cv2.imread(fpath)
            if im is None:
                continue
            if len(im.shape) == 2:
                im = cv2.cvtColor(im, cv2.COLOR_GRAY2BGR)
            frames.append(im)
        canvas = np.zeros((len(frames), ch, cw, 3), np.uint8)
        for fi, im in enumerate(frames):
            canvas[fi, :im.shape[0], :im.shape[1]] = im
        canvases.append(canvas)
        hws.append((frames[0].shape[0], frames[0].shape[1]))
    return canvases, hws


def track_dataset_batched(model, variables, runner, dataset, args):
    """Lockstep batched eval over a whole benchmark (non-VOT protocols):
    videos grouped by (canvas bucket, instance size) and tracked B lanes
    at a time with BatchScanEngine (BASELINE config 4).

    With --refill (default), videos are sorted longest-first and a
    finished lane is re-initialized with the next pending video at a
    chunk boundary (tracker/lockstep.run_refill_group), so skew-length
    benchmarks are not padding-bound to the group max. --refill 0 keeps
    the fixed-group padding path (supports --roi streaming)."""
    if args.epoch_test:
        suffix = os.path.splitext(os.path.basename(args.resume))[0]
        tracker_path = join(args.result_dir, args.dataset, args.arch + suffix)
    else:
        tracker_path = join(args.result_dir, args.dataset, args.arch)
    os.makedirs(tracker_path, exist_ok=True)

    groups = _probe_groups(
        dataset, tracker_path,
        lambda v: join(tracker_path, f"{v['name']}.txt"))
    engines: dict = {}

    def write_result(name, pos, sz):
        video = dataset[name]
        n = len(pos)
        rects = [np.asarray(video["gt"][0], np.float64).ravel()]
        for f in range(n):
            rects.append(np.array(
                [pos[f, 0] - sz[f, 0] / 2, pos[f, 1] - sz[f, 1] / 2,
                 sz[f, 0], sz[f, 1]], np.float64))
        result_path = join(tracker_path, f"{video['name']}.txt")
        with open(result_path, "w") as fin:
            for x in rects:
                bbox = list(np.asarray(x).ravel())
                fin.write(",".join(
                    str(v + 1) if idx in (0, 1) else str(v)
                    for idx, v in enumerate(bbox)) + "\n")

    roi_on = args.roi == "auto" or int(args.roi) != 0
    if args.refill and not roi_on:  # ROI streaming rides the padded path
        from usot_tpu.tracker.lockstep import run_refill_group

        for (ch, cw, instance), names in groups.items():
            t0 = time.perf_counter()
            canvases, hws = _load_group_canvases(dataset, names, ch, cw)
            videos = []
            for vi, name in enumerate(names):
                cx, cy, w, h = get_axis_aligned_bbox(
                    np.asarray(dataset[name]["gt"][0]))
                videos.append(dict(
                    name=name, canvas=canvases[vi], h=hws[vi][0],
                    w=hws[vi][1], init_pos=np.array([cx, cy]),
                    init_sz=np.array([w, h])))
            b = min(args.batch, len(names))
            engine = _make_batch_engine(engines, model, variables,
                                        instance, ch, cw, b, args)
            results = run_refill_group(engine, runner, videos)
            total = 0
            for name in names:
                pos, sz, _ = results[name]
                write_result(name, pos, sz)
                total += len(pos) + 1
            dt = time.perf_counter() - t0
            print("Refill group of {:d} videos ({:d} frames, {:d} lanes):"
                  " {:.1f}s -> {:.1f} fps aggregate".format(
                      len(names), total, b, dt, total / max(dt, 1e-9)))
        return

    for (ch, cw, instance), names in groups.items():
        for i in range(0, len(names), args.batch):
            group = names[i:i + args.batch]
            b = len(group)
            engine = _make_batch_engine(engines, model, variables,
                                        instance, ch, cw, b, args)

            t0 = time.perf_counter()
            canvases, hws = _load_group_canvases(dataset, group, ch, cw)
            vids, n_valid = [], []
            for vi, name in enumerate(group):
                cx, cy, w, h = get_axis_aligned_bbox(
                    np.asarray(dataset[name]["gt"][0]))
                vids.append((canvases[vi][0][:hws[vi][0], :hws[vi][1]],
                             np.array([cx, cy]), np.array([w, h])))
                n_valid.append(len(canvases[vi]) - 1)

            max_n = max(len(c) for c in canvases) - 1
            batch_frames = np.zeros((b, max_n, ch, cw, 3), np.uint8)
            for vi, canvas in enumerate(canvases):
                batch_frames[vi, :canvas.shape[0] - 1] = canvas[1:]

            state = engine.init_batch(vids, runner)
            roi_chunk = args.roi_chunk or None
            roi = engine.suggest_roi(state, chunk=roi_chunk) \
                if args.roi == "auto" else int(args.roi)
            if roi:
                state, pos, sz, score = engine.track_batch_roi(
                    state, batch_frames, n_valid=np.asarray(n_valid),
                    roi=roi, chunk=roi_chunk)
            else:
                state, pos, sz, score = engine.track_batch(
                    state, batch_frames, n_valid=np.asarray(n_valid))

            total_frames = 0
            for vi, name in enumerate(group):
                n = n_valid[vi]
                write_result(name, pos[vi, :n], sz[vi, :n])
                total_frames += n + 1
            dt = time.perf_counter() - t0
            print("Group of {:d} videos ({:d} frames): {:.1f}s "
                  "-> {:.1f} fps aggregate".format(
                      b, total_frames, dt, total_frames / max(dt, 1e-9)))


def track_dataset_vot_batched(model, variables, runner, dataset, args):
    """Lockstep batched VOT eval WITH the restart protocol: grouped
    lanes, host-checked overlaps, per-lane re-init splice + chunk replay
    (tracker/lockstep.run_vot_group). Restarts that flip the big/small
    instance size are spilled to the scan engine, which finishes the
    video from the spill frame — identical protocol semantics to
    --engine scan (ref: scripts/test_usot.py:85-103)."""
    from usot_tpu.tracker.config import TrackerConfig
    from usot_tpu.tracker.lockstep import run_vot_group

    if args.epoch_test:
        suffix = os.path.splitext(os.path.basename(args.resume))[0]
        tracker_path = join(args.result_dir, args.dataset, args.arch + suffix)
    else:
        tracker_path = join(args.result_dir, args.dataset, args.arch)
    os.makedirs(tracker_path, exist_ok=True)

    def result_of(video):
        return join(tracker_path, "baseline", video["name"],
                    video["name"] + "_001.txt")

    groups = _probe_groups(dataset, tracker_path, result_of)
    engines: dict = {}
    scan_engines: dict = {}
    p_probe = TrackerConfig()

    for (ch, cw, instance), names in groups.items():
        for i in range(0, len(names), args.batch):
            group = names[i:i + args.batch]
            b = len(group)
            t0 = time.perf_counter()
            canvases, hws = _load_group_canvases(dataset, group, ch, cw)
            gts = [dataset[name]["gt"] for name in group]
            engine = _make_batch_engine(engines, model, variables,
                                        instance, ch, cw, b, args,
                                        max_frames=2048)
            results = run_vot_group(
                engine, runner, canvases, hws, gts, instance,
                small_sz=p_probe.small_sz, big_sz=p_probe.big_sz)

            total_frames = 0
            for vi, name in enumerate(group):
                res = results[vi]
                if res.spill_from is not None:
                    print(f"spill: {name} re-init at frame "
                          f"{res.spill_from} flipped the instance size; "
                          "finishing on the scan engine")
                    # finish at the other instance size on the scan path
                    h, w = hws[vi]
                    frames = [canvases[vi][fi, :h, :w]
                              for fi in range(len(canvases[vi]))]
                    _scan_vot_loop(model, variables, runner, scan_engines,
                                   args, frames, canvases[vi], gts[vi],
                                   res.regions, res.spill_from, True)
                video_path = join(tracker_path, "baseline", name)
                os.makedirs(video_path, exist_ok=True)
                _write_regions(join(video_path, name + "_001.txt"),
                               res.regions, True)
                total_frames += len(res.regions)
            dt = time.perf_counter() - t0
            print("VOT group of {:d} videos ({:d} frames): {:.1f}s "
                  "-> {:.1f} fps aggregate".format(
                      b, total_frames, dt, total_frames / max(dt, 1e-9)))


_RUNNER_CACHE = {}


def _runner_of(engine, model, variables):
    from usot_tpu.tracker.runner import ModelRunner

    key = id(variables)
    if key not in _RUNNER_CACHE:
        _RUNNER_CACHE[key] = ModelRunner(model, variables)
    return _RUNNER_CACHE[key]


def main(argv=None):
    from usot_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax

    from usot_tpu.models.usot import build_usot, init_variables
    from usot_tpu.tracker.runner import ModelRunner
    from usot_tpu.tracker.tracker import USOTTracker
    from usot_tpu.train.checkpoint import load_variables

    args = parse_args(argv)

    import jax.numpy as jnp

    model = build_usot(mem_size=args.mem_size,
                       width=args.width, channels=args.channels,
                       dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                       else jnp.float32,
                       # fused Pallas GroupDW: measured 24.3 -> 22.4
                       # ms/step at B=32 (PERF_NOTES.md); interpret-mode
                       # on CPU is test-only slow, so gate by backend
                       fused_xcorr=jax.default_backend() == "tpu",
                       # exact s2b rewrite of the dilated layer3 convs:
                       # bit-identical and a ~3% win on the ISOLATED
                       # backbone (tools/ab_backbone_s2b.py), but NEGATIVE
                       # on the full tracking step (1952.7 -> 1846.6 fps
                       # staged; its reshape/transposes break XLA's fusion
                       # with the neck crop, PERF_NOTES.md "space-to-batch
                       # dilated layer3") — off, matching bench.py.
                       # USOT_S2B=1 re-enables for A/B.
                       s2b_dilated=os.environ.get("USOT_S2B") == "1"
                       and jax.default_backend() == "tpu")
    if args.resume and os.path.exists(args.resume):
        variables = load_variables(args.resume)
    else:
        print(f"warning: checkpoint {args.resume} not found; random init")
        variables = init_variables(model, jax.random.PRNGKey(0))
        # fresh BN stats are degenerate (var=1 around uncentered
        # activations -> exp() overflow in the bbox decode -> NaN
        # trajectories); calibrate so smoke runs stay finite
        from usot_tpu.models.calibrate import calibrate_batch_stats
        variables = calibrate_batch_stats(model, variables, n_iter=10)
    runner = ModelRunner(model, variables)

    dataset = load_dataset(args.dataset, args.dataset_root)
    tracker = USOTTracker()
    engines: dict = {}

    if args.engine == "batch":
        if "VOT" in args.dataset:
            track_dataset_vot_batched(model, variables, runner, dataset,
                                      args)
            return
        if "GOT" in args.dataset:
            raise SystemExit("engine=batch writes OTB-style result files; "
                             "use --engine scan for the GOT-10k layout")
        track_dataset_batched(model, variables, runner, dataset, args)
        return

    for name in list(dataset.keys()):
        if args.engine == "scan":
            track_video_scan(model, variables, runner, dataset[name], args,
                             engines)
        else:
            track_video(tracker, runner, dataset[name], args)


if __name__ == "__main__":
    main()
