"""Lockstep batched protocol drivers: VOT restart + lane refill.

BatchScanEngine tracks B videos in lockstep on-device; this module puts
the two HOST-side benchmark protocols on top of it:

- **VOT restart** (ref: scripts/test_usot.py:85-103): when the predicted
  box stops overlapping the ground truth, write 2, skip 5 frames, then
  re-initialize from the ground truth. Batched form: every chunk's
  trajectories are consumed on the host and checked per lane; a failed
  lane gets a fresh init SPLICED into its carry lane
  (BatchScanEngine.splice_lane) and the chunk is REPLAYED from the saved
  pre-chunk carry. Replays are deterministic for unaffected lanes (same
  program, same inputs), so no lane-blend pass over the multi-GB rings
  is needed — the cost of a restart is one extra chunk dispatch. This
  makes the lockstep throughput hold on USOT's flagship VOT protocol
  instead of only on OPE-style no-reset runs.

- **Lane refill**: non-VOT benchmarks have 10:1 video-length skew
  (LaSOT: 1k-10k frames); padding every lane of a lockstep group to the
  group max wastes most of the batch on finished lanes. Here videos are
  sorted longest-first and a finished lane is re-initialized with the
  next pending video at a chunk boundary. Refill decisions depend only
  on host-known video lengths, so the chunk pipeline never syncs — the
  splice dispatches simply interleave with the chunk dispatches.

Both protocols share the engine's lane-splice surgery, which re-inits a
lane through the SAME B=1 model passes as a fresh ScanEngine (restart
parity with the single-video scan path).
"""
from __future__ import annotations

from typing import Callable

import numpy as np

from usot_tpu.core.geometry import get_axis_aligned_bbox
from usot_tpu.eval.polygon import poly_iou


def _flat_block(canvases, lane_vids, lane_next, n_frames, chunk, ch, cw):
    """Assemble one (T, B, ch, cw*3) uint8 block from per-lane videos.

    canvases[v]: (n_v, ch, cw, 3) padded frames; lane_vids[b]: video id
    or -1 (idle lane); lane_next[b]: the lane's next local frame index.
    Frames past a video's end repeat its last frame (padding only —
    masked invalid by the caller)."""
    b = len(lane_vids)
    block = np.zeros((chunk, b, ch, cw * 3), np.uint8)
    for lane in range(b):
        v = lane_vids[lane]
        if v < 0:
            continue
        canv = canvases[v]
        n = n_frames[v]
        f0 = lane_next[lane]
        hi = min(f0 + chunk, n)
        k = max(hi - f0, 0)
        if k > 0:
            block[:k, lane] = canv[f0:hi].reshape(k, ch, cw * 3)
        if k < chunk:
            block[k:, lane] = canv[min(max(hi - 1, 0), n - 1)].reshape(
                ch, cw * 3)
    return block


# ---------------------------------------------------------------------
# VOT restart protocol
# ---------------------------------------------------------------------

class VOTLaneResult:
    """Per-video protocol outcome: the regions list in reference result-
    file semantics (1 init / bbox rows / 2 failure / 0 skipped), plus an
    optional spill point (instance-size flip on restart: the remainder
    must be tracked by a scan engine at the other instance size)."""

    def __init__(self, n):
        self.regions = [None] * n
        self.spill_from = None  # frame index to hand to the scan path


def stage_vot_blocks(engine, canvases):
    """Pre-upload every chunk's frame block for `run_vot_group` into HBM
    and fence the uploads. Lanes are pinned to videos (absolute == local
    frame index), so the blocks are restart-independent and a benchmark
    can reuse them across repeated protocol runs — isolating chip
    protocol throughput from host-link bandwidth (the staged-vs-streaming
    methodology of bench.py; see PERF_NOTES.md)."""
    import jax

    chunk, ch, cw = engine.chunk, engine.im_h, engine.im_w
    b = len(canvases)
    n_frames = [len(c) for c in canvases]
    staged = {}
    for cs in range(1, max(n_frames), chunk):
        block = _flat_block(canvases, list(range(b)), [cs] * b,
                            n_frames, chunk, ch, cw)
        staged[cs] = jax.device_put(block)
    for blk in staged.values():  # true upload fence (see stage_frames)
        np.asarray(blk[0, 0, 0, :1])
    return staged


def run_vot_group(engine, runner, canvases, hws, gts, instance_size,
                  small_sz_thresh: float = 0.004,
                  small_sz: int = 0, big_sz: int = 0,
                  stage: bool = False, staged_blocks: dict = None):
    """Track one lockstep group of VOT videos with the restart protocol.

    engine: BatchScanEngine with batch == len(canvases).
    canvases[v]: (n_v, ch, cw, 3) uint8, real frames top-left.
    hws[v]: (h, w) true frame size. gts[v]: per-frame ground truth
    (4-number rect or 8-number polygon rows).
    instance_size: the engine's search size; a restart whose re-chosen
    instance size differs is SPILLED (VOTLaneResult.spill_from) for the
    caller to finish on the matching scan engine — the reference
    re-chooses big/small at every init (ref: lib/tracker/usot_tracker.py
    init; scripts/test_usot.py re-init loop).

    stage=True pre-uploads every chunk's frame block into HBM before the
    protocol loop (see `stage_vot_blocks`); `staged_blocks` passes in
    blocks staged once by the caller so repeated runs don't re-upload.
    Either way replays reuse the staged block — this measures chip
    protocol throughput rather than host-link bandwidth (same
    staged-vs-streaming methodology as bench.py; see PERF_NOTES.md).

    Returns list[VOTLaneResult]. Protocol semantics match the
    single-video scan path (cli/test.py track_video_scan) frame by
    frame: regions[init]=1, failures regions[f]=2, then 4 zeros, re-init
    at f+5.
    """
    b = len(canvases)
    assert b == engine.batch
    chunk = engine.chunk
    ch, cw = engine.im_h, engine.im_w
    n_frames = [len(c) for c in canvases]
    max_n = max(n_frames)
    results = [VOTLaneResult(n) for n in n_frames]

    # --- initial init (batched model passes; 2 dispatches for B lanes)
    videos = []
    for v in range(b):
        cx, cy, w, h = get_axis_aligned_bbox(np.asarray(gts[v][0]))
        im0 = canvases[v][0][:hws[v][0], :hws[v][1]]
        videos.append((im0, np.array([cx, cy]), np.array([w, h])))
        results[v].regions[0] = 1
    state = engine.init_batch(videos, runner)

    # --- per-lane protocol bookkeeping (host ints)
    MODE_TRACK, MODE_AWAIT, MODE_DONE = 0, 1, 2
    mode = [MODE_TRACK if n > 1 else MODE_DONE for n in n_frames]
    resume = [1] * b        # first actively-tracked frame index
    consumed = [0] * b      # last frame whose region is written
    await_r = [0] * b       # pending re-init frame (MODE_AWAIT)

    def pick_instance(v, r):
        cx, cy, w, h = get_axis_aligned_bbox(np.asarray(gts[v][r]))
        area = (w * h) / float(hws[v][0] * hws[v][1])
        return (small_sz if area >= small_sz_thresh else big_sz), \
            (cx, cy, w, h)

    def do_splice(st, v, r):
        """Re-init lane v at frame r into carry `st`. Returns
        (st, resumed: bool)."""
        inst, (cx, cy, w, h) = pick_instance(v, r)
        if inst != instance_size:
            results[v].spill_from = r
            mode[v] = MODE_DONE
            return st, False
        results[v].regions[r] = 1
        consumed[v] = r
        if r + 1 >= n_frames[v]:
            mode[v] = MODE_DONE          # init on the last frame: done
            return st, False
        im = canvases[v][r][:hws[v][0], :hws[v][1]]
        lane = engine.make_lane_state(im, np.array([cx, cy], float),
                                      np.array([w, h], float), runner)
        st = engine.splice_lane(st, v, lane)
        mode[v] = MODE_TRACK
        resume[v] = r + 1
        return st, True

    staged = staged_blocks if staged_blocks is not None else {}
    if stage and staged_blocks is None:
        staged = stage_vot_blocks(engine, canvases)
    stage = stage or staged_blocks is not None

    for cs in range(1, max_n, chunk):
        ce = min(cs + chunk, max_n)
        # restarts whose resume frame falls inside (or before) this chunk
        for v in range(b):
            if mode[v] == MODE_AWAIT and await_r[v] + 1 < cs + chunk:
                state, _ = do_splice(state, v, await_r[v])
        if all(m == MODE_DONE for m in mode):
            break
        if not any(m == MODE_TRACK for m in mode):
            continue  # only awaits pending beyond this chunk: skip it

        # replay loop: run the chunk, consume, splice failed lanes into
        # the SAVED pre-chunk carry and re-run until no new failure
        pre_state = state
        while True:
            valid = np.zeros((chunk, b), bool)
            for v in range(b):
                if mode[v] != MODE_TRACK:
                    continue
                lo = max(resume[v], cs)
                hi = min(n_frames[v], ce)
                if lo < hi:
                    valid[lo - cs:hi - cs, v] = True
            if stage:
                block = staged[cs]
            else:
                block = _flat_block(canvases, list(range(b)), [cs] * b,
                                    n_frames, chunk, ch, cw)
            post_state, outs = engine.run_chunk(pre_state, block, valid,
                                                donate=False)
            pos = np.asarray(outs[0], np.float64)   # (T, B, 2)
            sz = np.asarray(outs[1], np.float64)

            replay = False
            for v in range(b):
                if mode[v] != MODE_TRACK:
                    continue
                f = max(consumed[v] + 1, cs)
                while f < min(n_frames[v], ce):
                    t = f - cs
                    loc = np.array([pos[t, v, 0] - sz[t, v, 0] / 2,
                                    pos[t, v, 1] - sz[t, v, 1] / 2,
                                    sz[t, v, 0], sz[t, v, 1]], np.float64)
                    if poly_iou(np.asarray(gts[v][f]), loc) <= 0:
                        results[v].regions[f] = 2
                        for f2 in range(f + 1, min(f + 5, n_frames[v])):
                            results[v].regions[f2] = 0
                        consumed[v] = min(f + 4, n_frames[v] - 1)
                        r = f + 5
                        if r >= n_frames[v]:
                            mode[v] = MODE_DONE
                        elif r + 1 < cs + chunk:
                            pre_state, resumed = do_splice(pre_state, v, r)
                            replay = replay or resumed
                        else:
                            mode[v] = MODE_AWAIT
                            await_r[v] = r
                        break
                    results[v].regions[f] = loc
                    consumed[v] = f
                    f += 1
                if mode[v] == MODE_TRACK and consumed[v] >= n_frames[v] - 1:
                    mode[v] = MODE_DONE
            if not replay:
                state = post_state
                break

    # lanes still awaiting a re-init past the last tracked frame: the
    # init itself is recorded (scan path: init then break, no tracking)
    for v in range(b):
        if mode[v] == MODE_AWAIT and await_r[v] <= n_frames[v] - 1:
            inst, _ = pick_instance(v, await_r[v])
            if inst != instance_size:
                results[v].spill_from = await_r[v]
            else:
                results[v].regions[await_r[v]] = 1
    return results


# ---------------------------------------------------------------------
# Lane refill (non-VOT lockstep eval)
# ---------------------------------------------------------------------

def run_refill_group(engine, runner, videos, on_done: Callable = None):
    """Track a pool of videos through a B-lane lockstep engine with lane
    refill: videos are taken longest-first; when a lane's video ends, the
    next pending video is spliced into that lane at the following chunk
    boundary.

    videos: list of dicts with keys
      name, canvas ((n, ch, cw, 3) uint8 incl. frame 0), h, w,
      init_pos (2,), init_sz (2,).
    on_done(name, pos, sz, score): optional callback per finished video
    (pos/sz: (n-1, 2), score: (n-1,)).

    Refill decisions depend only on host-known lengths, so no chunk ever
    waits on a D2H readback; results are collated at the end. Returns
    {name: (pos, sz, score)}.
    """
    b = engine.batch
    chunk = engine.chunk
    ch, cw = engine.im_h, engine.im_w
    order = sorted(range(len(videos)), key=lambda v: -len(videos[v]["canvas"]))
    canvases = [videos[v]["canvas"] for v in range(len(videos))]
    n_frames = [len(c) for c in canvases]

    # --- initial assignment: B longest videos via the batched init
    first = order[:b]
    pending = list(order[b:])
    init_list = []
    for v in first:
        vid = videos[v]
        im0 = vid["canvas"][0][:vid["h"], :vid["w"]]
        init_list.append((im0, np.asarray(vid["init_pos"], float),
                          np.asarray(vid["init_sz"], float)))
    # idle lanes (fewer videos than lanes) repeat lane 0's video masked
    while len(init_list) < b:
        init_list.append(init_list[0])
    state = engine.init_batch(init_list, runner)

    lane_vid = [first[i] if i < len(first) else -1 for i in range(b)]
    lane_next = [1] * b               # next local frame to track
    # per chunk: (outs, [(vid, local_start, k_valid)] per lane)
    records = []

    def active(lane):
        v = lane_vid[lane]
        return v >= 0 and lane_next[lane] < n_frames[v]

    while any(active(l) for l in range(b)):
        valid = np.zeros((chunk, b), bool)
        snap = []
        for lane in range(b):
            v = lane_vid[lane]
            if v < 0 or lane_next[lane] >= n_frames[v]:
                snap.append((v, lane_next[lane], 0))
                continue
            k = min(chunk, n_frames[v] - lane_next[lane])
            valid[:k, lane] = True
            snap.append((v, lane_next[lane], k))
        block = _flat_block(canvases, lane_vid, lane_next, n_frames,
                            chunk, ch, cw)
        state, outs = engine.run_chunk(state, block, valid, donate=True)
        records.append((outs, snap))

        # advance + refill at the boundary (host-only decisions). All
        # lanes refilling at this boundary share ONE batched init pass
        # and ONE fused splice dispatch (engine.make_lane_states /
        # splice_lanes) — per-lane dispatches cost a host-link round
        # trip each and dominated skewed-benchmark wall-clock.
        refills = []
        for lane in range(b):
            v, f0, k = snap[lane]
            if v < 0:
                continue
            lane_next[lane] = f0 + k
            if lane_next[lane] >= n_frames[v] and pending:
                nv = pending.pop(0)
                refills.append((lane, nv))
                lane_vid[lane] = nv
                lane_next[lane] = 1
        if refills:
            vids = []
            for _, nv in refills:
                vid = videos[nv]
                im0 = vid["canvas"][0][:vid["h"], :vid["w"]]
                vids.append((im0, np.asarray(vid["init_pos"], float),
                             np.asarray(vid["init_sz"], float)))
            lane_sts = engine.make_lane_states(vids, runner)
            state = engine.splice_lanes(
                state, [lane for lane, _ in refills], lane_sts)

    # --- collate (single D2H sweep at the end)
    out_pos = {v: np.zeros((n_frames[v] - 1, 2), np.float64)
               for v in range(len(videos))}
    out_sz = {v: np.zeros((n_frames[v] - 1, 2), np.float64)
              for v in range(len(videos))}
    out_score = {v: np.zeros((n_frames[v] - 1,), np.float64)
                 for v in range(len(videos))}
    for outs, snap in records:
        pos = np.asarray(outs[0])
        sz = np.asarray(outs[1])
        score = np.asarray(outs[2])
        for lane, (v, f0, k) in enumerate(snap):
            if v < 0 or k == 0:
                continue
            sl = slice(f0 - 1, f0 - 1 + k)
            out_pos[v][sl] = pos[:k, lane]
            out_sz[v][sl] = sz[:k, lane]
            out_score[v][sl] = score[:k, lane]
    results = {}
    for v in range(len(videos)):
        name = videos[v]["name"]
        results[name] = (out_pos[v], out_sz[v], out_score[v])
        if on_done is not None:
            on_done(name, out_pos[v], out_sz[v], out_score[v])
    return results
