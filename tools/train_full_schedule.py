"""Full 30-epoch staged training schedule on the chip + kill/resume proof.

Drives the REAL cli.train through the reference's complete staged recipe
(ref: scripts/train_usot.py:324-361, experiments/train/USOT.yaml:8-51):
naive -> cycle-memory at MEMORY_EPOCH, backbone unfreeze + optimizer
rebuild at UNFIX_EPOCH, warmup -> log LR decay across every LR-space
segment, lambda/cls_ratio shifts, checkpoints persisted from epoch 5.

Three subprocess runs consume ONE prebuilt shard cache (byte-identical
batches in the same order):

  1. unbroken:    epochs 1..END in a single invocation
  2. interrupted: the same invocation SIGKILLed mid-epoch KILL_EPOCH
                  (a real kill -9, triggered by polling the per-epoch
                  train_record.json that cli.train rewrites after every
                  epoch — so the kill lands while an epoch is in flight)
  3. resumed:     --resume from the last completed checkpoint, running
                  to END

and asserts (a) the interrupted prefix matches the unbroken run exactly
and (b) the resumed loss trajectory continues the unbroken run exactly.
Writes TRAIN_r05.json at the repo root: per-epoch losses/LR/flags/
timings, schedule transitions hit, and the resume delta.

Usage: python tools/train_full_schedule.py [--end-epoch 30] [--kill 16]
           [--width 64] [--channels 256] [--samples 32] [--batch 8]
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.train_synthetic import gen_dataset  # noqa: E402


def write_cfg(root, tag, crop_dir, ann_path, args, end_epoch):
    import yaml

    cfg = {
        "USOT": {
            "OUTPUT_DIR": os.path.join(root, tag, "log"),
            "CHECKPOINT_DIR": os.path.join(root, tag, "snapshot"),
            "WORKERS": 2,
            "PRINT_FREQ": 50,
            "TRAIN": {
                "WIDTH": args.width,
                "CHANNELS": args.channels,
                "START_EPOCH": 1,
                "END_EPOCH": end_epoch,
                "BATCH": args.batch,
                "BATCH_STAGE_2": args.batch,
                # The reference recipe's transition epochs, verbatim
                # (experiments/train/USOT.yaml:8-51).
                "MEMORY_EPOCH": 6,
                "UNFIX_EPOCH": 10,
                "MEMORY_NUM": 4,
                "PRETRAIN": "nonexistent.model",
                "WHICH_USE": ["GOT10K"],
                "WARMUP": {
                    "IFNOT": True, "TYPE": "step", "EPOCH": 5,
                    "KWARGS": {"start_lr": 0.001, "end_lr": 0.005,
                               "step": 1},
                },
                "LR": {"TYPE": "log",
                       "KWARGS": {"start_lr": 0.005, "end_lr": 0.0001}},
                "LAMBDA_SHIFT_EPOCHS": [0, 10, 20],
                "LAMBDA_1_LIST": [0.3, 0.275, 0.25],
                "CLS_RATIO_SHIFT_EPOCHS": [0, 10, 20],
                "CLS_RATIOS": [0.6, 0.5, 0.4],
            },
            "DATASET": {
                "GOT10K": {
                    "PATH": crop_dir + "/",
                    "ANNOTATION": ann_path,
                    "USE": args.samples,
                },
            },
        }
    }
    path = os.path.join(root, f"{tag}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def train_env():
    env = dict(os.environ)
    # Persistent compilation cache: the three runs share ~5 distinct step
    # programs; only the first process pays the compiles.
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, "var/jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "5"
    return env


def run_train(cfg_path, shards, resume=None):
    cmd = [sys.executable, "-m", "usot_tpu.cli.train", "--cfg", cfg_path,
           "--devices", "1", "--shards", shards]
    if resume:
        cmd += ["--resume", resume]
    print("==>", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, cwd=REPO, env=train_env())
    return time.perf_counter() - t0


def run_train_killed(cfg_path, shards, record_path, kill_epoch):
    """Launch cli.train and SIGKILL it while epoch `kill_epoch` is in
    flight: wait until the record shows epoch kill_epoch-1 complete
    (checkpoint saved), give the next epoch a moment to start stepping,
    then kill -9 the process group."""
    cmd = [sys.executable, "-m", "usot_tpu.cli.train", "--cfg", cfg_path,
           "--devices", "1", "--shards", shards]
    print("==> (to be killed mid-epoch %d)" % kill_epoch,
          " ".join(cmd), flush=True)
    proc = subprocess.Popen(cmd, cwd=REPO, env=train_env(),
                            start_new_session=True)
    t0 = time.perf_counter()
    killed_at = None
    try:
        while proc.poll() is None:
            time.sleep(0.5)
            try:
                with open(record_path) as f:
                    rec = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if str(kill_epoch - 1) in rec.get("epochs", {}):
                time.sleep(2.0)  # let epoch kill_epoch start stepping
                killed_at = time.perf_counter() - t0
                os.killpg(proc.pid, signal.SIGKILL)
                break
        proc.wait()
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
    if killed_at is None:
        raise RuntimeError(
            f"train exited (rc={proc.returncode}) before reaching "
            f"epoch {kill_epoch}")
    rc = proc.returncode
    print(f"    killed after {killed_at:.1f}s (rc={rc})", flush=True)
    return killed_at


def load_record(root, tag):
    with open(os.path.join(root, tag, "log", "train_record.json")) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--end-epoch", type=int, default=30)
    ap.add_argument("--kill", type=int, default=16,
                    help="epoch to SIGKILL the interrupted run during")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--samples", type=int, default=32,
                    help="samples per epoch")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--root", default="var/full_schedule")
    ap.add_argument("--out", default="TRAIN_r05.json")
    args = ap.parse_args()

    root = os.path.join(REPO, args.root)
    os.makedirs(root, exist_ok=True)
    crop_dir, ann_path = gen_dataset(root, args.videos)

    # One shard cache for all three runs: per-epoch deterministic
    # augmented batches (data/shards.py), so loss trajectories are
    # comparable bit-for-bit.
    shards = os.path.join(root, "shards")
    cfg_shards = write_cfg(root, "shardcfg", crop_dir, ann_path, args,
                           args.end_epoch)
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-m", "usot_tpu.cli.make_shards",
                    "--cfg", cfg_shards, "--out", shards,
                    "--epochs", f"1-{args.end_epoch}",
                    "--samples", str(args.samples), "--workers", "4"],
                   check=True, cwd=REPO)
    shard_s = time.perf_counter() - t0

    cfg_full = write_cfg(root, "unbroken", crop_dir, ann_path, args,
                         args.end_epoch)
    full_s = run_train(cfg_full, shards)
    unbroken = load_record(root, "unbroken")

    cfg_int = write_cfg(root, "interrupted", crop_dir, ann_path, args,
                        args.end_epoch)
    int_record = os.path.join(root, "interrupted", "log",
                              "train_record.json")
    killed_at = run_train_killed(cfg_int, shards, int_record, args.kill)
    interrupted = load_record(root, "interrupted")
    done = sorted(map(int, interrupted["epochs"]))
    assert done == list(range(1, args.kill)), \
        f"interrupted run completed {done}, expected 1..{args.kill - 1}"
    ckpt = os.path.join(root, "interrupted", "snapshot",
                        f"checkpoint_e{args.kill - 1}.ckpt")
    assert os.path.exists(ckpt), ckpt

    # Resume continues in the SAME output dirs from the kill point.
    resume_s = run_train(cfg_int, shards, resume=ckpt)
    resumed = load_record(root, "interrupted")

    # --- verification ---
    prefix_delta = 0.0
    for e in range(1, args.kill):
        a = unbroken["epochs"][str(e)]["losses"]
        b = interrupted["epochs"][str(e)]["losses"]
        prefix_delta = max(prefix_delta,
                           max(abs(x - y) for x, y in zip(a, b)))
        assert len(a) == len(b)

    resume_delta = 0.0
    for e in range(args.kill, args.end_epoch + 1):
        a = unbroken["epochs"][str(e)]["losses"]
        b = resumed["epochs"][str(e)]["losses"]
        assert len(a) == len(b), e
        resume_delta = max(resume_delta,
                           max(abs(x - y) for x, y in zip(a, b)))

    epochs = unbroken["epochs"]
    transitions = {
        "memory_epoch_6": (not epochs["5"]["cycle_memory"]
                           and epochs["6"]["cycle_memory"]),
        "unfix_epoch_10": (not epochs["9"]["unfix"]
                           and epochs["10"]["unfix"]),
        "warmup_rises": epochs["1"]["lr"] < epochs["5"]["lr"],
        "decay_falls": epochs["6"]["lr"] > epochs[str(args.end_epoch)]["lr"],
        "lambda_shifts": sorted({e["lambda_1"] for e in epochs.values()},
                                reverse=True),
        "cls_ratio_shifts": sorted({e["cls_ratio"]
                                    for e in epochs.values()},
                                   reverse=True),
        "ckpt_from_epoch_5": all(
            (epochs[str(e)]["checkpoint"] is not None) == (e >= 5)
            for e in range(1, args.end_epoch + 1)),
    }

    import jax
    out = {
        "what": "full staged schedule on chip + mid-epoch kill -9 + "
                "resume (ref: scripts/train_usot.py:324-361)",
        "device": str(jax.devices()[0]),
        "model": {"width": args.width, "channels": args.channels,
                  "batch": args.batch, "samples_per_epoch": args.samples},
        "end_epoch": args.end_epoch,
        "kill_epoch": args.kill,
        "transitions": transitions,
        "interrupted_prefix_max_delta": prefix_delta,
        "resume_max_loss_delta": resume_delta,
        "resume_exact": resume_delta <= 1e-6,
        "epochs": {e: {k: v for k, v in rec.items() if k != "losses"}
                   for e, rec in epochs.items()},
        "loss_first_last": [epochs["1"]["loss_avg"],
                            epochs[str(args.end_epoch)]["loss_avg"]],
        "wall_s": {"shards": round(shard_s, 1),
                   "unbroken": round(full_s, 1),
                   "interrupted_until_kill": round(killed_at, 1),
                   "resumed": round(resume_s, 1)},
    }
    path = os.path.join(REPO, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"resume_exact": out["resume_exact"],
                      "resume_max_loss_delta": resume_delta,
                      "transitions_ok": all(
                          v if isinstance(v, bool) else True
                          for v in transitions.values())}))
    print("wrote", path)


if __name__ == "__main__":
    main()
