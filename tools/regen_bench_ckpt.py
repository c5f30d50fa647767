"""Regenerate the trained bench checkpoint after a container recycle.

bench.py defaults to the TRAIN_r05 30-epoch checkpoint
(var/full_schedule/unbroken/snapshot/checkpoint_e30.ckpt) so the ROI
streaming leg measures the replay policy on a bounded trajectory — but
var/ is ephemeral. This reruns ONLY the unbroken leg of
tools/train_full_schedule.py (same config writer, same shard cache
recipe, same seeds -> the same checkpoint), skipping the kill/resume
proof that TRAIN_r05.json already records.

Usage: python tools/regen_bench_ckpt.py [--end-epoch 30]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.train_full_schedule import write_cfg, run_train  # noqa: E402
from tools.train_synthetic import gen_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--end-epoch", type=int, default=30)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--root", default="var/full_schedule")
    args = ap.parse_args()

    root = os.path.join(REPO, args.root)
    os.makedirs(root, exist_ok=True)
    crop_dir, ann_path = gen_dataset(root, args.videos)

    shards = os.path.join(root, "shards")
    cfg_shards = write_cfg(root, "shardcfg", crop_dir, ann_path, args,
                           args.end_epoch)
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-m", "usot_tpu.cli.make_shards",
                    "--cfg", cfg_shards, "--out", shards,
                    "--epochs", f"1-{args.end_epoch}",
                    "--samples", str(args.samples), "--workers", "4"],
                   check=True, cwd=REPO)
    print(f"shards in {time.perf_counter() - t0:.1f}s", flush=True)

    cfg_full = write_cfg(root, "unbroken", crop_dir, ann_path, args,
                         args.end_epoch)
    train_s = run_train(cfg_full, shards)
    ckpt = os.path.join(root, "unbroken", "snapshot",
                        f"checkpoint_e{args.end_epoch}.ckpt")
    assert os.path.exists(ckpt), ckpt
    print(f"train in {train_s:.1f}s -> {ckpt}", flush=True)


if __name__ == "__main__":
    main()
