"""Epoch-sweep benchmark testing (ref: scripts/test_epochs_usot.py).

The reference shards checkpoint epochs across GPUs with MPI; on TPU a
single chip runs each epoch's benchmark sequentially (the scan engine
batches whole videos), and multi-process sharding is unnecessary at this
scale. Set --processes > 1 to shard epochs across subprocesses anyway
(useful on multi-chip hosts with JAX_VISIBLE_DEVICES pinning).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="epoch sweep test")
    p.add_argument("--arch", default="USOT")
    p.add_argument("--start_epoch", type=int, default=10)
    p.add_argument("--end_epoch", type=int, default=30)
    p.add_argument("--dataset", default="VOT2018")
    p.add_argument("--snapshot_dir", default="var/snapshot")
    p.add_argument("--processes", type=int, default=1)
    # passthrough to cli.test (the onekey pipeline points these at its
    # own synthetic benchmark + result dirs)
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--result_dir", default=None)
    p.add_argument("--mem_size", type=int, default=None)
    p.add_argument("--engine", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    epochs = list(range(args.start_epoch, args.end_epoch + 1))
    passthrough = []
    for flag in ("dataset_root", "result_dir", "mem_size", "engine"):
        val = getattr(args, flag)
        if val is not None:
            passthrough += [f"--{flag}", str(val)]
    cmds = []
    for e in epochs:
        ckpt = os.path.join(args.snapshot_dir, f"checkpoint_e{e}.ckpt")
        if not os.path.exists(ckpt):
            continue
        cmds.append([sys.executable, "-m", "usot_tpu.cli.test",
                     "--arch", args.arch, "--resume", ckpt,
                     "--dataset", args.dataset, "--epoch_test", "True",
                     *passthrough])

    if args.processes <= 1:
        for cmd in cmds:
            subprocess.run(cmd, check=False)
    else:
        running = []
        for i, cmd in enumerate(cmds):
            running.append(subprocess.Popen(cmd))
            if len(running) >= args.processes:
                running.pop(0).wait()
        for pr in running:
            pr.wait()


if __name__ == "__main__":
    main()
