"""Train + commit the tiny full-step parity fixture (VERDICT r3 #4).

Trains a dev-scale USOT (width=8, channels=32, mem_size=2 — ~0.4M params)
on the synthetic moving-square recipe at FULL tracker geometry (search
255, score 25), then strips the final checkpoint to {params, batch_stats}
and writes tests/fixtures/tiny_usot_w8c32.msgpack (~2 MB).

A TRAINED checkpoint gives a peaked, non-chaotic response map, so the
scan engine and the host parity tracker can be pinned to sub-pixel
trajectory agreement in the quick CPU suite (tests/test_engine.py) —
with random weights the argmax is noise and any f32-vs-f64 rounding
flips it (the old err<130 bound).

Usage: python tools/make_tiny_fixture.py [--epochs 7] [--samples 400]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join("tests", "fixtures", "tiny_usot_w8c32.msgpack")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=7)
    ap.add_argument("--samples", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--root", default="var/tiny_fixture")
    ap.add_argument("--out", default=FIXTURE)
    args = ap.parse_args()

    from tools.train_synthetic import main as train_main
    sys.argv = ["train_synthetic.py", "--root", args.root,
                "--width", "8", "--channels", "32",
                "--end-epoch", str(args.epochs),
                "--samples", str(args.samples),
                "--batch", str(args.batch)]
    train_main()

    from flax import serialization
    from usot_tpu.train.checkpoint import load_variables
    ckpt = os.path.join(args.root, "snapshot",
                        f"checkpoint_e{args.epochs}.ckpt")
    variables = load_variables(ckpt)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "width": 8, "channels": 32, "mem_size": 2}))
    print("wrote", args.out, os.path.getsize(args.out) / 1e6, "MB")


if __name__ == "__main__":
    main()
