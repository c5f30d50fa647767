"""Checkpoint-level parity harness: converted USOT torch weights vs this
framework, layer by layer.

Usage (when a published checkpoint is available):
    python tools/compare_with_torch.py --ckpt USOT_star.pth \
        [--image path/to/frame.jpg]

Loads the torch state_dict, converts it (usot_tpu.models.convert), runs a
fixed input through backbone -> neck -> heads, and prints activation
statistics for the conversion to be diffed against a reference PyTorch
run of the same input (dump that side with any torch forward-hook script).
Also emits a .npz with the raw activations so the diff can be exact.

This is the USOT analog of the reference's own native-op parity test
(ref: preprocessing/.../correlation_native.py:26-77), lifted to whole-model
granularity.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--image", default=None)
    parser.add_argument("--out", default="var/parity_activations.npz")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from usot_tpu.models.convert import (convert_usot_checkpoint,
                                         load_torch_state_dict)
    from usot_tpu.models.usot import USOTNet, build_usot

    sd = load_torch_state_dict(args.ckpt)
    variables = convert_usot_checkpoint(sd)
    model = build_usot(mem_size=4)

    if args.image:
        import cv2

        im = cv2.imread(args.image)
        z = cv2.resize(im, (127, 127)).astype(np.float32)
        x = cv2.resize(im, (255, 255)).astype(np.float32)
    else:
        rng = np.random.default_rng(0)
        z = (rng.random((127, 127, 3)) * 255).astype(np.float32)
        x = (rng.random((255, 255, 3)) * 255).astype(np.float32)

    tb = jnp.asarray([[3.0, 3.0, 11.0, 11.0]])
    zf = model.apply(variables, jnp.asarray(z)[None], tb,
                     method=USOTNet.template_features)
    xf = model.apply(variables, jnp.asarray(x)[None],
                     method=USOTNet.search_features)
    cls, bbox = model.apply(variables, xf, zf, method=USOTNet.track_offline)
    mem = jnp.tile(zf, (7, 1, 1, 1))
    cls2, bbox2, cls_mem = model.apply(variables, xf, zf, mem,
                                       method=USOTNet.track_memory)

    acts = {
        "zf": np.asarray(zf), "xf": np.asarray(xf),
        "cls": np.asarray(cls), "bbox": np.asarray(bbox),
        "cls_mem": np.asarray(cls_mem),
        "input_z": z, "input_x": x,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **acts)

    for name, a in acts.items():
        if name.startswith("input"):
            continue
        print(f"{name:8s} shape={a.shape} mean={a.mean():+.6f} "
              f"std={a.std():.6f} min={a.min():+.4f} max={a.max():+.4f}")
    print(f"activations written to {args.out}")


if __name__ == "__main__":
    main()
