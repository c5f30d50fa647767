"""A/B: backbone+neck with the space-to-batch dilated-conv rewrite.

tools/ab_dilated.py measured the isolated layer3 dilated conv 1.37x
faster as space-to-batch phases, but the backbone-level effect was
never measured (the s2d STEM A/B was; s2b was not). Full-tensor mean
readout, device-resident scan (cliff_sweep measurement rules).

Usage: python tools/ab_backbone_s2b.py [--batch 32] [--iters 20]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from usot_tpu.models.usot import USOTNet, build_usot, init_variables
    from usot_tpu.tracker.config import TrackerConfig

    B = args.batch
    N = args.iters
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    p = TrackerConfig()
    p.instance_size = p.small_sz
    p.renew()
    S = p.instance_size
    rng = np.random.default_rng(0)
    x_crop = jnp.asarray(rng.normal(size=(B, S, S, 3)), dtype)

    results = {}
    for s2b in (False, True):
        model = build_usot(mem_size=4, dtype=dtype, s2b_dilated=s2b)
        cache = "var/bench_variables.msgpack"
        if os.path.exists(cache):
            from flax import serialization
            with open(cache, "rb") as f:
                variables = serialization.msgpack_restore(f.read())
        else:
            variables = init_variables(model, jax.random.PRNGKey(0))

        def f(c, variables=variables, model=model):
            x = x_crop + c.astype(dtype)
            out = model.apply(variables, x, method=USOTNet.search_features)
            return jnp.mean(out.astype(jnp.float32))

        jitted = jax.jit(lambda v: jax.lax.scan(
            lambda c, _: (f(c * 1e-9), None), jnp.float32(0.0), None,
            length=N)[0])
        ref = np.asarray(jitted(variables))
        reps = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(jitted(variables))
            reps.append((time.perf_counter() - t) / N * 1e3)
        results[s2b] = (min(reps), float(ref))
        print(f"s2b={s2b}: backbone+neck {min(reps):.2f} ms/iter "
              f"(readout {ref:.6f})", flush=True)

    t0, r0 = results[False]
    t1, r1 = results[True]
    print(f"ratio {t0 / t1:.3f}x; readout agree: "
          f"{abs(r0 - r1) / max(abs(r0), 1e-9):.2e}")


if __name__ == "__main__":
    main()
