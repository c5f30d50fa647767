"""Hardware A/B of memory-ring formulations at bench shapes.

The step attribution (tools/microbench_step.py, PERF_NOTES.md) charges
~5.2 ms of the ~19 ms batched frame step to ring traffic: queue
assembly (gather) 1.5 ms, ring write (scatter) 2.2 ms, prpool 1.5 ms.
Both the gather and the scatter act on (B, S, h, w, C) rings with
per-batch dynamic indices — the classic TPU-hostile access pattern.
This tool times the alternatives:

gather:
  take    - jnp.take_along_axis (current engine path)
  onehot  - one-hot matmul over the slot axis (MXU streams the whole
            ring; HBM-bound at ~ring-size/bandwidth, no gather unit)

write:
  scatter - vmapped dynamic_update_slice (current; lowers to scatter)
  shared  - single dynamic_update_slice of a (B, 1, h, w, C) block when
            every lane writes the same slot (true in the lockstep
            non-full regime: write_idx == mem_len identical across B),
            with a lax.cond scatter fallback when indices diverge

Each variant runs inside a 64-frame lax.scan so XLA sees the same
carry-aliasing opportunities as the real engine chunk.

Usage: python tools/bench_memops.py [--batch 32] [--slots 257]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = ((5, 5), (3, 5), (5, 3))
C = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--slots", type=int, default=257)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--k", type=int, default=5, help="picks per frame")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize pre-imports jax pinned to the axon TPU platform;
        # an env-only override is not enough (see tests/conftest.py)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "var/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    B, S, K, T = args.batch, args.slots, args.k, args.frames
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    rings0 = tuple(
        jnp.asarray(rng.normal(size=(B, S + 1, h, w, C)), dt)
        for h, w in SCALES)
    feats = tuple(
        jnp.asarray(rng.normal(size=(T, B, 1, h, w, C)), dt)
        for h, w in SCALES)
    picks_t = jnp.asarray(rng.integers(0, S, size=(T, B, K)), jnp.int32)
    # lockstep regime: same write slot across B each frame
    slots_shared = jnp.asarray(
        rng.integers(0, S, size=(T,)), jnp.int32)
    slots_t = jnp.broadcast_to(slots_shared[:, None], (T, B))
    valid = jnp.ones((T, B), bool)

    def gather_take(rings, picks):
        out = []
        for ring in rings:
            idx = picks.reshape(picks.shape + (1, 1, 1))
            out.append(jnp.take_along_axis(
                ring, jnp.broadcast_to(
                    idx, (B, K) + tuple(ring.shape[2:])), axis=1))
        return out

    def gather_onehot(rings, picks):
        oh = jax.nn.one_hot(picks, S + 1, dtype=rings[0].dtype)  # (B,K,S+1)
        out = []
        for ring in rings:
            b, s, h, w, c = ring.shape
            flat = ring.reshape(b, s, h * w * c)
            g = jnp.einsum("bks,bsf->bkf", oh, flat)
            out.append(g.reshape(b, K, h, w, c))
        return out

    def write_scatter(rings, fs, slot_b, valid_b):
        ring_idx = jnp.where(valid_b, slot_b, S)
        ar = jnp.arange(B)
        return tuple(r.at[ar, ring_idx].set(f[:, 0])
                     for r, f in zip(rings, fs))

    def write_shared(rings, fs, slot_b, valid_b):
        shared = jnp.all(slot_b == slot_b[0])

        def dus(rings):
            s = slot_b[0]
            out = []
            for r, f in zip(rings, fs):
                zeros = (0,) * (r.ndim - 2)
                old = jax.lax.dynamic_slice(
                    r, (0, s) + zeros, (B, 1) + r.shape[2:])
                blend = jnp.where(
                    valid_b[:, None, None, None, None], f, old)
                out.append(jax.lax.dynamic_update_slice(
                    r, blend, (0, s) + zeros))
            return tuple(out)

        def scat(rings):
            return write_scatter(rings, fs, slot_b, valid_b)

        return jax.lax.cond(shared, dus, scat, rings)

    gathers = {"take": gather_take, "onehot": gather_onehot}
    writes = {"scatter": write_scatter, "shared": write_shared}

    def make_step(gname, wname):
        gfn, wfn = gathers[gname], writes[wname]

        def scan_fn(rings, xs):
            picks, fs, slot_b, valid_b = xs
            q = gfn(rings, picks)
            # fold the gathered queue back in so neither op is DCE'd,
            # without materially changing traffic
            fs2 = tuple(
                f + jnp.mean(g, axis=1, keepdims=True) * 0
                for f, g in zip(fs, q))
            rings = wfn(rings, fs2, slot_b, valid_b)
            return rings, jnp.sum(q[0][:, 0, 0, 0, 0].astype(jnp.float32))

        @jax.jit
        def run(rings):
            rings, outs = jax.lax.scan(
                scan_fn, rings, (picks_t, feats, slots_t, valid))
            return rings, outs

        return run

    print(f"backend={jax.default_backend()} B={B} S={S} T={T} "
          f"ring MB={sum(np.prod(r.shape) for r in rings0) * 2 / 1e6:.0f}")
    for gname in gathers:
        for wname in writes:
            run = make_step(gname, wname)
            r, o = run(rings0)
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r, o = run(rings0)
            jax.block_until_ready(o)
            dt_ms = (time.perf_counter() - t0) / args.iters / T * 1e3
            print(f"  gather={gname:6s} write={wname:7s}: "
                  f"{dt_ms:.3f} ms/frame")

    # correctness cross-check (tiny, any backend)
    q1 = gather_take(rings0, picks_t[0])
    q2 = gather_onehot(rings0, picks_t[0])
    for a, b in zip(q1, q2):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    w1 = write_scatter(rings0, tuple(f[0] for f in feats),
                       slots_t[0], valid[0])
    w2 = write_shared(rings0, tuple(f[0] for f in feats),
                      slots_t[0], valid[0])
    for a, b in zip(w1, w2):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    # diverged-slot + invalid-lane fallback agreement
    slot_div = jnp.asarray(rng.integers(0, S, size=(B,)), jnp.int32)
    val_mix = jnp.asarray(rng.integers(0, 2, size=(B,)), bool)
    w1 = write_scatter(rings0, tuple(f[0] for f in feats), slot_div, val_mix)
    w2 = write_shared(rings0, tuple(f[0] for f in feats), slot_div, val_mix)
    for a, b in zip(w1, w2):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    # shared-slot path with an invalid lane must keep the old content
    w3 = write_shared(rings0, tuple(f[0] for f in feats),
                      slots_t[0], val_mix)
    s0 = int(slots_t[0, 0])
    for r0, w in zip(rings0, w3):
        got = np.asarray(w[:, s0], np.float32)
        old = np.asarray(r0[:, s0], np.float32)
        keep = ~np.asarray(val_mix)
        np.testing.assert_array_equal(got[keep], old[keep])
    print("correctness: all formulations agree")


if __name__ == "__main__":
    main()
