"""BN running-stat calibration for randomly-initialized models.

Inference always normalizes with BatchNorm *running* stats; a fresh init
(mean 0, var 1) meets raw 0-255 pixel activations and saturates the head.
Trained/converted checkpoints carry real stats, but tests, benchmarks and
scratch training warm-up benefit from bootstrapping the stats with a few
train-mode passes on synthetic inputs. Fully convolutional model => tiny
spatial inputs calibrate the same per-channel statistics cheaply.

Runs pinned to the CPU backend: the compute is trivial and remote-compile
latency on tunneled TPUs dwarfs it.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from usot_tpu.models.usot import USOTNet


def _features_pass(module: USOTNet, x, stem_bn, stage_bn):
    return module.features(x, stem_bn_train=stem_bn, stage_bn_train=stage_bn)


def calibrate_batch_stats(model: USOTNet, variables, seed: int = 0,
                          n_iter: int = 30, template: int = 63,
                          search: int = 95, amplitude: float = 255.0):
    """Returns variables with batch_stats re-estimated on synthetic
    image-scale inputs (train-mode passes; momentum 0.9 per pass)."""
    rng = np.random.default_rng(seed)

    def backbone_out(n):
        stem = (n - 7) // 2 + 1
        pooled = (stem + 2 - 3) // 2 + 1
        return (pooled - 3) // 2 + 1  # layer2 stride; layer1/3 keep size

    score = backbone_out(search) - 6  # head VALID convs + xcorr

    calib_model = USOTNet(mem_size=1, search_size=search, score_size=score,
                          sf_size=score, dtype=model.dtype,
                          width=model.width, channels=model.channels,
                          s2d_stem=model.s2d_stem,
                          s2b_dilated=model.s2b_dilated)

    try:
        calib_dev = jax.devices("cpu")[0]
    except RuntimeError:  # tunneled runtimes may expose no CPU backend
        calib_dev = jax.devices()[0]
    with jax.default_device(calib_dev):
        t = jnp.asarray(rng.random((2, template, template, 3))
                        .astype(np.float32) * amplitude)
        s = jnp.asarray(rng.random((2, search, search, 3))
                        .astype(np.float32) * amplitude)
        lab = jnp.zeros((2, score, score), jnp.float32).at[
            :, score // 2, score // 2].set(1.0)
        reg = jnp.ones((2, score, score, 4), jnp.float32)
        regw = jnp.ones((2, score, score), jnp.float32)
        tb = jnp.asarray([[2.0, 2.0, 10.0, 10.0]] * 2)
        sm = jnp.asarray(rng.random((2, 1, search, search, 3))
                         .astype(np.float32) * amplitude)
        sb = jnp.asarray([[3.0, 3.0, 8.0, 8.0]] * 2)

        @jax.jit
        def one_pass(vars_):
            _, mutated = calib_model.apply(
                vars_, t, s, lab, reg, regw, tb, search_memory=sm,
                search_bbox=sb, stage_bn_train=True,
                method=USOTNet.forward_train, mutable=["batch_stats"])
            return mutated["batch_stats"]

        @jax.jit
        def stem_pass(vars_):
            _, mutated = calib_model.apply(
                vars_, s, True, True, method=_features_pass,
                mutable=["batch_stats"])
            return mutated["batch_stats"]

        params = jax.device_put(variables["params"], calib_dev)
        stats = jax.device_put(variables["batch_stats"], calib_dev)
        for _ in range(n_iter):
            new_stem = stem_pass({"params": params, "batch_stats": stats})
            merged = dict(stats)
            merged["features"] = new_stem["features"]
            stats = one_pass({"params": params, "batch_stats": merged})
            # forward_train keeps the stem in eval mode; keep the stem stats
            # from the dedicated backbone pass
            s2 = dict(stats)
            f = dict(s2["features"])
            f["stem"] = new_stem["features"]["stem"]
            s2["features"] = f
            stats = s2

    return {"params": variables["params"],
            "batch_stats": jax.tree.map(np.asarray, stats)}
