"""Training-step tests on a tiny-geometry model (search 95 -> 5x5 score map)
so CPU compiles stay fast. Includes the 8-virtual-device data-parallel path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from usot_tpu.config.defaults import default_config
from usot_tpu.models.usot import USOTNet
from usot_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from usot_tpu.train.checkpoint import (restore_checkpoint, save_checkpoint)
from usot_tpu.train.optim import build_optimizer, label_params
from usot_tpu.train.schedulers import build_lr_spaces
from usot_tpu.train.step import TrainState, epoch_weights, make_train_step

T, S, SCORE, SF = 63, 95, 5, 11


def tiny_model():
    return USOTNet(mem_size=2, search_size=S, score_size=SCORE, sf_size=SF)


def tiny_batch(rng, b, mem=None):
    batch = {
        "template": jnp.asarray(rng.normal(size=(b, T, T, 3)).astype(np.float32)),
        "search": jnp.asarray(rng.normal(size=(b, S, S, 3)).astype(np.float32)),
        "label": jnp.asarray((rng.random((b, SCORE, SCORE)) > 0.8)
                             .astype(np.float32)),
        "reg_target": jnp.abs(jnp.asarray(
            rng.normal(size=(b, SCORE, SCORE, 4)).astype(np.float32))) + 1.0,
        "reg_weight": jnp.asarray((rng.random((b, SCORE, SCORE)) > 0.7)
                                  .astype(np.float32)),
        "template_bbox": jnp.asarray([[2.0, 2.0, 5.0, 5.0]] * b),
    }
    if mem:
        batch["search_memory"] = jnp.asarray(
            rng.normal(size=(b, mem, S, S, 3)).astype(np.float32))
        batch["search_bbox"] = jnp.asarray([[3.0, 3.0, 8.0, 8.0]] * b)
    return batch


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_model()
    t = jnp.zeros((1, T, T, 3))
    s = jnp.zeros((1, S, S, 3))
    lab = jnp.zeros((1, SCORE, SCORE))
    reg = jnp.zeros((1, SCORE, SCORE, 4))
    regw = jnp.zeros((1, SCORE, SCORE))
    tb = jnp.asarray([[2.0, 2.0, 5.0, 5.0]])
    sm = jnp.zeros((1, 1, S, S, 3))
    sb = jnp.asarray([[3.0, 3.0, 8.0, 8.0]])
    variables = model.init(jax.random.PRNGKey(0), t, s, lab, reg, regw, tb,
                           search_memory=sm, search_bbox=sb,
                           method=USOTNet.forward_train)
    return model, variables


class TestSchedulers:
    def test_usot_recipe(self):
        cfg = default_config()
        spaces = build_lr_spaces(cfg.USOT.TRAIN, 30)
        assert len(spaces) == 30
        # warmup 0.0025 -> 0.005 over 5 epochs (step policy)
        assert spaces[0] == pytest.approx(0.0025)
        assert spaces[4] == pytest.approx(0.005 / (2 ** (1 / 5)) * 2 ** (1 / 5),
                                          rel=0.3)
        # then log decay 0.005 -> 2e-5
        assert spaces[5] == pytest.approx(0.005)
        assert spaces[-1] == pytest.approx(2e-5)
        assert np.all(np.diff(spaces[5:]) < 0)

    def test_epoch_weights(self):
        cfg = default_config()
        l1, lt, cr = epoch_weights(cfg.USOT.TRAIN, 6)
        assert (l1, lt, cr) == (0.30, 0.9, 0.6)
        l1, _, cr = epoch_weights(cfg.USOT.TRAIN, 8)
        assert l1 == 0.275 and cr == 0.5
        l1, _, cr = epoch_weights(cfg.USOT.TRAIN, 30)
        assert l1 == 0.25 and cr == 0.4


class TestOptimizer:
    def test_labels_frozen_before_unfix(self, model_and_vars):
        _, variables = model_and_vars
        labels = label_params(variables["params"], unfix=False)
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        vals = {"/".join(str(getattr(p, "key", p)) for p in path): v
                for path, v in flat}
        assert all(v == "frozen" for k, v in vals.items()
                   if k.startswith("features"))
        assert all(v == "base" for k, v in vals.items()
                   if k.startswith(("neck", "connect")))

    def test_labels_after_unfix(self, model_and_vars):
        _, variables = model_and_vars
        labels = label_params(variables["params"], unfix=True)
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        vals = {"/".join(str(getattr(p, "key", p)) for p in path): v
                for path, v in flat}
        assert all(v == "frozen" for k, v in vals.items()
                   if k.startswith("features/stem"))
        assert any(v == "backbone" for k, v in vals.items()
                   if k.startswith("features/layer3"))


class TestTrainStep:
    def test_naive_step_updates_head_not_backbone(self, model_and_vars, rng):
        model, variables = model_and_vars
        tx, _ = build_optimizer(variables["params"], 0.9, 1e-4, 0.1,
                                unfix=False)
        state = TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]))
        step = make_train_step(model, tx, cycle_memory=False,
                               stage_bn_train=False, lambda_1=0.2)
        batch = tiny_batch(rng, 2)
        new_state, metrics = step(state, batch, jnp.float32(0.005),
                                  jnp.float32(0.5))
        assert np.isfinite(float(metrics["loss"]))
        # backbone unchanged
        pre = jax.tree.leaves(state.params["features"])
        post = jax.tree.leaves(new_state.params["features"])
        assert all(np.allclose(a, b) for a, b in zip(pre, post))
        # head changed
        pre_h = np.concatenate([np.ravel(x) for x in
                                jax.tree.leaves(state.params["connect"])])
        post_h = np.concatenate([np.ravel(x) for x in
                                 jax.tree.leaves(new_state.params["connect"])])
        assert not np.allclose(pre_h, post_h)

    def test_cycle_memory_step(self, model_and_vars, rng):
        model, variables = model_and_vars
        tx, _ = build_optimizer(variables["params"], 0.9, 1e-4, 0.1,
                                unfix=True)
        state = TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]))
        step = make_train_step(model, tx, cycle_memory=True,
                               stage_bn_train=True, lambda_1=0.3)
        batch = tiny_batch(rng, 2, mem=2)
        new_state, metrics = step(state, batch, jnp.float32(0.005),
                                  jnp.float32(0.5))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["cls_loss_memory"]) > 0
        # backbone layer3 now updates
        pre = jax.tree.leaves(state.params["features"]["layer3_0"])
        post = jax.tree.leaves(new_state.params["features"]["layer3_0"])
        assert any(not np.allclose(a, b) for a, b in zip(pre, post))

    def test_remat_step_matches_plain(self, model_and_vars, rng):
        """jax.checkpoint changes WHEN activations are computed, never
        what: the rematerialized step must match the plain one."""
        model, variables = model_and_vars
        tx, _ = build_optimizer(variables["params"], 0.9, 1e-4, 0.1,
                                unfix=True)
        state = TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]))
        batch = tiny_batch(rng, 2, mem=2)
        kw = dict(cycle_memory=True, stage_bn_train=True, lambda_1=0.3)
        plain = make_train_step(model, tx, **kw)
        rem = make_train_step(model, tx, remat=True, **kw)
        s1, m1 = plain(state, batch, jnp.float32(0.005), jnp.float32(0.5))
        s2, m2 = rem(state, batch, jnp.float32(0.005), jnp.float32(0.5))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)

    def test_accum_duplicated_microbatch_matches_plain(self, model_and_vars,
                                                       rng):
        """Grad-accumulation spec: train-mode BN normalizes by the
        CURRENT microbatch (incoming running stats don't enter the
        forward), so accum(k=2) over two IDENTICAL microbatches must
        produce exactly the grads — hence the params — of a plain step
        on one microbatch."""
        model, variables = model_and_vars
        tx, _ = build_optimizer(variables["params"], 0.9, 1e-4, 0.1,
                                unfix=True)
        state = TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]))
        half = tiny_batch(rng, 2)
        dup = jax.tree.map(lambda x: jnp.concatenate([x, x]), half)
        kw = dict(cycle_memory=False, stage_bn_train=True, lambda_1=0.2)
        plain = make_train_step(model, tx, **kw)
        acc = make_train_step(model, tx, accum_steps=2, **kw)
        s1, m1 = plain(state, half, jnp.float32(0.005), jnp.float32(0.5))
        s2, m2 = acc(state, dup, jnp.float32(0.005), jnp.float32(0.5))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)

    def test_data_parallel_8_devices(self, model_and_vars, rng):
        model, variables = model_and_vars
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        tx, _ = build_optimizer(variables["params"], 0.9, 1e-4, 0.1,
                                unfix=False)
        state = TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]))
        step = make_train_step(model, tx, cycle_memory=False,
                               stage_bn_train=False, lambda_1=0.2)
        state = replicate_tree(mesh, state)
        batch = shard_batch(mesh, tiny_batch(rng, 8))
        new_state, metrics = step(state, batch, jnp.float32(0.005),
                                  jnp.float32(0.5))
        assert np.isfinite(float(metrics["loss"]))

    def test_accum_remat_compose_with_mesh(self, model_and_vars, rng):
        """remat + grad accumulation must compile and run under the data
        mesh (the accum scan splits each chip's local shard; XLA keeps
        the one gradient all-reduce)."""
        model, variables = model_and_vars
        mesh = make_mesh()
        tx, _ = build_optimizer(variables["params"], 0.9, 1e-4, 0.1,
                                unfix=False)
        state = TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]))
        step = make_train_step(model, tx, cycle_memory=False,
                               stage_bn_train=False, lambda_1=0.2,
                               remat=True, accum_steps=2)
        state = replicate_tree(mesh, state)
        batch = shard_batch(mesh, tiny_batch(rng, 16))
        new_state, metrics = step(state, batch, jnp.float32(0.005),
                                  jnp.float32(0.5))
        assert np.isfinite(float(metrics["loss"]))
        pre = np.concatenate([np.ravel(x) for x in
                              jax.tree.leaves(state.params["connect"])])
        post = np.concatenate([np.ravel(x) for x in
                               jax.tree.leaves(new_state.params["connect"])])
        assert not np.allclose(pre, post)

    def test_checkpoint_roundtrip(self, model_and_vars, tmp_path):
        model, variables = model_and_vars
        tx, _ = build_optimizer(variables["params"], 0.9, 1e-4, 0.1,
                                unfix=False)
        state = TrainState(variables["params"], variables["batch_stats"],
                           tx.init(variables["params"]))
        path = save_checkpoint(str(tmp_path), state, epoch=7)
        restored, epoch = restore_checkpoint(path, state)
        assert epoch == 7
        a = jax.tree.leaves(state.params)
        b = jax.tree.leaves(restored.params)
        assert all(np.allclose(x, y) for x, y in zip(a, b))


class TestLosses:
    def test_iou_loss_masked_cells_do_not_poison(self):
        """Cells outside the positive mask carry negative ltrb targets;
        they must not NaN the masked mean (regression: the -log must only
        see positive cells' ratios)."""
        from usot_tpu.train.losses import iou_loss, weighted_bce

        pred = jnp.ones((1, 5, 5, 4)) * 3.0
        target = jnp.full((1, 5, 5, 4), -7.0)      # negative everywhere...
        target = target.at[0, 2, 2].set(jnp.asarray([3.0, 3.0, 3.0, 3.0]))
        weight = jnp.zeros((1, 5, 5)).at[0, 2, 2].set(1.0)
        loss = iou_loss(pred, target, weight)
        assert np.isfinite(float(loss))
        assert float(loss) == pytest.approx(0.0, abs=1e-5)  # exact match cell

        # all-negative mask: loss must still be finite (0/1 denominator)
        loss = iou_loss(pred, target, jnp.zeros((1, 5, 5)))
        assert np.isfinite(float(loss))

        # weighted BCE with no positives is finite too
        lab = jnp.zeros((1, 5, 5))
        assert np.isfinite(float(weighted_bce(jnp.zeros((1, 5, 5, 1)), lab)))
