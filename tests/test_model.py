import numpy as np
import jax
import jax.numpy as jnp
import pytest

from usot_tpu.models.backbone import ResNetPlus2
from usot_tpu.models.usot import USOTNet, init_variables, build_usot


@pytest.fixture(scope="module")
def small_model_vars():
    model = build_usot(mem_size=2)
    variables = init_variables(model, jax.random.PRNGKey(0))
    return model, variables


class TestBackbone:
    def test_output_shapes(self):
        bb = ResNetPlus2()
        v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)))
        out = bb.apply(v, jnp.zeros((1, 127, 127, 3)))
        assert out.shape == (1, 15, 15, 1024)
        out = bb.apply(v, jnp.zeros((1, 255, 255, 3)))
        assert out.shape == (1, 31, 31, 1024)
        out = bb.apply(v, jnp.zeros((1, 271, 271, 3)))
        assert out.shape == (1, 33, 33, 1024)

    @pytest.mark.parametrize("size", [33, 34])  # odd (needs pad) and even
    def test_s2d_stem_exact(self, size):
        """The space-to-depth stem rewrite must be numerically equivalent
        to the direct 7x7/s2 conv with the SAME parameter tree."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, size, size, 3)).astype(np.float32)
                        * 50.0)
        bb = ResNetPlus2()
        v = bb.init(jax.random.PRNGKey(3), x)
        bb_s2d = ResNetPlus2(s2d_stem=True)
        ref = bb.apply(v, x)
        got = bb_s2d.apply(v, x)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("size", [33, 34])  # odd (needs pad) and even
    def test_s2b_dilated_exact(self, size):
        """The space-to-batch rewrite of layer3's dilation-2 convs must be
        numerically equivalent with the SAME parameter tree."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, size, size, 3)).astype(np.float32)
                        * 50.0)
        bb = ResNetPlus2()
        v = bb.init(jax.random.PRNGKey(4), x)
        bb_s2b = ResNetPlus2(s2b_dilated=True)
        ref = bb.apply(v, x)
        got = bb_s2b.apply(v, x)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_param_count_matches_resnet50_trunk(self):
        # ResNet-50 through layer3 is 8.56M; the 3x3 (not 1x1) downsample
        # convs in layer2/layer3 add 256*512*8 + 512*1024*8 = 5.24M
        # -> expect ~13.79M
        bb = ResNetPlus2()
        v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)))
        n = sum(x.size for x in jax.tree.leaves(v["params"]))
        assert 13.6e6 < n < 14.0e6


class TestUSOTNet:
    def test_inference_shapes(self, small_model_vars):
        model, variables = small_model_vars
        z = jnp.zeros((1, 127, 127, 3))
        tb = jnp.asarray([[2.0, 2.0, 12.0, 12.0]])
        zf = model.apply(variables, z, tb, method=USOTNet.template_features)
        assert zf.shape == (1, 7, 7, 256)

        x = jnp.zeros((1, 255, 255, 3))
        xf = model.apply(variables, x, method=USOTNet.search_features)
        assert xf.shape == (1, 31, 31, 256)

        cls, bbox = model.apply(variables, xf, zf,
                                method=USOTNet.track_offline)
        assert cls.shape == (1, 25, 25, 1)
        assert bbox.shape == (1, 25, 25, 4)
        assert np.all(np.asarray(bbox) > 0)  # exp() output

        mem = jnp.zeros((7, 7, 7, 256))
        cls2, bbox2, cls_mem = model.apply(
            variables, xf, zf, mem, method=USOTNet.track_memory)
        assert cls_mem.shape == (1, 25, 25, 1)
        np.testing.assert_allclose(np.asarray(cls), np.asarray(cls2))

    def test_big_search_shapes(self, small_model_vars):
        model, variables = small_model_vars
        x = jnp.zeros((1, 271, 271, 3))
        xf = model.apply(variables, x, method=USOTNet.search_features)
        assert xf.shape == (1, 33, 33, 256)
        zf = jnp.zeros((1, 7, 7, 256))
        cls, bbox = model.apply(variables, xf, zf,
                                method=USOTNet.track_offline)
        assert cls.shape == (1, 27, 27, 1)

    def test_train_forward_naive(self, small_model_vars, rng):
        model, variables = small_model_vars
        b = 2
        t = jnp.asarray(rng.normal(size=(b, 127, 127, 3)).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(b, 255, 255, 3)).astype(np.float32))
        lab = jnp.asarray((rng.random((b, 25, 25)) > 0.8).astype(np.float32))
        reg = jnp.abs(jnp.asarray(rng.normal(size=(b, 25, 25, 4)).astype(np.float32))) + 1
        regw = jnp.asarray((rng.random((b, 25, 25)) > 0.7).astype(np.float32))
        tb = jnp.asarray([[2.0, 2.0, 12.0, 12.0]] * b)

        (l_ori, l_mem, l_reg), _ = model.apply(
            variables, t, s, lab, reg, regw, tb,
            method=USOTNet.forward_train, mutable=["batch_stats"])
        assert l_mem is None
        assert np.isfinite(float(l_ori)) and np.isfinite(float(l_reg))

    def test_train_forward_cycle_memory_and_grads(self, small_model_vars, rng):
        model, variables = small_model_vars
        b, m = 1, 2
        t = jnp.asarray(rng.normal(size=(b, 127, 127, 3)).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(b, 255, 255, 3)).astype(np.float32))
        lab = jnp.asarray((rng.random((b, 25, 25)) > 0.8).astype(np.float32))
        reg = jnp.abs(jnp.asarray(rng.normal(size=(b, 25, 25, 4)).astype(np.float32))) + 1
        regw = jnp.asarray((rng.random((b, 25, 25)) > 0.7).astype(np.float32))
        tb = jnp.asarray([[2.0, 2.0, 12.0, 12.0]] * b)
        sm = jnp.asarray(rng.normal(size=(b, m, 255, 255, 3)).astype(np.float32))
        sb = jnp.asarray([[6.0, 6.0, 18.0, 18.0]] * b)

        def loss_fn(params):
            (l_ori, l_mem, l_reg), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                t, s, lab, reg, regw, tb, search_memory=sm, search_bbox=sb,
                cls_ratio=0.5, method=USOTNet.forward_train,
                mutable=["batch_stats"])
            return 0.3 * l_ori + 0.6 * l_mem + l_reg

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # Head gradients must be nonzero
        gsum = sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree.leaves(grads["connect"]))
        assert gsum > 0


class TestFusedInit:
    def test_init_variables_fused_matches_plain(self):
        """init_variables must work for a fused_xcorr model even when the
        init device cannot lower Pallas (the CPU fallback used to crash
        with 'Only interpret mode is supported on CPU backend'), and the
        parameter tree must be identical to the non-fused model's."""
        fused = build_usot(mem_size=2, fused_xcorr=True)
        plain = build_usot(mem_size=2, fused_xcorr=False)
        vf = init_variables(fused, jax.random.PRNGKey(0))
        vp = init_variables(plain, jax.random.PRNGKey(0))
        leaves_f = jax.tree_util.tree_leaves_with_path(vf)
        leaves_p = jax.tree_util.tree_leaves_with_path(vp)
        assert [p for p, _ in leaves_f] == [p for p, _ in leaves_p]
        for (_, a), (_, b) in zip(leaves_f, leaves_p):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFoldedHead:
    """The folded/fused inference head (BN folded into kernels, the 6
    search-encoder convs fused to 3 double-wide, ConfFusion's 2 to 1)
    must reproduce track_memory_encoded_batched to f32 rounding."""

    def test_fused_matches_reference_path(self, small_model_vars):
        from usot_tpu.models.head import fold_inference_head
        model, variables = small_model_vars
        rng = np.random.default_rng(3)
        B, M = 2, 5
        xf = jnp.asarray(rng.normal(size=(B, 31, 31, 256)), jnp.float32)
        zf = jnp.asarray(rng.normal(size=(B, 7, 7, 256)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(B * M, 7, 7, 256)),
                            jnp.float32)
        zf_enc = model.apply(variables, zf, method=USOTNet.encode_template)
        q = model.apply(variables, feats,
                        method=USOTNet.encode_memory_kernels)
        queue_enc = tuple(t.reshape((B, M) + t.shape[1:]) for t in q)

        ref = model.apply(variables, xf, zf_enc, queue_enc,
                          method=USOTNet.track_memory_encoded_batched)
        fused = fold_inference_head(variables)
        got = model.apply(variables, xf, zf_enc, queue_enc, fused,
                          method=USOTNet.track_memory_encoded_fused)
        for r, g, name in zip(ref, got, ("cls", "bbox", "cls_mem")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=name)

    def test_engine_fused_head_optin(self, small_model_vars):
        """fused_head is opt-in (measured 3% SLOWER than XLA's own
        folding on v5e — PERF_NOTES.md); the pack rides inside the
        engine's variables tree when enabled."""
        from usot_tpu.tracker.config import TrackerConfig
        from usot_tpu.tracker.engine import ScanEngine
        model, variables = small_model_vars
        p = TrackerConfig()
        p.instance_size = p.small_sz
        p.renew()
        p.sf_size = p.score_size
        eng = ScanEngine(model, variables, p, im_h=120, im_w=160,
                         max_frames=16, chunk=2, fused_head=True)
        assert "fused_head" in eng.variables
        eng2 = ScanEngine(model, variables, p, im_h=120, im_w=160,
                          max_frames=16, chunk=2)
        assert "fused_head" not in eng2.variables
