import numpy as np
import jax
import jax.numpy as jnp
import pytest

from usot_tpu.ops.prroi import prroi_pool, prroi_pool_same_batch
from usot_tpu.ops.xcorr import (xcorr_depthwise, xcorr_depthwise_conv,
                                xcorr_depthwise_ref)


def bilinear_interp_np(F, y, x):
    """Bilinear interpolation with zero padding outside [0,H)x[0,W)."""
    H, W = F.shape

    def get(h, w):
        if 0 <= h < H and 0 <= w < W:
            return F[h, w]
        return 0.0

    h0, w0 = int(np.floor(y)), int(np.floor(x))
    dy, dx = y - h0, x - w0
    return (
        get(h0, w0) * (1 - dy) * (1 - dx)
        + get(h0, w0 + 1) * (1 - dy) * dx
        + get(h0 + 1, w0) * dy * (1 - dx)
        + get(h0 + 1, w0 + 1) * dy * dx
    )


def prroi_numeric(F, roi, ph, pw, n_samples=120):
    """Brute-force numerical integration reference for one channel."""
    x1, y1, x2, y2 = roi
    roi_w = max(x2 - x1, 0.0)
    roi_h = max(y2 - y1, 0.0)
    bw, bh = roi_w / pw, roi_h / ph
    out = np.zeros((ph, pw))
    if bw * bh == 0:
        return out
    for i in range(ph):
        for j in range(pw):
            ys = y1 + bh * i + (np.arange(n_samples) + 0.5) * bh / n_samples
            xs = x1 + bw * j + (np.arange(n_samples) + 0.5) * bw / n_samples
            acc = 0.0
            for yy in ys:
                for xx in xs:
                    acc += bilinear_interp_np(F, yy, xx)
            out[i, j] = acc / (n_samples * n_samples)
    return out


def prroi_closed_form(F, roi, ph, pw):
    """NumPy oracle for one channel: the reference CUDA kernel's exact
    closed-form bilinear integral per unit cell (ref:
    prroi_pooling_gpu_impl.cu:72-106 `PrRoIPoolingMatCalculation`,
    :150-212 `PrRoIPoolingForward`), not numerical quadrature."""
    H, W = F.shape

    def get(h, w):
        return F[h, w] if 0 <= h < H and 0 <= w < W else 0.0

    def K(alpha, lim):  # integral of the bilinear tent over [alpha, lim]
        return lim - 0.5 * lim * lim - alpha + 0.5 * alpha * alpha

    def mat(s_h, s_w, e_h, e_w, y0, x0, y1, x1):
        kx_s = K(x0 - s_w, x1 - s_w)
        kx_e = K(e_w - x1, e_w - x0)
        ky_s = K(y0 - s_h, y1 - s_h)
        ky_e = K(e_h - y1, e_h - y0)
        return (get(s_h, s_w) * kx_s * ky_s + get(s_h, e_w) * kx_e * ky_s
                + get(e_h, s_w) * kx_s * ky_e + get(e_h, e_w) * kx_e * ky_e)

    x1r, y1r, x2r, y2r = roi
    roi_w = max(x2r - x1r, 0.0)
    roi_h = max(y2r - y1r, 0.0)
    bw, bh = roi_w / pw, roi_h / ph
    out = np.zeros((ph, pw))
    win_size = max(0.0, bw * bh)
    if win_size == 0:
        return out
    for i in range(ph):
        for j in range(pw):
            ws_w, ws_h = x1r + bw * j, y1r + bh * i
            we_w, we_h = ws_w + bw, ws_h + bh
            s_w, e_w = int(np.floor(ws_w)), int(np.ceil(we_w))
            s_h, e_h = int(np.floor(ws_h)), int(np.ceil(we_h))
            acc = 0.0
            for w_it in range(s_w, e_w):
                for h_it in range(s_h, e_h):
                    acc += mat(h_it, w_it, h_it + 1, w_it + 1,
                               max(ws_h, float(h_it)),
                               max(ws_w, float(w_it)),
                               min(we_h, float(h_it) + 1.0),
                               min(we_w, float(w_it) + 1.0))
            out[i, j] = acc / win_size
    return out


class TestPrRoIPool:
    def test_matches_cuda_closed_form_oracle(self, rng):
        """Our separable tent-integral einsum vs the reference CUDA
        kernel's closed form, over random ROIs incl. out-of-bounds."""
        F = rng.normal(size=(1, 11, 11, 2)).astype(np.float32)
        rois = [(1.3, 0.7, 6.9, 7.4), (-2.0, -1.5, 4.2, 9.8),
                (0.0, 0.0, 11.0, 11.0), (3.25, 3.75, 5.5, 4.25)]
        for roi in rois:
            out = prroi_pool(jnp.asarray(F), jnp.asarray([[0, *roi]]), 7, 7)
            for c in range(2):
                ref = prroi_closed_form(F[0, :, :, c], roi, 7, 7)
                np.testing.assert_allclose(np.asarray(out)[0, :, :, c], ref,
                                           atol=1e-5, err_msg=str(roi))

    def test_matches_numerical_integration(self, rng):
        F = rng.normal(size=(1, 9, 9, 1)).astype(np.float32)
        roi = (1.3, 0.7, 6.9, 7.4)
        out = prroi_pool(jnp.asarray(F), jnp.asarray([[0, *roi]]), 3, 3)
        ref = prroi_numeric(F[0, :, :, 0], roi, 3, 3)
        np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], ref, atol=2e-3)

    def test_integer_aligned_equals_avg_pool(self, rng):
        # RoI covering cells exactly: continuous average of the bilinear
        # surface over [a, a+k] differs from discrete avg pooling, so instead
        # test a 1x1 bin over an exact unit cell against the closed form.
        F = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
        out = prroi_pool(jnp.asarray(F), jnp.asarray([[0, 2.0, 3.0, 3.0, 4.0]]), 1, 1)
        # integral of bilinear over a unit cell = mean of 4 corners
        expect = 0.25 * (F[0, 3, 2] + F[0, 3, 3] + F[0, 4, 2] + F[0, 4, 3])
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], expect, rtol=1e-5)

    def test_out_of_bounds_zero_padding(self, rng):
        F = rng.normal(size=(1, 5, 5, 1)).astype(np.float32)
        roi = (-3.0, -3.0, 1.5, 2.5)
        out = prroi_pool(jnp.asarray(F), jnp.asarray([[0, *roi]]), 2, 2)
        ref = prroi_numeric(F[0, :, :, 0], roi, 2, 2)
        np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], ref, atol=2e-3)

    def test_degenerate_roi_is_zero(self, rng):
        F = rng.normal(size=(1, 5, 5, 1)).astype(np.float32)
        out = prroi_pool(jnp.asarray(F), jnp.asarray([[0, 2.0, 2.0, 2.0, 4.0]]), 2, 2)
        assert np.all(np.asarray(out) == 0)
        # And gradients through a degenerate roi must not be NaN
        g = jax.grad(
            lambda r: jnp.sum(prroi_pool(jnp.asarray(F), r[None], 2, 2))
        )(jnp.asarray([0.0, 2.0, 2.0, 2.0, 4.0]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_batch_index_gather(self, rng):
        F = rng.normal(size=(3, 7, 7, 4)).astype(np.float32)
        rois = jnp.asarray([[2, 1.0, 1.0, 5.0, 5.0], [0, 0.5, 0.5, 6.0, 6.0]])
        out = prroi_pool(jnp.asarray(F), rois, 7, 7)
        out2 = prroi_pool(jnp.asarray(F[2:3]), jnp.asarray([[0, 1.0, 1.0, 5.0, 5.0]]), 7, 7)
        np.testing.assert_allclose(np.asarray(out)[0], np.asarray(out2)[0], rtol=1e-5)

    def test_feature_gradient_finite_difference(self, rng):
        jax.config.update("jax_enable_x64", True)
        try:
            F = rng.normal(size=(1, 6, 6, 1)).astype(np.float64)
            roi = jnp.asarray([[0, 1.2, 0.8, 4.7, 5.1]], dtype=jnp.float64)

            def loss(f):
                return jnp.sum(prroi_pool(f, roi, 3, 3) ** 2)

            g = jax.grad(loss)(jnp.asarray(F))
            eps = 1e-5
            for (h, w) in [(2, 3), (0, 0), (5, 5)]:
                Fp = F.copy(); Fp[0, h, w, 0] += eps
                Fm = F.copy(); Fm[0, h, w, 0] -= eps
                fd = (loss(jnp.asarray(Fp)) - loss(jnp.asarray(Fm))) / (2 * eps)
                np.testing.assert_allclose(
                    np.asarray(g)[0, h, w, 0], fd, rtol=1e-4, atol=1e-6)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_coord_gradient_finite_difference(self, rng):
        jax.config.update("jax_enable_x64", True)
        try:
            F = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float64))
            roi0 = np.array([1.3, 0.9, 6.2, 6.8])

            def loss(r):
                rois = jnp.concatenate([jnp.zeros((1,), r.dtype), r])[None]
                return jnp.sum(prroi_pool(F, rois, 7, 7) ** 2)

            g = jax.grad(loss)(jnp.asarray(roi0))
            eps = 1e-6
            for i in range(4):
                rp = roi0.copy(); rp[i] += eps
                rm = roi0.copy(); rm[i] -= eps
                fd = (loss(jnp.asarray(rp)) - loss(jnp.asarray(rm))) / (2 * eps)
                np.testing.assert_allclose(
                    np.asarray(g)[i], fd, rtol=1e-3, atol=1e-6)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_same_batch_wrapper(self, rng):
        F = jnp.asarray(rng.normal(size=(2, 15, 15, 8)).astype(np.float32))
        boxes = jnp.asarray([[1.0, 2.0, 12.0, 13.0], [0.0, 0.0, 14.0, 14.0]])
        out = prroi_pool_same_batch(F, boxes, 7)
        assert out.shape == (2, 7, 7, 8)


class TestXcorr:
    @pytest.mark.parametrize("shape", [
        ((2, 31, 31, 8), (2, 5, 5, 8)),
        ((1, 25, 27, 4), (1, 1, 3, 4)),
        ((3, 10, 10, 16), (3, 3, 1, 16)),
    ])
    def test_matches_reference(self, rng, shape):
        xs, ks = shape
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        k = jnp.asarray(rng.normal(size=ks).astype(np.float32))
        out = xcorr_depthwise(x, k)
        ref = xcorr_depthwise_ref(x, k)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
        conv = xcorr_depthwise_conv(x, k)
        np.testing.assert_allclose(np.asarray(conv), np.asarray(ref),
                                   atol=1e-4)


class TestXcorrPallas:
    def test_pallas_kernel_matches_reference(self, rng):
        """Pallas TPU kernel (interpreter mode on CPU) vs naive reference."""
        from usot_tpu.ops.pallas.xcorr_kernel import xcorr_depthwise_pallas

        for xs, ks in [((2, 31, 31, 256), (2, 5, 5, 256)),
                       ((1, 27, 29, 256), (1, 3, 5, 256)),
                       ((2, 29, 27, 128), (2, 5, 3, 128))]:
            x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
            k = jnp.asarray(rng.normal(size=ks).astype(np.float32))
            out = xcorr_depthwise_pallas(x, k, interpret=True)
            ref = xcorr_depthwise_ref(x, k)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-4)


class TestFusedGroupDW:
    """The fused multi-kernel GroupDW path (Pallas, interpret mode on CPU)
    vs the reference repeat+pairwise route, through the REAL head module
    so weight folding and reshapes are covered."""

    def test_groupdw_fused_matches_naive(self, rng):
        from usot_tpu.ops.pallas.xcorr_kernel import xcorr_groupdw_pallas
        from usot_tpu.ops.xcorr import xcorr_depthwise

        B, M, C = 2, 3, 128
        shapes = [((B, 9, 9, C), (B, M, 5, 5, C)),
                  ((B, 7, 9, C), (B, M, 3, 5, C)),
                  ((B, 9, 7, C), (B, M, 5, 3, C))]
        xs = [jnp.asarray(rng.normal(size=s[0]), jnp.float32)
              for s in shapes]
        ks = [jnp.asarray(rng.normal(size=s[1]), jnp.float32)
              for s in shapes]
        ref = 0.0
        for x, k in zip(xs, ks):
            rep = jnp.repeat(x[:, None], M, axis=1).reshape(
                (B * M,) + x.shape[1:])
            kf = k.reshape((B * M,) + k.shape[2:])
            ref = ref + xcorr_depthwise(rep, kf).reshape(B, M, 5, 5, C)
        out = xcorr_groupdw_pallas(xs, ks, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_head_fused_flag_parity(self, rng):
        """memory_cls + offline through USOTNet with fused_xcorr on/off."""
        import jax
        from usot_tpu.models.usot import USOTNet

        kw = dict(mem_size=2, search_size=95, score_size=5, sf_size=11)
        base = USOTNet(**kw)
        fused = USOTNet(fused_xcorr=True, **kw)
        xf = jnp.asarray(rng.normal(size=(2, 11, 11, 256)), jnp.float32)
        zf = jnp.asarray(rng.normal(size=(2, 7, 7, 256)), jnp.float32)
        mem = jnp.asarray(rng.normal(size=(2, 3, 7, 7, 256)), jnp.float32)
        variables = base.init(jax.random.PRNGKey(0), xf, zf, mem,
                              method=USOTNet.track_memory_batched)
        outs_b = base.apply(variables, xf, zf, mem,
                            method=USOTNet.track_memory_batched)
        outs_f = fused.apply(variables, xf, zf, mem,
                             method=USOTNet.track_memory_batched)
        for a, b in zip(outs_b, outs_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)
