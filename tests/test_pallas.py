"""Pallas kernels vs their jnp oracles (interpret mode on CPU)."""
import numpy as np
import pytest
import chex

import jax
import jax.numpy as jnp

from uaps_tpu.pallas.pseudo_label import fused_pseudo_label, _reference_impl
from uaps_tpu.pallas.perturb import fused_dropout


class TestFusedPseudoLabel:
    def test_matches_oracle(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((4, 2, 16, 128, 4)).astype(np.float32) * 3)
        w = jnp.asarray(np.asarray([0.4, 0.3, 0.2, 0.1], np.float32))
        oracle = _reference_impl(logits, w)
        kern = fused_pseudo_label(logits, w, force_pallas=True)
        np.testing.assert_array_equal(np.asarray(kern), np.asarray(oracle))

    def test_bf16_inputs(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((2, 1, 8, 128, 3)).astype(np.float32) * 4
        ).astype(jnp.bfloat16)
        w = jnp.asarray(np.asarray([0.6, 0.4], np.float32))
        oracle = _reference_impl(logits, w)
        kern = fused_pseudo_label(logits, w, force_pallas=True)
        # bf16: ties may differ at quantization boundaries; demand >=99.9%
        agree = (np.asarray(kern) == np.asarray(oracle)).mean()
        assert agree > 0.999

    def test_no_gradient(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((2, 1, 8, 128, 3)).astype(np.float32))
        w = jnp.ones((2,)) / 2

        def f(lg):
            pl = fused_pseudo_label(lg, w)
            return jnp.sum(pl.astype(jnp.float32))
        g = jax.grad(f)(logits)
        assert float(jnp.abs(g).max()) == 0.0


class TestFusedDropout:
    def test_distribution_and_scaling(self):
        x = jnp.ones((64, 128))
        out = np.asarray(fused_dropout(x, jnp.asarray(7, jnp.int32), 0.5))
        zero_frac = (out == 0).mean()
        assert abs(zero_frac - 0.5) < 0.05
        nz = out[out != 0]
        np.testing.assert_allclose(nz, 2.0, rtol=1e-6)

    def test_backward_mask_matches_forward(self):
        """The regenerated backward mask must equal the forward mask:
        grad of sum(dropout(x)) is exactly mask/keep_prob."""
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (32, 128)).astype(np.float32))
        seed = jnp.asarray(123, jnp.int32)
        out, vjp = jax.vjp(lambda v: fused_dropout(v, seed, 0.5), x)
        (gx,) = vjp(jnp.ones_like(out))
        fwd_mask = np.asarray(out != 0)
        bwd_mask = np.asarray(gx != 0)
        np.testing.assert_array_equal(fwd_mask, bwd_mask)
        np.testing.assert_allclose(np.asarray(gx)[fwd_mask], 2.0, rtol=1e-6)

    def test_deterministic_given_seed(self):
        x = jnp.ones((16, 128))
        a = fused_dropout(x, jnp.asarray(5, jnp.int32), 0.3)
        b = fused_dropout(x, jnp.asarray(5, jnp.int32), 0.3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = fused_dropout(x, jnp.asarray(6, jnp.int32), 0.3)
        assert not np.array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="interpret-mode PRNG yields zeros on CPU; the "
                           "kernel contracts run on real TPU (also driven "
                           "by scripts/tpu_perturb_check.py)")
class TestFusedPerturbKernels:
    """Contracts of the pallas perturbation kernels (pallas/perturb.py)
    vs reference semantics (UAPS_unet.py:156-185). The public custom-vjp
    wrappers take the jax.random path on CPU; here the kernels themselves
    run via the internal _call helpers."""

    def _x(self, shape=(3, 8, 16, 128)):
        return jnp.asarray(np.random.default_rng(3).standard_normal(
            shape).astype(np.float32))

    def test_dropout_kernel_gridded(self):
        from uaps_tpu.pallas.perturb import _dropout_call
        x = jnp.ones((4, 8, 16, 128))
        seed = jnp.asarray(11, jnp.int32)
        out = np.asarray(_dropout_call(seed, x, 0.5, False))
        zero_frac = (out == 0).mean()
        assert abs(zero_frac - 0.5) < 0.02
        nz = out[out != 0]
        np.testing.assert_allclose(nz, 2.0, rtol=1e-6)
        # per-example masks must DIFFER (F.dropout semantics)
        assert not np.array_equal(out[0], out[1])
        # and regenerate identically
        out2 = np.asarray(_dropout_call(seed, x, 0.5, False))
        np.testing.assert_array_equal(out, out2)

    def test_feature_noise_kernel_batch_shared(self):
        from uaps_tpu.pallas.perturb import _noise_call
        x = jnp.ones((3, 8, 16, 128))
        seed = jnp.asarray(21, jnp.int32)
        out = np.asarray(_noise_call(seed, x, 0.3, False))
        factor = out - 1.0  # x=1 -> out = 1 + noise
        assert factor.min() >= -0.3 - 1e-6 and factor.max() < 0.3 + 1e-6
        assert abs(factor.mean()) < 0.01  # symmetric around 0
        # noise SHARED across the batch (reference x.shape[1:] draw)
        np.testing.assert_array_equal(out[0], out[1])
        np.testing.assert_array_equal(out[0], out[2])

    @pytest.mark.parametrize("ax", [1, 3])
    def test_feature_dropout_kernel_semantics(self, ax):
        from uaps_tpu.pallas.perturb import _fdrop_call
        x = jnp.asarray(np.abs(np.random.default_rng(5).standard_normal(
            (2, 8, 16, 128))).astype(np.float32))
        seed = jnp.asarray(31, jnp.int32)
        out = np.asarray(_fdrop_call(seed, x, ax, False))
        xn = np.asarray(x)
        att = xn.mean(axis=ax, keepdims=True)
        for b in range(2):
            zero = np.broadcast_to(out[b] == 0, xn[b].shape) | (xn[b] == 0)
            # recover the implied threshold: zeros exactly where att >= t
            a_b = np.broadcast_to(att[b], xn[b].shape)
            dropped = (out[b] == 0) & (xn[b] != 0)
            kept = out[b] != 0
            if dropped.any() and kept.any():
                t_lo = a_b[kept].max()      # kept pixels: att < t
                t_hi = a_b[dropped].min()   # dropped pixels: att >= t
                assert t_hi >= t_lo - 1e-5
                mx = att[b].max()
                assert 0.7 * mx - 1e-5 <= t_hi <= 0.9 * mx + 1e-5
            # kept values pass through unchanged
            np.testing.assert_allclose(out[b][kept], xn[b][kept],
                                       rtol=1e-6)


class TestPerturbLaneRouting:
    """Routing/chunking logic of the lane-aligned elementwise view
    (pallas/perturb.py _lane_blocks / _fdrop_pallas_ok). The NHWC
    [B,256,256,16] ConvBlock dropout of the deep-supervision models OOM'd
    scoped VMEM (64 MB: int32 random bits lane-padded 16->128) until the
    kernels switched to this view; these pin the dispatch decisions."""

    def test_lane_blocks_aligned(self):
        from uaps_tpu.pallas.perturb import _lane_blocks
        # the shape class that OOM'd: per-example 256*256*16 = 2^20
        sub, chunk = _lane_blocks(jnp.zeros((16, 256, 256, 16)))
        assert sub == 256 * 256 * 16 // 128 and sub % chunk == 0
        assert chunk == 2048  # full power-of-two chunks
        # NCHW level-0 activations
        sub2, chunk2 = _lane_blocks(jnp.zeros((16, 16, 256, 256)))
        assert sub2 == sub and chunk2 == 2048
        # odd per-example size: falls back to the layout-shaped path
        assert _lane_blocks(jnp.zeros((4, 3, 200, 200)))[0] == 0
        # rank-2 test shapes: single-program path
        assert _lane_blocks(jnp.zeros((64, 128)))[0] == 0

    def test_fdrop_gate(self):
        from uaps_tpu.pallas.perturb import _fdrop_pallas_ok
        # NHWC big-spatial: att [1,256,256,1] pads 1->128 lanes = 32 MB
        assert not _fdrop_pallas_ok(jnp.zeros((16, 256, 256, 16)), -1)
        # NCHW same data: att [1,1,256,256] stays 0.25 MB — but the x
        # block itself is double-buffered in+out: bf16 (2 MB block)
        # fits, f32 (4 MB -> 16 MB scoped) OOM'd on-chip (r4) and must
        # gate off
        assert _fdrop_pallas_ok(
            jnp.zeros((16, 16, 256, 256), jnp.bfloat16), 1)
        assert not _fdrop_pallas_ok(jnp.zeros((16, 16, 256, 256)), 1)
        # NHWC small-spatial (the uaps skip levels that already ran)
        assert _fdrop_pallas_ok(jnp.zeros((16, 64, 64, 64)), -1)

    def test_lane_path_matches_layout_path_interpret(self):
        """Same seed, same data, two views: the lane-aligned kernel must
        produce A valid dropout (not necessarily the same bitstream);
        pin determinism + scaling through the public API on CPU."""
        from uaps_tpu.pallas.perturb import fused_dropout
        x = jnp.ones((4, 8, 16, 16))  # rest=2048, lane-aligned
        seed = jnp.asarray(3, jnp.int32)
        a = np.asarray(fused_dropout(x, seed, 0.5))
        b = np.asarray(fused_dropout(x, seed, 0.5))
        np.testing.assert_array_equal(a, b)
        nz = a[a != 0]
        np.testing.assert_allclose(nz, 2.0, rtol=1e-6)


class TestFusedPerturbFallbacks:
    """The platform-generic custom-vjp wrappers (jax.random path on CPU)
    must be differentiable with mask-regenerating backward semantics."""

    def test_public_api_cpu_fallbacks_differentiable(self):
        from uaps_tpu.pallas.perturb import (fused_feature_dropout,
                                             fused_feature_noise)
        x = jnp.asarray(np.random.default_rng(3).standard_normal(
            (2, 8, 16, 32)).astype(np.float32))
        seed = jnp.asarray(7, jnp.int32)
        out, vjp = jax.vjp(lambda v: fused_feature_noise(v, seed, 0.3), x)
        (gx,) = vjp(jnp.ones_like(out))
        # dx = 1 + noise = out/x elementwise
        np.testing.assert_allclose(np.asarray(gx),
                                   np.asarray(out) / np.asarray(x),
                                   rtol=1e-4)
        out2, vjp2 = jax.vjp(
            lambda v: fused_feature_dropout(v, seed, -1), x)
        (gx2,) = vjp2(jnp.ones_like(out2))
        np.testing.assert_array_equal(np.asarray(gx2 != 0),
                                      np.asarray(out2 != 0))


class TestMaxPoolKernel:
    """pallas/maxpool.py (custom elementwise-mask VJP) vs the XLA
    reduce_window/select-and-scatter composition. Ties must route to the
    FIRST window max in row-major order — both implementations'
    semantics (and torch nn.MaxPool2d's, utilities/UAPS_unet.py:53)."""

    def _oracle(self, x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 1, 2, 2), (1, 1, 2, 2), "VALID")

    def test_forward_matches(self, rng):
        from uaps_tpu.pallas.maxpool import max_pool_2x2_fast
        x = jnp.asarray(rng.standard_normal((2, 4, 32, 256)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(max_pool_2x2_fast(x, True)),
            np.asarray(self._oracle(x)))

    def test_backward_matches_select_and_scatter(self, rng):
        from uaps_tpu.pallas.maxpool import max_pool_2x2_fast
        x = jnp.asarray(rng.standard_normal((2, 4, 32, 256)), jnp.float32)
        cot = jnp.asarray(rng.standard_normal((2, 4, 16, 128)),
                          jnp.float32)

        def via_kernel(v):
            return jnp.sum(max_pool_2x2_fast(v, True) * cot)

        def via_xla(v):
            return jnp.sum(self._oracle(v) * cot)

        gk = jax.grad(via_kernel)(x)
        gx = jax.grad(via_xla)(x)
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(gx))

    def test_backward_tie_routing(self):
        from uaps_tpu.pallas.maxpool import max_pool_2x2_fast
        # all-equal window: gradient must go to the FIRST element only
        x = jnp.ones((1, 1, 16, 256), jnp.float32)
        g = jax.grad(lambda v: jnp.sum(max_pool_2x2_fast(v, True)))(x)
        gx = jax.grad(lambda v: jnp.sum(self._oracle(v)))(x)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(gx))
        assert float(g[0, 0, 0, 0]) == 1.0 and float(g[0, 0, 0, 1]) == 0.0

    def test_bf16(self, rng):
        from uaps_tpu.pallas.maxpool import max_pool_2x2_fast
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 256)),
                        jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(max_pool_2x2_fast(x, True)),
            np.asarray(self._oracle(x)))


class TestConv3x3Kernels:
    def _data(self, rng, b=2, h=16, w=128, cin=16, cout=8):
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        return x, k

    def test_nhwc_kernel_matches_xla(self, rng):
        from uaps_tpu.pallas.conv3x3 import (conv3x3_forward,
                                             reference_conv3x3)
        x, k = self._data(rng)
        np.testing.assert_allclose(
            np.asarray(conv3x3_forward(x, k, interpret=True)),
            np.asarray(reference_conv3x3(x, k)), rtol=1e-4, atol=1e-5)

    def test_nchw_kernel_matches_xla(self, rng):
        from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast
        from uaps_tpu.pallas.conv3x3 import reference_conv3x3
        x, k = self._data(rng)
        np.testing.assert_allclose(
            np.asarray(conv3x3_fast(x, k, True)),
            np.asarray(reference_conv3x3(x, k)), rtol=1e-4, atol=1e-5)

    def test_nchw_gradients_match_xla(self, rng):
        from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast
        from uaps_tpu.pallas.conv3x3 import reference_conv3x3
        x, k = self._data(rng)
        gk = jax.grad(lambda x, w: jnp.sum(conv3x3_fast(x, w, True) ** 2),
                      (0, 1))(x, k)
        gr = jax.grad(lambda x, w: jnp.sum(reference_conv3x3(x, w) ** 2),
                      (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                                   rtol=1e-3, atol=1e-2)

    def test_odd_channel_counts(self, rng):
        from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast
        from uaps_tpu.pallas.conv3x3 import reference_conv3x3
        x, k = self._data(rng, cin=3, cout=16)  # the in_conv shape
        np.testing.assert_allclose(
            np.asarray(conv3x3_fast(x, k, True)),
            np.asarray(reference_conv3x3(x, k)), rtol=1e-4, atol=1e-5)

    def test_variants_match_taps(self, rng):
        from uaps_tpu.pallas.conv3x3_nchw import (conv3x3_nchw,
                                                  conv3x3_nchw_wgrad)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, 8, 16, 128)), jnp.float32)
        ref_f = np.asarray(conv3x3_nchw(x, w, True, "taps"))
        ref_w = np.asarray(conv3x3_nchw_wgrad(x, g, True, "taps"))
        for variant in ("im2col", "dhdw", "flat", "dwout", "dwnp",
                        "dwm", "dwmf"):
            np.testing.assert_allclose(
                np.asarray(conv3x3_nchw(x, w, True, variant)), ref_f,
                rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(conv3x3_nchw_wgrad(x, g, True, variant)), ref_w,
                rtol=1e-4, atol=1e-4)
        # dwnp1/dwnp1f are wgrad-only (all nine taps in ONE packed
        # matmul; dwnp1f additionally on flat lane views)
        for wg in ("dwnp1", "dwnp1f"):
            np.testing.assert_allclose(
                np.asarray(conv3x3_nchw_wgrad(x, g, True, wg)), ref_w,
                rtol=1e-4, atol=1e-4)

    def test_packed_variants_unaligned_cout(self, rng, monkeypatch):
        """Co % 8 != 0 (the n_cls logits heads): the packed variants
        zero-pad Co to the next 8-multiple (r5) and must match taps;
        with UAPS_HEAD_COPAD=0 the r4 dwnp fallback must also match."""
        from uaps_tpu.pallas.conv3x3_nchw import (conv3x3_nchw,
                                                  conv3x3_nchw_wgrad)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 4)) * 0.1,
                        jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, 4, 16, 128)), jnp.float32)
        ref_f = np.asarray(conv3x3_nchw(x, w, True, "taps"))
        ref_w = np.asarray(conv3x3_nchw_wgrad(x, g, True, "taps"))
        for copad in ("1", "0"):
            monkeypatch.setenv("UAPS_HEAD_COPAD", copad)
            for v in ("dwm", "dwmf"):
                np.testing.assert_allclose(
                    np.asarray(conv3x3_nchw(x, w, True, v)), ref_f,
                    rtol=1e-4, atol=1e-4, err_msg=f"fwd {v} copad={copad}")
            for wg in ("dwnp1", "dwnp1f", "dwm", "dwmf"):
                np.testing.assert_allclose(
                    np.asarray(conv3x3_nchw_wgrad(x, g, True, wg)), ref_w,
                    rtol=1e-4, atol=1e-4, err_msg=f"wg {wg} copad={copad}")

    def test_flat_conv_vjp_matches_nchw(self, rng):
        """conv3x3_fast_flat (the ConvBlock flat-island entry: 3-D
        [B,C,H*W] in/out, lane-pad halo) must match the 4-D chain for
        value, dx and dW through the full custom VJP."""
        from uaps_tpu.pallas.conv3x3_nchw import (conv3x3_fast_flat,
                                                  conv3x3_fast_nchw)
        h, wdt = 16, 128
        x = jnp.asarray(rng.standard_normal((2, 16, h, wdt)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        xf = x.reshape(2, 16, h * wdt)

        v4, (dx4, dw4) = jax.value_and_grad(
            lambda xx, ww: jnp.sum(
                conv3x3_fast_nchw(xx, ww, True, "dwmf") ** 2),
            (0, 1))(x, w)
        vf, (dxf, dwf) = jax.value_and_grad(
            lambda xx, ww: jnp.sum(
                conv3x3_fast_flat(xx, ww, (h, wdt), True) ** 2),
            (0, 1))(xf, w)
        np.testing.assert_allclose(float(vf), float(v4), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dxf).reshape(dx4.shape), np.asarray(dx4),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dwf), np.asarray(dw4),
                                   rtol=1e-4, atol=1e-4)
        y4 = np.asarray(conv3x3_fast_nchw(x, w, True, "dwmf"))
        yf = np.asarray(conv3x3_fast_flat(xf, w, (h, wdt), True))
        np.testing.assert_allclose(yf.reshape(y4.shape), y4,
                                   rtol=1e-5, atol=1e-5)

    def test_dwk_matches_taps(self, rng, monkeypatch):
        """UAPS_DWK=1 (dh-in-K one-matmul dwmf twin) must match taps for
        the forward, the Co-padded head case, and the full flat VJP."""
        from uaps_tpu.pallas.conv3x3_nchw import (conv3x3_fast_flat,
                                                  conv3x3_nchw)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        w4 = jnp.asarray(rng.standard_normal((3, 3, 16, 4)) * 0.1,
                         jnp.float32)
        ref = np.asarray(conv3x3_nchw(x, w, True, "taps"))
        ref4 = np.asarray(conv3x3_nchw(x, w4, True, "taps"))
        xf = x.reshape(2, 16, 16 * 128)
        vf_ref, (dxr, dwr) = jax.value_and_grad(
            lambda xx, ww: jnp.sum(
                conv3x3_fast_flat(xx, ww, (16, 128), True) ** 2),
            (0, 1))(xf, w)
        for env in ("1", "0"):   # dwk default AND the 3-matmul fallback
            monkeypatch.setenv("UAPS_DWK", env)
            np.testing.assert_allclose(
                np.asarray(conv3x3_nchw(x, w, True, "dwmf")), ref,
                rtol=1e-5, atol=1e-5, err_msg=f"dwk={env}")
            np.testing.assert_allclose(
                np.asarray(conv3x3_nchw(x, w4, True, "dwmf")), ref4,
                rtol=1e-5, atol=1e-5, err_msg=f"dwk={env}")
            vf, (dx, dw) = jax.value_and_grad(
                lambda xx, ww: jnp.sum(
                    conv3x3_fast_flat(xx, ww, (16, 128), True) ** 2),
                (0, 1))(xf, w)
            np.testing.assert_allclose(float(vf), float(vf_ref),
                                       rtol=1e-5)
            np.testing.assert_allclose(np.asarray(dx), np.asarray(dxr),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(dw), np.asarray(dwr),
                                       rtol=1e-4, atol=1e-4)

    def test_packed_head_full_vjp_unaligned_cout(self, rng):
        """The full custom-VJP chain through a Co=4 dwmf head (fwd +
        dgrad with Cin=4 + padded packed wgrad) must match taps."""
        from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast_nchw
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 4)) * 0.1,
                        jnp.float32)

        def grads(variant):
            return jax.grad(
                lambda xx, ww: jnp.sum(
                    conv3x3_fast_nchw(xx, ww, True, variant) ** 2),
                argnums=(0, 1))(x, w)

        ref_dx, ref_dw = grads("taps")
        for v in ("dwm", "dwmf"):
            dx, dw = grads(v)
            np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw),
                                       rtol=1e-4, atol=1e-4)

    def test_wgrad_variant_override_matches(self, rng, monkeypatch):
        """UAPS_WGRAD_VARIANT decouples the wgrad kernel from the forward
        variant (the prepadded residual's W pad differs between dwnp and
        the rest, so the bwd re-pads/slices); every override must produce
        the same dW through the full custom-VJP chain."""
        from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast_nchw
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                        jnp.float32)

        def grads(fwd_variant):
            return jax.grad(
                lambda xx, ww: jnp.sum(
                    conv3x3_fast_nchw(xx, ww, True, fwd_variant) ** 2),
                argnums=(0, 1))(x, w)

        monkeypatch.delenv("UAPS_WGRAD_VARIANT", raising=False)
        ref_dx, ref_dw = grads("dwnp")
        for override in ("taps", "im2col", "dhdw", "dwnp", "dwnp1",
                         "dwnp1f", "dwm", "dwmf"):
            monkeypatch.setenv("UAPS_WGRAD_VARIANT", override)
            for fwd in ("dwnp", "taps", "dwm", "dwmf"):
                dx, dw = grads(fwd)
                np.testing.assert_allclose(np.asarray(dx),
                                           np.asarray(ref_dx),
                                           rtol=1e-4, atol=1e-4)
                np.testing.assert_allclose(np.asarray(dw),
                                           np.asarray(ref_dw),
                                           rtol=1e-4, atol=1e-4)

    def test_dwout_gradients_match_taps(self, rng):
        """dwout folds dw shifts into masked f32 lane-rolls (+flat
        output): the full custom-VJP chain must agree with taps."""
        from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast_nchw
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                        jnp.float32)

        def loss(variant):
            return jax.value_and_grad(
                lambda xx, ww: jnp.sum(
                    conv3x3_fast_nchw(xx, ww, True, variant) ** 2),
                (0, 1))(x, w)

        (v_t, g_t) = loss("taps")
        for variant in ("dwout", "flat", "dwnp"):
            v_v, g_v = loss(variant)
            np.testing.assert_allclose(float(v_v), float(v_t), rtol=1e-6)
            # different accumulation order -> f32 summation noise
            np.testing.assert_allclose(np.asarray(g_v[0]),
                                       np.asarray(g_t[0]),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(g_v[1]),
                                       np.asarray(g_t[1]),
                                       rtol=1e-4, atol=1e-4)

    def test_unknown_variant_errors(self):
        """A typo'd UAPS_CONV_VARIANT must raise, not silently run
        'taps' labeled as something else (review finding)."""
        from uaps_tpu.pallas.conv3x3_nchw import (conv3x3_nchw,
                                                  conv3x3_nchw_wgrad)
        x = jnp.zeros((1, 8, 16, 128), jnp.float32)
        w = jnp.zeros((3, 3, 8, 16), jnp.float32)
        g = jnp.zeros((1, 16, 16, 128), jnp.float32)
        with pytest.raises(ValueError, match="unknown conv variant"):
            conv3x3_nchw(x, w, True, "tap")
        with pytest.raises(ValueError, match="unknown conv variant"):
            conv3x3_nchw_wgrad(x, g, True, "imcol")

    def test_gated_backward_large_cin(self, rng):
        """cin > 32 routes dgrad/wgrad to XLA (measured faster on v5e);
        interpret mode forces the pallas branch, so compare the two gate
        paths by calling the XLA-branch formulas directly."""
        from uaps_tpu.pallas.conv3x3_nchw import _xla_conv_nhwc
        from uaps_tpu.pallas.conv3x3 import reference_conv3x3
        x, k = self._data(rng, cin=64, cout=32)
        g = jnp.asarray(rng.standard_normal((2, 16, 128, 32)), jnp.float32)
        w_rot = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
        dx_gate = _xla_conv_nhwc(g, w_rot)
        _, wvjp = jax.vjp(lambda ww: _xla_conv_nhwc(x, ww), k)
        dw_gate = wvjp(g)[0]
        dx_ref, dw_ref = jax.vjp(
            lambda xx, ww: reference_conv3x3(xx, ww), x, k)[1](g)
        np.testing.assert_allclose(np.asarray(dx_gate), np.asarray(dx_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dw_gate), np.asarray(dw_ref),
                                   rtol=1e-4, atol=1e-3)


class TestFusedCeDice:
    def test_matches_ops(self, rng):
        from uaps_tpu.pallas.ce_dice import fused_ce_dice
        from uaps_tpu.ops import cross_entropy_loss, softmax_dice_loss
        logits = jnp.asarray(
            rng.standard_normal((2, 16, 128, 4)).astype(np.float32) * 3)
        labels = jnp.asarray(rng.integers(0, 4, (2, 16, 128)), jnp.int32)
        ce, dice = fused_ce_dice(logits, labels)
        np.testing.assert_allclose(
            float(ce), float(cross_entropy_loss(logits, labels)), rtol=1e-5)
        np.testing.assert_allclose(
            float(dice), float(softmax_dice_loss(logits, labels)),
            rtol=1e-5)

    def test_gradient_matches_ops(self, rng):
        from uaps_tpu.pallas.ce_dice import fused_ce_dice
        from uaps_tpu.ops import cross_entropy_loss, softmax_dice_loss
        logits = jnp.asarray(
            rng.standard_normal((1, 8, 128, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, (1, 8, 128)), jnp.int32)
        gk = jax.grad(lambda lg: sum(fused_ce_dice(lg, labels)) * 0.5)(
            logits)
        gr = jax.grad(lambda lg: 0.5 * (cross_entropy_loss(lg, labels)
                                        + softmax_dice_loss(lg, labels)))(
            logits)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-8)

    def test_asymmetric_upstream_grads(self, rng):
        """CE and Dice get DIFFERENT upstream weights in some methods."""
        from uaps_tpu.pallas.ce_dice import fused_ce_dice
        from uaps_tpu.ops import cross_entropy_loss, softmax_dice_loss
        logits = jnp.asarray(
            rng.standard_normal((1, 8, 128, 4)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 4, (1, 8, 128)), jnp.int32)

        def lk(lg):
            ce, dice = fused_ce_dice(lg, labels)
            return 0.7 * ce + 0.3 * dice

        def lr(lg):
            return (0.7 * cross_entropy_loss(lg, labels)
                    + 0.3 * softmax_dice_loss(lg, labels))
        np.testing.assert_allclose(np.asarray(jax.grad(lk)(logits)),
                                   np.asarray(jax.grad(lr)(logits)),
                                   rtol=1e-4, atol=1e-8)


class TestConvStats:
    """conv3x3_nchw_stats: per-channel moments from the kernel accumulator
    + analytic VJP folding (dy_eff = dy + ds1 + 2 y ds2)."""

    def test_moments_match_reference(self, rng):
        from uaps_tpu.pallas.conv3x3_nchw import conv3x3_nchw_stats
        x = jnp.asarray(rng.standard_normal((2, 16, 32, 256)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        y, s1, s2 = conv3x3_nchw_stats(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1),
                                   np.asarray(ref.sum((0, 2, 3))),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s2),
                                   np.asarray((ref * ref).sum((0, 2, 3))),
                                   rtol=1e-5)

    def test_vjp_matches_reference(self, rng):
        from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast_nchw_stats
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1,
                        jnp.float32)

        def f(x, w):
            y, s1, s2 = conv3x3_fast_nchw_stats(x, w, True)
            return (y ** 2).mean() + 0.3 * s1.sum() + 0.1 * s2.sum()

        def fr(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
            return (y ** 2).mean() + 0.3 * y.sum() + 0.1 * (y * y).sum()

        gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(fr, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-4, atol=1e-5)


class TestFusedUncertainty:
    """fused_uncertainty vs (a) its jnp oracle and (b) the actual unfused
    UAPS pipeline (softmax/mean/kl_divergence_map/mix-argmax), value AND
    gradient."""

    def _unfused(self, logits, w):
        from uaps_tpu.ops.losses import kl_divergence_map
        softs = [jax.nn.softmax(logits[d], axis=-1)
                 for d in range(logits.shape[0])]
        preds = sum(softs) / logits.shape[0]
        var = jnp.stack([kl_divergence_map(logits[d], preds)
                         for d in range(logits.shape[0])])
        mixed = sum(wi * jax.lax.stop_gradient(s) for wi, s in zip(w, softs))
        return var, jnp.argmax(mixed, axis=-1).astype(jnp.int32)

    def test_forward_matches_unfused(self, rng):
        from uaps_tpu.pallas.uncertainty import fused_uncertainty
        logits = jnp.asarray(
            rng.standard_normal((4, 2, 16, 128, 4)).astype(np.float32) * 3)
        w = jnp.asarray(np.asarray([0.4, 0.3, 0.2, 0.1], np.float32))
        var_ref, ps_ref = self._unfused(logits, w)
        var, ps = fused_uncertainty(logits, w, force_pallas=True)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ps), np.asarray(ps_ref))

    def test_gradient_matches_unfused(self, rng):
        """The UAPS use: l_uncert = mean(var), gates = mean(exp(-var_d)).
        Gradients must agree with jax-autodiff through the unfused path
        (preds NOT detached — both paths keep the mean-pred gradient)."""
        from uaps_tpu.pallas.uncertainty import fused_uncertainty
        logits = jnp.asarray(
            rng.standard_normal((3, 1, 8, 128, 4)).astype(np.float32) * 2)
        w = jnp.asarray(np.asarray([0.5, 0.3, 0.2], np.float32))

        def loss_fused(lg):
            var, _ = fused_uncertainty(lg, w, force_pallas=True)
            gates = jnp.mean(jnp.exp(-var), axis=(1, 2, 3))
            return jnp.mean(var) + jnp.sum(gates * jnp.arange(3.0))

        def loss_unfused(lg):
            var, _ = self._unfused(lg, w)
            gates = jnp.mean(jnp.exp(-var), axis=(1, 2, 3))
            return jnp.mean(var) + jnp.sum(gates * jnp.arange(3.0))

        v1, g1 = jax.value_and_grad(loss_fused)(logits)
        v2, g2 = jax.value_and_grad(loss_unfused)(logits)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=2e-6, rtol=1e-4)

    def test_cpu_fallback_path(self, rng):
        """Without force_pallas on CPU the oracle runs — same API/shapes,
        grads flow."""
        from uaps_tpu.pallas.uncertainty import fused_uncertainty
        logits = jnp.asarray(
            rng.standard_normal((2, 1, 8, 16, 4)).astype(np.float32))
        w = jnp.asarray(np.asarray([0.5, 0.5], np.float32))
        var, ps = fused_uncertainty(logits, w)
        assert var.shape == (2, 1, 8, 16) and ps.shape == (1, 8, 16)
        g = jax.grad(lambda lg: jnp.mean(
            fused_uncertainty(lg, w)[0]))(logits)
        assert bool(jnp.isfinite(g).all())


class TestPoolNCHWKernel:
    """pallas/pool_nchw.py (fwd + bwd kernels, interpret mode) vs the XLA
    reduce_window/select-and-scatter composition. Ties route to the FIRST
    window max in row-major order — XLA's GE comparator and torch
    nn.MaxPool2d semantics (utilities/UAPS_unet.py:53)."""

    def _oracle(self, x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 1, 2, 2), (1, 1, 2, 2), "VALID")

    def test_forward_matches(self, rng):
        from uaps_tpu.pallas.pool_nchw import max_pool_2x2_nchw
        x = jnp.asarray(rng.standard_normal((2, 16, 32, 256)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(max_pool_2x2_nchw(x, True)),
            np.asarray(self._oracle(x)))

    def test_forward_bf16(self, rng):
        from uaps_tpu.pallas.pool_nchw import max_pool_2x2_nchw
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 128)),
                        jnp.bfloat16)
        out = max_pool_2x2_nchw(x, True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(out, np.float32),
            np.asarray(self._oracle(x), np.float32))

    def test_backward_matches_select_and_scatter(self, rng):
        from uaps_tpu.pallas.pool_nchw import max_pool_2x2_nchw
        # quantize to force many in-window ties
        x = jnp.asarray(
            np.round(rng.standard_normal((2, 16, 32, 256)) * 2) / 2,
            jnp.float32)
        cot = jnp.asarray(rng.standard_normal((2, 16, 16, 128)),
                          jnp.float32)
        gk = jax.grad(
            lambda v: jnp.sum(max_pool_2x2_nchw(v, True) * cot))(x)
        gx = jax.grad(lambda v: jnp.sum(self._oracle(v) * cot))(x)
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(gx))

    def test_backward_all_tie_routing(self):
        from uaps_tpu.pallas.pool_nchw import max_pool_2x2_nchw
        x = jnp.ones((1, 4, 16, 128), jnp.float32)
        g = jax.grad(lambda v: jnp.sum(max_pool_2x2_nchw(v, True)))(x)
        gx = jax.grad(lambda v: jnp.sum(self._oracle(v)))(x)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(gx))
        assert float(g[0, 0, 0, 0]) == 1.0 and float(g[0, 0, 0, 1]) == 0.0

    def test_shape_gate_and_dispatch_fallback(self, rng):
        from uaps_tpu.models.unet import max_pool_2x2
        from uaps_tpu.pallas.pool_nchw import pool_pallas_ok
        assert pool_pallas_ok(jnp.zeros((1, 16, 256, 256)))
        assert not pool_pallas_ok(jnp.zeros((1, 16, 64, 64)))   # W < 128
        assert not pool_pallas_ok(jnp.zeros((1, 16, 20, 128)))  # H % 16
        # pool_backend="pallas" on CPU falls back to reduce_window
        x = jnp.asarray(rng.standard_normal((1, 8, 32, 256)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(max_pool_2x2(x, "nchw", "auto", "pallas")),
            np.asarray(self._oracle(x)))


class TestFlatBNStats:
    """ConvBlock(bn_backend='flat') — BN moments reduced on the conv's
    flat [B, C, H*W] view via StatsBatchNorm — must match the default
    nn.BatchNorm path numerically (params and batch_stats trees are
    identical by construction)."""

    def test_matches_default_bn(self, rng):
        from uaps_tpu.models.unet import ConvBlock
        x = jnp.asarray(rng.standard_normal((2, 8, 32, 128)), jnp.float32)
        kw = dict(features=16, dropout_rate=0.0, dtype=jnp.float32,
                  layout="nchw")
        ref = ConvBlock(**kw, bn_backend="auto")
        flat = ConvBlock(**kw, bn_backend="flat")
        v_ref = ref.init({"params": jax.random.PRNGKey(0)}, x, train=True)
        v_flat = flat.init({"params": jax.random.PRNGKey(0)}, x, train=True)
        chex.assert_trees_all_close(v_ref["params"], v_flat["params"])
        y_ref, m_ref = ref.apply(v_ref, x, train=True,
                                 mutable=["batch_stats"])
        y_flat, m_flat = flat.apply(v_flat, x, train=True,
                                    mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y_flat), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        chex.assert_trees_all_close(m_flat["batch_stats"],
                                    m_ref["batch_stats"],
                                    rtol=2e-5, atol=2e-5)
        # eval path uses running stats identically
        ye_ref = ref.apply(v_ref, x, train=False)
        ye_flat = flat.apply(v_flat, x, train=False)
        np.testing.assert_allclose(np.asarray(ye_flat),
                                   np.asarray(ye_ref),
                                   rtol=2e-5, atol=2e-5)


class TestChainConvKernels:
    """pallas/block_conv.py — the r4 fused ConvBlock chain (VERDICT r3
    #1). Kernel parity + full VJPs in interpret mode against the jnp
    reference twins (which share the math INCLUDING the position-hashed
    dropout bitstream), then ConvBlock-level equivalence of the chain
    path vs the default path. Matches reference UAPS_unet.py:31-47."""

    B, CIN, COUT, H, W = 2, 8, 16, 64, 128

    def _data(self):
        from uaps_tpu.pallas import block_conv as bc
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(self.B, self.CIN, self.H, self.W),
                        jnp.float32)
        w = jnp.asarray(0.1 * rng.randn(3, 3, self.CIN, self.COUT),
                        jnp.float32)
        f = jnp.asarray(0.5 + rng.rand(self.CIN), jnp.float32)
        s = jnp.asarray(0.1 * rng.randn(self.CIN), jnp.float32)
        cos = [jnp.asarray(rng.randn(self.B, self.COUT, self.H, self.W),
                           jnp.float32),
               jnp.asarray(rng.randn(self.COUT), jnp.float32),
               jnp.asarray(rng.randn(self.COUT), jnp.float32)]
        return bc, x, w, f, s, jnp.int32(1234), cos

    def test_plain_fwd_and_vjp(self):
        bc, x, w, f, s, seed, (yt, c1, c2) = self._data()
        y, s1, s2 = bc.chain_conv_plain(x, w, True)
        yr, s1r, s2r = bc.chain_ref_plain(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                                   rtol=1e-5, atol=5e-3)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                                   rtol=1e-5, atol=5e-3)

        def lk(x, w):
            y, s1, s2 = bc.chain_conv_plain(x, w, True)
            return jnp.sum(y * yt) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

        def lr(x, w):
            y, s1, s2 = bc.chain_ref_plain(x, w)
            return jnp.sum(y * yt) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

        gk = jax.grad(lk, (0, 1))(x, w)
        gr = jax.grad(lr, (0, 1))(x, w)
        for a, b in zip(gk, gr):
            d = (np.abs(np.asarray(a - b)).max()
                 / (np.abs(np.asarray(b)).max() + 1e-9))
            assert d < 1e-4, d

    @pytest.mark.parametrize("rate", [0.0, 0.3])
    def test_bnl_fwd_and_vjp(self, rate):
        bc, x, w, f, s, seed, (yt, c1, c2) = self._data()
        y, s1, s2 = bc.chain_conv_bnl(x, f, s, w, seed, rate, True)
        yr, s1r, s2r = bc.chain_ref_bnl(x, f, s, w, seed, rate)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                                   rtol=1e-4, atol=5e-3)

        def lk(x, f, s, w):
            y, s1, s2 = bc.chain_conv_bnl(x, f, s, w, seed, rate, True)
            return jnp.sum(y * yt) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

        def lr(x, f, s, w):
            y, s1, s2 = bc.chain_ref_bnl(x, f, s, w, seed, rate)
            return jnp.sum(y * yt) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

        gk = jax.grad(lk, (0, 1, 2, 3))(x, f, s, w)
        gr = jax.grad(lr, (0, 1, 2, 3))(x, f, s, w)
        for a, b in zip(gk, gr):
            d = (np.abs(np.asarray(a - b)).max()
                 / (np.abs(np.asarray(b)).max() + 1e-9))
            assert d < 1e-4, d

    def test_hash_keep_rate_and_determinism(self):
        bc = self._data()[0]
        keep = bc.hash_keep_ref(jnp.int32(7), (4, 16, 64, 128), 0.3)
        m = float(np.asarray(keep).mean())
        assert abs(m - 0.7) < 0.01, m
        keep2 = bc.hash_keep_ref(jnp.int32(7), (4, 16, 64, 128), 0.3)
        assert np.array_equal(np.asarray(keep), np.asarray(keep2))
        keep3 = bc.hash_keep_ref(jnp.int32(8), (4, 16, 64, 128), 0.3)
        assert not np.array_equal(np.asarray(keep), np.asarray(keep3))

    def test_convblock_chain_matches_default(self):
        from uaps_tpu.models.unet import ConvBlock
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 64, 128), jnp.float32)
        kw = dict(features=16, dropout_rate=0.0, layout="nchw")
        ref = ConvBlock(conv_backend="auto", **kw)
        chn = ConvBlock(conv_backend="chain", **kw)
        v = ref.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        v2 = chn.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        chex.assert_trees_all_close(v["params"], v2["params"])
        y1, u1 = ref.apply(v, x, train=True, mutable=["batch_stats"])
        y2, u2 = chn.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   rtol=2e-5, atol=2e-5)
        chex.assert_trees_all_close(u2["batch_stats"], u1["batch_stats"],
                                    rtol=2e-5, atol=2e-5)
        ye1 = ref.apply(v, x, train=False)
        ye2 = chn.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(ye2), np.asarray(ye1),
                                   rtol=2e-5, atol=2e-5)

        def loss(params, m):
            out, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out * y1)

        g1 = jax.grad(loss)(v["params"], ref)
        g2 = jax.grad(loss)(v["params"], chn)
        for k in ("Conv_0", "Conv_1", "BatchNorm_0", "BatchNorm_1"):
            for p in g1[k]:
                if p == "bias" and k.startswith("Conv"):
                    # chain gives the mathematically exact zero (bias
                    # cancels through train-mode BN); the default path
                    # leaves catastrophic-cancellation noise
                    assert float(jnp.abs(g2[k][p]).max()) == 0.0
                    continue
                a, b = np.asarray(g2[k][p]), np.asarray(g1[k][p])
                d = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
                assert d < 1e-4, (k, p, d)

    def test_convblock_chain_dropout_stats(self):
        from uaps_tpu.models.unet import ConvBlock
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 64, 128), jnp.float32)
        ref = ConvBlock(conv_backend="auto", features=16,
                        dropout_rate=0.5, layout="nchw",
                        dropout_backend="xla")
        chn = ConvBlock(conv_backend="chain", features=16,
                        dropout_rate=0.5, layout="nchw")
        v = ref.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        r = {"dropout": jax.random.PRNGKey(7)}
        y1, _ = ref.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs=r)
        y2, _ = chn.apply(v, x, train=True, mutable=["batch_stats"],
                          rngs=r)
        # different RNG streams -> statistical agreement only
        assert abs(float(y1.mean()) - float(y2.mean())) < 0.02
        assert abs(float(y1.std()) - float(y2.std())) < 0.02
        # eval mode: dropout off, exact agreement
        ye1 = ref.apply(v, x, train=False)
        ye2 = chn.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(ye2), np.asarray(ye1),
                                   rtol=2e-5, atol=2e-5)
