"""Golden tests for the op layer against independent numpy oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.ops import (
    setup_filter, upfirdn2d, filter2d, upsample2d, downsample2d,
    bias_act, conv2d_resample, modulated_conv2d, wrapped_const_noise,
)
from tests.oracles import upfirdn2d_ref, conv2d_nhwc_ref, modulated_conv2d_ref

RNG = np.random.RandomState(0)


def rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


class TestUpfirdn2d:
    @pytest.mark.parametrize("up,down,padding", [
        (1, 1, 0), (1, 1, 2), (2, 1, 1), (1, 2, 1), (2, 2, 2),
        (1, 1, [1, 2, 0, 3]), (2, 1, [-1, 2, 1, -1]), (1, 1, -1),
    ])
    @pytest.mark.parametrize("ftaps", [None, [1, 3, 3, 1], [1, 2, 1]])
    def test_matches_oracle(self, up, down, padding, ftaps):
        x = rand(2, 8, 8, 3)
        f = setup_filter(ftaps) if ftaps is not None else None
        got = np.asarray(upfirdn2d(jnp.asarray(x), f, up=up, down=down,
                                   padding=padding))
        want = upfirdn2d_ref(x, f, up=up, down=down, padding=padding)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_gain_and_flip(self):
        x = rand(1, 6, 6, 2)
        f = setup_filter([1, 3, 3, 1], flip_filter=False)
        fa = np.array([[0.0, 1.0], [2.0, 0.5]], np.float32)
        got = np.asarray(upfirdn2d(jnp.asarray(x), fa, padding=1,
                                   flip_filter=True, gain=2.0))
        want = upfirdn2d_ref(x, fa, padding=1, flip_filter=True, gain=2.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        del f

    def test_separable_equals_outer(self):
        taps = np.array([1, 3, 3, 1], np.float32)
        f1d = taps / taps.sum()
        x = rand(1, 8, 8, 1)
        got = np.asarray(upfirdn2d(jnp.asarray(x), f1d, padding=2))
        want = upfirdn2d_ref(x, np.outer(f1d, f1d), padding=2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grad_is_transposed_upfirdn(self):
        # VJP of upsample should relate to downsample (spec: the reference
        # implements backward as transposed upfirdn, upfirdn2d.py:246-264).
        x = jnp.asarray(rand(1, 6, 6, 1))
        f = setup_filter([1, 3, 3, 1])

        def loss(x):
            return jnp.sum(upsample2d(x, f) ** 2)

        g = jax.grad(loss)(x)
        assert g.shape == x.shape
        # Finite-difference check on one element.
        eps = 1e-3
        x2 = x.at[0, 3, 3, 0].add(eps)
        fd = (loss(x2) - loss(x)) / eps
        np.testing.assert_allclose(float(fd), float(g[0, 3, 3, 0]),
                                   rtol=1e-2, atol=1e-2)

    def test_second_order_grad(self):
        # R1/path-length regularizers need grad-of-grad through resampling.
        x = jnp.asarray(rand(1, 4, 4, 1))
        f = setup_filter([1, 3, 3, 1])

        def inner(x):
            return jnp.sum(jnp.sin(upsample2d(x, f)))

        def outer(x):
            g = jax.grad(inner)(x)
            return jnp.sum(g ** 2)

        gg = jax.grad(outer)(x)
        assert np.all(np.isfinite(np.asarray(gg)))


class TestResampleWrappers:
    def test_upsample_shape_and_dc(self):
        f = setup_filter([1, 3, 3, 1])
        x = jnp.ones((1, 8, 8, 2), jnp.float32)
        y = upsample2d(x, f)
        assert y.shape == (1, 16, 16, 2)
        # DC preservation away from borders.
        np.testing.assert_allclose(np.asarray(y)[0, 4:12, 4:12, :], 1.0,
                                   rtol=1e-5)

    def test_downsample_shape_and_dc(self):
        f = setup_filter([1, 3, 3, 1])
        x = jnp.ones((1, 16, 16, 2), jnp.float32)
        y = downsample2d(x, f)
        assert y.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(np.asarray(y)[0, 2:6, 2:6, :], 1.0,
                                   rtol=1e-5)

    def test_filter2d_keeps_shape(self):
        f = setup_filter([1, 2, 1])
        x = jnp.asarray(rand(1, 9, 9, 1))
        assert filter2d(x, f).shape == x.shape


class TestBiasAct:
    def test_lrelu_gain_clamp(self):
        x = jnp.asarray(rand(4, 7))
        b = jnp.asarray(rand(7))
        y = np.asarray(bias_act(x, b, act="lrelu", clamp=0.5))
        xb = np.asarray(x) + np.asarray(b)[None]
        want = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2.0)
        want = np.clip(want, -0.5, 0.5)
        np.testing.assert_allclose(y, want, rtol=1e-6, atol=1e-6)

    def test_all_activations_finite(self):
        x = jnp.asarray(rand(2, 5))
        for act in ["linear", "relu", "lrelu", "tanh", "sigmoid", "elu",
                    "selu", "softplus", "swish"]:
            y = bias_act(x, act=act)
            assert np.all(np.isfinite(np.asarray(y)))

    def test_bias_dim(self):
        x = jnp.asarray(rand(2, 3, 4, 5))
        b = jnp.asarray(rand(5))
        y = bias_act(x, b, dim=-1)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x) + np.asarray(b), rtol=1e-6)

    def test_second_order_grad_tanh(self):
        x = jnp.asarray(rand(3, 3))

        def outer(x):
            g = jax.grad(lambda x: jnp.sum(bias_act(x, act="tanh") ** 2))(x)
            return jnp.sum(g ** 2)

        gg = jax.grad(outer)(x)
        assert np.all(np.isfinite(np.asarray(gg)))


class TestConv2dResample:
    def test_plain_conv(self):
        x = rand(2, 8, 8, 4)
        w = rand(3, 3, 4, 6)
        got = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w),
                                         padding=1))
        want = conv2d_nhwc_ref(x, w, pad=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_down2(self):
        x = rand(1, 8, 8, 3)
        w = rand(3, 3, 3, 5)
        f = setup_filter([1, 3, 3, 1])
        got = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f,
                                         down=2, padding=1))
        # Oracle: pad-adjusted FIR then strided conv (spec composition).
        fw = 4
        p = [1 + (fw - 2 + 1) // 2, 1 + (fw - 2) // 2] * 2
        xf = upfirdn2d_ref(x, f, padding=[p[0], p[1], p[2], p[3]])
        want = conv2d_nhwc_ref(xf, w, stride=2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        assert got.shape == (1, 4, 4, 5)

    def test_up2_shape_and_linearity(self):
        x = rand(2, 8, 8, 3)
        w = rand(3, 3, 3, 4)
        f = setup_filter([1, 3, 3, 1])
        y = conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f, up=2,
                            padding=1)
        assert y.shape == (2, 16, 16, 4)
        # Linearity in x.
        y2 = conv2d_resample(jnp.asarray(2 * x), jnp.asarray(w), f=f, up=2,
                             padding=1)
        np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y),
                                   rtol=1e-4, atol=1e-4)

    def test_up2_matches_explicit_composition(self):
        # up path == zero-upsample+pad+w-conv+f-filter*up^2 (generic spec).
        x = rand(1, 6, 6, 2)
        w = rand(3, 3, 2, 3)
        f = setup_filter([1, 3, 3, 1])
        got = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f,
                                         up=2, padding=1))
        fw = 4
        px0 = 1 + (fw + 1) // 2
        px1 = 1 + (fw - 2) // 2
        t = upfirdn2d_ref(x, f, up=2, padding=[px0, px1, px0, px1], gain=4)
        want = conv2d_nhwc_ref(t, w)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestModulatedConv2d:
    def test_demodulated_matches_fused_oracle(self):
        x = rand(3, 8, 8, 4)
        w = rand(3, 3, 4, 6)
        s = rand(3, 4) * 0.5 + 1.0
        got = np.asarray(modulated_conv2d(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(s), padding=1))
        want = modulated_conv2d_ref(x, w, s, demodulate=True, padding=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_no_demodulate(self):
        x = rand(2, 4, 4, 3)
        w = rand(1, 1, 3, 3)
        s = rand(2, 3)
        got = np.asarray(modulated_conv2d(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(s), demodulate=False))
        want = modulated_conv2d_ref(x, w, s, demodulate=False)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_noise_add(self):
        x = rand(2, 4, 4, 3)
        w = rand(3, 3, 3, 5)
        s = np.abs(rand(2, 3)) + 0.5
        noise = rand(2, 4, 4, 1)
        got = np.asarray(modulated_conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
            noise=jnp.asarray(noise), padding=1))
        base = np.asarray(modulated_conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), padding=1))
        np.testing.assert_allclose(got, base + noise, rtol=1e-4, atol=1e-4)

    def test_up2_demod(self):
        x = rand(2, 8, 8, 4)
        w = rand(3, 3, 4, 4)
        s = np.abs(rand(2, 4)) + 0.5
        f = setup_filter([1, 3, 3, 1])
        y = modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                             up=2, padding=1, resample_filter=f)
        assert y.shape == (2, 16, 16, 4)
        # Demodulated output should have roughly unit variance.
        v = float(jnp.var(y))
        assert 0.05 < v < 20.0

    def test_grad_flows_to_all(self):
        x = jnp.asarray(rand(2, 4, 4, 3))
        w = jnp.asarray(rand(3, 3, 3, 4))
        s = jnp.asarray(np.abs(rand(2, 3)) + 0.5)

        def loss(x, w, s):
            return jnp.sum(modulated_conv2d(x, w, s, padding=1) ** 2)

        gx, gw, gs = jax.grad(loss, argnums=(0, 1, 2))(x, w, s)
        for g in (gx, gw, gs):
            assert float(jnp.max(jnp.abs(g))) > 0
            assert np.all(np.isfinite(np.asarray(g)))


class TestWrappedNoise:
    def test_zero_position_is_identity(self):
        noise = jnp.asarray(rand(16, 16))
        pos = jnp.zeros((1, 2), jnp.int32)
        out = np.asarray(wrapped_const_noise(noise, pos, 128))[0, :, :, 0]
        # At (0,0) the sample grid hits exact texels: out[i,j] = noise[j, i]
        # (the reference's transposed indexing, preserved for parity).  The
        # final row/col wraps back to texel 0 because the reference grid ends
        # at coordinate 1.0 and 1.0 % 1 == 0.
        np.testing.assert_allclose(out[:15, :15], np.asarray(noise).T[:15, :15],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out[15, :15], np.asarray(noise).T[0, :15],
                                   rtol=1e-5, atol=1e-5)

    def test_consistency_across_overlapping_patches(self):
        # The whole point: two patches overlapping in canvas space must see
        # identical noise in the overlap, when offset by a multiple that maps
        # to exact texels.
        r_img = 128
        r_l = r_img  # full-res layer => integer texel offsets
        noise = jnp.asarray(rand(r_l, r_l))
        p0 = jnp.asarray([[0, 0]], jnp.int32)
        p1 = jnp.asarray([[0, 32]], jnp.int32)  # shift right 32 px
        n0 = np.asarray(wrapped_const_noise(noise, p0, r_img))[0, :, :, 0]
        n1 = np.asarray(wrapped_const_noise(noise, p1, r_img))[0, :, :, 0]
        # Patch at x=32: its column j corresponds to canvas column 32+j;
        # overlap region: n1[:, j] == n0[:, 32+j] for j < r_l-32 (up to the
        # mod(R-1) wrap boundary).
        np.testing.assert_allclose(n1[:, :64], n0[:, 32:96], rtol=1e-4,
                                   atol=1e-4)

    def test_batched_positions(self):
        noise = jnp.asarray(rand(8, 8))
        pos = jnp.asarray([[0, 0], [5, 9], [100, 3]], jnp.int32)
        out = wrapped_const_noise(noise, pos, 128)
        assert out.shape == (3, 8, 8, 1)
        assert np.all(np.isfinite(np.asarray(out)))
