"""Tests for the Pallas fused-FIR-epilogue kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from brushstroke_engine_tpu.ops import pallas_fir as pf
from brushstroke_engine_tpu.ops.filters import setup_filter

RNG = np.random.RandomState(0)


def make_inputs(B=2, H=32, W=32, C=16, with_noise=False):
    x = jnp.asarray(RNG.randn(B, H + 3, W + 3, C).astype(np.float32))
    f = setup_filter([1, 3, 3, 1])
    d = jnp.asarray((RNG.rand(B, C) * 0.5 + 0.7).astype(np.float32))
    noise = jnp.asarray(RNG.randn(B, H, W, 1).astype(np.float32)) \
        if with_noise else None
    bias = jnp.asarray(RNG.randn(C).astype(np.float32))
    return x, f, d, noise, bias


class TestPallasFir:
    def test_matches_reference_no_noise(self):
        x, f, d, noise, bias = make_inputs()
        want = pf.fir4_epilogue_reference(x, f, d, None, bias, 1.4142, 256.0)
        with pltpu.force_tpu_interpret_mode():
            got = pf.fir4_epilogue(x, f, d, None, bias, 1.4142, 256.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_noise_falls_back_to_reference(self):
        x, f, d, noise, bias = make_inputs(with_noise=True)
        got = pf.fir4_epilogue(x, f, d, noise, bias, 1.4142, 256.0)
        want = pf.fir4_epilogue_reference(x, f, d, noise, bias, 1.4142,
                                          256.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_nonseparable_filter_falls_back(self):
        x, f, d, _n, bias = make_inputs()
        f_bad = np.asarray(RNG.randn(4, 4), np.float32)
        got = pf.fir4_epilogue(x, f_bad, d, None, bias, 1.0, None)
        want = pf.fir4_epilogue_reference(x, f_bad, d, None, bias, 1.0, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_no_clamp(self):
        x, f, d, _n, bias = make_inputs()
        want = pf.fir4_epilogue_reference(x, f, d, None, bias * 100, 1.0,
                                          None)
        with pltpu.force_tpu_interpret_mode():
            got = pf.fir4_epilogue(x, f, d, None, bias * 100, 1.0, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)

    def test_enable_flag(self):
        assert not pf.pallas_fir_enabled()
        pf.set_pallas_fir_enabled(True)
        assert pf.pallas_fir_enabled()
        pf.set_pallas_fir_enabled(False)
