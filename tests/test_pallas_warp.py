"""Tests for the Pallas fused two-pass ADA warp (interpret mode on CPU).

The XLA two-pass form (`train/augment.py:_affine_warp_twopass`) is the
executable spec; the kernel must reproduce it (weights identical, applied
in f32) on every transform class the ADA geometric block can draw.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from brushstroke_engine_tpu.ops import pallas_warp as pw
from brushstroke_engine_tpu.ops.precision import set_precision_mode
from brushstroke_engine_tpu.train import augment as aug

RNG = np.random.RandomState(0)
W = 128  # kernel eligibility floor (lane width)


def _mats(kinds):
    """Per-sample inverse affines for the named transform classes."""
    ms = []
    for kind in kinds:
        if kind == "identity":
            m = np.eye(3)
        elif kind == "translate":
            m = np.eye(3)
            m[0, 2], m[1, 2] = 7.35, -3.6
        elif kind == "scale":
            m = np.diag([1.7, 0.55, 1.0])     # minify x (s1>1), magnify y
        elif kind == "rotate":
            t = 0.5
            m = np.array([[np.cos(t), -np.sin(t), 2.0],
                          [np.sin(t), np.cos(t), -1.0],
                          [0, 0, 1.0]])
        elif kind == "near90":
            t = np.pi / 2 - 0.07              # quarter-turn factoring path
            m = np.array([[np.cos(t), -np.sin(t), 0.5],
                          [np.sin(t), np.cos(t), 0.0],
                          [0, 0, 1.0]])
        else:
            raise ValueError(kind)
        ms.append(m)
    return jnp.asarray(np.stack(ms).astype(np.float32))


def _images(b):
    return jnp.asarray(RNG.randn(b, W, W, 3).astype(np.float32))


@pytest.fixture(autouse=True)
def _strict_precision():
    # f32 everywhere so the XLA spec path and the kernel agree tightly.
    set_precision_mode("strict")
    yield
    set_precision_mode("strict")


class TestPallasWarp:
    @pytest.mark.parametrize("kinds", [
        ("identity", "translate"),
        ("scale", "rotate"),
        ("near90", "translate"),
    ])
    def test_matches_xla_twopass(self, kinds):
        imgs = _images(len(kinds))
        mat = _mats(kinds)
        want = aug._affine_warp_twopass(imgs, mat)
        with pltpu.force_tpu_interpret_mode():
            got = pw.affine_warp_twopass_pallas(imgs, mat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_no_antialias_matches(self):
        imgs = _images(2)
        mat = _mats(("scale", "rotate"))
        want = aug._affine_warp_twopass(imgs, mat, antialias=False)
        with pltpu.force_tpu_interpret_mode():
            got = pw.affine_warp_twopass_pallas(imgs, mat, antialias=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradient_matches(self):
        imgs = _images(2)
        mat = _mats(("rotate", "scale"))
        cot = jnp.asarray(RNG.randn(2, W, W, 3).astype(np.float32))

        def loss_xla(x):
            return jnp.sum(aug._affine_warp_twopass(x, mat) * cot)

        def loss_pal(x):
            return jnp.sum(pw.affine_warp_twopass_pallas(x, mat) * cot)

        want = jax.grad(loss_xla)(imgs)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_pal)(imgs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_second_order_grad_matches(self):
        """The Dr1 pattern: reverse-diff THROUGH the warp's backward pass
        (grad of an |d logits/d x|^2 penalty wrt x).  Exercises the
        mutually-recursive custom VJPs -- a raw pallas_call in the
        backward has no JVP rule and used to break this phase."""
        imgs = _images(2)
        mat = _mats(("rotate", "scale"))
        wvec = jnp.asarray(RNG.randn(3).astype(np.float32))

        def penalty(warp, x):
            def logits(xx):
                return jnp.sum(jnp.sin(warp(xx, mat)) * wvec)
            g = jax.grad(logits)(x)
            return jnp.sum(g * g)

        want = jax.grad(
            lambda x: penalty(aug._affine_warp_twopass, x))(imgs)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(
                lambda x: penalty(pw.affine_warp_twopass_pallas, x))(imgs)
        scale = float(jnp.max(jnp.abs(want)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4 * max(scale, 1.0))

    def test_dispatch_flag(self):
        imgs = _images(1)
        mat = _mats(("translate",))
        assert not pw.pallas_warp_enabled()
        pw.set_pallas_warp_enabled(True)
        try:
            assert pw.pallas_warp_enabled()
            assert pw.warp_eligible(imgs)
            # Ineligible shapes keep the XLA path even when enabled.
            assert not pw.warp_eligible(jnp.zeros((1, 64, 64, 3)))
            with pltpu.force_tpu_interpret_mode():
                got = aug._affine_warp(imgs, mat)
            want = aug._affine_warp_twopass(imgs, mat)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)
        finally:
            pw.set_pallas_warp_enabled(False)
