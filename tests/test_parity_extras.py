"""Tests for parity-completeness extras: alternative heads, metric zoo,
param summary, test fixture."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.models.synthesis import (
    color_mapping_init, color_mapping_apply,
    to_canvas_stroke_init, to_canvas_stroke_apply,
)
from brushstroke_engine_tpu.metrics.fid import (
    kernel_inception_distance, inception_score, extract_features,
)
from brushstroke_engine_tpu.metrics.ppl import compute_ppl
from brushstroke_engine_tpu.utils.util import print_param_summary
from brushstroke_engine_tpu.engine.canvas import PaintingHelper
from tests.helpers import make_engine

KEY = jax.random.PRNGKey(0)


class TestAlternativeHeads:
    def test_color_mapping_network(self):
        params = color_mapping_init(KEY, w_dim=16)
        w = jax.random.normal(KEY, (4, 16))
        colors = color_mapping_apply(params, w)
        assert colors.shape == (4, 3, 3)
        assert (np.abs(np.asarray(colors)) <= 1).all()

    def test_to_canvas_stroke_layer(self):
        params = to_canvas_stroke_init(KEY, in_ch=8, out_ch=3, w_dim=16)
        x = jax.random.normal(KEY, (2, 16, 16, 8))
        w = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        img, debug = to_canvas_stroke_apply(params, x, w)
        assert img.shape == (2, 16, 16, 3)
        assert debug["uvs"].shape == (2, 16, 16, 3)
        np.testing.assert_allclose(np.asarray(debug["uvs"]).sum(-1), 1.0,
                                   atol=1e-5)
        assert (np.asarray(debug["alpha_fg"]) >= 0).all()
        assert (np.asarray(debug["alpha_fg"]) <= 1).all()
        assert (np.abs(np.asarray(debug["canvas"])) <= 1).all()


class TestMetricZoo:
    def test_kid_identical_near_zero(self):
        rng = np.random.RandomState(0)
        f = rng.randn(64, 32)
        kid_same = kernel_inception_distance(f, f.copy(),
                                             max_subset_size=32)
        g = rng.randn(64, 32) + 3.0
        kid_diff = kernel_inception_distance(f, g, max_subset_size=32)
        # Unbiased MMD over random subsets: near zero for same-distribution,
        # clearly positive for shifted distributions.
        assert abs(kid_same) < 0.05 * abs(kid_diff)
        assert kid_diff > 0

    def test_inception_score_bounds(self):
        rng = np.random.RandomState(0)
        # Confident, diverse predictions -> higher IS than uniform.
        confident = np.eye(8)[rng.randint(0, 8, 64)] * 10.0
        uniform = np.zeros((64, 8))
        assert inception_score(confident) > inception_score(uniform)

    def test_ppl_runs(self):
        eng = make_engine()
        from brushstroke_engine_tpu.models.geo_encoder import \
            geo_encoder_encode
        geom = jnp.ones((1, 32, 32, 1))
        feats = geo_encoder_encode(eng.enc_cfg, eng.enc_params,
                                   eng.enc_state, geom, res=[0])
        ppl = compute_ppl(eng, feats, num_samples=4, batch=2)
        assert np.isfinite(ppl) and ppl >= 0


class TestMisc:
    def test_param_summary(self, capsys):
        params = {"layer": {"weight": np.zeros((4, 5)),
                            "bias": np.zeros(5)}}
        total = print_param_summary(params, "toy")
        assert total == 25
        out = capsys.readouterr().out
        assert "toy parameters: 25" in out

    def test_test_stroke_fixture(self):
        s = PaintingHelper.test_stroke(64)
        assert s.shape == (64, 64, 4)
        assert s[..., 3].max() == 255
