"""Tests for the metrics layer: lpips, color, geom metrics, FID, loops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.metrics.lpips import (
    lpips_batched, LPIPSModel, set_default_model, get_default_model,
)
from brushstroke_engine_tpu.metrics.color import (
    rgb2lab, compute_lab_metrics, srgb_to_linear, linear_to_srgb,
)
from brushstroke_engine_tpu.metrics import geom as gm
from brushstroke_engine_tpu.metrics import fid as fid_lib
from brushstroke_engine_tpu.metrics.stroke_generator import (
    PaintStrokeGenerator, RandomState,
)
from brushstroke_engine_tpu.metrics.metric_main import (
    paint_engine_metric_loop, forger_compute_fid, stitching_metric_loop,
)
from brushstroke_engine_tpu.engine.library import SeedBrushLibrary
from tests.helpers import make_engine

KEY = jax.random.PRNGKey(0)


class TestLpips:
    def test_zero_for_identical(self):
        x = jax.random.normal(KEY, (2, 32, 32, 3))
        d = lpips_batched(x, x)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    def test_positive_and_ordered(self):
        x = jax.random.normal(KEY, (2, 32, 32, 3))
        near = x + 0.01 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        far = x + 1.0 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
        d_near = float(jnp.mean(lpips_batched(x, near)))
        d_far = float(jnp.mean(lpips_batched(x, far)))
        assert 0 < d_near < d_far

    def test_finite_below_32px(self):
        """Inputs under ~32px used to hit zero-size feature maps in the
        stride/pool chain -> nan means; tiny inputs are upsampled now."""
        for size in (16, 25, 31):
            x = jax.random.normal(KEY, (2, size, size, 3))
            y = jax.random.normal(jax.random.PRNGKey(1), x.shape)
            d = np.asarray(lpips_batched(x, y))
            assert np.isfinite(d).all() and (d > 0).all(), size
            np.testing.assert_allclose(np.asarray(lpips_batched(x, x)),
                                       0.0, atol=1e-5)

    def test_deterministic_default_model(self):
        m1 = LPIPSModel.random_init(0)
        m2 = LPIPSModel.random_init(0)
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        y = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
        np.testing.assert_allclose(np.asarray(lpips_batched(x, y, m1)),
                                   np.asarray(lpips_batched(x, y, m2)))


class TestColor:
    def test_srgb_roundtrip(self):
        x = jnp.linspace(0, 1, 32)
        np.testing.assert_allclose(
            np.asarray(linear_to_srgb(srgb_to_linear(x))), np.asarray(x),
            atol=1e-5)

    def test_lab_white_black(self):
        lab = np.asarray(rgb2lab(jnp.asarray([[1.0, 1.0, 1.0],
                                              [0.0, 0.0, 0.0]])))
        np.testing.assert_allclose(lab[0, 0], 100.0, atol=0.1)  # L of white
        np.testing.assert_allclose(lab[0, 1:], 0.0, atol=0.5)   # a,b of white
        np.testing.assert_allclose(lab[1, 0], 0.0, atol=0.1)    # L of black

    def test_lab_metrics_perfect_color(self):
        # Render = target color everywhere, opaque; FG = everything.
        target = np.asarray([[0.2, 0.5, 0.8]], np.float32)
        render = np.ones((1, 16, 16, 4), np.float32)
        render[..., :3] = target[0]
        geom = np.zeros((1, 16, 16, 1), np.float32)  # all FG
        m = compute_lab_metrics(jnp.asarray(target), jnp.asarray(render),
                                jnp.asarray(geom))
        assert m["LAB_E%"] == 0.0
        assert m["LAB_L2"] < 1e-3


class TestGeomMetrics:
    def make_render(self, alpha_bg=0.0, alpha_fg=1.0):
        geom = np.ones((2, 32, 32, 1), np.float32)
        geom[:, 12:20, 12:20] = 0.0  # FG square
        render = np.zeros((2, 32, 32, 4), np.float32)
        render[..., :3] = 0.5
        render[..., 3] = alpha_bg
        render[:, 12:20, 12:20, 3] = alpha_fg
        return jnp.asarray(render), jnp.asarray(geom)

    def test_transparency_clear_stroke(self):
        render, geom = self.make_render(alpha_bg=0.0, alpha_fg=1.0)
        m = gm.compute_transparency_metrics(render, geom)
        assert m["BG_CLARITY_MEAN"] > 0.95
        assert m["FG_OPACITY_MEDIAN"] == 1.0

    def test_transparency_muddy_background(self):
        render, geom = self.make_render(alpha_bg=0.8, alpha_fg=1.0)
        m = gm.compute_transparency_metrics(render, geom)
        assert m["BG_CLARITY_MEAN"] < 0.3

    def test_lpips_across_geo(self):
        render, _ = self.make_render()
        m = gm.compute_lpips_across_geo(render)
        assert np.isfinite(m["LPIPS_ACROSS_GEO"])

    def test_uniform_bg(self):
        render, geom = self.make_render()
        m = gm.compute_uniform_bg_lpips_metric(render, geom,
                                               patch_width=16)
        assert "LPIPS_UNIFORM_BG" in m

    def test_conservative_masks(self):
        geom = jnp.ones((1, 32, 32, 1))
        fg, bg = gm.get_conservative_fg_bg(geom)
        assert not np.asarray(fg).any()
        assert np.asarray(bg)[0, 16, 16, 0]


class TestFid:
    def test_identical_distributions_near_zero(self):
        rng = np.random.RandomState(0)
        imgs = (rng.rand(64, 32, 32, 3) * 255).astype(np.uint8)

        def batches():
            for i in range(0, 64, 16):
                yield imgs[i:i + 16]

        fid = fid_lib.fid_from_image_iterables(batches(), batches())
        assert fid < 1e-3

    def test_different_distributions_positive(self):
        rng = np.random.RandomState(0)
        a = (rng.rand(32, 32, 32, 3) * 255).astype(np.uint8)
        b = np.zeros_like(a)
        fid = fid_lib.fid_from_image_iterables([a], [b])
        assert fid > 0.01

    def test_feature_stats_streaming(self):
        s = fid_lib.FeatureStats(max_items=10)
        s.append(np.ones((6, fid_lib.FEATURE_DIM)))
        s.append(np.ones((6, fid_lib.FEATURE_DIM)))
        assert s.num_items == 10
        mean, cov = s.get_mean_cov()
        np.testing.assert_allclose(mean, 1.0)
        np.testing.assert_allclose(cov, 0.0, atol=1e-9)


class TestPrecisionRecall:
    def test_identical_sets_are_perfect(self):
        from brushstroke_engine_tpu.metrics.pr import compute_pr
        rng = np.random.RandomState(0)
        f = rng.randn(64, 16).astype(np.float32)
        p, r = compute_pr(f, f.copy(), nhood_size=3, row_batch_size=16)
        assert p == 1.0 and r == 1.0

    def test_disjoint_clusters_are_zero(self):
        from brushstroke_engine_tpu.metrics.pr import compute_pr
        rng = np.random.RandomState(0)
        real = rng.randn(48, 8).astype(np.float32)
        gen = rng.randn(48, 8).astype(np.float32) + 100.0
        p, r = compute_pr(real, gen, nhood_size=3, row_batch_size=32)
        assert p == 0.0 and r == 0.0

    def test_partial_overlap_matches_bruteforce(self):
        """Chunked MXU path == direct numpy k-NN hypersphere coverage
        (reference precision_recall.py:50-61 semantics, squared dists)."""
        from brushstroke_engine_tpu.metrics.pr import compute_pr
        rng = np.random.RandomState(1)
        real = rng.randn(40, 6).astype(np.float32)
        gen = np.concatenate([real[:20] + 0.01 * rng.randn(20, 6)
                              .astype(np.float32),
                              rng.randn(20, 6).astype(np.float32) + 8.0])
        k = 3

        def brute(manifold, probes):
            d_mm = np.linalg.norm(manifold[:, None] - manifold[None], axis=-1)
            kth = np.sort(d_mm, axis=1)[:, k]
            d_pm = np.linalg.norm(probes[:, None] - manifold[None], axis=-1)
            return float((d_pm <= kth[None]).any(1).mean())

        p, r = compute_pr(real, gen, nhood_size=k, row_batch_size=16)
        np.testing.assert_allclose(p, brute(real, gen), atol=1e-6)
        np.testing.assert_allclose(r, brute(gen, real), atol=1e-6)

    def test_from_images_and_vgg_detector(self):
        from brushstroke_engine_tpu.metrics.pr import (
            VGG16Features, compute_pr_from_images, vgg16_extract_features)
        rng = np.random.RandomState(0)
        imgs = (rng.rand(16, 32, 32, 3) * 255).astype(np.uint8)

        def batches():
            yield imgs[:8]
            yield imgs[8:]

        p, r = compute_pr_from_images(batches(), batches(), nhood_size=2)
        assert p == 1.0 and r == 1.0
        vgg = VGG16Features.random_init(0)
        feats = vgg16_extract_features(imgs[:4], vgg)
        assert feats.shape == (4, 512)
        assert np.all(np.isfinite(np.asarray(feats)))

    def test_vgg_from_torch_state_layout(self):
        """torchvision vgg16 state-dict layout converts (OIHW->HWIO,
        [out,in] fc -> [in,out])."""
        from brushstroke_engine_tpu.metrics.pr import (
            VGG16Features, vgg16_extract_features, _VGG_PLAN)
        rng = np.random.RandomState(0)
        state = {}
        cin = 3
        li = 0
        for spec in _VGG_PLAN:
            if spec == "M":
                li += 1
                continue
            state[f"features.{li}.weight"] = rng.randn(
                spec, cin, 3, 3).astype(np.float32) * 0.05
            state[f"features.{li}.bias"] = np.zeros(spec, np.float32)
            cin = spec
            li += 2  # conv + relu
        fin = 512 * 7 * 7
        for i in (0, 3):
            state[f"classifier.{i}.weight"] = rng.randn(
                4096, fin).astype(np.float32) * 0.001
            state[f"classifier.{i}.bias"] = np.zeros(4096, np.float32)
            fin = 4096
        vgg = VGG16Features.from_torch_state(state)
        assert len(vgg.convs) == 13 and len(vgg.fcs) == 2
        assert vgg.convs[0]["weight"].shape == (3, 3, 3, 64)
        feats = vgg16_extract_features(
            (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8), vgg)
        assert feats.shape == (2, 4096)
        assert np.all(np.isfinite(np.asarray(feats)))


class TestStrokeGenerator:
    def make_generator(self, batch=2):
        eng = make_engine()
        return PaintStrokeGenerator(batch, eng, RandomState(0))

    def test_generate_with_random_style(self):
        gen = self.make_generator()
        geom = np.ones((2, 32, 32, 1), np.float32)
        geom[:, 8:24, 8:24] = 0
        gen.set_new_geom(geom)
        gen.set_new_styles(gen.get_random_styles())
        render = gen.generate()
        assert render.shape == (2, 32, 32, 4)
        white = gen.generate(rgb_on_white_canvas=True)
        assert white.shape == (2, 32, 32, 3)

    def test_seeded_styles_reproducible(self):
        gen = self.make_generator()
        s1 = gen.get_random_styles(seeds=[5, 6])
        s2 = gen.get_random_styles(seeds=[5, 6])
        np.testing.assert_array_equal(s1, s2)

    def test_geometry_iterator(self):
        gen = self.make_generator()

        def tri_iter():
            rng = np.random.RandomState(0)
            while True:
                yield (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)

        gen.set_geometry_source_from_iterator(tri_iter(), 2)
        gen.set_new_geom()
        assert gen.geom.shape == (2, 32, 32, 1)
        assert gen.geom_truth.shape == (2, 32, 32, 1)


class TestMetricLoops:
    def test_paint_engine_metric_loop(self, tmp_path):
        eng = make_engine()
        gen = PaintStrokeGenerator(2, eng, RandomState(0))

        def tri_iter():
            rng = np.random.RandomState(1)
            while True:
                g = np.ones((2, 32, 32, 3), np.float32)
                y = rng.randint(4, 20)
                g[:, y:y + 8, 4:28, :] = 0
                yield (g * 255).astype(np.uint8)

        gen.set_geometry_source_from_iterator(tri_iter(), 2)
        lib = SeedBrushLibrary([1, 2], eng.gen_cfg.z_dim)
        summary = paint_engine_metric_loop(
            gen, lib, nbatches_per_style=1,
            eval_output_dir=str(tmp_path))
        assert "LAB_L2" in summary
        assert "BG_CLARITY_MEAN" in summary
        assert (tmp_path / "style_metrics.txt").exists()
        assert (tmp_path / "summary_metrics.txt").exists()
        assert (tmp_path / "style_ws.pkl").exists()

    def test_forger_fid_smoke(self):
        eng = make_engine()
        gen = PaintStrokeGenerator(2, eng, RandomState(0))

        def tri_iter():
            rng = np.random.RandomState(1)
            while True:
                yield (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)

        gen.set_geometry_source_from_iterator(tri_iter(), 2)
        real = [(np.random.RandomState(2).rand(8, 32, 32, 3) * 255)
                .astype(np.uint8)]
        fid = forger_compute_fid(gen, real, num_items=8)
        assert np.isfinite(fid)

    def test_stitching_metric_loop(self):
        eng = make_engine()
        gen = PaintStrokeGenerator(2, eng, RandomState(0))
        from brushstroke_engine_tpu.train.stitching import RandomStitcher

        def tri_iter():
            rng = np.random.RandomState(1)
            while True:
                yield (rng.rand(2, 96, 96, 3) * 255).astype(np.uint8)

        summary = stitching_metric_loop(
            gen, tri_iter(), num_batches=1,
            stitcher=RandomStitcher(crop_margin=2, min_overlap=8))
        assert "STITCH_LPIPS" in summary
        assert "STITCH_L1" in summary
