"""Tests for brush optimization/search tools."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.tools.latent import (
    get_w_stats, ws_for_seeds, pca_directions, seed_grid, dump_ws,
)
from brushstroke_engine_tpu.tools.projection import (
    project, ProjectionConfig, compute_masked_color,
)
from brushstroke_engine_tpu.tools.clarity import (
    optimize_style_clarity, ClarityConfig,
)
from brushstroke_engine_tpu.tools.clip_search import (
    HashingBackbone, FeatureDictionary, ClipStyleOptimizer, ClipOptConfig,
)
from tests.helpers import make_engine


def geometry_batches(batch=2, width=32, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        g = np.ones((batch, width, width, 1), np.float32)
        y = rng.randint(4, width - 12)
        g[:, y:y + 8, 4:width - 4] = 0.0
        yield g


class TestLatent:
    def test_w_stats(self):
        eng = make_engine()
        w_avg, w_std = get_w_stats(eng.gen_cfg, eng.gen_params["mapping"],
                                   num_samples=256)
        assert w_avg.shape == (1, 1, eng.gen_cfg.w_dim)
        assert w_std > 0

    def test_ws_for_seeds_and_dump(self, tmp_path):
        eng = make_engine()
        ws = ws_for_seeds(eng, [1, 2, 3])
        assert ws.shape == (3, eng.gen_cfg.num_ws, eng.gen_cfg.w_dim)
        f = str(tmp_path / "ws.bin")
        dump_ws(eng, [1, 2], f)
        loaded = np.fromfile(f, np.float64).reshape(2, -1)
        assert loaded.shape[1] == eng.gen_cfg.w_dim

    def test_pca_and_seed_grid(self):
        eng = make_engine()
        ws = ws_for_seeds(eng, list(range(12)))
        comps, var = pca_directions(ws[:, 0, :], num_components=4)
        assert comps.shape[0] == 4
        assert (var[:-1] >= var[1:]).all()
        grid = seed_grid(eng, 5, grid=3)
        assert grid.shape[0] == 9


class TestProjection:
    def test_masked_color(self):
        img = jnp.ones((1, 4, 4, 3)) * 0.5
        mask = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)
        c = compute_masked_color(img, mask)
        np.testing.assert_allclose(np.asarray(c), 0.5)

    def test_project_reduces_lpips(self):
        eng = make_engine()
        # Target: a render from a KNOWN style; projection should fit it.
        from brushstroke_engine_tpu.engine.brush import GanBrushOptions
        geom = next(geometry_batches())
        opts = GanBrushOptions()
        opts.set_style(np.tile(eng.random_style(3), (2, 1)), 3)
        out = eng._run_core(geom, opts)
        target = np.asarray(out["raw_img"])  # [-1, 1] raw generator output

        cfg = ProjectionConfig(num_steps=30, w_avg_samples=128,
                               optimize_noise=True,
                               min_lpips_improvement=-1.0)
        res = project(eng, target, geom, cfg, seed=0, log_every=10)
        assert res["w"].shape == (1, eng.gen_cfg.num_ws, eng.gen_cfg.w_dim)
        assert np.isfinite(res["lpips"])
        assert len(res["noise"]) > 0
        # Noise stays normalized.
        for v in res["noise"].values():
            assert abs(float(np.mean(v))) < 0.2
            assert 0.5 < float(np.mean(np.square(v))) < 2.0

    def test_project_parallel_two_styles(self):
        """N independent styles in one vmapped program: both fit their own
        target and the results are style-specific."""
        eng = make_engine()
        from brushstroke_engine_tpu.engine.brush import GanBrushOptions
        from brushstroke_engine_tpu.tools.projection import project_parallel
        geom = next(geometry_batches())
        targets, geoms = [], []
        for s in (3, 11):
            opts = GanBrushOptions()
            opts.set_style(np.tile(eng.random_style(s), (2, 1)), s)
            out = eng._run_core(geom, opts)
            targets.append(np.asarray(out["raw_img"]))
            geoms.append(geom)
        cfg = ProjectionConfig(num_steps=20, w_avg_samples=128,
                               optimize_noise=True,
                               min_lpips_improvement=-1.0)
        results = project_parallel(eng, np.stack(targets), np.stack(geoms),
                                   cfg, seed=0, log_every=10)
        assert len(results) == 2
        for res in results:
            assert res["w"].shape == (1, eng.gen_cfg.num_ws,
                                      eng.gen_cfg.w_dim)
            assert np.isfinite(res["lpips"])
            for v in res["noise"].values():
                assert abs(float(np.mean(v))) < 0.2
                assert 0.5 < float(np.mean(np.square(v))) < 2.0
        # Different targets must optimize to different styles.
        assert float(np.max(np.abs(results[0]["w"] - results[1]["w"]))) > 1e-3

    def test_project_resume(self):
        eng = make_engine()
        geom = next(geometry_batches())
        target = np.zeros((2, 32, 32, 3), np.float32)
        cfg = ProjectionConfig(num_steps=3, w_avg_samples=64)
        first = project(eng, target, geom, cfg, seed=0)
        again = project(eng, target, geom, cfg, seed=0, resume_from=first)
        assert again["w"].shape == first["w"].shape


class TestClarity:
    def test_optimize_improves_loss(self):
        eng = make_engine()
        from brushstroke_engine_tpu.tools.latent import ws_for_seeds
        w0 = ws_for_seeds(eng, [7])
        cfg = ClarityConfig(num_steps=20, losses="1.0*iou_inv(uvs)")
        res = optimize_style_clarity(eng, w0, geometry_batches(), cfg)
        assert res["w"].shape == w0.shape
        assert np.isfinite(res["loss"])
        assert not np.allclose(res["w"], w0)


class TestClipSearch:
    def test_text_embedding_deterministic(self):
        b = HashingBackbone(0)
        e1 = np.asarray(b.encode_text(["thick blue paint"]))
        e2 = np.asarray(b.encode_text(["thick blue paint"]))
        np.testing.assert_allclose(e1, e2)
        e3 = np.asarray(b.encode_text(["thin pencil"]))
        assert not np.allclose(e1, e3)

    def test_feature_dictionary_topk(self, tmp_path):
        b = HashingBackbone(0)
        d = FeatureDictionary(b)
        rng = np.random.RandomState(0)
        imgs = rng.rand(6, 32, 32, 3).astype(np.float32)
        d.add_images([f"s{i}" for i in range(6)], imgs)
        res = d.get_top_results("watercolor", k=3)
        assert len(res) == 3
        assert all(isinstance(k, str) for k, _ in res)
        # Round trip.
        p = str(tmp_path / "dict.pkl")
        d.save(p)
        d2 = FeatureDictionary.load(p, b)
        assert d2.get_top_results("watercolor", k=3) == res

    def test_dictionary_from_library(self):
        eng = make_engine()
        from brushstroke_engine_tpu.engine.library import SeedBrushLibrary
        lib = SeedBrushLibrary([1, 2], eng.gen_cfg.z_dim)
        d = FeatureDictionary(HashingBackbone(0))
        d.build_from_library(lib, eng.uvs_mapper)
        assert len(d.keys) == 2

    def test_clip_optimizer_runs(self):
        eng = make_engine()
        from brushstroke_engine_tpu.tools.latent import ws_for_seeds
        w0 = ws_for_seeds(eng, [1])
        opt = ClipStyleOptimizer(eng, HashingBackbone(0),
                                 ClipOptConfig(num_steps=10))
        res = opt.optimize("scratchy ink", w0, geometry_batches())
        assert res["w"].shape == w0.shape
        assert np.isfinite(res["loss"])


class TestMetricManifest:
    """calc_metrics --manifest pins the yardstick protocol: conflicting
    explicit flags fail fast, pinned values are adopted."""

    def test_conflicting_flag_rejected(self, tmp_path):
        import json as _json
        import subprocess
        import sys
        repo = os.path.join(os.path.dirname(__file__), os.pardir)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, "scripts/calc_metrics.py",
             "--gan_checkpoint", "/nonexistent.pkl",
             "--manifest", "metrics_manifest.json",
             "--num_items", "5"],
            capture_output=True, text=True, cwd=repo, env=env, timeout=300)
        assert proc.returncode == 2, proc.stderr
        assert "conflicts with the manifest" in proc.stderr

    def test_manifest_is_wellformed(self):
        import json as _json
        repo = os.path.join(os.path.dirname(__file__), os.pardir)
        m = _json.load(open(os.path.join(repo, "metrics_manifest.json")))
        proto = m["protocol"]
        assert proto["num_items"] == 1200 and proto["detector"] == "random"
        assert set(m["recorded"]) >= {"fid", "kid", "is", "precision",
                                      "recall", "ppl_w"}
