"""Tests for visualization, AE trainer, and CLI entry points."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.viz.visualize import (
    make_grid, compose_stroke, compose_stroke_with_canvas,
    visualize_raw_data, output_encoder_diagnostics, TrainingVisualizer,
)
from brushstroke_engine_tpu.utils.checkpoint import save_native
from tests.helpers import small_bundle, make_engine

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


class TestVisualize:
    def test_make_grid(self):
        imgs = np.zeros((5, 8, 8, 3), np.float32)
        grid = make_grid(imgs, nrow=3, pad=1)
        assert grid.shape == (2 * 9 + 1, 3 * 9 + 1, 3)

    def test_compose_stroke(self):
        uvs = np.zeros((1, 4, 4, 3), np.float32)
        uvs[..., 0] = 1.0
        colors = np.zeros((1, 3, 3), np.float32)
        colors[:, :, 0] = [1.0, 0.5, 0.25]
        out = compose_stroke(uvs, colors)
        np.testing.assert_allclose(out[0, 0, 0], [1.0, 0.5, 0.25])

    def test_compose_with_white_canvas(self):
        uvs = np.zeros((1, 4, 4, 3), np.float32)
        uvs[..., 2] = 1.0  # all background
        colors = np.zeros((1, 3, 3), np.float32)
        out = compose_stroke_with_canvas(uvs, colors, mode="white")
        np.testing.assert_allclose(out, 1.0)  # pure white

    def test_visualize_raw_data_sheet(self):
        eng = make_engine()
        from brushstroke_engine_tpu.engine.brush import GanBrushOptions
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(0), 0)
        geom = np.ones((2, 32, 32, 1), np.float32)
        out = eng._run_core(geom, opts)
        sheet = visualize_raw_data(out, geom)
        assert sheet.dtype == np.uint8
        assert sheet.shape[0] == 2 * 32
        assert sheet.shape[1] == 5 * 32  # geom + u + v + s + composite

    def test_encoder_diagnostics(self, tmp_path):
        b = small_bundle()
        geom = np.ones((2, 32, 32, 1), np.float32)
        geom[:, 8:16, 8:16] = 0
        sheet = output_encoder_diagnostics(
            str(tmp_path / "enc.png"), b.enc_cfg, b.enc_params, b.enc_state,
            geom)
        assert (tmp_path / "enc.png").exists()
        assert sheet.shape[1] == 64  # input | recon

    def test_training_visualizer(self, tmp_path):
        eng = make_engine()
        viz = TrainingVisualizer(batch_size=2, width=32, num_fixed_styles=2)
        viz.init(eng.gen_cfg.z_dim)
        viz.do_visualize(str(tmp_path), eng, "t0")
        assert (tmp_path / "fakes_t0.png").exists()
        assert (tmp_path / "geom_control_t0.png").exists()
        assert (tmp_path / "color_control_t0.png").exists()
        viz.visualize_stitching(str(tmp_path), eng, "t0")
        assert (tmp_path / "stitching_t0.png").exists()


class TestAETrainer:
    def test_short_training_improves(self, tmp_path):
        from brushstroke_engine_tpu.models.geo_encoder import \
            GeoEncoderConfig
        from brushstroke_engine_tpu.train.train_autoencoder import (
            AETrainConfig, train_autoencoder, load_ae_checkpoint,
            make_ae_train_step,
        )
        from brushstroke_engine_tpu.train.dataset import (
            SyntheticGeometryDataset, BatchIterator,
        )

        enc_cfg = GeoEncoderConfig(
            kind="sauto", preproc="-11inverse", pre_filters=8,
            down_filters=(8, 8), post_filters=(8,), up_filters=(8, 8))
        cfg = AETrainConfig(enc_cfg=enc_cfg, batch_size=2, num_steps=5,
                            widths=(32,), eval_every=2, checkpoint_every=4)
        ds = SyntheticGeometryDataset(48, size=8)
        it = BatchIterator(ds, 2)
        params, state = train_autoencoder(cfg, it, str(tmp_path))
        assert (tmp_path / "ae_latest.pkl").exists()
        cfg2, p2, s2 = load_ae_checkpoint(str(tmp_path / "ae_latest.pkl"))
        assert cfg2.kind == "sauto"
        leaves = jax.tree_util.tree_leaves(p2)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def run_cli(script, *args, timeout=500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # force cpu despite axon plugin via sitecustomize-style pre-import
    cmd = [sys.executable, "-c",
           "import jax; jax.config.update('jax_platforms','cpu');"
           "import runpy, sys; sys.argv=[%r]+%r; "
           "runpy.run_path(%r, run_name='__main__')"
           % (script, list(args), script)]
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=timeout)


class TestCLI:
    def test_train_dry_run(self):
        r = run_cli(os.path.join(REPO, "scripts", "train_main.py"),
                    "--outdir", "/tmp/bse_runs", "--dry-run",
                    "--output_resolution", "32", "--channel_max", "32",
                    "--batch", "2")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Resolved training options" in r.stdout

    def test_paint_image_cli(self, tmp_path):
        bundle = small_bundle()
        ckpt = str(tmp_path / "bundle.pkl")
        save_native(ckpt, bundle)
        # Small geometry image.
        import PIL.Image
        from brushstroke_engine_tpu.data.curated_geometry import (
            curated_geometry_patch,
        )
        geom = curated_geometry_patch("curve", 9, 64)
        geo_path = str(tmp_path / "geo.png")
        PIL.Image.fromarray((geom * 255).astype(np.uint8)).save(geo_path)

        r = run_cli(os.path.join(REPO, "scripts", "paint_image_main.py"),
                    "--gan_checkpoint", ckpt, "--geo_image", geo_path,
                    "--output_dir", str(tmp_path / "out"),
                    "--style_seed", "3", "--overlap_margin", "4",
                    "--crop_margin", "4", "--feature_blending_level", "1",
                    "--on_white")
        assert r.returncode == 0, r.stderr[-2000:]
        outs = os.listdir(tmp_path / "out")
        assert len(outs) == 1

    def test_fid_from_images_cli(self, tmp_path):
        import PIL.Image
        rng = np.random.RandomState(0)
        for d in ("a", "b"):
            os.makedirs(tmp_path / d)
            for i in range(4):
                img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
                PIL.Image.fromarray(img).save(
                    str(tmp_path / d / f"{i}.png"))
        r = run_cli(os.path.join(REPO, "scripts", "fid_from_images.py"),
                    "--images0", str(tmp_path / "a"),
                    "--images1", str(tmp_path / "b"),
                    "--resolution", "32", "--batch_size", "2")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "FID:" in r.stdout

    def test_calc_metrics_cli(self, tmp_path):
        import PIL.Image
        bundle = small_bundle()
        ckpt = str(tmp_path / "bundle.pkl")
        save_native(ckpt, bundle)
        rng = np.random.RandomState(0)
        os.makedirs(tmp_path / "styles")
        for i in range(8):
            PIL.Image.fromarray(
                (rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(
                str(tmp_path / "styles" / f"{i}.png"))
        out = str(tmp_path / "metrics.json")
        r = run_cli(os.path.join(REPO, "scripts", "calc_metrics.py"),
                    "--gan_checkpoint", ckpt,
                    "--data", str(tmp_path / "styles"),
                    "--metrics", "fid,kid,is,pr,ppl",
                    "--num_items", "8", "--batch_size", "4",
                    "--out", out)
        assert r.returncode == 0, r.stderr[-2000:]
        import json as _json
        vals = _json.loads(open(out).read())
        for k in ("fid", "kid", "is", "precision", "recall", "ppl"):
            assert k in vals and np.isfinite(vals[k]), (k, vals)

    def test_plot_colors_cli(self, tmp_path):
        import PIL.Image
        rng = np.random.RandomState(0)
        img_path = str(tmp_path / "img.png")
        PIL.Image.fromarray(
            (rng.rand(24, 24, 3) * 255).astype(np.uint8)).save(img_path)
        out = str(tmp_path / "colors.png")
        r = run_cli(os.path.join(REPO, "scripts", "plot_colors.py"),
                    "--image", img_path, "--samples", "200", "--out", out)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.isfile(out)

    def test_create_splines_and_prep(self, tmp_path):
        r = run_cli(os.path.join(REPO, "scripts", "create_splines.py"),
                    "--output_dir", str(tmp_path / "splines"),
                    "--num_images", "3", "--width", "48", "--workers", "1")
        assert r.returncode == 0, r.stderr[-2000:]
        assert len(os.listdir(tmp_path / "splines")) == 3
        r = run_cli(os.path.join(REPO, "scripts", "prep_geom_data.py"),
                    "--input_dir", str(tmp_path / "splines"),
                    "--output_dir", str(tmp_path / "tri"))
        assert r.returncode == 0, r.stderr[-2000:]
        assert len(os.listdir(tmp_path / "tri")) == 3
        import PIL.Image
        tri = np.asarray(PIL.Image.open(
            str(tmp_path / "tri" / sorted(os.listdir(
                tmp_path / "tri"))[0])))
        assert tri.shape[-1] == 3

    def test_dataset_tool_and_patch_augment(self, tmp_path):
        import PIL.Image
        rng = np.random.RandomState(0)
        os.makedirs(tmp_path / "imgs")
        for i in range(2):
            img = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
            PIL.Image.fromarray(img).save(
                str(tmp_path / "imgs" / f"{i}.png"))
        r = run_cli(os.path.join(REPO, "scripts", "dataset_tool.py"),
                    "--source", str(tmp_path / "imgs"),
                    "--dest", str(tmp_path / "out.zip"),
                    "--resolution", "32")
        assert r.returncode == 0, r.stderr[-2000:]
        from brushstroke_engine_tpu.train.dataset import ImageFolderDataset
        ds = ImageFolderDataset(str(tmp_path / "out.zip"), 32)
        assert len(ds) == 2 and ds[0].shape == (32, 32, 3)

        r = run_cli(os.path.join(REPO, "scripts", "patch_augment.py"),
                    "--input_dir", str(tmp_path / "imgs"),
                    "--output_zip", str(tmp_path / "patches.zip"),
                    "--patch_width", "32", "--patches_per_image", "3",
                    "--min_entropy", "0.0")
        assert r.returncode == 0, r.stderr[-2000:]
