"""Tests for the training layer: loss DSL, augment, phases, short loop."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.train.losses import (
    ForgerLosses, split_loss_string, compute_iou, compute_dice, triband_mask,
)
from brushstroke_engine_tpu.train.augment import AugmentConfig, augment_pipe
from brushstroke_engine_tpu.train.state import TrainConfig, init_train_state
from brushstroke_engine_tpu.train import steps as train_steps
from brushstroke_engine_tpu.train.dataset import (
    SyntheticGeometryDataset, BatchIterator, infinite_indices,
)
from brushstroke_engine_tpu.train.stitching import (
    RandomStitcher, translate_image, composite_shifted,
)
from brushstroke_engine_tpu.models.discriminator import DiscriminatorConfig
from tests.helpers import small_bundle

KEY = jax.random.PRNGKey(0)


def make_train_cfg(**kw):
    b = small_bundle()
    defaults = dict(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=4,
    )
    defaults.update(kw)
    return TrainConfig(**defaults), b


def fake_debug_data(batch=2, res=16, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(batch, res, res, 3).astype(np.float32)
    uvs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return {
        "uvs": jnp.asarray(uvs),
        "colors": jnp.asarray(np.tanh(rng.randn(batch, 3, 3))
                              .astype(np.float32)),
        "canvas": jnp.asarray(rng.randn(batch, res, res, 3)
                              .astype(np.float32)),
        "alpha": jnp.asarray(uvs[..., :2] / uvs[..., :2].sum(-1,
                                                             keepdims=True)),
        "fake_img": jnp.asarray(rng.randn(batch, res, res, 3)
                                .astype(np.float32)),
    }


class TestLossDSL:
    def test_parse_canonical_strings(self):
        # The shipped configs (train_flags.txt:10-11, finetune_flags.txt:1).
        for s in ["1.0*iou_inv(uvs)+1.0*iou(u)",
                  "1.0*iou_inv(uvs)",
                  "0.5*iou_inv(uvs)+0.5*lpips(fake_orig)+0.5*l1(fake_orig)"]:
            fl = ForgerLosses.create_from_string(s)
            assert not fl.is_empty()

    def test_split_with_args(self):
        w, name, comp, args = split_loss_string(
            "0.25*rgb(color_0,r=0.1,g=0.2,b=0.3)")
        assert w == 0.25 and name == "rgb" and comp == "color_0"
        assert args == {"r": "0.1", "g": "0.2", "b": "0.3"}

    def test_default_weight(self):
        w, name, comp, args = split_loss_string("iou(u)")
        assert w == 1.0

    def test_duplicate_rejected(self):
        with pytest.raises(ValueError):
            ForgerLosses.create_from_string("iou(u)+iou(u)")

    def test_unknown_loss_rejected(self):
        with pytest.raises(ValueError):
            ForgerLosses.create_from_string("bogus(uvs)")

    def test_compute_geometry_losses(self):
        fl = ForgerLosses.create_from_string(
            "1.0*iou_inv(uvs)+1.0*iou(u)+0.5*dice(uvs)+0.1*bce(uvs)"
            "+0.2*bgl2(uvs)+0.2*bgstd(uvs)+0.3*fgl4gt(uvs)+0.1*l1(u)")
        dd = fake_debug_data()
        truth = jnp.asarray((np.random.RandomState(1).rand(2, 16, 16, 1)
                             > 0.5).astype(np.float32))
        total, items = fl.compute(dd, truth, rng=KEY)
        assert np.isfinite(float(total))
        assert len(items) == 8

    def test_triband_partial(self):
        fl = ForgerLosses.create_from_string("1.0*iou_inv(uvs)")
        fl.set_partial_loss_with_triband_input(True)
        dd = fake_debug_data()
        tri = np.full((2, 16, 16, 1), 0.5, np.float32)  # all gray = ignored
        tri[:, :4] = 1.0
        total, _ = fl.compute(dd, jnp.asarray(tri))
        assert np.isfinite(float(total))

    def test_require_original_fake(self):
        fl = ForgerLosses.create_from_string("0.5*lpips(fake_orig)")
        assert fl.require_original_fake_image()

    def test_iou_dice_perfect_match(self):
        src = jnp.asarray((np.random.RandomState(0).rand(2, 8, 8) > 0.5)
                          .astype(np.float32))
        assert float(compute_iou(src, src)) < 1e-5
        assert float(compute_dice(src, src)) < 1e-5

    def test_rgb_loss(self):
        fl = ForgerLosses.create_from_string("1.0*rgb(color_0,r=1,g=0,b=0)")
        dd = fake_debug_data()
        total, _ = fl.compute(dd, None)
        assert float(total) > 0

    def test_gan_loss_component(self):
        fl = ForgerLosses.create_from_string("1.0*gan(fake_composite)")
        dd = {"fake_composite_logits": jnp.asarray([[2.0], [-1.0]])}
        total, _ = fl.compute(dd, None)
        want = np.mean(np.log1p(np.exp(-np.array([2.0, -1.0]))))
        np.testing.assert_allclose(float(total), want, rtol=1e-5)


class TestAugment:
    def test_identity_at_p_zero(self):
        cfg = AugmentConfig.from_spec("bgc")
        x = jax.random.normal(KEY, (2, 16, 16, 3))
        y = augment_pipe(cfg, jax.random.PRNGKey(1), x, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    def test_transforms_at_p_one(self):
        cfg = AugmentConfig.from_spec("bgc")
        x = jax.random.normal(KEY, (4, 16, 16, 3))
        y = augment_pipe(cfg, jax.random.PRNGKey(1), x, jnp.float32(1.0))
        assert y.shape == x.shape
        assert not np.allclose(np.asarray(y), np.asarray(x))
        assert np.all(np.isfinite(np.asarray(y)))

    def test_imgfilter_spec(self):
        cfg = AugmentConfig.from_spec("bgcf")
        x = jax.random.normal(KEY, (2, 16, 16, 3))
        y = augment_pipe(cfg, jax.random.PRNGKey(2), x, jnp.float32(1.0))
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))
        # p=0: the orthogonal band sum is an exact identity filter.
        y0 = augment_pipe(cfg, jax.random.PRNGKey(2), x, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-4)

    def test_twopass_warp_matches_gather(self):
        """MXU two-pass warp agrees with the gather warp wherever the
        sample coordinates stay in-bounds (reflected borders may
        legitimately differ; see _affine_warp_twopass docstring)."""
        from brushstroke_engine_tpu.train.augment import (
            _affine_warp_gather, _affine_warp_twopass, _rot2, _scale2,
            _translate2)

        b, n = 4, 32
        rng = np.random.RandomState(0)
        # Smooth test images bound the sheared-kernel approximation error.
        img = rng.randn(b, n, n, 3).astype(np.float32)
        k = np.exp(-0.5 * (np.arange(-6, 7) / 2.5) ** 2)
        k /= k.sum()
        img = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), 1, img)
        img = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), 2, img)
        img = jnp.asarray(img)
        std = float(np.asarray(img).std())

        ctr = (n - 1) / 2.0
        ys = jnp.arange(n, dtype=jnp.float32) - ctr
        coords = jnp.stack(jnp.meshgrid(ys, ys, indexing="ij")[::-1]
                           + [jnp.ones((n, n))], -1)

        def inbounds(mat, margin=2.0):
            src = jnp.einsum("bij,hwj->bhwi", mat, coords)
            sx, sy = src[..., 0] + ctr, src[..., 1] + ctr
            ok = ((sx >= margin) & (sx <= n - 1 - margin)
                  & (sy >= margin) & (sy <= n - 1 - margin))
            return np.asarray(ok)[..., None]

        cases = {
            "identity": jnp.tile(jnp.eye(3)[None], (b, 1, 1)),
            "translate": _translate2(jnp.full((b,), 2.4),
                                     jnp.full((b,), -1.7)),
            "scale": _scale2(jnp.full((b,), 1.3), jnp.full((b,), 0.8)),
            "rot90": _rot2(jnp.full((b,), np.pi / 2)),
        }
        for deg in (10.0, 45.0, 123.0, 269.0):
            cases[f"rot{deg}"] = _rot2(jnp.full((b,), np.deg2rad(deg)))
        exact = ("identity", "translate", "scale", "rot90")
        for name, mat in cases.items():
            g = np.asarray(_affine_warp_gather(img, mat))
            t = np.asarray(_affine_warp_twopass(img, mat,
                                                antialias=False))
            d = np.abs(g - t) * inbounds(mat)
            tol = 1e-4 if name in exact else 0.15 * std
            assert d.max() < tol, (name, d.max(), tol)

    def test_twopass_warp_antialias_minification(self):
        """Scale-adaptive kernels suppress aliasing under minification
        (the reference's sym6 up/down pair serves the same purpose):
        a 2x-minified 1px checkerboard should average out to near-flat,
        while naive bilinear keeps strong aliased contrast."""
        from brushstroke_engine_tpu.train.augment import (
            _affine_warp_twopass, _scale2)

        n = 32
        xx = np.arange(n)[None, :].repeat(n, 0)
        stripes = (xx % 2).astype(np.float32)[None, ..., None]
        img = jnp.asarray(np.tile(stripes, (2, 1, 1, 3)))
        mat = _scale2(jnp.full((2,), 1.9), jnp.full((2,), 1.9))
        naive = np.asarray(_affine_warp_twopass(img, mat, antialias=False))
        aa = np.asarray(_affine_warp_twopass(img, mat, antialias=True))
        core = (slice(None), slice(11, 21), slice(11, 21))
        assert naive[core].std() > 0.2           # aliased moire survives
        assert aa[core].std() < 0.1 * naive[core].std()
        np.testing.assert_allclose(aa[core].mean(), 0.5, atol=0.02)

    def test_jit_with_traced_p(self):
        cfg = AugmentConfig.from_spec("bgcnc")

        @jax.jit
        def run(x, p):
            return augment_pipe(cfg, jax.random.PRNGKey(0), x, p)

        x = jax.random.normal(KEY, (2, 16, 16, 3))
        y0 = run(x, jnp.float32(0.3))
        y1 = run(x, jnp.float32(0.9))  # no recompile needed (same shape)
        assert y0.shape == y1.shape


class TestPhases:
    def test_full_phase_cycle_updates_params(self):
        cfg, b = make_train_cfg(main_phase_losses="0.1*iou_inv(uvs)",
                                augment=AugmentConfig.from_spec("bgc"))
        state = init_train_state(cfg, KEY, g_params=b.gen_params,
                                 g_state=b.gen_state)
        g_before = jax.tree_util.tree_leaves(state["g_params"])[0].copy()
        d_before = jax.tree_util.tree_leaves(state["d_params"])[0].copy()

        geom = jnp.asarray(
            (np.random.RandomState(0).rand(4, 32, 32, 1) > 0.5)
            .astype(np.float32))
        feats = train_steps.encode_geometry(cfg, b.enc_params, b.enc_state,
                                            geom)
        real = jax.random.normal(KEY, (4, 32, 32, 3))
        z = jax.random.normal(KEY, (4, cfg.gen_cfg.z_dim))
        beta = jnp.float32(0.99)

        state, _ = train_steps.d_main_step(cfg, state, real, feats, z,
                                           jax.random.PRNGKey(1))
        state, _ = train_steps.g_main_step(cfg, state, feats, geom, z,
                                           jax.random.PRNGKey(2), beta)
        g_after = jax.tree_util.tree_leaves(state["g_params"])[0]
        d_after = jax.tree_util.tree_leaves(state["d_params"])[0]
        assert not np.allclose(np.asarray(g_before), np.asarray(g_after))
        assert not np.allclose(np.asarray(d_before), np.asarray(d_after))

    def test_accum_grads_matches_mean_of_rounds(self):
        """lax.scan accumulation == mean of per-microbatch grads."""
        from brushstroke_engine_tpu.train.steps import _accum_grads

        params = {"w": jnp.asarray([2.0, -1.0])}
        x = jnp.arange(8.0).reshape(8, 1)

        def loss_fn(p, mb, k):
            del k
            pred = mb["x"] @ p["w"][None, :1] + p["w"][1]
            return jnp.mean(pred ** 2), jnp.mean(pred)

        l1, aux1, g1 = _accum_grads(loss_fn, params, {"x": x},
                                    jax.random.PRNGKey(0), 1)
        l4, aux4, g4 = _accum_grads(loss_fn, params, {"x": x},
                                    jax.random.PRNGKey(0), 4)
        assert aux1.shape == (1,) and aux4.shape == (4,)
        # Mean-of-means == full mean here because microbatches are equal
        # sized; grads likewise.
        np.testing.assert_allclose(float(l4), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g4)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5)

    def test_phase_steps_with_batch_gpu(self):
        """Full D/G phase cycle with gradient accumulation (batch_gpu=2,
        batch=4) runs, updates params, and stays finite."""
        cfg, b = make_train_cfg(
            batch_size=4, batch_gpu=2,
            main_phase_losses="0.1*iou_inv(uvs)",
            augment=AugmentConfig.from_spec("bgc"))
        state = init_train_state(cfg, KEY, g_params=b.gen_params,
                                 g_state=b.gen_state)
        rng = np.random.RandomState(0)
        real = jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32)
        geom = jnp.asarray((rng.rand(4, 32, 32, 1) > 0.5), jnp.float32)
        z = jnp.asarray(rng.randn(4, cfg.gen_cfg.z_dim), jnp.float32)
        feats = train_steps.encode_geometry(cfg, b.enc_params, b.enc_state, geom)

        before = np.asarray(
            jax.tree_util.tree_leaves(state["d_params"])[0]).copy()
        state, s1 = train_steps.d_main_step(cfg, state, real, feats, z,
                                   jax.random.PRNGKey(1))
        state, s2 = train_steps.d_reg_step(cfg, state, real, jax.random.PRNGKey(2))
        state, s3 = train_steps.g_main_step(cfg, state, feats, geom, z,
                                   jax.random.PRNGKey(3),
                                   jnp.float32(0.99))
        after = np.asarray(jax.tree_util.tree_leaves(state["d_params"])[0])
        assert not np.allclose(before, after)
        for s in (s1, s2, s3):
            for k, v in s.items():
                assert np.isfinite(float(v)), k

    def test_phase_steps_with_bf16_models(self):
        """D/G phases (incl. R1 double-backward) run with bf16 blocks in
        both networks -- guards the conv transpose-rule dtype class of
        bugs (ops/conv.py preferred_element_type note)."""
        b = small_bundle()
        from brushstroke_engine_tpu.models.synthesis import SynthesisConfig
        import dataclasses
        gen_cfg = dataclasses.replace(
            b.gen_cfg,
            synthesis=dataclasses.replace(b.gen_cfg.synthesis,
                                          num_bf16_res=2))
        cfg = TrainConfig(
            gen_cfg=gen_cfg,
            disc_cfg=DiscriminatorConfig(
                c_dim=0, img_resolution=32, img_channels=3,
                channel_base=2048, channel_max=32, num_bf16_res=2),
            enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=2,
            main_phase_losses="0.1*iou_inv(uvs)",
            augment=AugmentConfig.from_spec("bgc"))
        state = init_train_state(cfg, KEY, g_params=b.gen_params,
                                 g_state=b.gen_state)
        rng = np.random.RandomState(0)
        real = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
        geom = jnp.asarray((rng.rand(2, 32, 32, 1) > 0.5), jnp.float32)
        z = jnp.asarray(rng.randn(2, cfg.gen_cfg.z_dim), jnp.float32)
        feats = train_steps.encode_geometry(cfg, b.enc_params, b.enc_state,
                                            geom)
        state, s1 = train_steps.d_main_step(cfg, state, real, feats, z,
                                            jax.random.PRNGKey(1))
        state, s2 = train_steps.d_reg_step(cfg, state, real,
                                           jax.random.PRNGKey(2))
        state, s3 = train_steps.g_main_step(cfg, state, feats, geom, z,
                                            jax.random.PRNGKey(3),
                                            jnp.float32(0.99))
        state, s4 = train_steps.g_reg_step(cfg, state, feats, z,
                                           jax.random.PRNGKey(4),
                                           jnp.float32(0.99))
        for s in (s1, s2, s3, s4):
            for k, v in s.items():
                assert np.isfinite(float(v)), k

    def test_geom_step_respects_mask(self):
        cfg, b = make_train_cfg(geom_warmstart_mode="last_and_rgb")
        state = init_train_state(cfg, KEY, g_params=b.gen_params,
                                 g_state=b.gen_state)
        geom = jnp.ones((4, 32, 32, 1))
        feats = train_steps.encode_geometry(cfg, b.enc_params, b.enc_state,
                                            geom)
        z = jax.random.normal(KEY, (4, cfg.gen_cfg.z_dim))
        warm = train_steps.make_geom_step(cfg, warmstart=True)
        before_map = np.asarray(
            state["g_params"]["mapping"]["fc0"]["weight"])
        before_last = np.asarray(
            state["g_params"]["synthesis"]["b32"]["conv1"]["weight"])
        state, _ = warm(state, feats, geom, z, jax.random.PRNGKey(1),
                        jnp.float32(0.5))
        after_map = np.asarray(state["g_params"]["mapping"]["fc0"]["weight"])
        after_last = np.asarray(
            state["g_params"]["synthesis"]["b32"]["conv1"]["weight"])
        np.testing.assert_array_equal(before_map, after_map)  # frozen
        assert not np.allclose(before_last, after_last)       # trainable

    def test_pl_mean_updates(self):
        cfg, b = make_train_cfg()
        state = init_train_state(cfg, KEY, g_params=b.gen_params,
                                 g_state=b.gen_state)
        geom = jnp.ones((4, 32, 32, 1))
        feats = train_steps.encode_geometry(cfg, b.enc_params, b.enc_state,
                                            geom)
        z = jax.random.normal(KEY, (4, cfg.gen_cfg.z_dim))
        assert float(state["pl_mean"]) == 0.0
        state, _ = train_steps.g_reg_step(cfg, state, feats, z,
                                          jax.random.PRNGKey(1),
                                          jnp.float32(0.5))
        assert float(state["pl_mean"]) != 0.0

    def test_ada_update_moves_p(self):
        cfg, b = make_train_cfg(augment=AugmentConfig.from_spec("bgc"))
        state = init_train_state(cfg, KEY, g_params=b.gen_params,
                                 g_state=b.gen_state)
        state = dict(state, ada_signs=jnp.float32(10.0),
                     ada_count=jnp.float32(10.0))  # overfit signal
        state = train_steps.ada_update(cfg, state, jnp.float32(1000.0))
        assert float(state["ada_p"]) > 0


class TestOrigFormat:
    def test_orig_color_format_training_steps(self):
        """The vanilla StyleGAN2 mode (color_format='orig', skip arch, no
        geometry) trains through the same phase functions."""
        from brushstroke_engine_tpu.models.generator import (
            make_generator_config, generator_init,
        )
        gen_cfg = make_generator_config(
            z_dim=16, w_dim=16, img_resolution=32, color_format="orig",
            architecture="skip", channel_base=2048, channel_max=32)
        g_params, g_state = generator_init(gen_cfg, KEY)
        b = small_bundle()
        cfg = TrainConfig(
            gen_cfg=gen_cfg,
            disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                         img_channels=3, channel_base=2048,
                                         channel_max=32),
            enc_cfg=b.enc_cfg, enc_res=(), batch_size=2,
            main_phase_losses="", geom_phase_losses="")
        state = init_train_state(cfg, KEY, g_params=g_params,
                                 g_state=g_state)
        real = jax.random.normal(KEY, (2, 32, 32, 3))
        z = jax.random.normal(KEY, (2, 16))
        state, s = train_steps.d_main_step(cfg, state, real, [], z,
                                           jax.random.PRNGKey(1))
        state, s2 = train_steps.g_main_step(cfg, state, [], None, z,
                                            jax.random.PRNGKey(2),
                                            jnp.float32(0.99))
        state, s3 = train_steps.g_reg_step(cfg, state, [], z,
                                           jax.random.PRNGKey(3),
                                           jnp.float32(0.99))
        for d in (s, s2, s3):
            assert all(np.isfinite(float(v)) for v in d.values())


class TestStitching:
    def test_translate_image(self):
        img = jnp.asarray(
            np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
        out = np.asarray(translate_image(img, jnp.asarray(1),
                                         jnp.asarray(0)))[0, :, :, 0]
        src = np.arange(16, dtype=np.float32).reshape(4, 4)
        assert (out[0] == 0).all()
        np.testing.assert_allclose(out[1:], src[:3])

    def test_generate_with_stitching_consistency(self):
        """The same canvas region rendered in two overlapping crops must
        agree where const noise + positions make them consistent: check the
        patches have the right shapes and composites are finite."""
        b = small_bundle()
        st = RandomStitcher(crop_margin=2, min_overlap=8)
        z = jax.random.normal(KEY, (2, b.gen_cfg.z_dim))
        geom = jnp.ones((2, 32, 32, 1))
        from brushstroke_engine_tpu.models.geo_encoder import \
            geo_encoder_encode
        feats = geo_encoder_encode(b.enc_cfg, b.enc_params, b.enc_state,
                                   geom, res=[0])
        res = st.generate_with_stitching(
            b.gen_cfg, b.gen_params,
            {"w_avg": jnp.zeros(16), "noise": b.gen_state["noise"]},
            z, feats, feats, (0, 0, 32, 32), (10, 6, 32, 32),
            jax.random.PRNGKey(5))
        assert res["patch1"].shape == (2, 8, 8, 3)
        assert res["patch2"].shape == (2, 8, 8, 3)
        for k in ("fake1_composite", "fake2_composite"):
            assert np.all(np.isfinite(np.asarray(res[k])))
        # Same geometry + same style + aligned positions: the aligned overlap
        # patches should be closer to each other than to random pairing.
        p1 = np.asarray(res["patch1"])
        p2 = np.asarray(res["patch2"])
        aligned = np.abs(p1 - p2).mean()
        scrambled = np.abs(p1 - p2[:, ::-1, ::-1]).mean()
        assert aligned <= scrambled * 1.5


class TestDataset:
    def test_synthetic_geometry(self):
        ds = SyntheticGeometryDataset(64, size=8)
        tri = ds[0]
        assert tri.shape == (64, 64, 3)
        assert tri.dtype == np.uint8
        # Triband: binary channel has strokes (some dark pixels).
        assert tri[..., 1].min() < 128

    def test_infinite_indices_sharded(self):
        it0 = infinite_indices(10, seed=3, rank=0, num_ranks=2)
        it1 = infinite_indices(10, seed=3, rank=1, num_ranks=2)
        a = [next(it0) for _ in range(10)]
        c = [next(it1) for _ in range(10)]
        assert all(0 <= x < 10 for x in a + c)

    def test_batch_iterator(self):
        ds = SyntheticGeometryDataset(32, size=8)
        it = BatchIterator(ds, batch_size=4)
        batch = next(it)
        assert batch.shape == (4, 32, 32, 3)


class TestShortLoop:
    def test_two_tick_loop(self, tmp_path):
        from brushstroke_engine_tpu.train.loop import TrainingLoop

        cfg, b = make_train_cfg(
            batch_size=2,
            main_phase_losses="0.1*iou_inv(uvs)",
            geom_phase_losses="1.0*iou_inv(uvs)",
            geom_warmstart_losses="1.0*iou_inv(uvs)+1.0*iou(u)",
            geom_warmstart_kimg=0,  # skip warmstart for speed here
            geom_interval=2,
            g_reg_interval=2, d_reg_interval=2,
            augment=AugmentConfig.from_spec("bgc"),
            kimg_per_tick=0,  # tick every batch
        )

        class StyleIter:
            def __iter__(self):
                return self

            def __next__(self):
                return (np.random.RandomState(0).rand(2, 32, 32, 3)
                        * 255).astype(np.uint8)

        geo_ds = SyntheticGeometryDataset(40, size=4)

        class GeomIter:
            def __init__(self):
                self.i = 0

            def __next__(self):
                self.i += 1
                return np.stack([geo_ds[self.i % 4], geo_ds[(self.i + 1) % 4]])

        loop = TrainingLoop(cfg, b.enc_params, b.enc_state, StyleIter(),
                            GeomIter(), run_dir=str(tmp_path),
                            profile_dir=str(tmp_path / "trace"),
                            profile_batches=(1, 2))
        loop.run(total_kimg=6 / 1000.0)
        assert loop.cur_nimg >= 6
        assert os.path.exists(loop.stats_path)
        # Device trace captured for the configured batch window.
        assert os.path.isdir(tmp_path / "trace")
        assert any(f for _, _, fs in os.walk(tmp_path / "trace") for f in fs)
        # TensorBoard events written beside stats.jsonl (soft dep present
        # in this environment).
        if loop.tb_writer is not None:
            assert any(f.startswith("events.")
                       for f in os.listdir(tmp_path))
        snaps = [f for f in os.listdir(tmp_path) if f.startswith("network")]
        assert len(snaps) >= 1
        # Snapshot round-trips into a working paint engine.
        from brushstroke_engine_tpu.engine.brush import (
            PaintEngineFactory, GanBrushOptions,
        )
        eng = PaintEngineFactory.create(os.path.join(str(tmp_path),
                                                     snaps[-1]))
        opts = GanBrushOptions()
        opts.set_style(eng.random_style(0), 0)
        patch = np.zeros((eng.patch_width, eng.patch_width, 4), np.uint8)
        patch[8:20, 8:20, 3] = 255
        img, _ = eng.render_stroke(patch, None, opts)
        assert img.shape == (32, 32, 4)

    def test_train_state_roundtrip_backends(self, tmp_path):
        """save/load_train_state round-trips bitwise on both the pickle
        and orbax backends, including progress counters."""
        from brushstroke_engine_tpu.train.loop import TrainingLoop

        cfg, b = make_train_cfg(batch_size=2)
        loop = TrainingLoop(cfg, b.enc_params, b.enc_state, None, None,
                            run_dir=str(tmp_path))
        loop.cur_nimg, loop.batch_idx, loop.cur_tick = 1234, 17, 3
        ref = jax.tree_util.tree_map(np.asarray, loop.state)

        for backend in ("pickle", "orbax"):
            loop.save_train_state(backend=backend)
            loop2 = TrainingLoop(cfg, b.enc_params, b.enc_state, None, None,
                                 run_dir=str(tmp_path))
            assert loop2.load_train_state(backend=backend)
            assert (loop2.cur_nimg, loop2.batch_idx, loop2.cur_tick) == \
                (1234, 17, 3)
            got = jax.tree_util.tree_map(np.asarray, loop2.state)
            for a, c in zip(jax.tree_util.tree_leaves(ref),
                            jax.tree_util.tree_leaves(got)):
                np.testing.assert_array_equal(a, c)

    def test_resume_is_bitwise_continuous(self, tmp_path):
        """Interrupt + auto_resume produces the same params as an
        uninterrupted run: full state AND host PRNG streams round-trip
        (constant data iterators isolate the state restoration)."""
        from brushstroke_engine_tpu.train.loop import TrainingLoop

        cfg, b = make_train_cfg(
            batch_size=2, main_phase_losses="0.1*iou_inv(uvs)",
            geom_warmstart_kimg=0, g_reg_interval=2, d_reg_interval=2,
            augment=AugmentConfig.from_spec("bgc"), kimg_per_tick=0)

        style = (np.random.RandomState(3).rand(2, 32, 32, 3)
                 * 255).astype(np.uint8)
        geo_ds = SyntheticGeometryDataset(40, size=2)
        tri = np.stack([geo_ds[0], geo_ds[1]])

        class Const:
            def __init__(self, arr):
                self.arr = arr

            def __next__(self):
                return self.arr

        def make_loop(d, auto=False):
            return TrainingLoop(cfg, b.enc_params, b.enc_state,
                                Const(style), Const(tri), run_dir=str(d),
                                seed=5, auto_resume=auto)

        # Interrupted: 2 batches, checkpoint, fresh process resumes to 4.
        la = make_loop(tmp_path / "a")
        la.run(total_kimg=4 / 1000.0)
        lb = make_loop(tmp_path / "a", auto=True)
        assert lb.cur_nimg == 4
        lb.run(total_kimg=8 / 1000.0)

        # Uninterrupted: 4 batches straight.
        lc = make_loop(tmp_path / "c")
        lc.run(total_kimg=8 / 1000.0)

        for x, y in zip(jax.tree_util.tree_leaves(lb.state["g_params"]),
                        jax.tree_util.tree_leaves(lc.state["g_params"])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(lb.state["d_params"]),
                        jax.tree_util.tree_leaves(lc.state["d_params"])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_loop_is_deterministic(self, tmp_path):
        """Two loops with the same seed produce identical stats: all
        randomness is threaded through seeded np/jax PRNGs (SURVEY.md
        section 5.2 rebuild note)."""
        from brushstroke_engine_tpu.train.loop import TrainingLoop

        cfg, b = make_train_cfg(
            batch_size=2,
            main_phase_losses="0.1*iou_inv(uvs)",
            geom_warmstart_kimg=0,
            g_reg_interval=2, d_reg_interval=2,
            augment=AugmentConfig.from_spec("bgc"),
            kimg_per_tick=1)

        geo_ds = SyntheticGeometryDataset(40, size=4)

        def iters():
            class StyleIter:
                def __next__(self):
                    return (np.random.RandomState(7).rand(2, 32, 32, 3)
                            * 255).astype(np.uint8)

            class GeomIter:
                def __init__(self):
                    self.i = 0

                def __next__(self):
                    self.i += 1
                    return np.stack([geo_ds[self.i % 4],
                                     geo_ds[(self.i + 1) % 4]])

            return StyleIter(), GeomIter()

        stats = []
        for run in range(2):
            si, gi = iters()
            loop = TrainingLoop(cfg, b.enc_params, b.enc_state, si, gi,
                                run_dir=str(tmp_path / f"r{run}"), seed=5)
            loop.run(total_kimg=4 / 1000.0)
            stats.append(dict(loop._last_stats))
        assert stats[0].keys() == stats[1].keys()
        for k in stats[0]:
            if k.startswith("Timing/"):
                continue        # wall-clock; first run pays compilation
            np.testing.assert_allclose(stats[0][k], stats[1][k], rtol=0,
                                       atol=0, err_msg=k)

    def test_warmstart_schedule(self, tmp_path):
        from brushstroke_engine_tpu.train.loop import TrainingLoop

        cfg, b = make_train_cfg(
            batch_size=2,
            geom_warmstart_kimg=4 / 1000.0,
            geom_warmstart_losses="1.0*iou_inv(uvs)",
            kimg_per_tick=0,
        )

        class StyleIter:
            def __next__(self):
                return (np.random.RandomState(0).rand(2, 32, 32, 3)
                        * 255).astype(np.uint8)

        geo_ds = SyntheticGeometryDataset(40, size=4)

        class GeomIter:
            def __init__(self):
                self.i = 0

            def __next__(self):
                self.i += 1
                return np.stack([geo_ds[self.i % 4],
                                 geo_ds[(self.i + 1) % 4]])

        loop = TrainingLoop(cfg, b.enc_params, b.enc_state, StyleIter(),
                            GeomIter(), run_dir=str(tmp_path))
        assert loop.in_warmstart()
        loop.run(total_kimg=4 / 1000.0, exit_after_warmstart=True)
        assert not loop.in_warmstart()


class TestClarityFinetune:
    """The reference's second training stage (finetune_flags.txt): a
    warmstart-only run resumed from a trained snapshot whose fake_orig
    losses anchor to the FROZEN original generator (G_orig deepcopy,
    training_loop_modified.py:260-262,479)."""

    def test_loop_snapshots_g_orig_from_resume(self, tmp_path):
        from brushstroke_engine_tpu.train.loop import TrainingLoop
        from brushstroke_engine_tpu.train.state import init_train_state

        cfg, b = make_train_cfg(
            batch_size=2, noise_mode="const",
            geom_warmstart_kimg=4 / 1000.0,
            geom_warmstart_losses="0.5*iou_inv(uvs)+0.5*l1(fake_orig)",
            kimg_per_tick=0,
        )
        resume = init_train_state(cfg, jax.random.PRNGKey(7),
                                  g_params=b.gen_params,
                                  g_state=b.gen_state)
        want = jax.tree_util.tree_map(np.array, resume["g_params"])

        class StyleIter:
            def __next__(self):
                return (np.random.RandomState(0).rand(2, 32, 32, 3)
                        * 255).astype(np.uint8)

        geo_ds = SyntheticGeometryDataset(40, size=4)

        class GeomIter:
            def __init__(self):
                self.i = 0

            def __next__(self):
                self.i += 1
                return np.stack([geo_ds[self.i % 4],
                                 geo_ds[(self.i + 1) % 4]])

        loop = TrainingLoop(cfg, b.enc_params, b.enc_state, StyleIter(),
                            GeomIter(), run_dir=str(tmp_path),
                            resume_state=resume)
        # The G_orig anchor is the RESUMED generator, captured before any
        # step could donate/overwrite the state buffers.
        assert loop.g_orig_params is not None
        got = jax.tree_util.tree_map(np.array, loop.g_orig_params)
        for w, g in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(w, g)

        loop.run(total_kimg=4 / 1000.0, exit_after_warmstart=True)
        assert any("l1_fake_orig" in k for k in loop._last_stats), \
            sorted(loop._last_stats)
        # The anchor stayed intact across donating steps.
        got = jax.tree_util.tree_map(np.array, loop.g_orig_params)
        for w, g in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(w, g)

    def test_no_orig_snapshot_without_fake_orig_losses(self, tmp_path):
        from brushstroke_engine_tpu.train.loop import TrainingLoop

        cfg, b = make_train_cfg(
            batch_size=2,
            geom_warmstart_kimg=4 / 1000.0,
            geom_warmstart_losses="1.0*iou_inv(uvs)",
            kimg_per_tick=0,
        )
        loop = TrainingLoop(cfg, b.enc_params, b.enc_state, None, None,
                            run_dir=str(tmp_path))
        assert loop.g_orig_params is None
