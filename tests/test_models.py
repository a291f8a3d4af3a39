"""Tests for the model layer: generator, synthesis hooks, geo encoder, D."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.models.generator import (
    make_generator_config, generator_init, generator_apply,
    generator_trainable_mask,
)
from brushstroke_engine_tpu.models.mapping import (
    MappingConfig, mapping_init, mapping_apply,
)
from brushstroke_engine_tpu.models.geo_encoder import (
    GeoEncoderConfig, geo_encoder_init, geo_encoder_encode, geo_encoder_apply,
    upsample_bilinear_align_corners, postprocess,
)
from brushstroke_engine_tpu.models.discriminator import (
    DiscriminatorConfig, discriminator_init, discriminator_apply,
)

KEY = jax.random.PRNGKey(0)


def small_gen_cfg(**kw):
    defaults = dict(z_dim=16, w_dim=16, img_resolution=32,
                    geom_feature_resolutions=(8,),
                    geom_feature_channels=(4,),
                    channel_base=2048, channel_max=32)
    defaults.update(kw)
    return make_generator_config(**defaults)


def make_geom_feats(cfg, batch):
    feats = []
    for r, c in zip(cfg.synthesis.geom_feature_resolutions,
                    cfg.synthesis.geom_feature_channels):
        feats.append(jnp.ones((batch, r, r, c), jnp.float32))
    return feats


class TestMapping:
    def test_shapes_and_w_avg(self):
        cfg = MappingConfig(z_dim=16, c_dim=0, w_dim=16, num_ws=10)
        params, state = mapping_init(cfg, KEY)
        z = jax.random.normal(KEY, (4, 16))
        ws, new_avg = mapping_apply(cfg, params, z, w_avg=state["w_avg"],
                                    update_w_avg=True)
        assert ws.shape == (4, 10, 16)
        assert new_avg.shape == (16,)
        # All broadcast ws identical.
        np.testing.assert_allclose(np.asarray(ws[:, 0]), np.asarray(ws[:, 5]))

    def test_truncation(self):
        cfg = MappingConfig(z_dim=16, c_dim=0, w_dim=16, num_ws=4)
        params, state = mapping_init(cfg, KEY)
        z = jax.random.normal(KEY, (2, 16))
        w_avg = jnp.ones((16,))
        full, _ = mapping_apply(cfg, params, z, w_avg=w_avg)
        trunc, _ = mapping_apply(cfg, params, z, w_avg=w_avg,
                                 truncation_psi=0.0)
        np.testing.assert_allclose(np.asarray(trunc),
                                   np.broadcast_to(np.ones(16), trunc.shape))
        assert not np.allclose(np.asarray(full), np.asarray(trunc))


class TestGenerator:
    def test_forward_shapes(self):
        cfg = small_gen_cfg()
        params, state = generator_init(cfg, KEY)
        z = jax.random.normal(KEY, (2, 16))
        img, debug, _ = generator_apply(
            cfg, params, state, z=z, geom_features=make_geom_feats(cfg, 2),
            return_debug_data=True)
        assert img.shape == (2, 32, 32, 3)
        assert debug["uvs"].shape == (2, 32, 32, 3)
        assert debug["colors"].shape == (2, 3, 3)
        uvs = np.asarray(debug["uvs"])
        np.testing.assert_allclose(uvs.sum(-1), 1.0, atol=1e-5)
        assert (np.asarray(debug["colors"]) >= -1).all()
        assert (np.asarray(debug["colors"]) <= 1).all()

    def test_triad_composite_matches_uvs_colors(self):
        cfg = small_gen_cfg()
        params, state = generator_init(cfg, KEY)
        z = jax.random.normal(KEY, (1, 16))
        img, debug, _ = generator_apply(
            cfg, params, state, z=z, geom_features=make_geom_feats(cfg, 1),
            return_debug_data=True)
        want = np.einsum("bhwk,bck->bhwc", np.asarray(debug["uvs"]),
                         np.asarray(debug["colors"]))
        np.testing.assert_allclose(np.asarray(img), want, atol=1e-5)

    def test_premapped_path_matches_mapping(self):
        cfg = small_gen_cfg()
        params, state = generator_init(cfg, KEY)
        z = jax.random.normal(KEY, (2, 16))
        feats = make_geom_feats(cfg, 2)
        img1, debug, _ = generator_apply(cfg, params, state, z=z,
                                         geom_features=feats,
                                         return_debug_data=True)
        img2, _, _ = generator_apply(cfg, params, state, ws=debug["ws"],
                                     geom_features=feats)
        np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                                   atol=1e-6)

    def test_noise_positions_change_output(self):
        cfg = small_gen_cfg()
        params, state = generator_init(cfg, KEY)
        # noise_strength initializes to 0 (StyleGAN2 convention); give the
        # noise a visible amplitude so positions can influence the output.
        params = jax.tree_util.tree_map_with_path(
            lambda path, x: jnp.ones_like(x)
            if any(getattr(p, "key", None) == "noise_strength" for p in path)
            else x, params)
        z = jax.random.normal(KEY, (1, 16))
        feats = make_geom_feats(cfg, 1)
        img0, _, _ = generator_apply(
            cfg, params, state, z=z, geom_features=feats,
            positions=jnp.asarray([[0, 0]], jnp.int32))
        img1, _, _ = generator_apply(
            cfg, params, state, z=z, geom_features=feats,
            positions=jnp.asarray([[0, 13]], jnp.int32))
        assert not np.allclose(np.asarray(img0), np.asarray(img1))

    def test_noise_buffer_override(self):
        cfg = small_gen_cfg()
        params, state = generator_init(cfg, KEY)
        params = jax.tree_util.tree_map_with_path(
            lambda path, x: jnp.ones_like(x)
            if any(getattr(p, "key", None) == "noise_strength" for p in path)
            else x, params)
        z = jax.random.normal(KEY, (1, 16))
        feats = make_geom_feats(cfg, 1)
        img0, _, _ = generator_apply(cfg, params, state, z=z,
                                     geom_features=feats)
        buffers = {"b32.conv1.noise_const":
                   jnp.zeros_like(state["noise"]["b32.conv1.noise_const"])
                   + 5.0}
        img1, _, _ = generator_apply(cfg, params, state, z=z,
                                     geom_features=feats,
                                     noise_buffers=buffers)
        assert not np.allclose(np.asarray(img0), np.asarray(img1))

    def test_return_and_blend_features(self):
        cfg = small_gen_cfg()
        params, state = generator_init(cfg, KEY)
        z = jax.random.normal(KEY, (1, 16))
        feats = make_geom_feats(cfg, 1)
        img, debug, _ = generator_apply(cfg, params, state, z=z,
                                        geom_features=feats,
                                        return_features=(32,))
        f32 = debug["features32"]
        assert f32.shape[1:3] == (32, 32)
        # Blending with alpha=1 replaces features entirely -> rerunning with
        # stored features must reproduce the same final image.
        img2, debug2, _ = generator_apply(
            cfg, params, state, z=z, geom_features=feats,
            return_features=(32,),
            blended_features={32: (f32, jnp.ones((1, 32, 32, 1)))})
        np.testing.assert_allclose(np.asarray(img2), np.asarray(img),
                                   atol=1e-4)
        # alpha=0 keeps the computed features -> also identical.
        img3, _, _ = generator_apply(
            cfg, params, state, z=z, geom_features=feats,
            return_features=(32,),
            blended_features={32: (jnp.zeros_like(f32),
                                   jnp.zeros((1, 32, 32, 1)))})
        np.testing.assert_allclose(np.asarray(img3), np.asarray(img),
                                   atol=1e-4)

    def test_style_mixing_runs(self):
        cfg = small_gen_cfg()
        params, state = generator_init(cfg, KEY)
        z = jax.random.normal(KEY, (2, 16))
        img, _, _ = generator_apply(
            cfg, params, state, z=z, geom_features=make_geom_feats(cfg, 2),
            style_mixing_prob=1.0, style_mixing_rng=jax.random.PRNGKey(3))
        assert np.all(np.isfinite(np.asarray(img)))

    def test_jit_and_grad(self):
        cfg = small_gen_cfg()
        params, state = generator_init(cfg, KEY)
        z = jax.random.normal(KEY, (2, 16))
        feats = make_geom_feats(cfg, 2)

        @jax.jit
        def loss_fn(params):
            img, _, _ = generator_apply(cfg, params, state, z=z,
                                        geom_features=feats)
            return jnp.mean(img ** 2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)

    def test_trainable_mask_modes(self):
        cfg = small_gen_cfg()
        params, _ = generator_init(cfg, KEY)
        m_all = generator_trainable_mask(cfg, params, "all")
        assert all(jax.tree_util.tree_leaves(m_all))
        m_rgb = generator_trainable_mask(cfg, params, "rgb")
        leaves = jax.tree_util.tree_leaves(m_rgb)
        assert any(leaves) and not all(leaves)
        n_rgb = sum(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda m: int(m), m_rgb)))
        n_last = sum(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda m: int(m),
            generator_trainable_mask(cfg, params, "last_and_rgb"))))
        assert n_last > n_rgb

    def test_positional_encoding_cat(self):
        cfg = small_gen_cfg(positional_encoding="simplesine",
                            posenc_inject_resolutions=(1,))
        params, state = generator_init(cfg, KEY)
        z = jax.random.normal(KEY, (2, 16))
        img, _, _ = generator_apply(
            cfg, params, state, z=z, geom_features=make_geom_feats(cfg, 2),
            positions=jnp.asarray([[0, 0], [7, 9]], jnp.int32))
        assert img.shape == (2, 32, 32, 3)

    def test_orig_color_format_skip_arch(self):
        cfg = make_generator_config(z_dim=16, w_dim=16, img_resolution=32,
                                    color_format="orig", architecture="skip",
                                    channel_base=2048, channel_max=32)
        params, state = generator_init(cfg, KEY)
        z = jax.random.normal(KEY, (2, 16))
        img, _, _ = generator_apply(cfg, params, state, z=z)
        assert img.shape == (2, 32, 32, 3)


class TestGeoEncoder:
    def test_sauto_multires(self):
        cfg = GeoEncoderConfig(kind="sauto", preproc="-11inverse")
        params, state = geo_encoder_init(cfg, KEY)
        geom = jnp.ones((2, 64, 64, 1))
        feats = geo_encoder_encode(cfg, params, state, geom, res=[0, 1])
        assert feats[0].shape == (2, 8, 8, cfg.feature_channels(0))
        assert feats[1].shape == (2, 16, 16, cfg.feature_channels(1))
        assert cfg.featuremap_resolution(64, 0) == 8
        assert cfg.featuremap_resolution(64, 1) == 16

    def test_fast_mode_bf16_encode_close_to_strict(self):
        """Production (fast) mode runs the frozen encoder in bf16; features
        must stay float32-typed and close to the strict-mode values."""
        from brushstroke_engine_tpu.ops.precision import precision_mode
        cfg = GeoEncoderConfig(kind="sauto", preproc="-11inverse")
        params, state = geo_encoder_init(cfg, KEY)
        geom = jnp.asarray(
            (np.random.RandomState(0).rand(2, 64, 64, 1) > 0.5), jnp.float32)
        with precision_mode("strict"):
            ref = geo_encoder_encode(cfg, params, state, geom, res=[0, 1])
        with precision_mode("fast"):
            fast = geo_encoder_encode(cfg, params, state, geom, res=[0, 1])
        for a, b in zip(ref, fast):
            assert b.dtype == jnp.float32
            scale = float(jnp.abs(a).max()) + 1e-8
            assert float(jnp.abs(a - b).max()) < 0.02 * scale

    def test_sauto_full_roundtrip(self):
        cfg = GeoEncoderConfig(kind="sauto", preproc="none")
        params, state = geo_encoder_init(cfg, KEY)
        geom = jnp.ones((1, 32, 32, 1)) * 0.5
        recon, new_state = geo_encoder_apply(cfg, params, state, geom)
        assert recon.shape == (1, 32, 32, 1)
        post = postprocess(cfg, recon)
        assert (np.asarray(post) >= 0).all() and (np.asarray(post) <= 1).all()

    def test_conv_ae(self):
        cfg = GeoEncoderConfig(kind="conv", img_width=32, emb_channel=4,
                               channel_factor=4, num_layers=3,
                               in_channels=1, out_channels=1)
        params, state = geo_encoder_init(cfg, KEY)
        geom = jnp.ones((1, 32, 32, 1))
        feats = geo_encoder_encode(cfg, params, state, geom, res=[0])
        assert feats[0].shape == (1, 4, 4, 4)
        recon, _ = geo_encoder_apply(cfg, params, state, geom)
        assert recon.shape == (1, 32, 32, 1)

    def test_bn_train_updates_state(self):
        cfg = GeoEncoderConfig(kind="sauto")
        params, state = geo_encoder_init(cfg, KEY)
        geom = jax.random.uniform(KEY, (2, 32, 32, 1))
        _, new_state = geo_encoder_apply(cfg, params, state, geom, train=True)
        old = state["encoder"]["layer0"]["bn"]["mean"]
        new = new_state["encoder"]["layer0"]["bn"]["mean"]
        assert not np.allclose(np.asarray(old), np.asarray(new))

    def test_align_corners_upsample(self):
        x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 1, 4, 1))
        y = np.asarray(upsample_bilinear_align_corners(x))[0, 0, :, 0]
        # align_corners=True: endpoints preserved, linear in between.
        want = np.arange(8) * 3.0 / 7.0
        np.testing.assert_allclose(y, want, atol=1e-5)


class TestDiscriminator:
    def test_logits_and_grad(self):
        cfg = DiscriminatorConfig(c_dim=0, img_resolution=32, img_channels=4,
                                  channel_base=2048, channel_max=32)
        params = discriminator_init(cfg, KEY)
        img = jax.random.normal(KEY, (4, 32, 32, 4))
        logits = discriminator_apply(cfg, params, img)
        assert logits.shape == (4, 1)

        def loss(params):
            return jnp.mean(discriminator_apply(cfg, params, img))

        g = jax.grad(loss)(params)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree_util.tree_leaves(g))

    def test_mbstd_group_sensitivity(self):
        cfg = DiscriminatorConfig(c_dim=0, img_resolution=32, img_channels=3,
                                  channel_base=2048, channel_max=32,
                                  mbstd_group_size=2)
        params = discriminator_init(cfg, KEY)
        same = jnp.ones((2, 32, 32, 3))
        varied = jnp.concatenate([jnp.ones((1, 32, 32, 3)),
                                  -jnp.ones((1, 32, 32, 3))])
        l_same = discriminator_apply(cfg, params, same)
        l_varied = discriminator_apply(cfg, params, varied)
        assert not np.allclose(np.asarray(l_same), np.asarray(l_varied))
