"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, make_dp_train_step,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_batch_layout():
    mesh = make_mesh()
    x = jnp.zeros((16, 4))
    xs = shard_batch(mesh, x)
    assert xs.sharding.num_devices == 8


def test_dp_step_matches_single_device():
    """The fused DP step over 8 chips must produce the same loss stats as
    the plain single-device phase steps on the same full batch."""
    from tests.helpers import small_bundle
    from brushstroke_engine_tpu.train.state import TrainConfig, \
        init_train_state
    from brushstroke_engine_tpu.train import steps as ts
    from brushstroke_engine_tpu.models.discriminator import \
        DiscriminatorConfig

    b = small_bundle()
    cfg = TrainConfig(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=8,
        g_reg_interval=1, d_reg_interval=1,
        main_phase_losses="0.1*iou_inv(uvs)",
        style_mixing_prob=0.0)

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    geom = jnp.asarray((rng.rand(8, 32, 32, 1) > 0.5), jnp.float32)
    z1 = jnp.asarray(rng.randn(8, 16), jnp.float32)
    z2 = jnp.asarray(rng.randn(8, 16), jnp.float32)

    # Single-device run.
    state1 = init_train_state(cfg, key, g_params=b.gen_params,
                              g_state=b.gen_state)
    k = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    feats = ts.encode_geometry(cfg, b.enc_params, b.enc_state, geom)
    state1, d_stats = ts.d_main_step(cfg, state1, real, feats, z1, k1)

    # DP run over the mesh.
    mesh = make_mesh()
    state2 = init_train_state(cfg, key, g_params=b.gen_params,
                              g_state=b.gen_state)
    state2 = replicate(mesh, state2)
    enc_p = replicate(mesh, b.enc_params)
    enc_s = replicate(mesh, b.enc_state)
    batch = shard_batch(mesh, {"real": real, "geom": geom,
                               "z1": z1, "z2": z2})
    step = make_dp_train_step(cfg, mesh)
    state2, stats = step(state2, enc_p, enc_s, batch["real"], batch["geom"],
                         batch["z1"], batch["z2"], jax.random.PRNGKey(1),
                         jnp.int32(0), jnp.float32(0.99))

    # D-main loss stats agree between sharded and unsharded execution (the
    # same rng key folding path is used inside).
    np.testing.assert_allclose(float(stats["Loss/D/loss"]),
                               float(d_stats["Loss/D/loss"]),
                               rtol=1e-3, atol=1e-3)
    # Params remain replicated and finite after the full fused step.
    leaf = jax.tree_util.tree_leaves(state2["g_params"])[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_graft_dryrun():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_detector_caches_survive_backend_reset():
    """The dryrun bootstrap calls jax.extend.backend.clear_backends(),
    which strands any cached device-committed weight tree on a dead
    client ("incompatible devices" even though both sides print as
    device 0).  The FID/LPIPS singletons must detect this and rebuild
    (utils.util.tree_on_stale_backend)."""
    import jax.extend.backend
    from brushstroke_engine_tpu.metrics import fid as fid_mod
    from brushstroke_engine_tpu.metrics import lpips as lpips_mod

    lpips_model = lpips_mod.get_default_model()
    detector = fid_mod.get_default_extractor()
    jax.extend.backend.clear_backends()
    # Both getters must hand back models usable with FRESH arrays.
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    d = lpips_mod.lpips_batched(x, x * 0.5 + 0.1)
    assert np.all(np.isfinite(np.asarray(d)))
    f = fid_mod.extract_features(x)
    assert np.all(np.isfinite(np.asarray(f)))
    # And the stale objects were actually replaced, not reused.
    assert lpips_mod.get_default_model() is not lpips_model
    assert fid_mod.get_default_extractor() is not detector


def test_training_loop_dp_fused(tmp_path):
    """mesh= and use_fused= compose: the single-dispatch fused step runs
    SPMD from input shardings alone."""
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    from brushstroke_engine_tpu.train.dataset import SyntheticGeometryDataset
    from tests.test_train import make_train_cfg

    cfg, b = make_train_cfg(
        batch_size=8,
        main_phase_losses="0.1*iou_inv(uvs)",
        geom_phase_losses="1.0*iou_inv(uvs)",
        geom_warmstart_kimg=0,
        geom_interval=2, g_reg_interval=2, d_reg_interval=2,
        kimg_per_tick=1)  # no tick work in this short run

    class StyleIter:
        def __next__(self):
            return (np.random.RandomState(1).rand(8, 32, 32, 3)
                    * 255).astype(np.uint8)

    geo_ds = SyntheticGeometryDataset(40, size=8)

    class GeomIter:
        def __init__(self):
            self.i = 0

        def __next__(self):
            self.i += 1
            return np.stack([geo_ds[(self.i + j) % 8] for j in range(8)])

    loop = TrainingLoop(cfg, b.enc_params, b.enc_state, StyleIter(),
                        GeomIter(), run_dir=str(tmp_path),
                        mesh=make_mesh(), use_fused=True)
    loop.run(total_kimg=16 / 1000.0)
    leaf = jax.tree_util.tree_leaves(loop.state["g_params"])[0]
    assert leaf.sharding.num_devices == 8
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_training_loop_data_parallel(tmp_path):
    """End-to-end TrainingLoop over the 8-device mesh: state replicated,
    batches sharded, phase steps run SPMD, snapshot still loads."""
    import os
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    from brushstroke_engine_tpu.train.dataset import (
        SyntheticGeometryDataset,
    )
    from tests.test_train import make_train_cfg

    cfg, b = make_train_cfg(
        batch_size=8,
        main_phase_losses="0.1*iou_inv(uvs)",
        geom_phase_losses="1.0*iou_inv(uvs)",
        geom_warmstart_kimg=0,
        geom_interval=2, g_reg_interval=2, d_reg_interval=2,
        kimg_per_tick=0,
    )

    class StyleIter:
        def __next__(self):
            return (np.random.RandomState(0).rand(8, 32, 32, 3)
                    * 255).astype(np.uint8)

    geo_ds = SyntheticGeometryDataset(40, size=8)

    class GeomIter:
        def __init__(self):
            self.i = 0

        def __next__(self):
            self.i += 1
            return np.stack([geo_ds[(self.i + j) % 8] for j in range(8)])

    mesh = make_mesh()
    loop = TrainingLoop(cfg, b.enc_params, b.enc_state, StyleIter(),
                        GeomIter(), run_dir=str(tmp_path), mesh=mesh)
    # State ends up replicated over all 8 devices.
    leaf = jax.tree_util.tree_leaves(loop.state["g_params"])[0]
    assert leaf.sharding.num_devices == 8
    loop.run(total_kimg=16 / 1000.0)
    assert loop.cur_nimg >= 16
    leaf = jax.tree_util.tree_leaves(loop.state["g_params"])[0]
    assert np.all(np.isfinite(np.asarray(leaf)))
    snaps = [f for f in os.listdir(tmp_path) if f.startswith("network")]
    assert len(snaps) >= 1


def test_sharded_canvas_stylize_matches_single_device():
    """The mesh-sharded on-device canvas replay (tile batches data-parallel
    over 8 chips) must agree with the unsharded single-device render."""
    from tests.helpers import make_engine
    from brushstroke_engine_tpu.engine.brush import GanBrushOptions
    from brushstroke_engine_tpu.engine.stylize import stylize_image_ondevice
    from brushstroke_engine_tpu.data.curves import random_spline_stroke

    eng = make_engine()
    rng = np.random.default_rng(11)
    geom = random_spline_stroke(rng, 96, radius=4.0)

    opts1 = GanBrushOptions()
    opts1.set_style(eng.random_style(5), 5)
    single = stylize_image_ondevice(eng, geom, opts1, overlap_margin=4,
                                    crop_margin=4,
                                    feature_blending_level=1, batch_size=8)

    mesh = make_mesh()
    opts2 = GanBrushOptions()
    opts2.set_style(eng.random_style(5), 5)
    sharded = stylize_image_ondevice(eng, geom, opts2, overlap_margin=4,
                                     crop_margin=4,
                                     feature_blending_level=1, batch_size=8,
                                     mesh=mesh)
    assert single.shape == sharded.shape
    diff = np.abs(single.astype(int) - sharded.astype(int))
    assert np.median(diff) <= 1
    assert (diff <= 2).mean() > 0.99


def test_sharded_canvas_stylize_rejects_bad_batch():
    from tests.helpers import make_engine
    from brushstroke_engine_tpu.engine.brush import GanBrushOptions
    from brushstroke_engine_tpu.engine.stylize import stylize_image_ondevice
    import pytest

    eng = make_engine()
    opts = GanBrushOptions()
    opts.set_style(eng.random_style(5), 5)
    geom = np.zeros((96, 96), np.float32)
    with pytest.raises(ValueError):
        stylize_image_ondevice(eng, geom, opts, overlap_margin=4,
                               feature_blending_level=1, batch_size=6,
                               mesh=make_mesh())


def test_serving_render_batch_sharded_matches_single_device():
    """Multi-chip serving: render_batch with a serving mesh (batch sharded
    over 8 devices, padded to the mesh size) matches the single-device
    result row for row."""
    from tests.helpers import small_bundle, make_engine
    from brushstroke_engine_tpu.engine.brush import GanBrushOptions

    eng = make_engine(small_bundle())
    pw = eng.patch_width
    rng = np.random.RandomState(0)

    def requests(n):
        geoms = (rng.rand(n, pw, pw, 1) > 0.5).astype(np.float32)
        opts = []
        for i in range(n):
            o = GanBrushOptions()
            o.set_style(eng.random_style(i), i)
            o.set_position(8 * i, 4 * i)
            opts.append(o)
        return geoms, opts

    for n in (3, 8):  # 3 exercises padding to the mesh size
        geoms, opts = requests(n)
        want = np.asarray(eng.render_batch(geoms, opts)["rgba"])

        eng.set_serving_mesh(make_mesh())
        try:
            got = np.asarray(eng.render_batch(geoms, opts)["rgba"])
        finally:
            eng.set_serving_mesh(None)
        assert got.shape == (n, pw, pw, 4)
        np.testing.assert_allclose(got, want, atol=2e-5)
