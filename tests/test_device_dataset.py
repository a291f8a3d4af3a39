"""Device-resident dataset banks: on-chip sampling for the fused step.

The reference trains through a torch DataLoader (per-batch CPU decode +
host->device copies); train/device_dataset.py replaces that with uint8
HBM banks sampled inside the fused dispatch.  These tests pin the sampling
semantics to the host pipeline's float conversions, the crop algebra, the
bank size guard, and single-vs-DP equivalence of the on-device draw.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import small_bundle
from brushstroke_engine_tpu.train.device_dataset import (
    build_device_banks, crop_tri, sample_banks,
)
from brushstroke_engine_tpu.train.dataset import (
    geom_batch_to_float, style_batch_to_float,
)


class _ArrayDS:
    def __init__(self, arr):
        self.arr = arr

    def __len__(self):
        return len(self.arr)

    def __getitem__(self, i):
        return self.arr[i]


def test_sample_banks_matches_host_conversions():
    rng = np.random.RandomState(0)
    style = (rng.rand(10, 8, 8, 3) * 255).astype(np.uint8)
    tri = (rng.rand(7, 12, 12, 3) * 255).astype(np.uint8)
    key = jax.random.PRNGKey(3)
    s, t = jax.jit(lambda k: sample_banks(
        jnp.asarray(style), jnp.asarray(tri), k, 4))(key)
    ks, kg = jax.random.split(key)
    idx_s = np.asarray(jax.random.randint(ks, (4,), 0, 10))
    idx_g = np.asarray(jax.random.randint(kg, (4,), 0, 7))
    np.testing.assert_allclose(np.asarray(s),
                               style_batch_to_float(style[idx_s]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t),
                               geom_batch_to_float(tri[idx_g]), atol=1e-6)


def test_crop_tri_matches_numpy_slice():
    rng = np.random.RandomState(1)
    tri = rng.rand(3, 12, 12, 3).astype(np.float32)
    out_in, out_truth = jax.jit(
        lambda t, c: crop_tri(t, c, 8))(jnp.asarray(tri),
                                        jnp.asarray([2, 3, 8, 8], np.int32))
    want = tri[:, 2:10, 3:11]
    np.testing.assert_allclose(np.asarray(out_in), want[..., 1:2], atol=0)
    np.testing.assert_allclose(np.asarray(out_truth), want[..., 2:3], atol=0)


def test_build_banks_size_guard():
    rng = np.random.RandomState(2)
    arr = (rng.rand(4, 8, 8, 3) * 255).astype(np.uint8)
    with pytest.raises(ValueError, match="device residency"):
        build_device_banks(_ArrayDS(arr), _ArrayDS(arr), max_bytes=16)
    banks = build_device_banks(_ArrayDS(arr), _ArrayDS(arr))
    assert banks.tri_hw == (8, 8)
    np.testing.assert_array_equal(np.asarray(banks.style), arr)


def _banks_and_cfg(batch_size=2, **cfg_kw):
    from brushstroke_engine_tpu.train.state import TrainConfig
    from brushstroke_engine_tpu.models.discriminator import (
        DiscriminatorConfig)
    from brushstroke_engine_tpu.train.augment import AugmentConfig
    from brushstroke_engine_tpu.train.dataset import (
        SyntheticGeometryDataset)
    b = small_bundle()
    kw = dict(
        gen_cfg=b.gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=32,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=b.enc_cfg, enc_res=(0,), batch_size=batch_size,
        main_phase_losses="0.1*iou_inv(uvs)",
        geom_interval=3, g_reg_interval=2, d_reg_interval=2,
        geom_warmstart_kimg=0,
        augment=AugmentConfig.from_spec("bgc"))
    kw.update(cfg_kw)
    cfg = TrainConfig(**kw)
    rng = np.random.RandomState(3)
    style = (rng.rand(16, 32, 32, 3) * 255).astype(np.uint8)
    geo_ds = SyntheticGeometryDataset(40, size=12)
    banks = build_device_banks(_ArrayDS(style), geo_ds)
    return b, cfg, banks


def test_fused_device_step_runs_and_updates():
    from brushstroke_engine_tpu.train.fused import make_fused_train_step
    from brushstroke_engine_tpu.train.state import init_train_state
    b, cfg, banks = _banks_and_cfg()
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    step = make_fused_train_step(cfg, device_data=True)
    before = np.asarray(
        jax.tree_util.tree_leaves(state["g_params"])[0]).copy()
    crop1 = np.asarray([4, 2, 32, 32], np.int32)
    state, stats = step(state, b.enc_params, b.enc_state,
                        banks.style, banks.tri, jax.random.PRNGKey(1),
                        jnp.int32(2), jnp.bool_(False), jnp.float32(0.99),
                        crop1)
    ran = {k for k, v in stats.items() if np.isfinite(float(v))}
    assert "Loss/D/loss" in ran and "Loss/r1_penalty" in ran
    after = np.asarray(jax.tree_util.tree_leaves(state["g_params"])[0])
    assert not np.allclose(before, after)
    assert np.all(np.isfinite(after))


def test_fused_device_step_stitch_branch():
    from brushstroke_engine_tpu.train.fused import make_fused_train_step
    from brushstroke_engine_tpu.train.state import init_train_state
    b, cfg, banks = _banks_and_cfg(
        stitch_interval=2, stitch_phase_losses="1*gan(fake_composite)")
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    step = make_fused_train_step(cfg, device_data=True)
    crop1 = np.asarray([0, 0, 32, 32], np.int32)
    crop2 = np.asarray([4, 4, 32, 32], np.int32)
    state, stats = step(state, b.enc_params, b.enc_state,
                        banks.style, banks.tri, jax.random.PRNGKey(1),
                        jnp.int32(4), jnp.bool_(False), jnp.float32(0.99),
                        crop1, crop2)
    ran = {k for k, v in stats.items() if np.isfinite(float(v))}
    assert any(k.startswith("Loss/forger/Gstitch") or "stitch" in k.lower()
               for k in ran), sorted(ran)


def test_training_loop_with_device_banks(tmp_path):
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    b, cfg, banks = _banks_and_cfg(batch_size=4, kimg_per_tick=1)
    loop = TrainingLoop(cfg, b.enc_params, b.enc_state, None, None,
                        run_dir=str(tmp_path), use_fused=True,
                        device_banks=banks)
    loop.run(total_kimg=12 / 1000.0)
    assert loop.cur_nimg >= 12
    leaf = jax.tree_util.tree_leaves(loop.state["g_params"])[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_device_banks_requires_fused(tmp_path):
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    b, cfg, banks = _banks_and_cfg()
    with pytest.raises(ValueError, match="use_fused"):
        TrainingLoop(cfg, b.enc_params, b.enc_state, None, None,
                     run_dir=str(tmp_path), use_fused=False,
                     device_banks=banks)


def test_gen_crops_bounds_and_overlap():
    """On-device crop draw mirrors the host stitcher's guarantees: crop1
    uniform over valid positions, crop2 within the overlap radius and
    inside the image (engine.areas.gen_overlapping_square_crop algebra)."""
    from brushstroke_engine_tpu.train.device_dataset import gen_crops
    res, h, w, margin, mo = 64, 100, 90, 10, 50
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    c1, c2 = jax.vmap(
        lambda k: gen_crops(k, (h, w), res, True, margin, mo))(keys)
    c1, c2 = np.asarray(c1), np.asarray(c2)
    assert c1[:, 0].min() >= 0 and c1[:, 0].max() <= h - res
    assert c1[:, 1].min() >= 0 and c1[:, 1].max() <= w - res
    # crop2 in-image (areas.py clamps to input_width - width - 1).
    assert c2[:, 0].min() >= 0 and c2[:, 0].max() <= h - res - 1
    assert c2[:, 1].min() >= 0 and c2[:, 1].max() <= w - res - 1
    # Overlap radius: |delta| <= res - margin - min_overlap - 1.
    radius = res - margin - min(mo, res - margin - 1) - 1
    assert np.abs(c2[:, :2] - c1[:, :2]).max() <= radius
    # Non-degenerate randomness.
    assert len(np.unique(c1[:, 0])) > 5 and len(np.unique(c2[:, 0])) > 5


def test_chunked_step_phase_schedule():
    """chunk=K scan: warmstart flag, lazy-reg intervals and the stitch
    interval all derive from the traced step index on-device; the stacked
    stats must show warm phases on early steps and main phases after."""
    from brushstroke_engine_tpu.train.fused import make_fused_train_step
    from brushstroke_engine_tpu.train.state import init_train_state
    b, cfg, banks = _banks_and_cfg(
        batch_size=2, geom_warmstart_kimg=4 / 1000.0,
        geom_warmstart_losses="1.0*iou_inv(uvs)",
        stitch_interval=2, stitch_phase_losses="1*gan(fake_composite)")
    state = init_train_state(cfg, jax.random.PRNGKey(0),
                             g_params=b.gen_params, g_state=b.gen_state)
    step = make_fused_train_step(cfg, device_data=True, chunk=4)
    state, stats = step(state, b.enc_params, b.enc_state,
                        banks.style, banks.tri, jax.random.PRNGKey(1),
                        jnp.int32(0), jnp.int32(0))
    stats = {k: np.asarray(v) for k, v in stats.items()}
    d_loss = stats["Loss/D/loss"]
    assert d_loss.shape == (4,)
    # nimg = 0, 2 are inside the 4-image warmstart: D did not run there.
    assert not np.isfinite(d_loss[0]) and not np.isfinite(d_loss[1])
    assert np.isfinite(d_loss[2]) and np.isfinite(d_loss[3])
    warm_keys = [k for k in stats if "warmstart" in k or "warm" in k]
    assert any(np.isfinite(stats[k][:2]).any() for k in warm_keys), \
        sorted(stats)
    leaf = jax.tree_util.tree_leaves(state["g_params"])[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_training_loop_chunked_dispatch(tmp_path):
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    from brushstroke_engine_tpu.parallel.mesh import make_mesh
    from brushstroke_engine_tpu.train.device_dataset import (
        build_device_banks)
    mesh = make_mesh()
    b, cfg, banks = _banks_and_cfg(batch_size=8, kimg_per_tick=1)
    banks = build_device_banks(_ArrayDS(np.asarray(banks.style)),
                               _ArrayDS(np.asarray(banks.tri)), mesh=mesh)
    loop = TrainingLoop(cfg, b.enc_params, b.enc_state, None, None,
                        run_dir=str(tmp_path), use_fused=True, mesh=mesh,
                        device_banks=banks, steps_per_dispatch=3, seed=7)
    loop.run(total_kimg=48 / 1000.0)
    assert loop.cur_nimg >= 48 and loop.batch_idx % 3 == 0
    leaf = jax.tree_util.tree_leaves(loop.state["g_params"])[0]
    assert np.all(np.isfinite(np.asarray(leaf)))
    # Tick stat reduction handled the [K]-stacked values.
    assert "Loss/D/loss" in loop._last_stats


def test_chunked_requires_device_banks(tmp_path):
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    b, cfg, _ = _banks_and_cfg()
    with pytest.raises(ValueError, match="device_banks"):
        TrainingLoop(cfg, b.enc_params, b.enc_state, None, None,
                     run_dir=str(tmp_path), use_fused=True,
                     steps_per_dispatch=4)


def test_device_banks_dp_matches_single_device(tmp_path):
    """Same seed => identical on-device draws, so the DP-mesh run must
    track the single-device run (fp reduction-order tolerance only)."""
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    from brushstroke_engine_tpu.parallel.mesh import make_mesh

    results = []
    for mesh in (None, make_mesh()):
        b, cfg, banks0 = _banks_and_cfg(batch_size=8, kimg_per_tick=1)
        if mesh is not None:
            from brushstroke_engine_tpu.train.device_dataset import (
                build_device_banks)
            banks0 = build_device_banks(
                _ArrayDS(np.asarray(banks0.style)),
                _ArrayDS(np.asarray(banks0.tri)), mesh=mesh)
        loop = TrainingLoop(cfg, b.enc_params, b.enc_state, None, None,
                            run_dir=str(tmp_path / f"m{mesh is not None}"),
                            use_fused=True, mesh=mesh, device_banks=banks0,
                            seed=7)
        loop.run(total_kimg=24 / 1000.0)
        results.append(np.asarray(
            jax.tree_util.tree_leaves(loop.state["g_params"])[0]))
    np.testing.assert_allclose(results[0], results[1], rtol=2e-3, atol=2e-3)
