"""Fused single-dispatch training step.

The reference's phase loop issues one optimizer pass per phase per batch
(training_loop_modified.py:413-496).  The phase-by-phase functions in
steps.py mirror that; this module additionally fuses the WHOLE batch cycle --
warmstart switch, Dmain, lazy Dreg(R1), Gmain, lazy Greg(PL), interval
Gstitch (with its double-crop data path), interval Ggeom, and the ADA p
controller -- into ONE jitted program with ``lax.cond`` branches, so a
training batch is a single device dispatch (and a single compile).  This is
the production shape of the trainer: the host only feeds data and reads
scalars.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.train.state import TrainConfig
from brushstroke_engine_tpu.train import steps as ts


def _nan_like_shapes(shape_dict) -> Dict:
    return {k: jnp.full(v.shape, jnp.nan, v.dtype)
            for k, v in shape_dict.items()}


def make_fused_train_step(cfg: TrainConfig, device_data: bool = False,
                          mesh=None, chunk: int = 0,
                          crop_margin: int = 10, min_overlap: int = 50):
    """Returns step(state, enc_params, enc_state, real_img, geom_input,
    geom_truth, rng, batch_idx, warm, ema_beta[, geom_input2, crop1,
    crop2]) -> (state, stats).

    ``warm`` is a traced bool selecting the warmstart branch; ``batch_idx``
    drives lazy-regularization and Gstitch/Ggeom intervals.  When the config
    enables stitching, pass the second overlapping geometry crop
    ``geom_input2`` plus both crop rectangles (as int arrays; the stitcher
    takes traced coordinates, so crops don't retrace) -- the Gstitch phase
    then runs inside the same dispatch on its interval (reference phase set
    training_loop_modified.py:296-301).  Stats always contain every phase's
    keys; phases that did not run this step report NaN.

    With ``device_data=True`` the returned step instead has signature
    step(state, enc_params, enc_state, style_bank, tri_bank, rng,
    batch_idx, warm, ema_beta, crop1[, crop2]): the batch is SAMPLED
    ON-DEVICE from uint8 banks (see train/device_dataset.py) -- gather by
    random index, float conversion, training-resolution crop (and the
    stitch phase's second crop) all inside the same dispatch, so the host
    feeds nothing per step but a key and crop offsets.  ``mesh`` shards the
    sampled batch over the ``data`` axis.

    With additionally ``chunk=K > 0`` the returned step runs K consecutive
    batches per dispatch as a ``lax.scan`` over the single-batch cycle --
    signature step(state, enc_params, enc_state, style_bank, tri_bank,
    rng, batch_idx0, nimg0) -> (state, stats stacked [K]).  EVERYTHING
    per-step moves on-device: the bank draw, both crop rectangles
    (device_dataset.gen_crops mirrors the host stitcher's distribution),
    the warmstart flag (from the traced image counter), and the EMA decay
    with its ramp-up.  The host's only per-dispatch work is one key, two
    int scalars, and the tick machinery -- this is the production trainer
    shape for a high-latency host<->device link, and it removes the last
    per-batch host costs everywhere else.
    """
    warm_step = ts.make_geom_step(cfg, warmstart=True).__wrapped__ \
        if cfg.geom_warmstart_kimg > 0 else None
    geom_step = ts.make_geom_step(cfg, warmstart=False).__wrapped__ \
        if cfg.geom_interval > 0 and cfg.losses("geom").items else None
    # Clarity-finetune support: fake_orig losses need the FROZEN original
    # generator (reference G_orig, training_loop_modified.py:260-262,479).
    needs_orig_warm = warm_step is not None and \
        cfg.losses("warmstart").require_original_fake_image()
    needs_orig_geom = geom_step is not None and \
        cfg.losses("geom").require_original_fake_image()
    stitch_step = ts.make_stitch_step(cfg).__wrapped__ \
        if cfg.stitch_interval > 0 and cfg.losses("stitch").items else None
    d_main = ts.d_main_step.__wrapped__
    d_reg = ts.d_reg_step.__wrapped__
    g_main = ts.g_main_step.__wrapped__
    g_reg = ts.g_reg_step.__wrapped__
    ada = ts.ada_update.__wrapped__

    def core(state, enc_params, enc_state, real_img, geom_input, geom_truth,
             k, batch_idx, warm, ema_beta, geom_input2=None, crop1=None,
             crop2=None, g_orig_params=None):
        feats = ts.encode_geometry(cfg, enc_params, enc_state, geom_input)
        n = real_img.shape[0]
        zdim = cfg.gen_cfg.z_dim
        z1 = jax.random.normal(k[5], (n, zdim))
        z2 = jax.random.normal(k[6], (n, zdim))
        z3 = jax.random.normal(k[7], (n, zdim))

        # Phase thunks (state -> (state, stats)).
        def t_dmain(s):
            return d_main(cfg, s, real_img, feats, z1, k[0])

        def t_dreg(s):
            return d_reg(cfg, s, real_img, k[1])

        def t_gmain(s):
            return g_main(cfg, s, feats, geom_truth, z2, k[2], ema_beta)

        def t_greg(s):
            return g_reg(cfg, s, feats, z2, k[3], ema_beta)

        thunks = {"dmain": t_dmain, "dreg": t_dreg, "gmain": t_gmain,
                  "greg": t_greg}
        if geom_step is not None:
            thunks["ggeom"] = lambda s: geom_step(
                s, feats, geom_truth, z3, k[4], ema_beta,
                g_orig_params=g_orig_params if needs_orig_geom else None)
        if warm_step is not None:
            thunks["warm"] = lambda s: warm_step(
                s, feats, geom_truth, z1, k[4], ema_beta,
                g_orig_params=g_orig_params if needs_orig_warm else None)
        if stitch_step is not None:
            assert geom_input2 is not None and crop1 is not None \
                and crop2 is not None, \
                "stitching is configured: pass geom_input2/crop1/crop2"
            z_st = jax.random.normal(k[8], (n, zdim))

            def t_stitch(s):
                # Second-crop encode lives inside the cond branch: it only
                # costs device time on stitch batches.
                feats2 = ts.encode_geometry(cfg, enc_params, enc_state,
                                            geom_input2)
                return stitch_step(s, feats, feats2, z_st, crop1, crop2,
                                   k[9], ema_beta)

            thunks["stitch"] = t_stitch

        # Stats prototypes (shapes only; no compute).
        protos = {name: jax.eval_shape(fn, state)[1]
                  for name, fn in thunks.items()}
        all_nan = {}
        for p in protos.values():
            all_nan.update(_nan_like_shapes(p))

        def with_stats(partial_stats):
            out = dict(all_nan)
            out.update(partial_stats)
            return out

        def cond_phase(pred, fn, s):
            return jax.lax.cond(
                pred, fn,
                lambda s_: (s_, _nan_like_shapes(jax.eval_shape(fn, s_)[1])),
                s)

        def main_branch(s):
            s, st1 = t_dmain(s)
            s, st2 = cond_phase(batch_idx % cfg.d_reg_interval == 0,
                                t_dreg, s)
            s, st3 = t_gmain(s)
            s, st4 = cond_phase(batch_idx % cfg.g_reg_interval == 0,
                                t_greg, s)
            stats = {}
            for d in (st1, st2, st3, st4):
                stats.update(d)
            if stitch_step is not None:
                s, st_s = cond_phase(batch_idx % cfg.stitch_interval == 0,
                                     thunks["stitch"], s)
                stats.update(st_s)
            if geom_step is not None:
                s, st5 = cond_phase(batch_idx % cfg.geom_interval == 0,
                                    thunks["ggeom"], s)
                stats.update(st5)
            if cfg.augment is not None:
                s = jax.lax.cond(
                    jnp.logical_and(batch_idx > 0,
                                    batch_idx % cfg.ada_interval == 0),
                    lambda s_: ada(cfg, s_, jnp.float32(
                        cfg.batch_size * cfg.ada_interval)),
                    lambda s_: s_, s)
            return s, with_stats(stats)

        def warm_branch(s):
            s, st = thunks["warm"](s)
            return s, with_stats(st)

        if warm_step is None:
            return main_branch(state)
        return jax.lax.cond(warm, warm_branch, main_branch, state)

    if not device_data:
        @partial(jax.jit, donate_argnums=(0,))
        def step(state, enc_params, enc_state, real_img, geom_input,
                 geom_truth, rng, batch_idx, warm, ema_beta,
                 geom_input2=None, crop1=None, crop2=None,
                 g_orig_params=None):
            k = jax.random.split(rng, 10)
            return core(state, enc_params, enc_state, real_img, geom_input,
                        geom_truth, k, batch_idx, warm, ema_beta,
                        geom_input2, crop1, crop2, g_orig_params)

        return step

    from brushstroke_engine_tpu.train.device_dataset import (
        crop_tri, gen_crops, sample_banks)
    res = cfg.gen_cfg.img_resolution
    stitching = stitch_step is not None

    def sampled_core(state, enc_params, enc_state, style_bank, tri_bank,
                     k, kbank, batch_idx, warm, ema_beta, crop1, crop2,
                     g_orig_params=None):
        real_img, tri = sample_banks(style_bank, tri_bank, kbank,
                                     cfg.batch_size, mesh=mesh)
        geom_input, geom_truth = crop_tri(tri, crop1, res)
        geom_input2 = crop_tri(tri, crop2, res)[0] if stitching else None
        return core(state, enc_params, enc_state, real_img, geom_input,
                    geom_truth, k, batch_idx, warm, ema_beta,
                    geom_input2, crop1, crop2, g_orig_params)

    if not chunk:
        @partial(jax.jit, donate_argnums=(0,))
        def device_step(state, enc_params, enc_state, style_bank, tri_bank,
                        rng, batch_idx, warm, ema_beta, crop1, crop2=None,
                        g_orig_params=None):
            k = jax.random.split(rng, 11)
            if stitching:
                assert crop2 is not None, \
                    "stitching is configured: pass crop2"
            return sampled_core(state, enc_params, enc_state, style_bank,
                                tri_bank, k[:10], k[10], batch_idx, warm,
                                ema_beta, crop1, crop2, g_orig_params)

        return device_step

    warm_start_nimg = cfg.geom_warmstart_start_kimg * 1000.0
    warm_len_nimg = cfg.geom_warmstart_kimg * 1000.0

    @partial(jax.jit, donate_argnums=(0,))
    def chunk_step(state, enc_params, enc_state, style_bank, tri_bank,
                   rng, batch_idx0, nimg0, g_orig_params=None):
        tri_hw = (tri_bank.shape[1], tri_bank.shape[2])

        def body(s, i):
            batch_idx = batch_idx0 + i
            nimg = (nimg0 + i * cfg.batch_size).astype(jnp.float32)
            k = jax.random.split(jax.random.fold_in(rng, i), 12)
            crop1, crop2 = gen_crops(k[11], tri_hw, res, stitching,
                                     crop_margin, min_overlap)
            if warm_step is not None:
                warm = jnp.logical_and(
                    nimg >= warm_start_nimg,
                    nimg - warm_start_nimg < warm_len_nimg)
            else:
                warm = jnp.bool_(False)
            # EMA decay with ramp-up (loop._ema_beta, reference
            # training_loop_modified.py ema_nimg ramp).
            ema_nimg = jnp.float32(cfg.ema_kimg * 1000.0)
            if cfg.ema_rampup is not None:
                ema_nimg = jnp.minimum(ema_nimg, nimg * cfg.ema_rampup)
            ema_beta = jnp.exp2(-cfg.batch_size /
                                jnp.maximum(ema_nimg, 1e-8))
            return sampled_core(s, enc_params, enc_state, style_bank,
                                tri_bank, k[:10], k[10], batch_idx, warm,
                                ema_beta, crop1, crop2, g_orig_params)

        return jax.lax.scan(body, state, jnp.arange(chunk))

    return chunk_step
