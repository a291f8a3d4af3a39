"""Jitted training phase functions.

Each reference phase (Dmain, Dreg/r1, Gmain, Greg/path-length, Ggeom,
Ggeom-warm; loss_modified.py:140-272) becomes a pure function
``state, batch, rng -> state, stats``.  Regularizers that need
gradient-of-gradient (R1, PL) use plain ``jax.grad`` composition -- XLA
differentiates through the conv stack natively, replacing the reference's
``conv2d_gradfix``/``no_weight_gradients`` machinery.

G_ema update runs inside the G steps (lerp with a traced beta).  ADA's
feedback controller accumulates sign statistics in the state; the p update is
a tiny jitted function the host calls every ``ada_interval`` batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from brushstroke_engine_tpu.models.generator import (
    generator_apply, generator_trainable_mask,
)
from brushstroke_engine_tpu.models.discriminator import discriminator_apply
from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode
from brushstroke_engine_tpu.train.augment import augment_pipe
from brushstroke_engine_tpu.train.state import TrainConfig, make_optimizers


def _scoped(name):
    """Annotate phase computations for device profiles (the TPU analog of
    the reference's record_function scopes, SURVEY.md section 5.1)."""
    return jax.named_scope(name)


def encode_geometry(cfg: TrainConfig, enc_params, enc_state, geom):
    """Frozen geometry encoding (no grads; reference loop :409-410)."""
    feats = geo_encoder_encode(cfg.enc_cfg, enc_params, enc_state, geom,
                               res=list(cfg.enc_res))
    return [jax.lax.stop_gradient(f) for f in feats]


def _run_g(cfg: TrainConfig, g_params, state, z, geom_feats, rng,
           style_mixing_prob=None, update_w_avg=True):
    smp = cfg.style_mixing_prob if style_mixing_prob is None \
        else style_mixing_prob
    k_mix, k_noise = jax.random.split(rng)
    img, debug, new_w_avg = generator_apply(
        cfg.gen_cfg, g_params, {"w_avg": state["w_avg"],
                                "noise": state["noise"]},
        z=z, geom_features=geom_feats, noise_mode=cfg.noise_mode,
        rng=k_noise,
        return_debug_data=True, style_mixing_prob=smp,
        style_mixing_rng=k_mix, update_w_avg=update_w_avg)
    return img, debug, new_w_avg


def _run_d(cfg: TrainConfig, d_params, img, rng, ada_p):
    if cfg.augment is not None:
        img = augment_pipe(cfg.augment, rng, img, ada_p)
    return discriminator_apply(cfg.disc_cfg, d_params, img)


def _apply_updates(opt, params, grads, opt_state, mask=None):
    grads = jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads)
    if mask is not None:
        grads = jax.tree_util.tree_map(
            lambda g, m: g * jnp.float32(m), grads, mask)
    updates, new_opt_state = opt.update(grads, opt_state, params)
    if mask is not None:
        # Keep masked-out optimizer moments untouched is not needed for Adam
        # correctness here; zero updates suffice (grad=0 -> tiny moment decay,
        # matching torch Adam which also decays moments of frozen params only
        # if stepped -- the reference freezes via requires_grad so its opt
        # skips them entirely; zeroing updates matches the param trajectory).
        updates = jax.tree_util.tree_map(
            lambda u, m: u * jnp.float32(m), updates, mask)
    return optax.apply_updates(params, updates), new_opt_state


def ema_update(g_ema, g_params, beta):
    return jax.tree_util.tree_map(
        lambda e, p: p + (e - p) * beta, g_ema, g_params)


def _num_rounds(cfg: TrainConfig, batch: int) -> int:
    """Gradient-accumulation round count from cfg.batch_gpu (reference
    --batch-gpu microbatching, training_loop_modified.py:438-480)."""
    if not cfg.batch_gpu or cfg.batch_gpu >= batch:
        return 1
    assert batch % cfg.batch_gpu == 0, \
        f"batch {batch} not divisible by batch_gpu {cfg.batch_gpu}"
    return batch // cfg.batch_gpu


def _to_rounds(tree, rounds: int):
    return jax.tree_util.tree_map(
        lambda x: x.reshape((rounds, x.shape[0] // rounds) + x.shape[1:]),
        tree)


def _accum_grads(loss_fn, params, batch_tree, rng, rounds: int):
    """Accumulate grads over ``rounds`` microbatches with ``lax.scan``.

    ``batch_tree`` leaves have leading batch dim; ``loss_fn(params, mb,
    rng) -> (loss, aux)``.  Returns (mean loss, aux stacked over rounds,
    mean grads).  The sequential scan trades wall-clock for peak memory,
    exactly like the reference's batch_gpu rounds (which also give each
    round its own noise/augment draws).
    """
    gfn = jax.value_and_grad(loss_fn, has_aux=True)
    if rounds == 1:
        (loss, aux), grads = gfn(params, batch_tree, rng)
        return loss, jax.tree_util.tree_map(lambda a: a[None], aux), grads

    mbs = _to_rounds(batch_tree, rounds)
    rngs = jax.random.split(rng, rounds)

    def body(carry, xs):
        gsum, lsum = carry
        mb, k = xs
        (loss, aux), grads = gfn(params, mb, k)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        return (gsum, lsum + loss), aux

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (gsum, lsum), auxs = jax.lax.scan(body, (zero, jnp.float32(0.0)),
                                      (mbs, rngs))
    grads = jax.tree_util.tree_map(lambda g: g / rounds, gsum)
    return lsum / rounds, auxs, grads


# ---------------------------------------------------------------------------
# D phases
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def d_main_step(cfg: TrainConfig, state, real_img, geom_feats, z, rng):
    """Dmain: softplus(D(G(z))) + softplus(-D(real)) (loss_modified:226-245).

    Honors cfg.batch_gpu gradient accumulation: the generator forward and
    both D passes run per microbatch inside the scan, bounding peak memory
    like the reference's rounds."""
    g_opt, d_opt, _ = make_optimizers(cfg)
    rounds = _num_rounds(cfg, z.shape[0])

    def loss_fn(d_params, mb, k):
        k_g, k_aug1, k_aug2 = jax.random.split(k, 3)
        gen_img, _, _ = _run_g(cfg, state["g_params"], state, mb["z"],
                               mb["feats"], k_g, update_w_avg=False)
        gen_img = jax.lax.stop_gradient(gen_img)
        gen_logits = _run_d(cfg, d_params, gen_img, k_aug1, state["ada_p"])
        real_logits = _run_d(cfg, d_params, mb["real"], k_aug2,
                             state["ada_p"])
        loss = jnp.mean(jax.nn.softplus(gen_logits)) \
            + jnp.mean(jax.nn.softplus(-real_logits))
        return loss, (gen_logits, real_logits)

    batch = {"real": real_img, "feats": geom_feats, "z": z}
    with _scoped("Dmain"):
        loss, (gen_logits, real_logits), grads = _accum_grads(
            loss_fn, state["d_params"], batch, rng, rounds)
    gen_logits = gen_logits.reshape(-1)
    real_logits = real_logits.reshape(-1)
    new_d, new_opt = _apply_updates(d_opt, state["d_params"], grads,
                                    state["d_opt"])
    state = dict(state, d_params=new_d, d_opt=new_opt,
                 ada_signs=state["ada_signs"]
                 + jnp.sum(jnp.sign(real_logits)),
                 ada_count=state["ada_count"] + real_logits.shape[0])
    stats = {"Loss/D/loss": loss,
             "Loss/scores/fake": jnp.mean(gen_logits),
             "Loss/scores/real": jnp.mean(real_logits),
             "Loss/signs/real": jnp.mean(jnp.sign(real_logits))}
    return state, stats


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def d_reg_step(cfg: TrainConfig, state, real_img, rng):
    """Dr1: R1 gradient penalty on reals (loss_modified:249-272).

    Honors cfg.batch_gpu -- R1's double backward is the peak-memory phase,
    so accumulation matters most here."""
    _, d_opt, _ = make_optimizers(cfg)
    gain = float(cfg.d_reg_interval)
    rounds = _num_rounds(cfg, real_img.shape[0])

    def loss_fn(d_params, mb, k):
        def d_sum(img):
            return jnp.sum(_run_d(cfg, d_params, img, k, state["ada_p"]))

        r1_grads = jax.grad(d_sum)(mb["real"])
        r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
        loss = jnp.mean(r1_penalty) * (cfg.r1_gamma / 2) * gain
        return loss, jnp.mean(r1_penalty)

    with _scoped("Dreg"):
        loss, penalty, grads = _accum_grads(
            loss_fn, state["d_params"], {"real": real_img}, rng, rounds)
    penalty = jnp.mean(penalty)
    new_d, new_opt = _apply_updates(d_opt, state["d_params"], grads,
                                    state["d_opt"])
    state = dict(state, d_params=new_d, d_opt=new_opt)
    return state, {"Loss/r1_penalty": penalty, "Loss/D/reg": loss}


# ---------------------------------------------------------------------------
# G phases
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def g_main_step(cfg: TrainConfig, state, geom_feats, geom_truth, z, rng,
                ema_beta):
    """Gmain: softplus(-D(G(z))) + main_phase_losses (loss_modified:149-178).

    Honors cfg.batch_gpu gradient accumulation (w_avg takes the final
    round's EMA value; each round starts from the same pre-step w_avg,
    matching the reference's buffer mutation to within one round's decay).
    """
    g_opt, _, _ = make_optimizers(cfg)
    main_losses = cfg.losses("main")
    rounds = _num_rounds(cfg, z.shape[0])

    def loss_fn(g_params, mb, k):
        k_g, k_aug, k_loss = jax.random.split(k, 3)
        img, debug, new_w_avg = _run_g(cfg, g_params, state, mb["z"],
                                       mb["feats"], k_g)
        logits = _run_d(cfg, state["d_params"], img, k_aug, state["ada_p"])
        loss = jnp.mean(jax.nn.softplus(-logits))
        debug = dict(debug, fake_img=img)
        forger_loss, items = main_losses.compute(debug, mb["truth"],
                                                 rng=k_loss)
        return loss + forger_loss, (loss, items, new_w_avg)

    batch = {"feats": geom_feats, "truth": geom_truth, "z": z}
    with _scoped("Gmain"):
        total, (gan_loss, items, new_w_avg), grads = _accum_grads(
            loss_fn, state["g_params"], batch, rng, rounds)
    gan_loss = jnp.mean(gan_loss)
    items = {k: jnp.mean(v) for k, v in items.items()}
    if new_w_avg is not None:
        new_w_avg = new_w_avg[-1]
    new_g, new_opt = _apply_updates(g_opt, state["g_params"], grads,
                                    state["g_opt"])
    new_ema = ema_update(state["g_ema"], new_g, ema_beta)
    state = dict(state, g_params=new_g, g_opt=new_opt, g_ema=new_ema,
                 w_avg=new_w_avg if new_w_avg is not None
                 else state["w_avg"])
    stats = {"Loss/G/loss": gan_loss, "Loss/G/total_loss": total}
    stats.update({f"Loss/forger/Gmain/{k}": v for k, v in items.items()})
    return state, stats


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def g_reg_step(cfg: TrainConfig, state, geom_feats, z, rng, ema_beta):
    """Gpl: path-length regularization on a shrunk batch
    (loss_modified:207-223).  grad-of-grad via jax.grad composition."""
    g_opt, _, _ = make_optimizers(cfg)
    gain = float(cfg.g_reg_interval)
    bs = z.shape[0] // cfg.pl_batch_shrink
    z = z[:bs]
    geom_feats = [f[:bs] for f in geom_feats]
    k_g, k_noise_img = jax.random.split(rng)

    k_mix1, k_mix2, k_mix3 = jax.random.split(jax.random.fold_in(rng, 77), 3)

    def loss_fn(g_params):
        # Map z -> ws explicitly so we can differentiate w.r.t. ws.
        from brushstroke_engine_tpu.models.mapping import mapping_apply
        ws, _ = mapping_apply(cfg.gen_cfg.mapping, g_params["mapping"], z,
                              None, w_avg=state["w_avg"])
        if cfg.style_mixing_prob > 0:
            # The reference's Gpl runs G with default style mixing
            # (loss_modified.py:210 run_G); PL grads are w.r.t. mixed ws.
            num_ws = ws.shape[1]
            cutoff = jax.random.randint(k_mix1, (), 1, num_ws)
            cutoff = jnp.where(
                jax.random.uniform(k_mix2, ()) < cfg.style_mixing_prob,
                cutoff, num_ws)
            ws2, _ = mapping_apply(
                cfg.gen_cfg.mapping, g_params["mapping"],
                jax.random.normal(k_mix3, z.shape, z.dtype), None,
                w_avg=state["w_avg"])
            idx = jnp.arange(num_ws)[None, :, None]
            ws = jnp.where(idx < cutoff, ws, ws2)

        def synth(ws_in):
            img, _, _ = generator_apply(
                cfg.gen_cfg, g_params,
                {"w_avg": state["w_avg"], "noise": state["noise"]},
                ws=ws_in, geom_features=geom_feats, noise_mode=cfg.noise_mode,
                rng=k_g)
            return img

        img = synth(ws)
        pl_noise = jax.random.normal(k_noise_img, img.shape) / \
            jnp.sqrt(jnp.float32(img.shape[1] * img.shape[2]))

        # pl_grads = d/dws sum(img * pl_noise); weight gradients flow through
        # the second backward exactly as in the reference (the
        # no_weight_gradients context only skips the *first* grad's weight
        # terms, which do not contribute to d(pl_grads)/d(weights) anyway).
        pl_grads = jax.grad(
            lambda w_: jnp.sum(synth(w_) * pl_noise))(ws)
        pl_lengths = jnp.sqrt(
            jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
        pl_mean = state["pl_mean"] + cfg.pl_decay * \
            (jnp.mean(pl_lengths) - state["pl_mean"])
        pl_penalty = jnp.square(pl_lengths - pl_mean)
        loss = jnp.mean(pl_penalty) * cfg.pl_weight * gain
        return loss, (jax.lax.stop_gradient(pl_mean),
                      jnp.mean(pl_penalty))

    with _scoped("Greg"):
        (loss, (new_pl_mean, penalty)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state["g_params"])
    new_g, new_opt = _apply_updates(g_opt, state["g_params"], grads,
                                    state["g_opt"])
    new_ema = ema_update(state["g_ema"], new_g, ema_beta)
    state = dict(state, g_params=new_g, g_opt=new_opt, g_ema=new_ema,
                 pl_mean=new_pl_mean)
    return state, {"Loss/pl_penalty": penalty, "Loss/G/reg": loss}


def make_geom_step(cfg: TrainConfig, warmstart: bool):
    """Build the (jitted) Ggeom / Ggeom-warm step with its layer mask
    (loss_modified:181-204; trainable layers per reference :296-301)."""
    losses = cfg.losses("warmstart" if warmstart else "geom")
    mode = cfg.geom_warmstart_mode if warmstart else cfg.geom_phase_mode
    needs_orig = losses.require_original_fake_image()

    @partial(jax.jit, static_argnames=(), donate_argnums=(0,))
    def step(state, geom_feats, geom_truth, z, rng, ema_beta,
             g_orig_params=None):
        _, _, geom_opt = make_optimizers(cfg)
        mask = generator_trainable_mask(cfg.gen_cfg, state["g_params"], mode)
        k_g, k_loss, k_orig = jax.random.split(rng, 3)

        fake_orig = None
        if needs_orig:
            assert g_orig_params is not None
            img_o, _, _ = _run_g(cfg, g_orig_params, state, z, geom_feats,
                                 k_orig, style_mixing_prob=0.0,
                                 update_w_avg=False)
            fake_orig = jax.lax.stop_gradient(img_o)

        def loss_fn(g_params):
            img, debug, _ = _run_g(
                cfg, g_params, state, z, geom_feats, k_g,
                style_mixing_prob=0.0 if needs_orig else None,
                update_w_avg=False)
            debug = dict(debug, fake_img=img)
            if fake_orig is not None:
                debug["fake_orig"] = fake_orig
            loss, items = losses.compute(debug, geom_truth, rng=k_loss)
            return loss, items

        (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["g_params"])
        new_g, new_opt = _apply_updates(geom_opt, state["g_params"], grads,
                                        state["geom_opt"], mask=mask)
        new_ema = ema_update(state["g_ema"], new_g, ema_beta)
        state = dict(state, g_params=new_g, geom_opt=new_opt, g_ema=new_ema)
        phase = "Ggeom-warm" if warmstart else "Ggeom"
        stats = {f"Loss/forger/{phase}/total": loss}
        stats.update({f"Loss/forger/{phase}/{k}": v
                      for k, v in items.items()})
        return state, stats

    return step


def make_stitch_step(cfg: TrainConfig, stitcher=None):
    """Gstitch: GAN + stitch losses on cross-composited overlapping crops
    (loss_modified.accumulate_gradients_stitch, :108-138).  Crop rectangles
    are per-batch host ints -> static under jit (retraces per unique crop
    pair are avoided by passing crop deltas as traced ints where possible;
    the masks/slices inside the stitcher already take traced coordinates, so
    only the *structure* is static).  ``stitcher`` may be injected (parity
    tests use crop_margin=0 to null the reference's offset-crop indexing
    quirk); ``positions1`` overrides the random canvas positions."""
    from brushstroke_engine_tpu.train.stitching import RandomStitcher
    losses = cfg.losses("stitch")
    if stitcher is None:
        stitcher = RandomStitcher()

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, geom_feats1, geom_feats2, z, crop1, crop2, rng,
             ema_beta, positions1=None):
        g_opt, _, _ = make_optimizers(cfg)
        k_stitch, k_aug1, k_aug2, k_loss = jax.random.split(rng, 4)

        def loss_fn(g_params):
            res = stitcher.generate_with_stitching(
                cfg.gen_cfg, g_params,
                {"w_avg": state["w_avg"], "noise": state["noise"]},
                z, geom_feats1, geom_feats2, crop1, crop2, k_stitch,
                positions1=positions1)
            fake = jnp.concatenate([res["fake1"], res["fake2"]], axis=0)
            fake_logits = _run_d(cfg, state["d_params"], fake, k_aug1,
                                 state["ada_p"])
            composite = jnp.concatenate(
                [res["fake1_composite"], res["fake2_composite"]], axis=0)
            composite_logits = _run_d(cfg, state["d_params"], composite,
                                      k_aug2, state["ada_p"])
            debug = {"fake": fake, "fake_logits": fake_logits,
                     "fake_composite": composite,
                     "fake_composite_logits": composite_logits,
                     "patch1": res["patch1"], "patch2": res["patch2"]}
            loss, items = losses.compute(debug, None, rng=k_loss)
            return loss, items

        (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["g_params"])
        new_g, new_opt = _apply_updates(g_opt, state["g_params"], grads,
                                        state["g_opt"])
        new_ema = ema_update(state["g_ema"], new_g, ema_beta)
        state = dict(state, g_params=new_g, g_opt=new_opt, g_ema=new_ema)
        stats = {"Loss/forger/Gstitch/total": loss}
        stats.update({f"Loss/forger/Gstitch/{k}": v
                      for k, v in items.items()})
        return state, stats

    return step


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def ada_update(cfg: TrainConfig, state, nimg_per_interval):
    """ADA p adjustment from accumulated real-sign statistics
    (training_loop_modified.py:516-519)."""
    mean_sign = state["ada_signs"] / jnp.clip(state["ada_count"], 1, None)
    adjust = jnp.sign(mean_sign - cfg.ada_target) * \
        nimg_per_interval / (cfg.ada_kimg * 1000.0)
    new_p = jnp.clip(state["ada_p"] + adjust, 0.0, None)
    return dict(state, ada_p=new_p,
                ada_signs=jnp.zeros_like(state["ada_signs"]),
                ada_count=jnp.zeros_like(state["ada_count"]))
