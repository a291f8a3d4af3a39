"""Training state and configuration.

The reference's phase machinery (mutable modules + per-phase torch optimizers,
training_loop_modified.py:264-301) becomes one explicit pytree ``TrainState``
threaded through jitted phase functions.  Lazy regularization is reproduced
by scaling the shared G/D Adam hyperparameters once at construction
(mb_ratio = interval / (interval + 1), reference :276-279); the geometry
phase uses its own Adam(0, 0.99) over G params (reference :291-292).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from brushstroke_engine_tpu.models.generator import (
    GeneratorConfig, generator_init,
)
from brushstroke_engine_tpu.models.discriminator import (
    DiscriminatorConfig, discriminator_init,
)
from brushstroke_engine_tpu.models.geo_encoder import GeoEncoderConfig
from brushstroke_engine_tpu.train.augment import AugmentConfig
from brushstroke_engine_tpu.train.losses import ForgerLosses


@dataclass(frozen=True)
class TrainConfig:
    gen_cfg: GeneratorConfig
    disc_cfg: DiscriminatorConfig
    enc_cfg: GeoEncoderConfig
    enc_res: Tuple[int, ...] = (0, 1)
    batch_size: int = 64
    # Microbatch size for gradient accumulation (reference --batch-gpu,
    # training_loop_modified.py:438-480). None = whole batch in one round.
    batch_gpu: Optional[int] = None

    # Optimizers (reference train_flags: lr 2e-4 / 2e-4).
    g_lr: float = 2e-4
    d_lr: float = 2e-4
    geom_lr: float = 2e-4
    adam_beta0: float = 0.0
    adam_beta1: float = 0.99
    adam_eps: float = 1e-8

    # Lazy regularization intervals (reference train.py cfg 'auto').
    g_reg_interval: int = 4
    d_reg_interval: int = 16

    # Synthesis noise during training.  The reference trains with random
    # per-layer noise (SynthesisLayer default noise_mode='random');
    # 'const' exists for deterministic cross-framework gradient-parity
    # tests (tests/test_reference_parity.py).
    noise_mode: str = "random"

    # GAN loss hyperparameters (reference loss_modified.py:30-34).
    style_mixing_prob: float = 0.9
    r1_gamma: float = 0.8192     # auto spec: 0.0002 * res^2 / batch @128/64... see train.py:265
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    pl_weight: float = 2.0

    # NeuBE loss DSL strings (reference train_flags.txt).
    main_phase_losses: str = ""
    geom_phase_losses: str = "1.0*iou_inv(uvs)"
    geom_warmstart_losses: str = "1.0*iou_inv(uvs)+1.0*iou(u)"
    stitch_phase_losses: str = ""
    partial_loss_with_triband_input: bool = True

    # Phase scheduling.
    geom_interval: int = 200
    stitch_interval: int = 0
    geom_phase_mode: str = "last_and_rgb"
    geom_warmstart_mode: str = "last_and_rgb"
    geom_warmstart_kimg: int = 50
    geom_warmstart_start_kimg: int = 0

    # ADA (reference train.py / training_loop_modified.py:516-519).
    augment: Optional[AugmentConfig] = None
    ada_target: float = 0.6
    ada_interval: int = 4
    ada_kimg: float = 500.0

    # EMA.
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = None

    # Totals.
    total_kimg: int = 10000
    kimg_per_tick: int = 4

    def __post_init__(self):
        # Round-3 observed an ~11x-slower generator forward at EXACTLY
        # batch 128 / 128px; the round-4 repro
        # (scripts/repro_b128_compile_pathology.py) shows the pathology
        # ABSENT under the current toolchain once warm-up artifacts are
        # excluded (B=128 12.5 ms vs B=64 7.0 ms — proportional), and
        # identifies the likely original culprit: the FIRST timed pass
        # after a fresh-process compile can run ~10x slow.  Keep an
        # info-level pointer so anyone who sees the shape run slow knows
        # the one-command re-check.
        if self.batch_size == 128 and \
                getattr(self.gen_cfg, "img_resolution", None) == 128:
            import logging
            logging.getLogger(__name__).info(
                "batch 128 @ 128px: a compile pathology was once observed "
                "for this exact shape (not reproducible as of round 4); "
                "if training seems slow, re-check with "
                "scripts/repro_b128_compile_pathology.py.")

    def losses(self, which: str) -> ForgerLosses:
        s = {"main": self.main_phase_losses,
             "geom": self.geom_phase_losses,
             "warmstart": self.geom_warmstart_losses,
             "stitch": self.stitch_phase_losses}[which]
        fl = ForgerLosses.create_from_string(s)
        fl.set_partial_loss_with_triband_input(
            self.partial_loss_with_triband_input)
        return fl


def lazy_adam(lr: float, beta0: float, beta1: float, eps: float,
              reg_interval: Optional[int]):
    """Adam with lazy-regularization hyperparameter scaling."""
    if reg_interval is not None and reg_interval > 1:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        beta0 = beta0 ** mb_ratio
        beta1 = beta1 ** mb_ratio
    return optax.adam(learning_rate=lr, b1=beta0, b2=beta1, eps=eps)


def make_optimizers(cfg: TrainConfig):
    g_opt = lazy_adam(cfg.g_lr, cfg.adam_beta0, cfg.adam_beta1, cfg.adam_eps,
                      cfg.g_reg_interval)
    d_opt = lazy_adam(cfg.d_lr, cfg.adam_beta0, cfg.adam_beta1, cfg.adam_eps,
                      cfg.d_reg_interval)
    geom_opt = optax.adam(learning_rate=cfg.geom_lr, b1=0.0, b2=0.99,
                          eps=1e-8)
    return g_opt, d_opt, geom_opt


def init_train_state(cfg: TrainConfig, key, g_params=None, g_state=None):
    """Build the full training state pytree."""
    k_g, k_d = jax.random.split(key)
    if g_params is None:
        g_params, g_state = generator_init(cfg.gen_cfg, k_g)
    else:
        # Copy caller-provided trees: phase steps donate the state buffers,
        # which must not invalidate the caller's arrays.
        g_params = jax.tree_util.tree_map(jnp.array, g_params)
        g_state = jax.tree_util.tree_map(jnp.array, g_state)
    d_params = discriminator_init(cfg.disc_cfg, k_d)
    g_opt, d_opt, geom_opt = make_optimizers(cfg)
    state = {
        "g_params": g_params,
        "d_params": d_params,
        "g_ema": jax.tree_util.tree_map(jnp.array, g_params),  # real copies

        "w_avg": g_state.get("w_avg", jnp.zeros((cfg.gen_cfg.w_dim,))),
        "noise": g_state["noise"],
        "g_opt": g_opt.init(g_params),
        "d_opt": d_opt.init(d_params),
        "geom_opt": geom_opt.init(g_params),
        "pl_mean": jnp.zeros((), jnp.float32),
        "ada_p": jnp.zeros((), jnp.float32),
        "ada_signs": jnp.zeros((), jnp.float32),
        "ada_count": jnp.zeros((), jnp.float32),
    }
    return state
