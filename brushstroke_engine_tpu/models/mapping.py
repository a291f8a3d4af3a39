"""Mapping network z (+c) -> w.

Functional rebuild of the reference MappingNetwork
(reference: thirdparty/stylegan2_ada_pytorch/training/networks.py:215-290).

The w-average EMA is explicit state threaded through apply (no hidden
buffers): ``mapping_apply`` returns ``(ws, new_w_avg)`` so a jitted train step
can carry it; inference passes ``update_w_avg=False`` and ignores the second
output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.models.layers import fc_init, fc_apply, \
    normalize_2nd_moment


@dataclass(frozen=True)
class MappingConfig:
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]        # None = no broadcast (D's cmap mapping).
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995

    @property
    def features_list(self):
        embed = self.embed_features
        if embed is None:
            embed = self.w_dim
        if self.c_dim == 0:
            embed = 0
        layer = self.layer_features or self.w_dim
        return ([self.z_dim + embed] + [layer] * (self.num_layers - 1)
                + [self.w_dim])

    @property
    def embed_dim(self):
        return 0 if self.c_dim == 0 else (self.embed_features or self.w_dim)


def mapping_init(cfg: MappingConfig, key):
    keys = jax.random.split(key, cfg.num_layers + 1)
    params = {}
    if cfg.c_dim > 0:
        params["embed"] = fc_init(keys[-1], cfg.c_dim, cfg.embed_dim)
    feats = cfg.features_list
    for i in range(cfg.num_layers):
        params[f"fc{i}"] = fc_init(keys[i], feats[i], feats[i + 1],
                                   lr_multiplier=cfg.lr_multiplier)
    state = {"w_avg": jnp.zeros((cfg.w_dim,), jnp.float32)} \
        if (cfg.num_ws is not None and cfg.w_avg_beta is not None) else {}
    return params, state


def mapping_apply(cfg: MappingConfig, params, z, c=None, *, w_avg=None,
                  truncation_psi: float = 1.0,
                  truncation_cutoff: Optional[int] = None,
                  update_w_avg: bool = False):
    """Returns (ws [B, num_ws, w_dim] or w [B, w_dim], new_w_avg or None)."""
    x = None
    if cfg.z_dim > 0:
        x = normalize_2nd_moment(z.astype(jnp.float32))
    if cfg.c_dim > 0:
        y = normalize_2nd_moment(
            fc_apply(params["embed"], c.astype(jnp.float32)))
        x = jnp.concatenate([x, y], axis=1) if x is not None else y

    for i in range(cfg.num_layers):
        x = fc_apply(params[f"fc{i}"], x, activation=cfg.activation,
                     lr_multiplier=cfg.lr_multiplier)

    new_w_avg = None
    if update_w_avg and cfg.w_avg_beta is not None:
        assert w_avg is not None
        batch_mean = jax.lax.stop_gradient(jnp.mean(x, axis=0))
        new_w_avg = batch_mean + (w_avg - batch_mean) * cfg.w_avg_beta

    if cfg.num_ws is not None:
        x = jnp.tile(x[:, None, :], (1, cfg.num_ws, 1))

    if truncation_psi != 1.0:
        assert w_avg is not None
        if cfg.num_ws is None or truncation_cutoff is None:
            x = w_avg + (x - w_avg) * truncation_psi
        else:
            trunc = w_avg + (x[:, :truncation_cutoff] - w_avg) * truncation_psi
            x = jnp.concatenate([trunc, x[:, truncation_cutoff:]], axis=1)
    return x, new_w_avg
