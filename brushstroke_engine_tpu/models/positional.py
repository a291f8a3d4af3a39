"""Positional encoders for patch-position conditioning.

Functional rebuild of the reference encoders
(reference: forger/train/positional.py:20-143): grid (normalized xy),
sinusoidal tables, and simple periodic encodings, plus the per-pixel
``encode_grid`` variant used in 'varying' featuremap mode.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PositionalEncoderConfig:
    kind: str                 # 'grid' | 'sine' | 'simplesine'
    resolution: int
    sine_channels: int = 0    # for kind == 'sine'

    @property
    def out_channels(self) -> int:
        if self.kind == "grid":
            return 2
        if self.kind == "sine":
            return self.sine_channels
        if self.kind == "simplesine":
            return 4
        raise ValueError(self.kind)

    @staticmethod
    def from_string(spec: str, resolution: int) -> "PositionalEncoderConfig":
        """Parse the reference flag format: 'grid', 'sine:<ch>', 'simplesine'."""
        if spec == "grid":
            return PositionalEncoderConfig("grid", resolution)
        if spec.startswith("sine"):
            ch = int(spec.split(":")[-1])
            return PositionalEncoderConfig("sine", resolution, ch)
        if spec == "simplesine":
            return PositionalEncoderConfig("simplesine", resolution)
        raise ValueError(f"unknown positional encoding {spec!r}")


def _sine_table(cfg: PositionalEncoderConfig) -> np.ndarray:
    enc_len = cfg.out_channels // 2
    position = np.arange(cfg.resolution)[:, None]
    div = np.exp(np.arange(0, enc_len, 2) * (-math.log(10000.0) / enc_len))
    pe = np.zeros((cfg.resolution, enc_len), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def _simplesine_table(cfg: PositionalEncoderConfig) -> np.ndarray:
    position = (np.arange(cfg.resolution, dtype=np.float32)
                / cfg.resolution * 2 * np.pi)
    return np.stack([np.cos(position), np.sin(position)], axis=1)


def encode_position(cfg: PositionalEncoderConfig, pos):
    """Encode integer positions -> [..., out_channels // 2] floats."""
    pos = jnp.mod(pos, cfg.resolution)
    if cfg.kind == "grid":
        res = 2.0 * pos.astype(jnp.float32) / (cfg.resolution - 1) - 1.0
        return res[..., None]
    table = _sine_table(cfg) if cfg.kind == "sine" else _simplesine_table(cfg)
    return jnp.asarray(table)[pos]


def encode_xy(cfg: PositionalEncoderConfig, x, y):
    """Encode (x, y) -> [..., out_channels] (reference forward, positional.py:65)."""
    return jnp.concatenate([encode_position(cfg, x), encode_position(cfg, y)],
                           axis=-1)


def encode_grid(cfg: PositionalEncoderConfig, start_x, start_y,
                resolution: int):
    """Per-pixel encodings for a patch grid ('varying' featuremap mode).

    Args:
      start_x / start_y: ``[B]`` int starts.
      resolution: output grid size.

    Returns:
      ``[B, resolution, resolution, out_channels]`` (NHWC; the reference
      returns NCHW, positional.py:39-63).
    """
    increment = cfg.resolution // resolution
    shift = jnp.arange(0, increment * resolution, increment)  # [res]
    xs = start_x[:, None] + shift[None, :]
    ys = start_y[:, None] + shift[None, :]
    ex = encode_position(cfg, jnp.mod(xs, cfg.resolution))  # [B, res, C/2]
    ey = encode_position(cfg, jnp.mod(ys, cfg.resolution))  # [B, res, C/2]
    r = resolution
    ex_grid = jnp.broadcast_to(ex[:, None, :, :],
                               (ex.shape[0], r, r, ex.shape[-1]))
    ey_grid = jnp.broadcast_to(ey[:, :, None, :],
                               (ey.shape[0], r, r, ey.shape[-1]))
    return jnp.concatenate([ex_grid, ey_grid], axis=-1)
