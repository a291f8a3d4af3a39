"""W-space statistics and exploration utilities.

Rebuild of the reference latent tools:
  * get_w_stats (forger/experiment/util/latent.py:15-32): w mean/std over
    mapping samples, used to initialize every W optimization.
  * get_ws dump (forger/metrics/get_ws_main.py): W vectors for seed lists.
  * seed-grid expansion / PCA directions
    (forger/experiment/latent_exploration/seed_expand.py,
    forger/viz/visualize_pca_main.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.models.mapping import mapping_apply


def get_w_stats(gen_cfg, mapping_params, num_samples: int = 10000,
                seed: int = 0, batch: int = 512
                ) -> Tuple[np.ndarray, float]:
    """Mean W [1, 1, w_dim] and scalar std over mapping samples."""
    rng = np.random.RandomState(seed)
    ws_all = []
    mcfg = gen_cfg.mapping
    for i in range(0, num_samples, batch):
        n = min(batch, num_samples - i)
        z = jnp.asarray(rng.randn(n, gen_cfg.z_dim), jnp.float32)
        ws, _ = mapping_apply(mcfg, mapping_params, z, None)
        ws_all.append(np.asarray(ws[:, 0, :]))          # [n, w_dim]
    w = np.concatenate(ws_all, axis=0)
    w_avg = w.mean(axis=0, keepdims=True)[None]          # [1, 1, w_dim]
    w_std = float(np.sqrt(np.square(w - w_avg[0]).sum(1).mean()))
    return w_avg.astype(np.float32), w_std


def ws_for_seeds(engine, seeds: List[int]) -> np.ndarray:
    """Broadcast W vectors for a list of style seeds (get_ws_main.py)."""
    zs = np.concatenate([engine.random_style(s) for s in seeds], axis=0)
    ws, _ = mapping_apply(
        engine.gen_cfg.mapping, engine.gen_params["mapping"],
        jnp.asarray(zs, jnp.float32), None,
        w_avg=engine.gen_state.get("w_avg"))
    return np.asarray(ws)


def dump_ws(engine, seeds: List[int], out_file: str):
    """Binary float64 W dump compatible with the reference PCA tooling."""
    ws = ws_for_seeds(engine, seeds)[:, 0, :].astype(np.float64)
    ws.tofile(out_file)
    return ws


def pca_directions(ws: np.ndarray, num_components: int = 8
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Principal directions of a W sample set -> (components, variances)."""
    w = ws.reshape(ws.shape[0], -1)
    mean = w.mean(0, keepdims=True)
    centered = w - mean
    u, s, vt = np.linalg.svd(centered, full_matrices=False)
    var = (s ** 2) / max(w.shape[0] - 1, 1)
    return vt[:num_components], var[:num_components]


def seed_grid(engine, center_seed: int, radius_scale: float = 0.2,
              grid: int = 5, seed: int = 0) -> np.ndarray:
    """W-space neighborhood grid around a style (seed_expand.py analog):
    perturb the center W along 2 random orthogonal directions."""
    ws = ws_for_seeds(engine, [center_seed])          # [1, num_ws, w_dim]
    rng = np.random.RandomState(seed)
    d1 = rng.randn(*ws.shape[1:])
    d2 = rng.randn(*ws.shape[1:])
    d1 /= np.linalg.norm(d1)
    d2 -= d1 * (d1 * d2).sum() / max((d1 * d1).sum(), 1e-8)
    d2 /= np.linalg.norm(d2)
    lin = np.linspace(-radius_scale, radius_scale, grid)
    out = np.stack([
        ws[0] + a * d1 * np.linalg.norm(ws) + b * d2 * np.linalg.norm(ws)
        for a in lin for b in lin])
    return out.astype(np.float32)
