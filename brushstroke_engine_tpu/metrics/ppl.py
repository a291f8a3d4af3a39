"""Perceptual path length in W space.

Rebuild of the reference metric-zoo PPL (thirdparty/.../metrics/
perceptual_path_length.py): LPIPS distance between renders at slightly
perturbed latents, scaled by 1/eps^2, sampled over interpolation endpoints.
Adapted to the geometry-conditioned generator: geometry features are held
fixed while w is perturbed.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.models.generator import generator_apply
from brushstroke_engine_tpu.models.mapping import mapping_apply
from brushstroke_engine_tpu.metrics.lpips import lpips_batched


def slerp(a, b, t):
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.clip(jnp.sum(a_n * b_n, axis=-1, keepdims=True), -1, 1)
    omega = jnp.arccos(d)
    so = jnp.sin(omega)
    return (jnp.sin((1 - t) * omega) / so) * a + \
        (jnp.sin(t * omega) / so) * b


def compute_ppl(engine, geom_features, num_samples: int = 64,
                epsilon: float = 1e-4, space: str = "w",
                batch: int = 8, seed: int = 0) -> float:
    """PPL for the engine's generator over fixed geometry features."""
    gen_cfg = engine.gen_cfg
    g_state = {"w_avg": engine.gen_state.get("w_avg"),
               "noise": engine.gen_state["noise"]}
    rng = np.random.RandomState(seed)
    dists = []
    for start in range(0, num_samples, batch):
        n = min(batch, num_samples - start)
        z0 = jnp.asarray(rng.randn(n, gen_cfg.z_dim), jnp.float32)
        z1 = jnp.asarray(rng.randn(n, gen_cfg.z_dim), jnp.float32)
        t = jnp.asarray(rng.rand(n, 1), jnp.float32)
        if space == "w":
            w0, _ = mapping_apply(gen_cfg.mapping,
                                  engine.gen_params["mapping"], z0, None)
            w1, _ = mapping_apply(gen_cfg.mapping,
                                  engine.gen_params["mapping"], z1, None)
            wt0 = w0 + (w1 - w0) * t[:, :, None]
            wt1 = w0 + (w1 - w0) * jnp.clip(t + epsilon, 0, 1)[:, :, None]
        else:  # z space, slerp
            zt0 = slerp(z0, z1, t)
            zt1 = slerp(z0, z1, t + epsilon)
            wt0, _ = mapping_apply(gen_cfg.mapping,
                                   engine.gen_params["mapping"], zt0, None)
            wt1, _ = mapping_apply(gen_cfg.mapping,
                                   engine.gen_params["mapping"], zt1, None)
        feats = [jnp.broadcast_to(f[:1], (n,) + f.shape[1:])
                 for f in geom_features]
        img0, _, _ = generator_apply(gen_cfg, engine.gen_params, g_state,
                                     ws=wt0, geom_features=feats,
                                     noise_mode="const")
        img1, _, _ = generator_apply(gen_cfg, engine.gen_params, g_state,
                                     ws=wt1, geom_features=feats,
                                     noise_mode="const")
        d = lpips_batched(img0, img1) / (epsilon ** 2)
        dists.append(np.asarray(d))
    d = np.concatenate(dists)
    # Reference filters outliers outside [1%, 99%] quantiles.
    lo, hi = np.percentile(d, [1, 99])
    return float(d[(d >= lo) & (d <= hi)].mean())
