"""Multi-chip parallelism: device mesh, sharding helpers, DP train step.

The reference is explicitly single-GPU (README:137, train.py:574) with
vestigial DDP plumbing (DDP wrappers, InfiniteSampler ranks, ddp_sync gating
-- SURVEY.md section 2.12).  The TPU rebuild expresses the same capabilities
the SPMD way:

  * Data parallelism: one ``jax.sharding.Mesh(('data',))`` over ICI; the
    batch dimension is sharded, parameters/optimizer state are replicated,
    and XLA inserts the gradient all-reduce inside the jitted step (no
    process groups, no sync gating -- replaces misc.ddp_sync /
    torch.distributed init, training_loop_modified.py:240-252).
  * Spatial tile parallelism: the painting engine's patch-tile batches shard
    over the same axis (the conv-GAN analog of sequence parallelism --
    SURVEY.md section 5.7).
  * TP/PP/EP: not needed at this model scale (<=128-channel convs); the
    mesh/axis structure here extends to extra axes if models grow.

Per-host input sharding replaces the reference's rank-aware InfiniteSampler
(torch_utils/misc.py:109) -- see dataset.infinite_indices(rank, num_ranks).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Put arrays with the leading (batch) dim sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(cfg, mesh: Mesh, axis: str = "data"):
    """Build a fused data-parallel training step over the mesh.

    One jitted program runs Dmain + Gmain (+ lazy Dreg/Greg selected by the
    traced step index through ``lax.cond``) with the batch sharded over
    ``axis`` and state replicated.  XLA lowers the cross-replica gradient
    reduction onto ICI automatically.

    Returns step(state, real_img, geom_input, z1, z2, rng, step_idx,
                 ema_beta) -> (state, stats)
    """
    from brushstroke_engine_tpu.train import steps as ts

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def _step(state, enc_params, enc_state, real_img, geom_input, z1, z2,
              rng, step_idx, ema_beta):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        feats = ts.encode_geometry(cfg, enc_params, enc_state, geom_input)
        geom_truth = geom_input

        state, d_stats = ts.d_main_step.__wrapped__(
            cfg, state, real_img, feats, z1, k1)

        def with_dreg(state):
            s, _ = ts.d_reg_step.__wrapped__(cfg, state, real_img, k2)
            return s

        state = jax.lax.cond(
            step_idx % cfg.d_reg_interval == 0, with_dreg, lambda s: s,
            state)

        state, g_stats = ts.g_main_step.__wrapped__(
            cfg, state, feats, geom_truth, z2, k3, ema_beta)

        def with_greg(state):
            s, _ = ts.g_reg_step.__wrapped__(cfg, state, feats, z2, k4,
                                             ema_beta)
            return s

        state = jax.lax.cond(
            step_idx % cfg.g_reg_interval == 0, with_greg, lambda s: s,
            state)
        stats = dict(d_stats)
        stats.update(g_stats)
        return state, stats

    return jax.jit(
        _step,
        in_shardings=(repl, repl, repl, data, data, data, data, repl, repl,
                      repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,))


def shard_tile_render(mesh: Mesh, render_fn, axis: str = "data"):
    """Wrap a batched tile-render function so tile batches shard over chips
    (spatial-parallel canvas rendering)."""
    data = NamedSharding(mesh, P(axis))

    def wrapped(*tile_batches, **kw):
        tile_batches = [jax.device_put(t, data) for t in tile_batches]
        return render_fn(*tile_batches, **kw)

    return wrapped
