"""Host-side training loop: phase scheduling, data feed, ticks, snapshots.

Rebuild of the reference training loop
(thirdparty/.../training/training_loop_modified.py:50-670): the same phase
machine -- Dmain(1), Dreg(d_reg_interval), Gmain(1), Greg(g_reg_interval),
optional Gstitch(stitch_interval) and Ggeom(geom_interval), with a separate
Ggeom-warm schedule during warmstart kimg -- driving jitted device steps.
Everything numeric lives in steps.py; this loop only feeds fixed-shape numpy
batches, applies the schedule, updates ADA p, and handles ticks (stats jsonl,
native snapshots, optional visualizer/metrics callbacks).
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.train.state import TrainConfig, init_train_state
from brushstroke_engine_tpu.train import steps as train_steps
from brushstroke_engine_tpu.train.dataset import (
    BatchIterator, style_batch_to_float, geom_batch_to_float,
)
from brushstroke_engine_tpu.train.stitching import RandomStitcher
from brushstroke_engine_tpu.utils.checkpoint import EngineBundle, save_native

logger = logging.getLogger(__name__)


@dataclass
class LoopHooks:
    """Optional callbacks invoked at tick time."""
    on_tick: Optional[Callable] = None          # (loop, stats_dict)
    on_snapshot: Optional[Callable] = None      # (loop, snapshot_path)


class TrainingLoop:
    def __init__(self, cfg: TrainConfig, enc_params, enc_state,
                 style_iter, geom_iter, run_dir: str,
                 seed: int = 0, hooks: Optional[LoopHooks] = None,
                 resume_state=None, auto_resume: bool = False,
                 debug_nans: bool = False, profile_phases: bool = False,
                 use_fused: bool = False, mesh=None,
                 profile_dir: Optional[str] = None,
                 profile_batches=(10, 13), device_banks=None,
                 steps_per_dispatch: int = 1,
                 snapshot_ticks: int = 1):
        if debug_nans:
            # Analog of the reference's grad-anomaly debugging hooks
            # (SURVEY.md section 5.2); catches non-finite values at source.
            jax.config.update("jax_debug_nans", True)
        self.profile_phases = profile_phases
        # Device-trace capture (reference record_function scopes +
        # CUDA-event Timing, SURVEY.md section 5.1): batches 10-12 are
        # written as a jax.profiler trace viewable in TensorBoard/Perfetto.
        self.profile_dir = profile_dir
        self.profile_batches = tuple(profile_batches)
        self._trace_active = False
        self.cfg = cfg
        self.enc_params = enc_params
        self.enc_state = enc_state
        self.style_iter = style_iter
        self.geom_iter = geom_iter
        self.run_dir = run_dir
        self.hooks = hooks or LoopHooks()
        os.makedirs(run_dir, exist_ok=True)

        key = jax.random.PRNGKey(seed)
        self.state = resume_state if resume_state is not None else \
            init_train_state(cfg, key)

        # Data parallelism over a jax.sharding.Mesh: state and encoder are
        # replicated, batches are sharded over the 'data' axis, and the
        # UNCHANGED jitted steps run SPMD -- XLA inserts the gradient
        # all-reduce over ICI from the input shardings alone (replaces the
        # reference's DDP wrappers, training_loop_modified.py:240-252).
        self.mesh = mesh
        # Multi-host: rank/num_ranks shard the input pipeline per process
        # (SURVEY 2.12; replaces the reference's rank-aware InfiniteSampler +
        # process-group init, train.py:523-530).  Single-process runs get
        # (0, 1) and behave exactly as before.
        from brushstroke_engine_tpu.parallel.distributed import \
            host_shard_info
        self.rank, self.num_ranks = host_shard_info()
        if mesh is not None:
            from brushstroke_engine_tpu.parallel.mesh import replicate
            n = mesh.devices.size
            assert cfg.batch_size % n == 0, \
                f"batch_size {cfg.batch_size} not divisible by {n} devices"
            self.state = replicate(mesh, self.state)
            self.enc_params = replicate(mesh, self.enc_params)
            self.enc_state = replicate(mesh, self.enc_state)
        self.rng = np.random.default_rng(seed)
        # RNG key stream lives on the HOST (CPU backend): splitting it on
        # the accelerator would issue two tiny device dispatches per batch
        # that serialize against the training step for no work.  The key is
        # kept as numpy and split on the CPU platform; the jitted steps
        # receive it as a plain host array (one 8-byte upload per dispatch).
        try:
            self._cpu_dev = jax.local_devices(backend="cpu")[0]
        except Exception:
            self._cpu_dev = None
        self.host_key = np.asarray(jax.random.key_data(
            jax.random.PRNGKey(seed + 1)))

        self.geom_step = train_steps.make_geom_step(cfg, warmstart=False) \
            if cfg.geom_interval > 0 and cfg.losses("geom").items else None
        self.warm_step = train_steps.make_geom_step(cfg, warmstart=True) \
            if cfg.geom_warmstart_kimg > 0 else None
        self.stitch_step = train_steps.make_stitch_step(cfg) \
            if cfg.stitch_interval > 0 and cfg.losses("stitch").items \
            else None
        self.stitcher = RandomStitcher()
        # Device-resident data (train/device_dataset.py): the fused step
        # samples batches from uint8 HBM banks; style/geom iterators are
        # unused per step (they may be None).
        self.device_banks = device_banks
        if device_banks is not None and not use_fused:
            raise ValueError("device_banks requires use_fused=True")
        # steps_per_dispatch > 1: lax.scan K batches per dispatch with all
        # per-step randomness on-device (fused.make_fused_train_step chunk
        # mode) -- the host then only runs tick machinery.
        self.steps_per_dispatch = max(int(steps_per_dispatch), 1)
        if self.steps_per_dispatch > 1 and device_banks is None:
            raise ValueError("steps_per_dispatch > 1 requires device_banks "
                             "(per-step data must live on-device)")
        self.fused_step = None
        if use_fused:
            from brushstroke_engine_tpu.train.fused import \
                make_fused_train_step
            self.fused_step = make_fused_train_step(
                cfg, device_data=device_banks is not None, mesh=mesh,
                chunk=self.steps_per_dispatch
                if self.steps_per_dispatch > 1 else 0,
                crop_margin=self.stitcher.crop_margin,
                min_overlap=self.stitcher.min_overlap)

        # Network-snapshot + train-state persistence cadence, in ticks
        # (reference network_snapshot_ticks, training_loop_modified.py; the
        # final tick always persists).  Persistence is the dominant tick
        # cost on a high-latency host<->device link: it fetches the whole
        # state tree, so writing it every tick serializes the dispatch
        # queue against ~100 ms-RTT transfers (measured 650 -> 127 imgs/s
        # at snapshot_ticks=1 through the dev tunnel).
        self.snapshot_ticks = max(int(snapshot_ticks), 1)
        self.cur_nimg = 0
        self.batch_idx = 0
        self.cur_tick = 0
        self.stats_path = os.path.join(run_dir, "stats.jsonl")
        # TensorBoard events beside stats.jsonl (reference loop :318-346;
        # wandb's sync_tensorboard reads the same files).  Soft dependency.
        self.tb_writer = None
        if self.rank == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb_writer = SummaryWriter(log_dir=run_dir)
            except Exception:
                logger.info(
                    "TensorBoard unavailable; writing stats.jsonl only")
        self._last_stats: Dict[str, float] = {}
        self._last_snapshot_sec: Optional[float] = None
        # Eval-hook failure counters, surfaced into tick stats as
        # Eval/<name>_failures so a silently-broken metric/viz path shows up
        # in stats.jsonl instead of only as a log warning.
        self.hook_failure_counts: Dict[str, int] = {}
        if auto_resume and resume_state is None:
            self.load_train_state()

        # Clarity-finetune: fake_orig losses compare against the FROZEN
        # original (resumed) generator -- the reference's G_orig deepcopy
        # (training_loop_modified.py:260-262).  Snapshot AFTER any resume so
        # the target is the resumed model, and copy so step donation can't
        # alias it.
        self.g_orig_params = None
        needs_orig = (
            (self.warm_step is not None or use_fused) and
            cfg.geom_warmstart_kimg > 0 and
            cfg.losses("warmstart").require_original_fake_image()
        ) or (
            (self.geom_step is not None or use_fused) and
            cfg.geom_interval > 0 and cfg.losses("geom").items and
            cfg.losses("geom").require_original_fake_image()
        )
        if needs_orig:
            self.g_orig_params = jax.tree_util.tree_map(
                jnp.array, self.state["g_params"])

    # ------------------------------------------------------------------

    def _next_rng(self):
        """Split the per-batch PRNG key on the HOST CPU backend so the tiny
        split program never lands on (or syncs with) the accelerator stream;
        the subkey reaches the jitted step as plain numpy (uploaded with the
        dispatch)."""
        if self._cpu_dev is not None:
            with jax.default_device(self._cpu_dev):
                ks = np.asarray(jax.random.split(jnp.asarray(self.host_key)))
        else:
            ks = np.asarray(jax.random.split(jnp.asarray(self.host_key)))
        self.host_key = ks[0]
        return ks[1]

    def _data(self, x):
        """Device-put a batch array, sharded over the mesh if present.

        Multi-host: ``x`` is this PROCESS'S shard of the global batch
        (rank-sliced rows); the global jax.Array is assembled from the
        process-local data so the jitted step sees one batch sharded over
        every host's devices.
        """
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(self.mesh, P("data"))
        if self.num_ranks > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(jnp.asarray(x), sharding)

    def _host_normal(self, n: int, dim: int):
        """Global [n, dim] normal draw -> this process's rank-slice, on
        device.  Every rank draws the SAME global array (same host rng
        stream) and keeps its contiguous row block, so multi-host runs see
        the same global batch as a single-process run."""
        x = np.asarray(self.rng.standard_normal((n, dim)), np.float32)
        if self.num_ranks > 1:
            local = n // self.num_ranks
            x = x[self.rank * local:(self.rank + 1) * local]
        return self._data(x)

    def _ema_beta(self) -> np.float32:
        ema_nimg = self.cfg.ema_kimg * 1000.0
        if self.cfg.ema_rampup is not None:
            ema_nimg = min(ema_nimg, self.cur_nimg * self.cfg.ema_rampup)
        # numpy scalar: uploaded with the step dispatch instead of a
        # separate eager device_put per batch.
        return np.float32(0.5 ** (self.cfg.batch_size /
                                  max(ema_nimg, 1e-8)))

    def in_warmstart(self) -> bool:
        c = self.cfg
        start = c.geom_warmstart_start_kimg * 1000
        return (self.cur_nimg >= start and
                self.cur_nimg - start < c.geom_warmstart_kimg * 1000)

    # ------------------------------------------------------------------

    def _fetch_batch(self):
        cfg = self.cfg
        res = cfg.gen_cfg.img_resolution
        style_u8 = next(self.style_iter)
        geom_u8 = next(self.geom_iter)
        style = style_batch_to_float(style_u8)
        tri = geom_batch_to_float(geom_u8)            # [B, H, W, 3]

        # Crop the triband image to training resolution, keeping the crop
        # params for the stitch phase's second crop (reference :393-426).
        h, w = tri.shape[1:3]
        y = int(self.rng.integers(0, max(h - res, 0) + 1))
        x = int(self.rng.integers(0, max(w - res, 0) + 1))
        crop1 = (y, x, res, res)
        tri_crop = tri[:, y:y + res, x:x + res]

        # Triband channels: G = conditioning input, B = loss target
        # (reference train.py:625-626; channel indices configurable upstream).
        geom_input = tri_crop[..., 1:2]
        geom_truth = tri_crop[..., 2:3]
        return style, tri, crop1, geom_input, geom_truth

    def run(self, total_kimg: Optional[int] = None,
            exit_after_warmstart: bool = False,
            progress_fn: Optional[Callable] = None,
            abort_fn: Optional[Callable] = None):
        """Train until total_kimg.  ``progress_fn(cur_nimg, total_kimg*1000)``
        is called per tick and ``abort_fn() -> bool`` is polled per tick
        (reference abort/progress callbacks,
        training_loop_modified.py:119-120, 545-549)."""
        cfg = self.cfg
        total_kimg = total_kimg if total_kimg is not None else cfg.total_kimg
        tick_start_nimg = self.cur_nimg
        tick_start_time = time.time()
        if progress_fn is not None:
            progress_fn(self.cur_nimg, total_kimg * 1000)

        while True:
            if self.profile_dir is not None:
                if self.batch_idx == self.profile_batches[0] and \
                        not self._trace_active:
                    jax.profiler.start_trace(self.profile_dir)
                    self._trace_active = True
                elif self.batch_idx == self.profile_batches[1] and \
                        self._trace_active:
                    jax.profiler.stop_trace()
                    self._trace_active = False
                    logger.info("Wrote device trace to %s", self.profile_dir)
            warm = self.in_warmstart()
            chunked = self.steps_per_dispatch > 1
            if chunked:
                pass  # crops, warm flag and EMA beta are drawn ON-DEVICE
            elif self.device_banks is not None:
                # On-device sampling: the host only picks crop offsets.
                res = cfg.gen_cfg.img_resolution
                h, _w = self.device_banks.tri_hw
                y = int(self.rng.integers(0, max(h - res, 0) + 1))
                x = int(self.rng.integers(0, max(_w - res, 0) + 1))
                crop1 = (y, x, res, res)
            else:
                style, tri_full, crop1, geom_input, geom_truth = \
                    self._fetch_batch()
                if self.fused_step is None:
                    # The fused step encodes geometry inside its own
                    # dispatch.
                    feats = train_steps.encode_geometry(
                        cfg, self.enc_params, self.enc_state,
                        self._data(geom_input))
                geom_truth_j = self._data(geom_truth)
            # Per-batch loss scalars stay ON DEVICE until the tick boundary:
            # materializing ~25 tiny scalars with float() every batch forces
            # a host<->device round trip that serializes the dispatch queue
            # (the host can otherwise run ahead feeding the next batch while
            # the step executes).  Only the tick path reads them back.
            stats: Dict[str, float] = {}
            phase_t0 = [time.time()]

            def note(s, phase=None):
                stats.update(s)
                if self.profile_phases and phase is not None:
                    # Block on the phase's outputs so wall-clock deltas
                    # approximate per-phase device time (reference
                    # Timing/<phase> scalars, loop :624-631).
                    jax.block_until_ready(s)
                    now = time.time()
                    stats[f"Timing/{phase}"] = now - phase_t0[0]
                    phase_t0[0] = now

            ema_beta = self._ema_beta()

            if chunked:
                # One dispatch runs steps_per_dispatch batches (lax.scan);
                # stats come back stacked [K] and are reduced at the tick.
                self.state, s = self.fused_step(
                    self.state, self.enc_params, self.enc_state,
                    self.device_banks.style, self.device_banks.tri,
                    self._next_rng(), np.int32(self.batch_idx),
                    np.int32(self.cur_nimg),
                    g_orig_params=self.g_orig_params)
                note(s, "fused")
            elif self.fused_step is not None:
                if self.device_banks is not None:
                    stitch_kwargs = {}
                    if self.stitch_step is not None:
                        crop2 = self.stitcher.gen_overlapping_square_crop(
                            self.device_banks.tri_hw[0], crop1)
                        stitch_kwargs = {
                            "crop2": np.asarray(crop2, np.int32)}
                    self.state, s = self.fused_step(
                        self.state, self.enc_params, self.enc_state,
                        self.device_banks.style, self.device_banks.tri,
                        self._next_rng(), np.int32(self.batch_idx),
                        np.bool_(warm), ema_beta,
                        crop1=np.asarray(crop1, np.int32),
                        g_orig_params=self.g_orig_params, **stitch_kwargs)
                else:
                    stitch_kwargs = {}
                    if self.stitch_step is not None:
                        # Gstitch runs INSIDE the fused dispatch on its
                        # interval; the host only slices the second crop.
                        crop2 = self.stitcher.gen_overlapping_square_crop(
                            tri_full.shape[1], crop1)
                        g2 = tri_full[:, crop2[0]:crop2[0] + crop2[2],
                                      crop2[1]:crop2[1] + crop2[3], 1:2]
                        stitch_kwargs = {
                            "geom_input2": self._data(g2),
                            "crop1": np.asarray(crop1, np.int32),
                            "crop2": np.asarray(crop2, np.int32),
                        }
                    self.state, s = self.fused_step(
                        self.state, self.enc_params, self.enc_state,
                        self._data(style), self._data(geom_input),
                        geom_truth_j, self._next_rng(),
                        np.int32(self.batch_idx), np.bool_(warm), ema_beta,
                        g_orig_params=self.g_orig_params, **stitch_kwargs)
                note(s, "fused")
            elif warm:
                z = self._host_normal(cfg.batch_size, cfg.gen_cfg.z_dim)
                self.state, s = self.warm_step(
                    self.state, feats, geom_truth_j, z, self._next_rng(),
                    ema_beta, g_orig_params=self.g_orig_params)
                note(s, "Ggeom-warm")
            else:
                # Dmain
                z = self._host_normal(cfg.batch_size, cfg.gen_cfg.z_dim)
                self.state, s = train_steps.d_main_step(
                    cfg, self.state, self._data(style), feats, z,
                    self._next_rng())
                note(s, "Dmain")
                # Dreg
                if cfg.d_reg_interval > 0 and \
                        self.batch_idx % cfg.d_reg_interval == 0:
                    self.state, s = train_steps.d_reg_step(
                        cfg, self.state, self._data(style),
                        self._next_rng())
                    note(s, "Dreg")
                # Gmain
                z = self._host_normal(cfg.batch_size, cfg.gen_cfg.z_dim)
                self.state, s = train_steps.g_main_step(
                    cfg, self.state, feats, geom_truth_j, z,
                    self._next_rng(), ema_beta)
                note(s, "Gmain")
                # Greg (path length)
                if cfg.g_reg_interval > 0 and \
                        self.batch_idx % cfg.g_reg_interval == 0:
                    z = self._host_normal(cfg.batch_size, cfg.gen_cfg.z_dim)
                    self.state, s = train_steps.g_reg_step(
                        cfg, self.state, feats, z, self._next_rng(),
                        ema_beta)
                    note(s, "Greg")
                # Gstitch
                if self.stitch_step is not None and \
                        self.batch_idx % cfg.stitch_interval == 0:
                    crop2 = self.stitcher.gen_overlapping_square_crop(
                        tri_full.shape[1], crop1)
                    g2 = tri_full[:, crop2[0]:crop2[0] + crop2[2],
                                  crop2[1]:crop2[1] + crop2[3], 1:2]
                    feats2 = train_steps.encode_geometry(
                        cfg, self.enc_params, self.enc_state,
                        self._data(g2))
                    z = self._host_normal(cfg.batch_size, cfg.gen_cfg.z_dim)
                    self.state, s = self.stitch_step(
                        self.state, feats, feats2, z,
                        np.asarray(crop1, np.int32),
                        np.asarray(crop2, np.int32),
                        self._next_rng(), ema_beta)
                    note(s, "Gstitch")
                # Ggeom
                if self.geom_step is not None and \
                        self.batch_idx % cfg.geom_interval == 0:
                    z = self._host_normal(cfg.batch_size, cfg.gen_cfg.z_dim)
                    self.state, s = self.geom_step(
                        self.state, feats, geom_truth_j, z,
                        self._next_rng(), ema_beta,
                        g_orig_params=self.g_orig_params)
                    note(s, "Ggeom")
                # ADA p adjustment.
                if cfg.augment is not None and \
                        self.batch_idx % cfg.ada_interval == 0 and \
                        self.batch_idx > 0:
                    self.state = train_steps.ada_update(
                        cfg, self.state,
                        np.float32(cfg.batch_size * cfg.ada_interval))

            self.cur_nimg += cfg.batch_size * self.steps_per_dispatch
            self.batch_idx += self.steps_per_dispatch
            self._last_stats = stats

            finishing_warm = warm and not self.in_warmstart()
            done = self.cur_nimg >= total_kimg * 1000 or \
                (finishing_warm and exit_after_warmstart)
            if not done and self.cur_nimg < tick_start_nimg + \
                    cfg.kimg_per_tick * 1000:
                continue

            # ---- tick maintenance ----
            tick_time = time.time() - tick_start_time
            # Materialize the deferred device scalars (one readback per tick
            # instead of per batch).  Non-finite values are dropped: the
            # fused step reports NaN for phases skipped this batch.
            fetched = jax.device_get(stats)
            stats.clear()
            for k, v in fetched.items():
                # Chunked dispatch returns [K]-stacked per-step values; keep
                # the most recent step that actually ran the phase (scalars
                # reshape to [1], so both modes share this path).
                a = np.asarray(v, np.float64).reshape(-1)
                a = a[np.isfinite(a)]
                if a.size:
                    stats[k] = float(a[-1])
            stats["Progress/tick"] = self.cur_tick
            stats["Progress/kimg"] = self.cur_nimg / 1e3
            stats["Progress/ada_p"] = float(self.state["ada_p"])
            stats["Timing/sec_per_tick"] = tick_time
            stats["Timing/sec_per_kimg"] = tick_time / max(
                (self.cur_nimg - tick_start_nimg) / 1000.0, 1e-8)
            if self._last_snapshot_sec is not None:
                # Cost of the PREVIOUS tick's persistence (it happens after
                # the stats write, so it is reported one tick late).
                stats["Timing/snapshot_sec"] = self._last_snapshot_sec
                self._last_snapshot_sec = None
            for name, cnt in self.hook_failure_counts.items():
                stats[f"Eval/{name}_failures"] = cnt
            if self.rank == 0:
                with open(self.stats_path, "a") as f:
                    f.write(json.dumps(stats) + "\n")
            if self.tb_writer is not None:
                for k, v in stats.items():
                    self.tb_writer.add_scalar(k, v, self.cur_nimg)
                self.tb_writer.flush()
            logger.info("tick %d kimg %.1f %s", self.cur_tick,
                        self.cur_nimg / 1e3,
                        {k: round(v, 4) for k, v in list(stats.items())[:6]})
            if self.hooks.on_tick is not None and self.rank == 0:
                self.hooks.on_tick(self, stats)
            if progress_fn is not None:
                progress_fn(self.cur_nimg, total_kimg * 1000)
            if abort_fn is not None and abort_fn():
                logger.info("Aborting at user request (abort_fn)")
                done = True

            # Chief-only persistence (state is replicated, every rank holds
            # identical values; reference rank-0 gating, loop :552-566).
            # Gated on snapshot_ticks: the full-state fetch + pickle is the
            # single most expensive tick item over a high-latency link.
            if self.rank == 0 and (done or
                                   self.cur_tick % self.snapshot_ticks == 0):
                t_snap = time.time()
                snap_path = self.save_snapshot()
                self.save_train_state()
                self._last_snapshot_sec = time.time() - t_snap
                if self.hooks.on_snapshot is not None:
                    self.hooks.on_snapshot(self, snap_path)

            self.cur_tick += 1
            tick_start_nimg = self.cur_nimg
            tick_start_time = time.time()
            if done:
                if self._trace_active:
                    jax.profiler.stop_trace()
                    self._trace_active = False
                if self.tb_writer is not None:
                    self.tb_writer.flush()
                return self.state

    # ------------------------------------------------------------------

    def save_train_state(self, path: Optional[str] = None,
                         backend: str = "pickle") -> str:
        """Full resumable training checkpoint: params, optimizer moments,
        EMA, ADA/PL state, and progress counters (the reference resumes only
        network params via copy_params_and_buffers; we keep the whole state
        so resumed runs are bitwise-continuous).

        ``backend='orbax'`` writes an Orbax StandardCheckpointer directory
        instead (tensor-wise storage; the production choice for large state
        and multi-host saves -- SURVEY.md section 5.4 rebuild note).
        """
        counters = {"cur_nimg": self.cur_nimg, "batch_idx": self.batch_idx,
                    "cur_tick": self.cur_tick}
        # Host-side PRNG streams: restoring these makes a resumed run
        # bitwise-continuous with the uninterrupted one (the reference
        # restores params only and replays fresh randomness).
        rng_state = {"host_key": np.asarray(self.host_key),
                     "np_rng": self.rng.bit_generator.state}
        # ONE batched device->host fetch: jax.device_get starts every
        # leaf's copy_to_host_async before blocking, so the transfer costs
        # ~one link round trip; tree_map(np.asarray, ...) fetches leaf by
        # leaf (hundreds of serial ~100 ms RTTs through the dev tunnel).
        host_state = jax.device_get(self.state)
        if backend == "orbax":
            import orbax.checkpoint as ocp
            path = path or os.path.join(self.run_dir, "train_state_orbax")
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(
                    os.path.abspath(path),
                    {"state": host_state,
                     "counters": {k: np.int64(v)
                                  for k, v in counters.items()},
                     "host_key": rng_state["host_key"]},
                    force=True)
            # numpy Generator state is a nested dict of python ints; store
            # beside the orbax dir (not a tensor).
            import pickle
            with open(path + ".nprng.pkl", "wb") as f:
                pickle.dump(rng_state["np_rng"], f)
            return path
        import pickle
        path = path or os.path.join(self.run_dir, "train_state.pkl")
        payload = {
            "magic": "brushstroke_engine_tpu.train_state.v1",
            "state": host_state,
            "rng_state": rng_state,
            **counters,
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=4)
        os.replace(tmp, path)
        return path

    def load_train_state(self, path: Optional[str] = None,
                         backend: str = "pickle") -> bool:
        if backend == "orbax":
            import orbax.checkpoint as ocp
            path = path or os.path.join(self.run_dir, "train_state_orbax")
            if not os.path.isdir(path):
                return False
            with ocp.StandardCheckpointer() as ckptr:
                payload = ckptr.restore(os.path.abspath(path))
            self.state = jax.tree_util.tree_map(jnp.asarray,
                                                payload["state"])
            c = payload["counters"]
            self.cur_nimg = int(c["cur_nimg"])
            self.batch_idx = int(c["batch_idx"])
            self.cur_tick = int(c["cur_tick"])
            if "host_key" in payload:
                self.host_key = np.asarray(payload["host_key"])
            import pickle
            if os.path.isfile(path + ".nprng.pkl"):
                with open(path + ".nprng.pkl", "rb") as f:
                    self.rng.bit_generator.state = pickle.load(f)
            logger.info("Resumed training state (orbax) at %d kimg",
                        self.cur_nimg // 1000)
            return True
        import pickle
        path = path or os.path.join(self.run_dir, "train_state.pkl")
        if not os.path.isfile(path):
            return False
        with open(path, "rb") as f:
            payload = pickle.load(f)
        assert payload.get("magic") == \
            "brushstroke_engine_tpu.train_state.v1"
        self.state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
        self.cur_nimg = payload["cur_nimg"]
        self.batch_idx = payload["batch_idx"]
        self.cur_tick = payload["cur_tick"]
        if "rng_state" in payload:
            self.host_key = np.asarray(payload["rng_state"]["host_key"])
            self.rng.bit_generator.state = payload["rng_state"]["np_rng"]
        logger.info("Resumed training state at %d kimg",
                    self.cur_nimg // 1000)
        return True

    def save_snapshot(self) -> str:
        """Self-contained engine bundle of G_ema + the geometry encoder
        (mirrors the reference's embedded-encoder snapshots,
        training_loop_modified.py:560-578)."""
        path = os.path.join(
            self.run_dir,
            f"network-snapshot-{self.cur_nimg // 1000:06d}.pkl")
        # Batched fetch (see save_train_state): one pipelined transfer of
        # the EMA + encoder trees instead of per-leaf round trips inside
        # save_native's np.asarray calls.
        g_ema, w_avg, noise, enc_p, enc_s = jax.device_get(
            (self.state["g_ema"], self.state["w_avg"], self.state["noise"],
             self.enc_params, self.enc_state))
        bundle = EngineBundle(
            gen_cfg=self.cfg.gen_cfg,
            gen_params=g_ema,
            gen_state={"w_avg": w_avg, "noise": noise},
            enc_cfg=self.cfg.enc_cfg,
            enc_params=enc_p,
            enc_state=enc_s,
            color_format=self.cfg.gen_cfg.synthesis.color_format,
            geom_inject_resolutions=self.cfg.enc_res,
            extra={"cur_nimg": self.cur_nimg},
        )
        save_native(path, bundle)
        return path
