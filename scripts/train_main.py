#!/usr/bin/env python
"""GAN training CLI.

Rebuild of the reference trainer entry (thirdparty/.../train.py:569-816)
with the same option names where they exist; assembles a TrainConfig, builds
or loads the geometry encoder, creates the numbered run directory
(00000-<desc> style), dumps training_options.json, and runs the loop.
"""

import argparse
import dataclasses
import json
import logging
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

logger = logging.getLogger(__name__)


def next_run_dir(outdir: str, desc: str) -> str:
    os.makedirs(outdir, exist_ok=True)
    prev = [re.match(r"^(\d+)-", d) for d in os.listdir(outdir)]
    prev_ids = [int(m.group(1)) for m in prev if m]
    run_id = max(prev_ids, default=-1) + 1
    return os.path.join(outdir, f"{run_id:05d}-{desc}")


def build_parser():
    ap = argparse.ArgumentParser(description=__doc__)
    # Data.
    ap.add_argument("--data", help="Style image dataset (dir or zip).")
    ap.add_argument("--geom_data", default=None,
                    help="Triband geometry dataset (dir or zip); synthetic "
                         "splines if omitted.")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--resume", default=None,
                    help="Native snapshot to resume G from.")
    ap.add_argument("--encoder_checkpt", default=None,
                    help="Geometry encoder (.pt converted or native).")
    ap.add_argument("--mirror", type=int, default=0)
    # Model (reference train_flags.txt names).
    ap.add_argument("--output_resolution", type=int, default=128)
    ap.add_argument("--zdim", type=int, default=64)
    ap.add_argument("--wdim", type=int, default=64)
    ap.add_argument("--channel_max", type=int, default=128)
    ap.add_argument("--num_bf16_res", type=int, default=4,
                    help="Run G and D at bf16 for the N highest "
                         "resolutions (reference 'auto' spec fp16 analog; "
                         "0 disables).")
    ap.add_argument("--color_format", default="triad",
                    choices=["orig", "triad", "canvas"])
    ap.add_argument("--color_w_channels", type=int, default=0)
    ap.add_argument("--geom_inject_resolutions", default="0,1",
                    help="Encoder resolutions to inject (CSV).")
    ap.add_argument("--synthesis_arch", default="orig")
    ap.add_argument("--d_arch", default="orig")
    ap.add_argument("--positional_encoding", default=None)
    ap.add_argument("--posenc_inject_resolutions", default="")
    ap.add_argument("--posenc_injection_mode", default="cat")
    # Optimization.
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--batch_gpu", type=int, default=None,
                    help="Microbatch size for gradient accumulation "
                         "(reference --batch-gpu); None = full batch.")
    ap.add_argument("--glr", type=float, default=2e-4)
    ap.add_argument("--dlr", type=float, default=2e-4)
    ap.add_argument("--geom_lr", type=float, default=2e-4)
    ap.add_argument("--gamma", type=float, default=None,
                    help="R1 weight; default 0.0002*res^2/batch.")
    ap.add_argument("--kimg", type=int, default=10000)
    ap.add_argument("--snap", type=int, default=100,
                    help="Network-snapshot + metric-suite interval in "
                         "ticks (reference network_snapshot_ticks).")
    ap.add_argument("--image_snap", type=int, default=10,
                    help="Visualizer-sheet interval in ticks (reference "
                         "image_snapshot_ticks).")
    ap.add_argument("--aug", default="ada", choices=["ada", "noaug"])
    ap.add_argument("--augpipe", default="bgc")
    ap.add_argument("--style_mixing_prob", type=float, default=0.9)
    ap.add_argument("--ema_kimg", type=float, default=-1.0,
                    help="G_ema half-life in kimg; -1 = reference 'auto' "
                         "spec batch*10/32 (train.py:180).")
    ap.add_argument("--ema_rampup", type=float, default=0.05,
                    help="EMA ramp-up ratio (reference 'auto' spec 0.05); "
                         "<=0 disables ramp-up.")
    # NeuBE phases (train_flags.txt:8-14).
    ap.add_argument("--main_phase_losses", default="")
    ap.add_argument("--geom_phase_losses", default="1.0*iou_inv(uvs)")
    ap.add_argument("--geom_warmstart_losses",
                    default="1.0*iou_inv(uvs)+1.0*iou(u)")
    ap.add_argument("--stitch_phase_losses", default="")
    ap.add_argument("--geom_interval", type=int, default=200)
    ap.add_argument("--stitch_interval", type=int, default=0)
    ap.add_argument("--geom_phase_mode", default="last_and_rgb")
    ap.add_argument("--geom_warmstart_mode", default="last_and_rgb")
    ap.add_argument("--geom_warmstart_kimg", type=float, default=50)
    ap.add_argument("--geom_warmstart_start_kimg", type=float, default=0)
    ap.add_argument("--exit_after_warmstart", action="store_true")
    ap.add_argument("--partial_loss_with_triband_input", type=int, default=1)
    ap.add_argument("--geom_input_channel", type=int, default=1)
    ap.add_argument("--geom_truth_channel", type=int, default=2)
    # Misc.
    ap.add_argument("--fused", action="store_true",
                    help="Single-dispatch fused train step (all phases in "
                         "one jitted program; recommended on TPU).")
    ap.add_argument("--dp", type=int, default=0,
                    help="Data-parallel over N devices (jax.sharding mesh; "
                         "0 = single device). batch must divide by N.")
    ap.add_argument("--device_dataset", action="store_true",
                    help="Decode the whole dataset once and keep it in HBM "
                         "as uint8 banks; the fused step then samples each "
                         "batch on-device (no per-step host decode or "
                         "host->device batch copies). Requires --fused; "
                         "see train/device_dataset.py for the size guard.")
    ap.add_argument("--steps_per_dispatch", type=int, default=1,
                    help="With --device_dataset: run N batches per device "
                         "dispatch (lax.scan over the fused step; crops, "
                         "warmstart flag and EMA schedule computed "
                         "on-device). Hides host/dispatch latency; ticks "
                         "land on dispatch boundaries.")
    ap.add_argument("--coordinator_address", default="",
                    help="Multi-host: coordinator host:port for "
                         "jax.distributed (auto-detected on TPU pods).")
    ap.add_argument("--num_processes", type=int, default=0,
                    help="Multi-host: total process count (0 = autodetect).")
    ap.add_argument("--process_id", type=int, default=-1,
                    help="Multi-host: this process's id (-1 = autodetect).")
    ap.add_argument("--profile_dir", default=None,
                    help="Write a jax.profiler device trace of batches "
                         "10-12 here (view in TensorBoard/Perfetto).")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--metrics", default="fid,forger")
    ap.add_argument("--dry-run", action="store_true", dest="dry_run")
    ap.add_argument("--log_level", type=int, default=logging.INFO)
    return ap


def setup_config(args):
    """argparse args -> (TrainConfig, enc bundle) mirroring
    setup_training_loop_kwargs (reference train.py:99-474)."""
    from brushstroke_engine_tpu.flagship import flagship_encoder_config
    from brushstroke_engine_tpu.models.generator import make_generator_config
    from brushstroke_engine_tpu.models.discriminator import (
        DiscriminatorConfig,
    )
    from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_init
    from brushstroke_engine_tpu.train.state import TrainConfig
    from brushstroke_engine_tpu.train.augment import AugmentConfig
    import jax

    inject = tuple(int(x) for x in
                   args.geom_inject_resolutions.split(",") if x != "")

    enc_cfg = flagship_encoder_config()
    enc_params = enc_state = None
    if args.encoder_checkpt:
        try:
            # Native AE checkpoint (train_autoencoder.save_ae_checkpoint).
            from brushstroke_engine_tpu.train.train_autoencoder import \
                load_ae_checkpoint
            enc_cfg, enc_params, enc_state = \
                load_ae_checkpoint(args.encoder_checkpt)
        except Exception:
            # Reference torch .pt checkpoint (factory.py:18 layout).
            from brushstroke_engine_tpu.utils import checkpoint as ckpt
            from brushstroke_engine_tpu.utils import torch_extract as tx
            raw = tx.load_torch_file(args.encoder_checkpt)
            enc_args = raw.get("args", {})
            if hasattr(enc_args, "__dict__"):
                enc_args = vars(enc_args)
            enc_cfg = ckpt.encoder_config_from_args(enc_args)
            flat = {k: tx.to_numpy(v)
                    for k, v in raw["model_state"].items()}
            enc_params, enc_state = ckpt.convert_encoder_state(flat,
                                                               enc_cfg)
    else:
        enc_params, enc_state = geo_encoder_init(
            enc_cfg, jax.random.PRNGKey(args.seed + 99))

    res = args.output_resolution
    posenc_res = tuple(int(x) for x in
                       args.posenc_inject_resolutions.split(",") if x != "")
    gen_cfg = make_generator_config(
        z_dim=args.zdim, w_dim=args.wdim, img_resolution=res,
        geom_feature_resolutions=tuple(
            enc_cfg.featuremap_resolution(res, r) for r in inject),
        geom_feature_channels=tuple(
            enc_cfg.feature_channels(r) for r in inject),
        color_format=args.color_format,
        color_w_channels=args.color_w_channels,
        channel_base=16384, channel_max=args.channel_max,
        num_bf16_res=args.num_bf16_res,
        positional_encoding=args.positional_encoding,
        posenc_inject_resolutions=posenc_res,
        posenc_injection_mode=args.posenc_injection_mode)
    disc_cfg = DiscriminatorConfig(
        c_dim=0, img_resolution=res, img_channels=3,
        channel_base=16384, channel_max=args.channel_max,
        num_bf16_res=args.num_bf16_res,
        architecture="resnet" if args.d_arch == "resnet" else "resnet")

    gamma = args.gamma if args.gamma is not None else \
        0.0002 * (res ** 2) / args.batch

    cfg = TrainConfig(
        gen_cfg=gen_cfg, disc_cfg=disc_cfg, enc_cfg=enc_cfg,
        enc_res=inject, batch_size=args.batch, batch_gpu=args.batch_gpu,
        g_lr=args.glr, d_lr=args.dlr, geom_lr=args.geom_lr,
        r1_gamma=gamma,
        style_mixing_prob=args.style_mixing_prob,
        main_phase_losses=args.main_phase_losses,
        geom_phase_losses=args.geom_phase_losses,
        geom_warmstart_losses=args.geom_warmstart_losses,
        stitch_phase_losses=args.stitch_phase_losses,
        partial_loss_with_triband_input=bool(
            args.partial_loss_with_triband_input),
        geom_interval=args.geom_interval,
        stitch_interval=args.stitch_interval,
        geom_phase_mode=args.geom_phase_mode,
        geom_warmstart_mode=args.geom_warmstart_mode,
        geom_warmstart_kimg=args.geom_warmstart_kimg,
        geom_warmstart_start_kimg=args.geom_warmstart_start_kimg,
        augment=AugmentConfig.from_spec(args.augpipe)
        if args.aug == "ada" else None,
        ema_kimg=(args.ema_kimg if args.ema_kimg >= 0
                  else args.batch * 10.0 / 32.0),
        ema_rampup=(args.ema_rampup if args.ema_rampup > 0 else None),
        total_kimg=args.kimg)
    return cfg, enc_cfg, enc_params, enc_state


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level)

    from brushstroke_engine_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()

    # Multi-host SPMD: initialize jax.distributed BEFORE any backend use so
    # jax.devices() is the global view (reference analog: the NCCL process
    # group init at train.py:523-530; SURVEY 2.12).  No-op on single hosts.
    from brushstroke_engine_tpu.parallel.distributed import (
        maybe_initialize_distributed, host_shard_info,
    )
    multihost = maybe_initialize_distributed(
        coordinator_address=args.coordinator_address or None,
        num_processes=args.num_processes or None,
        process_id=args.process_id if args.process_id >= 0 else None)
    rank, num_ranks = host_shard_info()

    cfg, enc_cfg, enc_params, enc_state = setup_config(args)

    desc = (f"{args.color_format}-res{args.output_resolution}"
            f"-batch{args.batch}")
    run_dir = next_run_dir(args.outdir, desc)

    if args.dry_run:
        print("Resolved training options:")
        print(json.dumps({k: str(v) for k, v in vars(args).items()},
                         indent=2))
        print(f"Would create run dir: {run_dir}")
        return

    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "training_options.json"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()}, f, indent=2)

    from brushstroke_engine_tpu.train.dataset import (
        ImageFolderDataset, SyntheticGeometryDataset, BatchIterator,
    )
    from brushstroke_engine_tpu.train.loop import TrainingLoop

    res = args.output_resolution
    if args.data:
        style_ds = ImageFolderDataset(args.data, res, xflip=bool(args.mirror))
    else:
        logger.warning("--data not given: using random noise style images "
                       "(smoke-test mode)")

        class _NoiseDS:
            def __len__(self):
                return 1024

            def __getitem__(self, idx):
                rng = np.random.default_rng(idx)
                return (rng.random((res, res, 3)) * 255).astype(np.uint8)

        style_ds = _NoiseDS()
    if args.geom_data:
        geom_ds = ImageFolderDataset(args.geom_data, res + 64, channels=3)
    else:
        # Device-resident mode decodes the whole dataset up-front; cap the
        # synthetic stand-in so startup stays quick.
        geom_ds = SyntheticGeometryDataset(
            res + 64, size=2048 if args.device_dataset else 10000)

    # Per-process input shard: each rank loads batch/num_ranks items from
    # its own interleaved index stream (dataset.infinite_indices).
    assert cfg.batch_size % num_ranks == 0, \
        f"batch {cfg.batch_size} not divisible by {num_ranks} processes"
    local_bs = cfg.batch_size // num_ranks
    style_iter = geom_iter = None
    if not args.device_dataset:
        style_iter = BatchIterator(style_ds, local_bs, seed=args.seed,
                                   rank=rank, num_ranks=num_ranks)
        geom_iter = BatchIterator(geom_ds, local_bs, seed=args.seed + 1,
                                  rank=rank, num_ranks=num_ranks)

    resume_state = None
    if args.resume:
        from brushstroke_engine_tpu.utils.checkpoint import load_native
        from brushstroke_engine_tpu.train.state import init_train_state
        import jax
        bundle = load_native(args.resume)
        # Build the resumed state BEFORE the loop so constructor-time
        # consumers (the clarity-finetune G_orig snapshot) see the resumed
        # generator, not a fresh init.
        resume_state = init_train_state(cfg, jax.random.PRNGKey(args.seed),
                                        g_params=bundle.gen_params,
                                        g_state=bundle.gen_state)

    mesh = None
    if args.dp or multihost:
        from brushstroke_engine_tpu.parallel.mesh import make_mesh
        # Multi-host requires the mesh to span every process's devices.
        mesh = make_mesh(None if multihost else args.dp)

    # Tick-time evaluation (reference training_loop_modified.py:552-621):
    # visualizer sheets every tick, metric suite + FID every --snap ticks.
    hooks = None
    metric_names = tuple(m for m in args.metrics.split(",") if m)
    if metric_names:
        from brushstroke_engine_tpu.train.eval_hooks import make_eval_hooks
        fid_real = None
        if "fid" in metric_names and args.data:
            n = min(len(style_ds), 256)
            fid_real = [
                np.stack([style_ds[j]
                          for j in range(i, min(i + 16, n))])
                for i in range(0, n, 16)]
        metric_geom_iter = BatchIterator(geom_ds, 4, seed=args.seed + 2)
        hooks = make_eval_hooks(
            image_snapshot_ticks=args.image_snap,
            metric_snapshot_ticks=args.snap,
            fid_real_batches=fid_real, geom_iterator=metric_geom_iter,
            metrics=metric_names)

    device_banks = None
    if args.device_dataset:
        if not args.fused:
            raise SystemExit("--device_dataset requires --fused")
        from brushstroke_engine_tpu.train.device_dataset import \
            build_device_banks
        device_banks = build_device_banks(style_ds, geom_ds, mesh=mesh,
                                          log_fn=logger.info)

    loop = TrainingLoop(cfg, enc_params, enc_state, style_iter, geom_iter,
                        run_dir=run_dir, seed=args.seed,
                        use_fused=args.fused, mesh=mesh,
                        profile_dir=args.profile_dir, hooks=hooks,
                        device_banks=device_banks,
                        steps_per_dispatch=args.steps_per_dispatch,
                        resume_state=resume_state,
                        snapshot_ticks=args.snap)
    loop.run(exit_after_warmstart=args.exit_after_warmstart)
    print(f"Training finished; run dir: {run_dir}")


if __name__ == "__main__":
    main()
