"""Worker process for the 2-process jax.distributed training test.

Runs the SAME deterministic tiny training (full fused phase machine over an
8-device 'data' mesh) either as one process of a 2-process multi-host group
(--num_processes 2, 4 virtual CPU devices each) or standalone
(--num_processes 1, 8 virtual devices).  Writes final stats + a parameter
digest as JSON so the test can assert the two configurations are equal
(VERDICT r2 item 2; capability anchor: reference train.py:523-530).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    n_local = 8 // args.num_processes
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from brushstroke_engine_tpu.parallel.distributed import (
            maybe_initialize_distributed,
        )
        ok = maybe_initialize_distributed(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.num_processes,
            process_id=args.rank)
        assert ok, "distributed init failed"
    assert jax.device_count() == 8, jax.devices()

    import numpy as np
    from brushstroke_engine_tpu.models.discriminator import (
        DiscriminatorConfig,
    )
    from brushstroke_engine_tpu.models.geo_encoder import (
        GeoEncoderConfig, geo_encoder_init,
    )
    from brushstroke_engine_tpu.models.generator import make_generator_config
    from brushstroke_engine_tpu.parallel.mesh import make_mesh
    from brushstroke_engine_tpu.train.state import TrainConfig
    from brushstroke_engine_tpu.train.loop import TrainingLoop
    from brushstroke_engine_tpu.train.augment import AugmentConfig

    enc_cfg = GeoEncoderConfig(kind="sauto", in_channels=1, out_channels=1,
                               preproc="-11inverse", pre_filters=8,
                               down_filters=(16, 16), post_filters=(8,),
                               up_filters=(16, 8))
    enc_params, enc_state = geo_encoder_init(enc_cfg, jax.random.PRNGKey(0))
    res = 32
    inject = (0, 1)
    gen_cfg = make_generator_config(
        z_dim=16, w_dim=16, img_resolution=res,
        geom_feature_resolutions=tuple(
            enc_cfg.featuremap_resolution(res, r) for r in inject),
        geom_feature_channels=tuple(
            enc_cfg.feature_channels(r) for r in inject),
        channel_base=2048, channel_max=32)
    B = 8
    cfg = TrainConfig(
        gen_cfg=gen_cfg,
        disc_cfg=DiscriminatorConfig(c_dim=0, img_resolution=res,
                                     img_channels=3, channel_base=2048,
                                     channel_max=32),
        enc_cfg=enc_cfg, enc_res=inject, batch_size=B,
        g_reg_interval=2, d_reg_interval=2,
        main_phase_losses="0.1*iou_inv(uvs)",
        geom_phase_losses="1.0*iou_inv(uvs)", geom_interval=2,
        geom_warmstart_kimg=0,
        stitch_phase_losses="1*gan(fake_composite)", stitch_interval=2,
        augment=AugmentConfig.from_spec("bgc"),
        kimg_per_tick=1000)   # no tick work during the short run

    rank, ranks = args.rank, args.num_processes
    local = B // ranks

    class DetIter:
        """Deterministic GLOBAL batch -> this rank's contiguous row block."""

        def __init__(self, seed, shape):
            self.seed, self.shape, self.i = seed, shape, 0

        def __next__(self):
            g = np.random.RandomState(self.seed + self.i)
            self.i += 1
            batch = (g.rand(B, *self.shape) * 255).astype(np.uint8)
            return batch[rank * local:(rank + 1) * local]

    loop = TrainingLoop(cfg, enc_params, enc_state,
                        DetIter(100, (res, res, 3)),
                        DetIter(200, (res + 32, res + 32, 3)),
                        run_dir=os.path.join(os.path.dirname(args.out),
                                             f"run{rank}"),
                        seed=7, mesh=make_mesh(), use_fused=True)
    assert (loop.rank, loop.num_ranks) == (rank, ranks)
    loop.run(total_kimg=args.steps * B / 1000.0)

    digest = float(sum(float(np.abs(np.asarray(x)).sum())
                       for x in jax.tree_util.tree_leaves(
                           loop.state["g_params"])))
    if rank == 0:
        with open(args.out, "w") as f:
            json.dump({"stats": loop._last_stats, "g_digest": digest,
                       "nimg": loop.cur_nimg}, f)
    print(f"worker rank {rank}/{ranks} done", flush=True)


if __name__ == "__main__":
    main()
