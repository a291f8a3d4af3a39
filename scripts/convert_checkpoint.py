#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to native TPU bundles.

Handles:
  * training snapshot pkls ({G, D, G_ema, args, encoder}; reference
    training_loop_modified.py:560-578) -> native engine bundle
  * standalone encoder .pt checkpoints -> native AE checkpoint
  * brush library pkls with torch tensors -> torch-free numpy pkls
  * TF-legacy StyleGAN2 pickles ((G, D, Gs) tflib tuple; reference
    legacy.py:109) -> native generator checkpoint (orig color format;
    no geometry encoder in those pickles)

No reference code is executed: persistence-pickled modules are read with the
exec-free extractor (brushstroke_engine_tpu/utils/torch_extract.py).
"""

import argparse
import logging
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

logger = logging.getLogger(__name__)


def convert_snapshot(src, dst, encoder_checkpoint=None):
    from brushstroke_engine_tpu.utils import checkpoint as ckpt
    bundle = ckpt.convert_reference_snapshot(
        src, encoder_checkpoint=encoder_checkpoint)
    ckpt.save_native(dst, bundle)
    n = sum(int(np.prod(np.shape(x))) for x in
            _leaves(bundle.gen_params))
    print(f"Converted snapshot {src} -> {dst} "
          f"(G_ema: {n:,} params, color_format={bundle.color_format}, "
          f"inject={bundle.geom_inject_resolutions})")


def convert_encoder(src, dst):
    from brushstroke_engine_tpu.utils import checkpoint as ckpt
    from brushstroke_engine_tpu.utils import torch_extract as tx
    from brushstroke_engine_tpu.train.train_autoencoder import \
        save_ae_checkpoint
    raw = tx.load_torch_file(src)
    enc_args = raw.get("args", {})
    if hasattr(enc_args, "__dict__"):
        enc_args = vars(enc_args)
    cfg = ckpt.encoder_config_from_args(enc_args)
    flat = {k: tx.to_numpy(v) for k, v in raw["model_state"].items()}
    params, state = ckpt.convert_encoder_state(flat, cfg)
    save_ae_checkpoint(dst, cfg, params, state)
    print(f"Converted encoder {src} -> {dst} (kind={cfg.kind})")


def convert_library(src, dst):
    from brushstroke_engine_tpu.engine.library import (
        WBrushLibrary, _to_numpy,
    )
    lib = WBrushLibrary.from_file(src)
    out = {}
    for k, v in lib.styles.items():
        if isinstance(v, dict):
            entry = {}
            for kk, vv in v.items():
                entry[kk] = {k2: _to_numpy(v2) for k2, v2 in vv.items()} \
                    if isinstance(vv, dict) else _to_numpy(vv)
            out[k] = entry
        else:
            out[k] = _to_numpy(v)
    with open(dst, "wb") as f:
        pickle.dump(out, f)
    print(f"Converted library {src} -> {dst} ({len(out)} styles)")


def convert_tf(src, dst):
    from brushstroke_engine_tpu.utils import checkpoint as ckpt
    import dataclasses
    cfg, params, state = ckpt.convert_tf_generator_pkl(src)
    payload = {
        "magic": "brushstroke_engine_tpu.tf_generator.v1",
        "gen_cfg": dataclasses.asdict(cfg),
        "gen_params": params,
        "gen_state": state,
    }
    with open(dst, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    n = sum(int(np.prod(np.shape(x))) for x in _leaves(params))
    print(f"Converted TF generator {src} -> {dst} ({n:,} params, "
          f"{cfg.img_resolution}px {cfg.synthesis.architecture})")


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kind", required=True,
                    choices=["snapshot", "encoder", "library", "tf"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--encoder_checkpoint", default=None,
                    help="For snapshots without an embedded encoder.")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.kind == "snapshot":
        convert_snapshot(args.src, args.dst, args.encoder_checkpoint)
    elif args.kind == "encoder":
        convert_encoder(args.src, args.dst)
    elif args.kind == "tf":
        convert_tf(args.src, args.dst)
    else:
        convert_library(args.src, args.dst)


if __name__ == "__main__":
    main()
