#!/usr/bin/env python
"""Text-driven brush search and optimization.

CLI form of the reference optimize_clip.ipynb workflow (forger/util/
clip_util.py): build a style-thumbnail feature dictionary from a library,
answer a text query with the top-k styles, and optionally optimize the best
match's W+ toward the text embedding, saving the result as a brush pkl.
"""

import argparse
import logging
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gan_checkpoint", required=True)
    ap.add_argument("--encoder_checkpoint", default=None)
    ap.add_argument("--library", default="rand50")
    ap.add_argument("--query", required=True)
    ap.add_argument("--top_k", type=int, default=5)
    ap.add_argument("--optimize", action="store_true")
    ap.add_argument("--num_steps", type=int, default=300)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--dictionary", default=None,
                    help="Existing feature-dictionary pkl to reuse.")
    ap.add_argument("--clip_weights", default=None,
                    help="OpenAI CLIP state-dict .pt for the REAL backbone "
                         "(semantic search); omit for the labeled "
                         "non-semantic hashing fallback.")
    ap.add_argument("--clip_bpe", default=None,
                    help="CLIP BPE merges file "
                         "(bpe_simple_vocab_16e6.txt[.gz]).")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from brushstroke_engine_tpu.engine.brush import (
        PaintEngineFactory, GanBrushOptions,
    )
    from brushstroke_engine_tpu.engine.library import BrushLibrary
    from brushstroke_engine_tpu.tools.clip_search import (
        FeatureDictionary, ClipStyleOptimizer, ClipOptConfig,
        CLIPBackbone, HashingBackbone,
    )
    from brushstroke_engine_tpu.tools.latent import ws_for_seeds
    from brushstroke_engine_tpu.data.curves import random_spline_stroke
    from brushstroke_engine_tpu.models.mapping import mapping_apply
    import jax.numpy as jnp

    engine = PaintEngineFactory.create(
        args.gan_checkpoint, encoder_checkpoint=args.encoder_checkpoint)
    lib = BrushLibrary.from_arg(args.library, z_dim=engine.gen_cfg.z_dim)
    if args.clip_weights:
        backbone = CLIPBackbone(args.clip_weights, args.clip_bpe)
    else:
        backbone = HashingBackbone(0)
    print(f"Backbone kind: {backbone.kind}" + (
        "" if backbone.kind == "clip" else
        " (NOT semantic -- pass --clip_weights for real search)"))

    os.makedirs(args.output_dir, exist_ok=True)
    dict_path = args.dictionary or os.path.join(args.output_dir,
                                                "style_dict.pkl")
    if os.path.isfile(dict_path):
        d = FeatureDictionary.load(dict_path, backbone)
    else:
        d = FeatureDictionary(backbone)
        d.build_from_library(lib, engine.uvs_mapper)
        d.save(dict_path)

    results = d.get_top_results(args.query, k=args.top_k)
    print("Top styles for query %r (backbone=%s):"
          % (args.query, backbone.kind))
    for style_id, score in results:
        print(f"  {style_id}: {score:.4f}")

    if args.optimize:
        best_id = results[0][0]
        opts = GanBrushOptions()
        lib.set_style(best_id, opts)
        if opts.style_ws is not None:
            w0 = opts.style_ws
        else:
            ws, _ = mapping_apply(
                engine.gen_cfg.mapping, engine.gen_params["mapping"],
                jnp.asarray(opts.style_z, jnp.float32), None,
                w_avg=engine.gen_state.get("w_avg"))
            w0 = np.asarray(ws)

        def geom_batches():
            rng = np.random.default_rng(0)
            w = engine.patch_width
            while True:
                yield np.stack([random_spline_stroke(rng, w)[..., None]
                                for _ in range(4)])

        opt = ClipStyleOptimizer(engine, backbone,
                                 ClipOptConfig(num_steps=args.num_steps))
        res = opt.optimize(args.query, w0, geom_batches())
        out_path = os.path.join(
            args.output_dir,
            "CLIP_" + args.query.replace(" ", "_") + ".pkl")
        with open(out_path, "wb") as f:
            pickle.dump({args.query.replace(" ", "_"): {"w": res["w"]}}, f)
        print(f"Optimized style written to {out_path}")


if __name__ == "__main__":
    main()
