"""Diagnose the LAB_E% color-control regression (round-5 VERDICT task 2).

Loads trained snapshots and attributes the user-color failure to the UVS
channel decomposition: for each snapshot it reports, over geometry-foreground
pixels, how much softmax mass each of U/V/S carries, the learned per-channel
colors, and LAB_E% under (a) the standard primary-only override (what the
metric loop and the UI do, reference brush.py:150-174 color_override) and
(b) a counterfactual override of BOTH stroke channels (U and V).  If (b)
collapses LAB_E% while (a) fails, the stroke interior has migrated into the
secondary channel V, i.e. the post-warmstart geom losses (iou_inv(uvs) only,
train_flags.txt geom_phase_losses) no longer anchor U = stroke foreground the
way the warmstart's extra iou(u) term did (reference losses.py:453-476).

Usage:
  python scripts/diagnose_color_control.py SNAPSHOT [SNAPSHOT ...] \
      --out docs/evidence/r5_color_diag
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from brushstroke_engine_tpu.engine.brush import (
    GanBrushOptions, PaintEngineFactory,
)
from brushstroke_engine_tpu.metrics import color as color_metric
from brushstroke_engine_tpu.viz.visualize import (
    curated_geometry_batch, MAPPER_SHAPES, save_image, to_uint8,
)

SWEEP = np.asarray([
    [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
    [1.0, 1.0, 0.0], [1.0, 0.0, 1.0],
], np.float32)


def render(engine, z, geom, color0=None, color1=None):
    opts = GanBrushOptions()
    opts.set_style(np.asarray(z, np.float32))
    if color0 is not None:
        opts.set_color(0, np.asarray(color0 * 255, np.uint8))
    if color1 is not None:
        opts.set_color(1, np.asarray(color1 * 255, np.uint8))
    return engine._run_core(np.asarray(geom, np.float32), opts)


def lab_e(colors, out, geom):
    rgba = jnp.asarray(out["rgba"])
    m = color_metric.compute_lab_metrics(jnp.asarray(colors), rgba,
                                         jnp.asarray(geom))
    return m["LAB_E%"], m["LAB_L2"]


def diagnose(path, out_dir, n_styles=8, seed=0):
    engine = PaintEngineFactory.create(path)
    engine.set_render_mode("clear")
    rng = np.random.RandomState(seed)
    z = rng.randn(n_styles, engine.gen_cfg.z_dim).astype(np.float32)
    geom = curated_geometry_batch(MAPPER_SHAPES, radius=16,
                                  width=engine.patch_width)[..., None]
    geom = np.asarray(geom[:n_styles], np.float32)
    n = min(n_styles, geom.shape[0])
    z, geom = z[:n], geom[:n]

    # 1) Channel attribution: softmax mass per channel over geom FG/BG.
    out = render(engine, z, geom)
    uvs = np.asarray(out["uvs"])                        # [B, H, W, 3]
    fg = 1.0 - geom[..., 0]                             # 1 = stroke FG
    bg = geom[..., 0]
    fg_mass = (uvs * fg[..., None]).sum((0, 1, 2)) / max(fg.sum(), 1)
    bg_mass = (uvs * bg[..., None]).sum((0, 1, 2)) / max(bg.sum(), 1)
    learned_colors = np.asarray(out["colors"])          # [B, 3(rgb), 3(uvs)]

    # Tag includes the run directory: snapshot basenames collide across runs
    # (every finetune ends at network-snapshot-000200.pkl).
    run = os.path.basename(os.path.dirname(os.path.dirname(path))) or "run"
    tag = run + "_" + os.path.basename(path).replace(".pkl", "")
    report = {
        "snapshot": path,
        "fg_mass_uvs": [round(float(x), 4) for x in fg_mass],
        "bg_mass_uvs": [round(float(x), 4) for x in bg_mass],
        "mean_learned_colors_rgb_per_channel":
            [[round(float(c), 3) for c in learned_colors[:, :, k].mean(0)]
             for k in range(3)],
    }

    # 2) LAB_E sweep: primary-only override vs U+V override.
    rows_primary, rows_both = [], []
    e_primary, e_both = [], []
    for c in SWEEP:
        cb = np.tile(c[None], (n, 1))
        o1 = render(engine, z, geom, color0=c)
        e1, l1 = lab_e(cb, o1, geom)
        o2 = render(engine, z, geom, color0=c, color1=c)
        e2, l2 = lab_e(cb, o2, geom)
        e_primary.append(e1)
        e_both.append(e2)
        rows_primary.append(np.asarray(o1["rgba"])[0, ..., :3])
        rows_both.append(np.asarray(o2["rgba"])[0, ..., :3])
    report["lab_e_primary_only"] = round(float(np.mean(e_primary)), 2)
    report["lab_e_primary_and_secondary"] = round(float(np.mean(e_both)), 2)

    os.makedirs(out_dir, exist_ok=True)
    sheet = np.concatenate(
        [np.concatenate(rows_primary, axis=1),
         np.concatenate(rows_both, axis=1)], axis=0)
    save_image(os.path.join(out_dir, f"override_ab_{tag}.png"),
               to_uint8(sheet))

    # 3) UVS panel for the first style (geom | U | V | S | composite).
    panels = [np.tile(geom[:1], (1, 1, 1, 3))]
    for k in range(3):
        panels.append(np.tile(uvs[:1, ..., k:k + 1], (1, 1, 1, 3)))
    panels.append(np.asarray(out["rgba"])[:1, ..., :3])
    save_image(os.path.join(out_dir, f"uvs_{tag}.png"),
               to_uint8(np.concatenate([p[0] for p in panels], axis=1)))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("snapshots", nargs="+")
    ap.add_argument("--out", default="docs/evidence/r5_color_diag")
    args = ap.parse_args()
    reports = [diagnose(p, args.out) for p in args.snapshots]
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(reports, f, indent=2)
    for r in reports:
        print(json.dumps(r, indent=2))


if __name__ == "__main__":
    main()
