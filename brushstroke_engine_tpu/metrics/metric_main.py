"""Metric evaluation loops: per-style stroke metrics, stitching, FID.

Rebuild of the reference metric loops (forger/metrics/metric_main.py:75-326)
and the forger FID protocol (thirdparty/.../metrics/
frechet_inception_distance.py:53-81): per style -- Lab color control,
transparency, background uniformity, across-geometry LPIPS, and stitching
metrics; FID from real style images vs strokes painted in 'full' mode over
dataset geometry.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from brushstroke_engine_tpu.metrics import color as color_metric
from brushstroke_engine_tpu.metrics import geom as geom_metric
from brushstroke_engine_tpu.metrics import fid as fid_lib
from brushstroke_engine_tpu.models.mapping import mapping_apply
from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode
from brushstroke_engine_tpu.train.stitching import RandomStitcher

logger = logging.getLogger(__name__)


def update_sum_dict(total: Dict, new: Dict):
    for k, v in new.items():
        total[k] = total.get(k, 0.0) + float(v)


def normalize_sum_dict(total: Dict, denom: float):
    for k in total:
        total[k] = total[k] / denom


def to_file_line(values, do_strip=True) -> str:
    parts = []
    for v in values:
        parts.append("{:<15}".format(
            v if isinstance(v, str) else "%0.4f" % float(v)))
    return " ".join(parts).rstrip() + "\n" if do_strip else \
        " ".join(parts) + "\n"


def ordered_dict_values(d: Dict, keys):
    return [d[k] for k in keys]


def _stitch_for_style(generator, z, tri_batch, gic, stitcher, rng_key):
    """Run the stitching render for one style batch; returns metric dict."""
    eng = generator.engine
    geom = np.asarray(tri_batch, np.float32) / 255.0
    geom = geom[..., gic:gic + 1]
    res_w = eng.patch_width
    h, w = geom.shape[1:3]
    if h <= res_w or w <= res_w:
        return {}
    rng = generator.random_state.rng
    y = int(rng.randint(0, h - res_w))
    x = int(rng.randint(0, w - res_w))
    crop1 = (y, x, res_w, res_w)
    crop2 = stitcher.gen_overlapping_square_crop(h, crop1)

    g1 = geom[:, crop1[0]:crop1[0] + res_w, crop1[1]:crop1[1] + res_w]
    g2 = geom[:, crop2[0]:crop2[0] + res_w, crop2[1]:crop2[1] + res_w]
    enc1 = geo_encoder_encode(eng.enc_cfg, eng.enc_params, eng.enc_state,
                              jnp.asarray(g1), res=list(eng.enc_res))
    enc2 = geo_encoder_encode(eng.enc_cfg, eng.enc_params, eng.enc_state,
                              jnp.asarray(g2), res=list(eng.enc_res))
    res = stitcher.generate_with_stitching(
        eng.gen_cfg, eng.gen_params,
        {"w_avg": eng.gen_state.get("w_avg", jnp.zeros(eng.gen_cfg.w_dim)),
         "noise": eng.gen_state["noise"]},
        jnp.asarray(z), enc1, enc2, crop1, crop2, rng_key)
    return geom_metric.compute_stitching_metrics(res, stitcher.crop_margin)


def paint_engine_metric_loop(generator, style_library, nbatches_per_style,
                             fullres_geom_iterator=None,
                             stitcher: Optional[RandomStitcher] = None,
                             geom_input_channel: int = 1,
                             eval_output_dir: Optional[str] = None,
                             files_prefix: str = "") -> Dict[str, float]:
    """Per-style metric loop (reference metric_main.py:105-236)."""
    generator.set_render_mode("clear")
    style_ofile = summary_ofile = None
    if eval_output_dir is not None:
        os.makedirs(eval_output_dir, exist_ok=True)
        style_ofile = open(os.path.join(
            eval_output_dir, f"{files_prefix}style_metrics.txt"), "w")
        summary_ofile = open(os.path.join(
            eval_output_dir, f"{files_prefix}summary_metrics.txt"), "w")

    ordered_keys = None
    summary_losses: Dict[str, float] = {}
    style_ws = {}
    nprocessed = 0
    rng_key = jax.random.PRNGKey(generator.random_state.seed or 0)

    for style_id in style_library.get_style_ids():
        seed_str = "{:<15}".format(style_id)
        style_library.set_style(style_id, generator.brush_options)

        # Record the style's W for library export (reference :152-157).
        opts = generator.brush_options
        if opts.style_ws is not None:
            style_ws[seed_str] = np.asarray(opts.style_ws)
        elif opts.style_z is not None:
            eng = generator.engine
            ws, _ = mapping_apply(
                eng.gen_cfg.mapping, eng.gen_params["mapping"],
                jnp.asarray(opts.style_z, jnp.float32), None,
                w_avg=eng.gen_state.get("w_avg"))
            style_ws[seed_str] = np.asarray(ws)

        style_losses: Dict[str, float] = {}
        for bidx in range(nbatches_per_style):
            rng_key, k1, k2, k3 = jax.random.split(rng_key, 4)
            colors = generator.random_colors()
            generator.set_new_geom()
            generator.set_new_primary_color(colors)
            render = jnp.asarray(generator.generate())
            geom = jnp.asarray(generator.geom)

            batch_losses = color_metric.compute_lab_metrics(
                jnp.asarray(colors), render, geom)
            batch_losses.update(
                geom_metric.compute_transparency_metrics(render, geom))
            batch_losses.update(geom_metric.compute_uniform_bg_lpips_metric(
                render, geom, same_style=False, rng=k1,
                key_suffix="multicolor"))

            generator.unset_colors()
            render = jnp.asarray(generator.generate())
            batch_losses.update(geom_metric.compute_uniform_bg_lpips_metric(
                render, geom, same_style=True, rng=k2))
            batch_losses.update(
                geom_metric.compute_lpips_across_geo(render, rng=k3))

            if stitcher is not None and fullres_geom_iterator is not None \
                    and generator.current_styles() is not None:
                rng_key, ks = jax.random.split(rng_key)
                tri = next(fullres_geom_iterator)
                z = generator.current_styles()[:tri.shape[0]]
                if z.shape[0] == tri.shape[0]:
                    batch_losses.update(_stitch_for_style(
                        generator, z, tri, geom_input_channel, stitcher, ks))

            update_sum_dict(style_losses, batch_losses)

        if ordered_keys is None:
            ordered_keys = sorted(style_losses.keys())
            header = "SEED            " + to_file_line(ordered_keys)
            if style_ofile:
                style_ofile.write(header)
            if summary_ofile:
                summary_ofile.write(to_file_line(ordered_keys))

        normalize_sum_dict(style_losses, float(nbatches_per_style))
        update_sum_dict(summary_losses, style_losses)
        line = seed_str + " " + to_file_line(
            ordered_dict_values(style_losses, ordered_keys), do_strip=False)
        if style_ofile:
            style_ofile.write(line)
            style_ofile.flush()
        logger.debug("%d: %s", nprocessed, line.strip())
        nprocessed += 1

    normalize_sum_dict(summary_losses, float(max(nprocessed, 1)))
    if style_ofile:
        style_ofile.close()
    if summary_ofile:
        summary_ofile.write(to_file_line(
            ordered_dict_values(summary_losses, ordered_keys or []),
            do_strip=False))
        summary_ofile.close()
    if eval_output_dir is not None:
        with open(os.path.join(eval_output_dir,
                               f"{files_prefix}style_ws.pkl"), "wb") as f:
            pickle.dump(style_ws, f)
    return summary_losses


def stitching_metric_loop(generator, fullres_geom_iterator, num_batches,
                          stitcher: Optional[RandomStitcher] = None,
                          geom_input_channel: int = 1) -> Dict[str, float]:
    """Standalone stitching metric loop (reference metric_main.py:75-103)."""
    stitcher = stitcher or RandomStitcher()
    summary: Dict[str, float] = {}
    rng_key = jax.random.PRNGKey(generator.random_state.seed or 0)
    n = 0
    for _ in range(num_batches):
        rng_key, ks = jax.random.split(rng_key)
        tri = next(fullres_geom_iterator)
        z_dim = generator.engine.gen_cfg.z_dim
        z = generator.random_state.rng.randn(
            tri.shape[0], z_dim).astype(np.float32)
        losses = _stitch_for_style(generator, z, tri, geom_input_channel,
                                   stitcher, ks)
        if losses:
            update_sum_dict(summary, losses)
            n += 1
    normalize_sum_dict(summary, float(max(n, 1)))
    return summary


def forger_compute_fid(generator, real_batches: Iterable,
                       num_items: int = 50000,
                       fade_canvas: bool = False) -> float:
    """FID between real style images and painted strokes in 'full' mode
    (reference frechet_inception_distance.py:53-81; 'fadecanvas' composites
    over a blurred canvas, :77-79)."""
    generator.set_render_mode("full")
    stats_real = fid_lib.FeatureStats(num_items)
    stats_gen = fid_lib.FeatureStats(num_items)

    for batch in real_batches:
        stats_real.append(fid_lib.extract_features(jnp.asarray(batch)))
        if stats_real.is_full:
            break

    while not stats_gen.is_full:
        generator.set_new_geom()
        generator.set_new_styles(generator.get_random_styles())
        generator.set_random_colors()
        render = generator.generate()
        rgb = render[..., :3]
        if fade_canvas:
            blur = geom_metric.gaussian_smoothing(jnp.asarray(rgb))
            alpha = jnp.asarray(render[..., 3:4])
            rgb = np.asarray(alpha * rgb + (1 - alpha) * blur)
        img = np.clip(rgb * 255, 0, 255).astype(np.uint8)
        stats_gen.append(fid_lib.extract_features(jnp.asarray(img)))

    return fid_lib.compute_fid_from_feature_stats(stats_real, stats_gen)


def summary_losses_to_file(fname, losses, step=None, do_print=False):
    """Append a metrics line (reference metric_main.py:239-263)."""
    ordered_keys = sorted(losses.keys())
    exists = os.path.isfile(fname)
    with open(fname, "a") as f:
        if not exists:
            head = ("STEP " if step is not None else "") + \
                to_file_line(ordered_keys)
            f.write(head)
        line = (("%d " % step) if step is not None else "") + to_file_line(
            ordered_dict_values(losses, ordered_keys), do_strip=False)
        f.write(line)
    if do_print:
        print(line.strip())
