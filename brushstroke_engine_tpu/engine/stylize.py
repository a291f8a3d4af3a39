"""Batch stylization of line drawings: tile an any-size image into
overlapping patches, render each with the paint engine (feature blending
across seams), and assemble an RGBA canvas.

Rebuild of the reference stylization path:
  * generate_stitching_crops (forger/viz/style_transfer.py:15-48)
  * paint_image_main CLI     (forger/viz/paint_image_main.py:104-193)

TPU-first notes: patches are rendered through the same jitted render core as
the interactive path, and independent tiles can be batched (``batch_size``)
when feature blending is off; with blending on, tiles run in scan order since
each tile reads features written by its neighbors (matching the reference's
sequential semantics).
"""

from __future__ import annotations

import logging
import math
from typing import List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def generate_stitching_crops(img_shape: Tuple[int, int], patch_width: int,
                             overlap_margin: int, geom: np.ndarray = None,
                             mode: str = "all") -> List[Tuple[int, int, int, int]]:
    """Grid of overlapping (y, x, h, w) crops covering the image.

    Stride = patch_width - 2 * overlap_margin; the last row/col is clamped so
    crops stay inside the (pre-padded) image.  mode='nonempty' skips crops
    whose geometry patch contains no stroke pixels.
    """
    rows, cols = img_shape[:2]
    stride = patch_width - 2 * overlap_margin
    crops = []
    ys = list(range(0, max(rows - 2 * overlap_margin - 1, 1), stride))
    xs = list(range(0, max(cols - 2 * overlap_margin - 1, 1), stride))
    for y in ys:
        y = min(y, rows - patch_width)
        for x in xs:
            x = min(x, cols - patch_width)
            if mode == "nonempty" and geom is not None:
                patch = geom[y:y + patch_width, x:x + patch_width]
                if float(patch.min()) > 0.5:
                    continue
            crops.append((y, x, patch_width, patch_width))
    return crops


def pad_geometry(geom: np.ndarray, patch_width: int,
                 overlap_margin: int) -> Tuple[np.ndarray, int]:
    """Pad a geometry image (1.0 = BG) so the crop grid covers it exactly."""
    rows, cols = geom.shape[:2]
    stride = patch_width - 2 * overlap_margin
    new_rows = max(patch_width,
                   int(math.ceil((rows - 2 * overlap_margin) / stride))
                   * stride + 2 * overlap_margin)
    new_cols = max(patch_width,
                   int(math.ceil((cols - 2 * overlap_margin) / stride))
                   * stride + 2 * overlap_margin)
    out = np.ones((new_rows, new_cols), geom.dtype)
    out[:rows, :cols] = geom
    return out, stride


def read_geometry_image(img: np.ndarray, binarize: bool = True
                        ) -> np.ndarray:
    """Any-format image -> float geometry (1 = BG, 0 = stroke)
    (reference _read_any_geo, paint_image_main.py:30-57)."""
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 4:
        gray = 1.0 - arr[..., 3].astype(np.float32) / 255.0
    elif arr.ndim == 3:
        gray = arr[..., :3].astype(np.float32).mean(-1) / 255.0
    else:
        gray = arr.astype(np.float32)
        if gray.max() > 1.5:
            gray = gray / 255.0
    if binarize:
        from brushstroke_engine_tpu.utils.img_proc import threshold_otsu
        t = threshold_otsu(gray)
        gray = (gray > t).astype(np.float32)
    return gray


def stylize_image(helper, geom: np.ndarray, brush_options, *,
                  overlap_margin: int = 10, crop_margin: int = 10,
                  feature_blending_level: int = 2,
                  on_white: bool = False,
                  mode: str = "all") -> np.ndarray:
    """Render a full line drawing with a brush style.

    Args:
      helper: a PaintingHelper bound to a paint engine.
      geom: [H, W] float geometry, 1 = background.
      brush_options: GanBrushOptions with the style set.

    Returns:
      [H', W', 4] uint8 RGBA stylized canvas (padded size).
    """
    patch_width = helper.engine.patch_width
    geom, _ = pad_geometry(geom, patch_width, overlap_margin)
    rows, cols = geom.shape

    helper.make_new_canvas(rows, cols,
                           feature_blending=feature_blending_level)
    crops = generate_stitching_crops((rows, cols), patch_width,
                                     overlap_margin, geom=geom, mode=mode)
    canvas = np.zeros((rows, cols, 4), np.uint8)

    for (y, x, h, w) in crops:
        patch = geom[y:y + h, x:x + w]
        stroke_patch = np.zeros((h, w, 4), np.uint8)
        stroke_patch[..., 3] = ((1.0 - patch) * 255).astype(np.uint8)
        brush_options.set_position(x, y)
        img, _, meta = helper.render_stroke(
            stroke_patch, None, brush_options,
            meta={"x": x, "y": y, "crop_margin": crop_margin})
        oy, ox = meta["y"], meta["x"]
        hh, ww = img.shape[:2]
        canvas[oy:oy + hh, ox:ox + ww] = img

    if on_white:
        canvas = composite_on_white(canvas)
    return canvas


def composite_on_white(canvas: np.ndarray) -> np.ndarray:
    alpha = canvas[..., 3:4].astype(np.float32) / 255.0
    rgb = canvas[..., :3].astype(np.float32) * alpha + 255.0 * (1 - alpha)
    return np.concatenate(
        [np.clip(rgb, 0, 255).astype(np.uint8),
         np.full_like(canvas[..., 3:4], 255)], axis=-1)


def _gather_feature_windows(ffeat, fmask, fys, fxs, border):
    """Batched read of feature-canvas windows (device-side).

    Window size is static from ``border.shape``; returns (feats [B,R,R,C],
    alpha [B,R,R,1], upd [B,R,R]).  alpha keeps stored features where they
    exist (simplified whole-tile variant of the interactive dirty-area
    ramp); upd marks texels this tile may write (crop border excluded).
    """
    import jax
    import jax.numpy as jnp
    r = border.shape[0]
    c = ffeat.shape[-1]

    def one(fy, fx):
        f = jax.lax.dynamic_slice(ffeat, (0, fy, fx, 0), (1, r, r, c))[0]
        m = jax.lax.dynamic_slice(fmask, (fy, fx), (r, r))
        return f, m

    feats, masks = jax.vmap(one)(fys, fxs)
    alpha = masks[..., None]
    upd = (1.0 - masks) * border[None]
    return feats, alpha, upd


_WINDOW_FNS = {}


def _window_fns():
    """Module-level jitted window ops (per-call jax.jit wrappers would
    recompile every stylize invocation)."""
    if "gather" not in _WINDOW_FNS:
        import jax
        _WINDOW_FNS["gather"] = jax.jit(_gather_feature_windows)
        _WINDOW_FNS["scatter"] = jax.jit(_scatter_feature_windows,
                                         donate_argnums=(0, 1))
    return _WINDOW_FNS["gather"], _WINDOW_FNS["scatter"]


def _scatter_feature_windows(ffeat, fmask, new_feats, upds, fys, fxs):
    """Sequential device-side write-back of a wave's feature windows
    (tiles within a wave never overlap, so order is irrelevant)."""
    import jax
    import jax.numpy as jnp
    r = new_feats.shape[1]
    c = new_feats.shape[-1]

    def body(i, carry):
        fe, ma = carry
        fy, fx = fys[i], fxs[i]
        win = jax.lax.dynamic_slice(fe, (0, fy, fx, 0), (1, r, r, c))
        u = upds[i][None, :, :, None]
        merged = win * (1 - u) + new_feats[i][None] * u
        fe = jax.lax.dynamic_update_slice(fe, merged, (0, fy, fx, 0))
        mwin = jax.lax.dynamic_slice(ma, (fy, fx), (r, r))
        ma = jax.lax.dynamic_update_slice(
            ma, jnp.maximum(mwin, upds[i]), (fy, fx))
        return fe, ma

    return jax.lax.fori_loop(0, fys.shape[0], body, (ffeat, fmask))


def _prepare_wave_chunks(crops, stride: int, batch_size: int):
    """Group crops into checkerboard waves, chunk each wave to a fixed
    batch (padding tail chunks with the last tile), and stack the tile
    origins into [n_chunks, batch] arrays ordered wave-by-wave."""
    waves = {}
    for (y, x, h, w) in crops:
        key = ((y // stride) % 2, (x // stride) % 2)
        waves.setdefault(key, []).append((y, x))
    ys, xs = [], []
    for key in sorted(waves):
        tiles = waves[key]
        for start in range(0, len(tiles), batch_size):
            chunk = tiles[start:start + batch_size]
            pad = chunk + [chunk[-1]] * (batch_size - len(chunk))
            ys.append([y for (y, _x) in pad])
            xs.append([x for (_y, x) in pad])
    return np.asarray(ys, np.int32), np.asarray(xs, np.int32)


def _stylize_waves_impl(gen_cfg, enc_cfg, enc_res, render_mode, color_format,
                        blend_res, crop_margin, patch_width,
                        bundle_params, geom_canvas, ys, xs,
                        z, ws, noise_buffers, color_override, color_mask,
                        sfactor, border, quant_scales=None):
    """Whole-canvas stylization as one device program: a lax.scan over
    checkerboard-wave chunks.  See stylize_image_ondevice."""
    import jax
    import jax.numpy as jnp
    from brushstroke_engine_tpu.engine.render import render_core

    gen_params, gen_state, enc_params, enc_state = bundle_params
    rows, cols = geom_canvas.shape
    pw = patch_width
    cm = crop_margin
    blending = blend_res is not None
    if geom_canvas.dtype == jnp.uint8:
        # Host shipped the (binary) geometry as uint8 to quarter the
        # transfer; decode once in HBM.
        geom_canvas = geom_canvas.astype(jnp.float32) / 255.0

    canvas0 = jnp.zeros((rows, cols, 4), jnp.uint8)
    if blending:
        down = pw // blend_res
        feat_ch = gen_cfg.synthesis.channels(blend_res)
        ffeat0 = jnp.zeros((1, -(-rows // down), -(-cols // down), feat_ch),
                           jnp.float32)
        fmask0 = jnp.zeros(ffeat0.shape[1:3], jnp.float32)
    else:
        ffeat0 = jnp.zeros((), jnp.float32)
        fmask0 = jnp.zeros((), jnp.float32)

    def chunk_body(carry, inp):
        canvas, ffeat, fmask = carry
        cys, cxs = inp
        geoms = jax.vmap(lambda y, x: jax.lax.dynamic_slice(
            geom_canvas, (y, x), (pw, pw)))(cys, cxs)[..., None]
        blended = None
        rf = ()
        if blending:
            fys = cys // down
            fxs = cxs // down
            feats_win, alpha, upds = _gather_feature_windows(
                ffeat, fmask, fys, fxs, border)
            blended = {blend_res: (feats_win, alpha)}
            rf = (blend_res,)
        out = render_core.__wrapped__(
            gen_cfg, enc_cfg, enc_res, render_mode, rf, color_format,
            gen_params, gen_state, enc_params, enc_state,
            geoms, z, ws, jnp.stack([cys, cxs], axis=1), noise_buffers,
            color_override, color_mask, blended, sfactor,
            quant_scales=quant_scales)
        if blending:
            ffeat, fmask = _scatter_feature_windows(
                ffeat, fmask,
                out[f"features{blend_res}"].astype(jnp.float32),
                upds, fys, fxs)
        rgba = (jnp.clip(out["rgba"], 0.0, 1.0) * 255).astype(jnp.uint8)

        def wbody(i, cv):
            img = rgba[i]
            if cm > 0:
                img = img[cm:pw - cm, cm:pw - cm]
            return jax.lax.dynamic_update_slice(
                cv, img, (cys[i] + cm, cxs[i] + cm, 0))

        canvas = jax.lax.fori_loop(0, cys.shape[0], wbody, canvas)
        return (canvas, ffeat, fmask), None

    (canvas, _, _), _ = jax.lax.scan(chunk_body, (canvas0, ffeat0, fmask0),
                                     (ys, xs))
    return canvas


_STYLIZE_WAVES = None


def _stylize_waves():
    global _STYLIZE_WAVES
    if _STYLIZE_WAVES is None:
        import jax
        from functools import partial
        _STYLIZE_WAVES = partial(jax.jit, static_argnames=(
            "gen_cfg", "enc_cfg", "enc_res", "render_mode", "color_format",
            "blend_res", "crop_margin", "patch_width",
            "quant_scales"))(_stylize_waves_impl)
    return _STYLIZE_WAVES


def stylize_image_ondevice(engine, geom: np.ndarray, brush_options, *,
                           overlap_margin: int = 10, crop_margin: int = 10,
                           feature_blending_level: int = 2,
                           batch_size: int = 32,
                           on_white: bool = False,
                           mode: str = "all",
                           mesh=None) -> np.ndarray:
    """Whole-canvas stylization in ONE device dispatch.

    Same wave decomposition as :func:`stylize_image_batched`, but the chunk
    loop runs as a ``lax.scan`` inside a single jitted program: the geometry
    ships to HBM once, the feature canvas and the RGBA canvas live on-device,
    and the only host traffic is geometry in / uint8 canvas out.  On a
    dispatch-latency-bound link (or at production request rates) this
    replaces ~4 x ceil(tiles/batch) dispatches with one.

    With ``mesh`` (a 1-axis ``jax.sharding.Mesh``), each wave's tile batch
    shards over the mesh devices — the SP/spatial-parallel canvas render of
    SURVEY.md section 2.12: tile gather + encode + synthesis run
    data-parallel, and XLA inserts the all-gather where the (sequential,
    replicated) feature/canvas write-back needs the full wave.
    ``batch_size`` must divide evenly by the mesh size.
    """
    import jax
    import jax.numpy as jnp

    patch_width = engine.patch_width
    stride = patch_width - 2 * overlap_margin
    assert stride * 2 >= patch_width, \
        "checkerboard waves need overlap_margin <= patch_width/4"
    geom, _ = pad_geometry(geom, patch_width, overlap_margin)
    rows, cols = geom.shape
    crops = generate_stitching_crops((rows, cols), patch_width,
                                     overlap_margin, geom=geom, mode=mode)
    if not crops:
        canvas = np.zeros((rows, cols, 4), np.uint8)
        return composite_on_white(canvas) if on_white else canvas
    ys, xs = _prepare_wave_chunks(crops, stride, batch_size)

    brush_options.prepare_style(batch_size)
    override, cmask = brush_options.color_override(batch_size)
    sfactor = None
    if brush_options.enable_uvs_mapping:
        sfactor = engine.uvs_mapper.get_sfactor(brush_options)
    noise_buffers = brush_options.custom_args.get("noise_buffers") or None
    if noise_buffers is not None:
        noise_buffers = {k: jnp.asarray(np.asarray(v).reshape(
            np.asarray(v).shape[-2:])) for k, v in noise_buffers.items()}

    blend_res = None
    border = None
    if feature_blending_level > 0:
        down = 2 ** (feature_blending_level - 1)
        blend_res = patch_width // down
        cm = crop_margin // down
        border_np = np.zeros((blend_res, blend_res), np.float32)
        if cm > 0:
            border_np[cm:-cm, cm:-cm] = 1.0
        else:
            border_np[:] = 1.0
        border = jnp.asarray(border_np)

    z = brush_options.style_z
    ws = brush_options.style_ws
    # Binary geometry (the standard binarized path) ships as uint8: 4x less
    # host->device traffic, exactly recovered on-device.
    geom32 = np.asarray(geom, np.float32)
    g255 = geom32 * 255.0
    if np.array_equal(g255, np.round(g255)):
        geom_dev = jnp.asarray(g255.astype(np.uint8))
    else:
        geom_dev = jnp.asarray(geom32)

    ys = jnp.asarray(ys)
    xs = jnp.asarray(xs)
    z = None if z is None else jnp.asarray(z, jnp.float32)
    ws = None if ws is None else jnp.asarray(ws, jnp.float32)
    override = None if override is None else jnp.asarray(override)
    cmask = None if cmask is None else jnp.asarray(cmask)
    bundle_tree = (engine.gen_params, engine.gen_state,
                   engine.enc_params, engine.enc_state)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        n = mesh.shape[axis]
        if batch_size % n:
            raise ValueError(f"batch_size {batch_size} must divide by the "
                             f"mesh size {n}")
        shard = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
        ys = shard(ys, P(None, axis))
        xs = shard(xs, P(None, axis))
        if z is not None:
            z = shard(z, P(axis))
        if ws is not None:
            ws = shard(ws, P(axis))
        if override is not None:
            override = shard(override, P(axis))
        geom_dev = shard(geom_dev, P())
        if border is not None:
            border = shard(border, P())
        # The engine commits its weight trees to ONE accelerator at
        # construction (per-dispatch host restaging is the serving
        # latency killer); a mesh-sharded call needs them REPLICATED
        # over every mesh device instead.  Replicate once per mesh and
        # cache on the engine so repeated sharded calls reuse the copy.
        cached = getattr(engine, "_mesh_replicated_weights", None)
        if cached is None or cached[0] is not mesh:
            rep = jax.device_put(bundle_tree, NamedSharding(mesh, P()))
            engine._mesh_replicated_weights = (mesh, rep)
        bundle_tree = engine._mesh_replicated_weights[1]
    # Static-int8 serving (engine.enable_int8_serving): forwarded as a
    # STATIC argument so int8-vs-bf16 programs cache separately.
    qk = engine._quant_key() if hasattr(engine, "_quant_key") else None
    canvas = _stylize_waves()(
        engine.gen_cfg, engine.enc_cfg, tuple(engine.enc_res),
        engine.render_mode, engine.color_format, blend_res, crop_margin,
        patch_width,
        bundle_tree,
        geom_dev, ys, xs, z, ws, noise_buffers,
        override, cmask, sfactor, border, quant_scales=qk)
    canvas = np.asarray(canvas)
    if on_white:
        canvas = composite_on_white(canvas)
    return canvas


def stylize_image_batched(engine, geom: np.ndarray, brush_options, *,
                          overlap_margin: int = 10, crop_margin: int = 10,
                          feature_blending_level: int = 2,
                          batch_size: int = 16,
                          on_white: bool = False,
                          mode: str = "all") -> np.ndarray:
    """TPU-batched canvas stylization using checkerboard waves.

    The reference renders tiles strictly sequentially because each tile reads
    features written by earlier overlapping tiles (SURVEY.md section 3.3).
    On TPU we exploit the dependency structure: with stride >= patch/2,
    tiles in the same (row%2, col%2) parity class never overlap EACH OTHER,
    so each of the 4 waves renders as one large device batch; cross-wave
    blending still flows through the feature canvas.  This turns ~250
    sequential patch dispatches for a 2000x2000 canvas into 4 batched waves.
    """
    import jax
    import jax.numpy as jnp

    patch_width = engine.patch_width
    stride = patch_width - 2 * overlap_margin
    assert stride * 2 >= patch_width, \
        "checkerboard waves need overlap_margin <= patch_width/4"
    geom, _ = pad_geometry(geom, patch_width, overlap_margin)
    rows, cols = geom.shape
    crops = generate_stitching_crops((rows, cols), patch_width,
                                     overlap_margin, geom=geom, mode=mode)
    canvas = np.zeros((rows, cols, 4), np.uint8)

    # The feature canvas stays DEVICE-resident for the whole render; the
    # only host<->device traffic is geometry in and uint8 RGBA out.  (The
    # first version round-tripped f32 features per chunk -- on a tunneled
    # dev chip that was ~70 MB/chunk and dominated wall-clock.)
    blending = feature_blending_level > 0
    blend_res = None
    gather_fn = scatter_fn = None
    ffeat = fmask = border = None
    if blending:
        down = 2 ** (feature_blending_level - 1)
        blend_res = patch_width // down
        feat_ch = engine.gen_cfg.synthesis.channels(blend_res)
        fh = -(-rows // down)
        fw = -(-cols // down)
        ffeat = jnp.zeros((1, fh, fw, feat_ch), jnp.float32)
        fmask = jnp.zeros((fh, fw), jnp.float32)
        cm = crop_margin // down
        border_np = np.zeros((blend_res, blend_res), np.float32)
        if cm > 0:
            border_np[cm:-cm, cm:-cm] = 1.0
        else:
            border_np[:] = 1.0
        border = jnp.asarray(border_np)
        gather_fn, scatter_fn = _window_fns()

    waves = {}
    for (y, x, h, w) in crops:
        key = ((y // stride) % 2, (x // stride) % 2)
        waves.setdefault(key, []).append((y, x, h, w))

    for key in sorted(waves):
        tiles = waves[key]
        for start in range(0, len(tiles), batch_size):
            chunk = tiles[start:start + batch_size]
            n = len(chunk)
            # Pad tail chunks to the full batch (repeating the last tile)
            # so every wave runs the SAME compiled programs -- tail-shaped
            # chunks would otherwise trigger a fresh XLA compile each.
            pad = chunk + [chunk[-1]] * (batch_size - n)
            geom_b = np.stack([
                geom[y:y + h, x:x + w] for (y, x, h, w) in pad]
            )[..., None].astype(np.float32)
            brush_options.set_position(
                np.asarray([x for (_y, x, _h, _w) in pad]),
                np.asarray([y for (y, _x, _h, _w) in pad]))
            brush_options.prepare_style(batch_size)

            blended = None
            return_features = ()
            if blending:
                down = patch_width // blend_res
                fys = jnp.asarray([y // down for (y, _x, _h, _w) in pad])
                fxs = jnp.asarray([x // down for (_y, x, _h, _w) in pad])
                feats_win, alpha, upds = gather_fn(ffeat, fmask, fys, fxs,
                                                   border)
                blended = {blend_res: (feats_win, alpha)}
                return_features = (blend_res,)

            out = engine._run_core(geom_b, brush_options,
                                   blended_features=blended,
                                   return_features=return_features)
            # uint8 cast ON DEVICE: 4x less transfer than f32.
            rgba = np.asarray((jnp.clip(out["rgba"], 0.0, 1.0)
                               * 255).astype(jnp.uint8))
            if blending:
                ffeat, fmask = scatter_fn(ffeat, fmask,
                                          out[f"features{blend_res}"]
                                          .astype(jnp.float32),
                                          upds, fys, fxs)
            for i, (y, x, h, w) in enumerate(chunk):
                img = rgba[i]
                if crop_margin > 0:
                    img = img[crop_margin:-crop_margin,
                              crop_margin:-crop_margin]
                canvas[y + crop_margin:y + h - crop_margin,
                       x + crop_margin:x + w - crop_margin] = img

    if on_white:
        canvas = composite_on_white(canvas)
    return canvas
