"""Device-resident feature canvas: the whole per-stroke step in ONE program.

The host-side PaintingHelper (engine/canvas.py) mirrors the reference: the
feature canvas lives in host memory and every stroke moves feature tensors
host<->device.  This module is the TPU-first version promised in SURVEY.md
section 5.7: the canvas (intermediate generator activations + validity mask)
stays in HBM as jax arrays, and one jitted function per stroke does

  read window (dynamic_slice) -> blend-alpha from the mask -> encode+render
  with blended features -> write window back (dynamic_update_slice)

with the canvas buffers donated, so an interactive stroke is a single device
dispatch with no feature traffic -- the <30 ms p50 design point.  Tile
positions are traced values: painting anywhere on the canvas reuses one
compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brushstroke_engine_tpu.models.generator import generator_apply
from brushstroke_engine_tpu.models.geo_encoder import geo_encoder_encode


class CanvasState(NamedTuple):
    """Feature canvas pytree: [1, H/d, W/d, C] features + [H/d, W/d] mask."""
    features: jnp.ndarray
    mask: jnp.ndarray           # float32, 1.0 where features are valid


def init_canvas_state(canvas_height: int, canvas_width: int,
                      down_factor: int, feature_channels: int,
                      dtype=jnp.float32) -> CanvasState:
    h = -(-canvas_height // down_factor)
    w = -(-canvas_width // down_factor)
    return CanvasState(
        features=jnp.zeros((1, h, w, feature_channels), dtype),
        mask=jnp.zeros((h, w), jnp.float32))


def _blend_alpha(mask_window, blend_margin: int, crop_margin: int):
    """Blend weight for stored features over a whole-tile dirty area
    (engine/canvas.py:generate_dirty_area_alpha specialized to the
    full-patch case, all-jnp).  Returns (alpha [h,w,1], update [h,w])."""
    h, w = mask_window.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    # Clamp so the dirty interior never vanishes for small blend windows.
    m = min(blend_margin + crop_margin, h // 4)
    blend_margin = max(min(blend_margin, h // 4), 1)
    lo = m
    hi_r = h - m
    hi_c = w - m
    # Distance-based ramp from the interior dirty area to the borders.
    d_r = jnp.minimum(ys - lo, hi_r - 1 - ys)
    d_c = jnp.minimum(xs - lo, hi_c - 1 - xs)
    d = jnp.minimum(d_r, d_c)
    ramp = jnp.clip(1.0 + d / blend_margin, 0.0, 1.0)  # 1 inside, ->0 at edge
    # Keep stored features where they exist and we are near the border.
    alpha = (1.0 - ramp) * mask_window
    update = jnp.maximum(ramp > 0.99, mask_window * (alpha > 0))
    if crop_margin > 0:
        border = jnp.zeros((h, w))
        border = border.at[crop_margin:h - crop_margin,
                           crop_margin:w - crop_margin].set(1.0)
        update = update * border
    return alpha[..., None], update


@partial(jax.jit, static_argnames=(
    "gen_cfg", "enc_cfg", "enc_res", "render_mode", "blend_res",
    "blend_margin", "crop_margin"), donate_argnums=(8,))
def render_stroke_step(gen_cfg, enc_cfg, enc_res, render_mode: str,
                       blend_res: int, blend_margin: int, crop_margin: int,
                       bundle_params, canvas: CanvasState,
                       geom_patch, position, z, ws,
                       color_override, color_mask):
    """One interactive stroke: returns (rgba [1,W,W,4], new CanvasState).

    Args:
      bundle_params: (gen_params, gen_state, enc_params, enc_state).
      geom_patch: [1, W, W, 1] float, 1 = background.
      position: [2] int (y, x) canvas coords (multiple of down factor).
      z / ws: style (exactly one non-None).
      color_override/color_mask: optional user colors ([1,3,3] / [1,1,3]).
    """
    gen_params, gen_state, enc_params, enc_state = bundle_params
    patch = geom_patch.shape[1]
    down = patch // blend_res
    y, x = position[0], position[1]
    fy = y // down
    fx = x // down

    # Read the stored window + mask.
    feats_win = jax.lax.dynamic_slice(
        canvas.features, (0, fy, fx, 0),
        (1, blend_res, blend_res, canvas.features.shape[-1]))
    mask_win = jax.lax.dynamic_slice(canvas.mask, (fy, fx),
                                     (blend_res, blend_res))

    alpha, update = _blend_alpha(mask_win, max(blend_margin // down, 1),
                                 crop_margin // down)

    geom_feats = geo_encoder_encode(enc_cfg, enc_params, enc_state,
                                    geom_patch, res=list(enc_res))
    img, debug, _ = generator_apply(
        gen_cfg, gen_params, gen_state, z=z, ws=ws,
        geom_features=geom_feats, positions=position[None],
        noise_mode="const", return_debug_data=True,
        return_features=(blend_res,),
        blended_features={blend_res: (feats_win, alpha[None])})

    uvs = debug["uvs"]
    colors = (debug["colors"] + 1.0) / 2.0
    if color_override is not None:
        colors = color_mask * color_override + (1 - color_mask) * colors
    stroke = jnp.einsum("bhwk,bck->bhwc", uvs, colors)
    if render_mode == "clear":
        a = jnp.sum(uvs[..., :2], axis=-1, keepdims=True)
    else:
        a = jnp.ones_like(stroke[..., :1])
    rgba = jnp.concatenate([stroke, a], axis=-1)

    # Write back features where update is set.
    new_feats = debug[f"features{blend_res}"].astype(canvas.features.dtype)
    upd = update[None, :, :, None]
    merged = feats_win * (1 - upd) + new_feats * upd
    features = jax.lax.dynamic_update_slice(canvas.features, merged,
                                            (0, fy, fx, 0))
    mask = jax.lax.dynamic_update_slice(
        canvas.mask, jnp.maximum(mask_win, update), (fy, fx))
    return rgba, CanvasState(features=features, mask=mask)


@partial(jax.jit, static_argnames=(
    "gen_cfg", "enc_cfg", "enc_res", "render_mode", "blend_res",
    "blend_margin", "crop_margin", "quant_scales"), donate_argnums=(8,))
def render_stroke_packed(gen_cfg, enc_cfg, enc_res, render_mode: str,
                         blend_res: int, blend_margin: int, crop_margin: int,
                         bundle_params, canvas: CanvasState,
                         packed, z, ws, color_override, color_mask,
                         quant_scales=None):
    """:func:`render_stroke_step` behind a single-upload request layout.

    ``packed`` is one float32 vector ``[pw*pw + 2]``: the geometry patch
    followed by (y, x).  Interactive serving dispatches through a network
    tunnel in this dev environment (and potentially a NUMA hop in
    production); every separate host->device transfer costs a round trip,
    so the whole per-stroke request rides ONE upload and the RGBA response
    returns as uint8 (4x smaller readback, and the clip/scale runs on
    device instead of the serving host).
    """
    pw = int(round((packed.shape[0] - 2) ** 0.5))
    geom_patch = packed[:pw * pw].reshape(1, pw, pw, 1)
    position = packed[pw * pw:].astype(jnp.int32)
    # quant_scales is STATIC: int8-vs-bf16 must be part of the jit cache
    # key (see engine/render.py:render_core).
    from brushstroke_engine_tpu.ops import quant
    with quant.static_ctx(quant_scales):
        rgba, new_canvas = render_stroke_step.__wrapped__(
            gen_cfg, enc_cfg, enc_res, render_mode, blend_res, blend_margin,
            crop_margin, bundle_params, canvas, geom_patch, position, z, ws,
            color_override, color_mask)
    # Unbatched uint8 out: the caller downloads this array as-is.  Indexing
    # or converting on the host would dispatch extra device programs and --
    # on remote/tunneled backends -- force materialization of the big
    # sibling canvas output, which must never leave the device.
    rgba_u8 = jnp.clip(rgba[0] * 255.0, 0, 255).astype(jnp.uint8)
    return rgba_u8, new_canvas


class PoolState(NamedTuple):
    """S stacked session canvases: [S, H/d, W/d, C] features + [S, H/d, W/d]
    mask.  Slot S-1 is a scratch canvas that absorbs batch-padding writes."""
    features: jnp.ndarray
    mask: jnp.ndarray


@partial(jax.jit, static_argnames=(
    "gen_cfg", "enc_cfg", "enc_res", "render_mode", "blend_res",
    "blend_margin", "crop_margin", "quant_scales"), donate_argnums=(8,))
def render_strokes_pool(gen_cfg, enc_cfg, enc_res, render_mode: str,
                        blend_res: int, blend_margin: int, crop_margin: int,
                        bundle_params, pool: PoolState, slots, alpha_u8,
                        pos, z, ws, color_override, color_mask,
                        quant_scales=None):
    """N concurrent sessions' strokes in ONE device program.

    The round-4 serving artifact failed the 30 ms SLO 6x over at 8 sessions
    because every device-canvas stroke was its own dispatch (~1 tunnel round
    trip each, serialized by chip contention).  This program batches the hot
    path — geometry encode + generator synthesis — across sessions on the
    MXU, with each session's canvas window gathered from / scattered back to
    its slot of the shared pool, so a flush window of N strokes costs one
    upload + one dispatch + one download instead of N.

    Args:
      pool: donated PoolState (all sessions' canvases stacked on HBM).
      slots: [N] int32 pool rows; real requests use distinct slots, padding
        rows point at the scratch slot (last row) so their write-back is
        harmless.
      alpha_u8: [N, pw*pw] uint8 — the raw stroke alpha masks exactly as
        they arrive on the wire.  The float conversion/inversion
        (prepare_geom_input semantics, reference brush.py:672-681) runs on
        DEVICE: the serving host->device link is the latency/bandwidth
        bottleneck (dev tunnel ~20 MB/s; measured 8-stroke f32 uploads cost
        ~100 ms/flush), so the request crosses it at 1 byte/px, not 4.
      pos: [N, 2] int32 — per-request (y, x) canvas coords.
      z / ws: [N, z_dim] or [N, num_ws, w_dim]; exactly one non-None.
      color_override / color_mask: [N, 3, 3] / [N, 1, 3] (zero mask = no-op).

    Returns (rgba_u8 [N, pw, pw, 4], new PoolState).
    """
    # quant_scales is STATIC: int8-vs-bf16 must be part of the jit cache
    # key (see engine/render.py:render_core); the context is read by the
    # synthesis convs at trace time.
    from brushstroke_engine_tpu.ops import quant
    with quant.static_ctx(quant_scales):
        return _render_strokes_pool_body(
            gen_cfg, enc_cfg, enc_res, render_mode, blend_res, blend_margin,
            crop_margin, bundle_params, pool, slots, alpha_u8, pos, z, ws,
            color_override, color_mask)


def _render_strokes_pool_body(gen_cfg, enc_cfg, enc_res, render_mode,
                              blend_res, blend_margin, crop_margin,
                              bundle_params, pool, slots, alpha_u8,
                              pos, z, ws, color_override, color_mask):
    gen_params, gen_state, enc_params, enc_state = bundle_params
    n = alpha_u8.shape[0]
    pw = int(round(alpha_u8.shape[1] ** 0.5))
    # prepare_geom_input on device: 0 = FG stroke, 1 = BG.
    geom = 1.0 - (alpha_u8.reshape(n, pw, pw, 1).astype(jnp.float32)
                  / 255.0)
    position = pos.astype(jnp.int32)
    down = pw // blend_res
    fy = position[:, 0] // down
    fx = position[:, 1] // down
    ch = pool.features.shape[-1]

    # Gather each session's stored window from its pool slot.
    feats_win = jax.vmap(lambda s, y, x: jax.lax.dynamic_slice(
        pool.features, (s, y, x, 0), (1, blend_res, blend_res, ch))[0])(
        slots, fy, fx)
    mask_win = jax.vmap(lambda s, y, x: jax.lax.dynamic_slice(
        pool.mask, (s, y, x), (1, blend_res, blend_res))[0])(slots, fy, fx)

    alpha, update = jax.vmap(
        lambda m: _blend_alpha(m, max(blend_margin // down, 1),
                               crop_margin // down))(mask_win)

    # The MXU win: ONE batched encode + synthesis for all sessions.
    geom_feats = geo_encoder_encode(enc_cfg, enc_params, enc_state,
                                    geom, res=list(enc_res))
    img, debug, _ = generator_apply(
        gen_cfg, gen_params, gen_state, z=z, ws=ws,
        geom_features=geom_feats, positions=position,
        noise_mode="const", return_debug_data=True,
        return_features=(blend_res,),
        blended_features={blend_res: (feats_win, alpha)})

    uvs = debug["uvs"]
    colors = (debug["colors"] + 1.0) / 2.0
    colors = color_mask * color_override + (1 - color_mask) * colors
    stroke = jnp.einsum("bhwk,bck->bhwc", uvs, colors)
    if render_mode == "clear":
        a = jnp.sum(uvs[..., :2], axis=-1, keepdims=True)
    else:
        a = jnp.ones_like(stroke[..., :1])
    rgba = jnp.concatenate([stroke, a], axis=-1)
    rgba_u8 = jnp.clip(rgba * 255.0, 0, 255).astype(jnp.uint8)

    # Write back: sessions hold distinct slots, so windows are disjoint in
    # the slot dimension and a sequential scan of small dynamic updates is
    # exact (scatter order only matters for scratch-slot padding rows, whose
    # content is never read: a fresh canvas zeroes its slot mask).
    new_feats = debug[f"features{blend_res}"].astype(pool.features.dtype)
    upd = update[:, :, :, None]
    merged = feats_win * (1 - upd) + new_feats * upd
    new_mask_win = jnp.maximum(mask_win, update)

    def write(carry, item):
        feats, mask = carry
        s, y, x, mrg, mwin = item
        feats = jax.lax.dynamic_update_slice(feats, mrg[None], (s, y, x, 0))
        mask = jax.lax.dynamic_update_slice(mask, mwin[None], (s, y, x))
        return (feats, mask), None

    (features, mask), _ = jax.lax.scan(
        write, (pool.features, pool.mask),
        (slots, fy, fx, merged, new_mask_win))
    return rgba_u8, PoolState(features=features, mask=mask)


class DeviceCanvasPool:
    """Slot allocator over one stacked on-device canvas (PoolState).

    Sessions that share a canvas configuration (shape, blending level, crop)
    draw from one pool; a cross-session flush renders all their pending
    strokes through :func:`render_strokes_pool` as one dispatch.  The last
    slot is reserved as scratch for batch padding.
    """

    BUCKETS = (1, 2, 4, 8, 16)

    def __init__(self, engine, canvas_height: int, canvas_width: int,
                 feature_blending_level: int = 2, blend_margin: int = 16,
                 crop_margin: int = 0, capacity: int = 8):
        self.engine = engine
        self.level = feature_blending_level
        self.down = 2 ** (feature_blending_level - 1)
        self.blend_res = engine.patch_width // self.down
        self.blend_margin = blend_margin
        self.crop_margin = crop_margin
        self.canvas_shape = (canvas_height, canvas_width)
        self.channels = engine.gen_cfg.synthesis.channels(self.blend_res)
        self._params = (engine.gen_params, engine.gen_state,
                        engine.enc_params, engine.enc_state)
        self._free = list(range(capacity))
        self._capacity = capacity
        from brushstroke_engine_tpu.utils.util import commit_to_default_device
        h = -(-canvas_height // self.down)
        w = -(-canvas_width // self.down)
        self.state = commit_to_default_device(PoolState(
            features=jnp.zeros((capacity + 1, h, w, self.channels),
                               jnp.float32),
            mask=jnp.zeros((capacity + 1, h, w), jnp.float32)))

    @property
    def scratch_slot(self) -> int:
        return self.state.mask.shape[0] - 1

    def acquire(self) -> int:
        """Claim a slot (fresh canvas: its mask is zeroed); grows the pool
        by doubling when exhausted (one reallocation + retrace)."""
        if not self._free:
            old = self.state
            grow = self._capacity
            self._capacity *= 2
            self._free = list(range(grow, self._capacity))
            # Keep the scratch slot last: old scratch row becomes a regular
            # slot (it is zeroed on acquire like any fresh canvas).
            self.state = PoolState(
                features=jnp.concatenate(
                    [old.features,
                     jnp.zeros((grow,) + old.features.shape[1:],
                               old.features.dtype)]),
                mask=jnp.concatenate(
                    [old.mask, jnp.zeros((grow,) + old.mask.shape[1:],
                                         old.mask.dtype)]))
        slot = self._free.pop(0)
        self.reset_slot(slot)
        return slot

    def reset_slot(self, slot: int):
        """New canvas for a session: invalidate its stored features."""
        self.state = PoolState(
            features=self.state.features,
            mask=self.state.mask.at[slot].set(0.0))

    def release(self, slot: int):
        if slot not in self._free:
            self._free.append(slot)

    def render_batch(self, requests):
        """Render N sessions' strokes as one dispatch.

        Args:
          requests: list of dicts with keys ``slot`` (int), ``geom``
            (flattened uint8 alpha mask [pw*pw], straight off the wire —
            the float inversion runs on device), ``x``, ``y`` (canvas ints,
            already down-aligned by the caller or aligned here), and
            ``opts`` (GanBrushOptions; rows must share style kind — all-z
            or all-ws).

        Returns ``(rgba_u8 device array [bucket, pw, pw, 4], metas list of
        n)``: materialize with ONE ``np.asarray(rgba)`` for the whole batch
        (slicing device rows individually would dispatch extra programs),
        then slice rows [:n] host-side.  ``crop_margin`` cropping is the
        caller's job (host-side, after download).
        """
        eng = self.engine
        n = len(requests)
        bucket = next((b for b in self.BUCKETS if b >= n), n)
        use_ws = requests[0]["opts"].style_ws is not None

        alpha_rows, pos_rows, style_rows = [], [], []
        override = np.zeros((bucket, 3, 3), np.float32)
        cmask = np.zeros((bucket, 1, 3), np.float32)
        slots, metas = [], []
        for i, req in enumerate(requests):
            o = req["opts"]
            o.prepare_style(1)
            assert (o.style_ws is not None) == use_ws, \
                "mixed z/ws rows in a pooled render batch"
            x = (int(req["x"]) // self.down) * self.down
            y = (int(req["y"]) // self.down) * self.down
            alpha_rows.append(np.asarray(req["geom"], np.uint8))
            pos_rows.append((y, x))
            style_rows.append(o.style_ws[0] if use_ws else o.style_z[0])
            ov, mk = o.color_override(1)
            if ov is not None:
                override[i] = ov[0]
                cmask[i, 0] = mk[0, 0]
            slots.append(int(req["slot"]))
            metas.append({"x": x + self.crop_margin,
                          "y": y + self.crop_margin})
        for _ in range(bucket - n):
            alpha_rows.append(alpha_rows[-1])
            pos_rows.append(pos_rows[-1])
            style_rows.append(style_rows[-1])
            slots.append(self.scratch_slot)

        alpha = jnp.asarray(np.stack(alpha_rows))
        pos = jnp.asarray(np.asarray(pos_rows, np.int32))
        style = jnp.asarray(np.stack(style_rows).astype(np.float32))
        slots_arr = jnp.asarray(np.asarray(slots, np.int32))
        rgba, self.state = render_strokes_pool(
            eng.gen_cfg, eng.enc_cfg, tuple(eng.enc_res), eng.render_mode,
            self.blend_res, self.blend_margin, self.crop_margin,
            self._params, self.state, slots_arr, alpha, pos,
            None if use_ws else style, style if use_ws else None,
            jnp.asarray(override), jnp.asarray(cmask),
            quant_scales=eng._quant_key())
        return rgba, metas


class DevicePaintSession:
    """Stateful wrapper: an interactive painting session whose feature canvas
    never leaves the device.  API mirrors PaintingHelper.render_stroke for
    full patches."""

    def __init__(self, engine, canvas_height: int, canvas_width: int,
                 feature_blending_level: int = 2, blend_margin: int = 16,
                 crop_margin: int = 0):
        self.engine = engine
        self.level = feature_blending_level
        self.down = 2 ** (feature_blending_level - 1)
        self.blend_res = engine.patch_width // self.down
        self.blend_margin = blend_margin
        self.crop_margin = crop_margin
        ch = engine.gen_cfg.synthesis.channels(self.blend_res)
        # Commit the fresh canvas like the (committed) weight trees: the
        # first stroke's jit output is committed, so an uncommitted zeros
        # canvas would make call 1 compile a second executable variant.
        from brushstroke_engine_tpu.utils.util import commit_to_default_device
        self.canvas = commit_to_default_device(
            init_canvas_state(canvas_height, canvas_width, self.down, ch))
        self._params = (engine.gen_params, engine.gen_state,
                        engine.enc_params, engine.enc_state)
        # Device-resident copies of the style tensors (z/ws/color override):
        # they change on set_brush, not per stroke, so re-uploading them per
        # stroke would add avoidable host->device round trips.
        self._style_host = None
        self._style_dev = (None, None, None, None)

    def _style_arrays(self, opts):
        opts.prepare_style(1)
        override, cmask = opts.color_override(1)
        host = tuple(None if a is None else np.asarray(a, np.float32)
                     for a in (opts.style_z, opts.style_ws, override, cmask))
        if self._style_host is not None and all(
                (a is None) == (b is None)
                and (a is None or np.array_equal(a, b))
                for a, b in zip(host, self._style_host)):
            return self._style_dev
        self._style_host = host
        self._style_dev = tuple(None if a is None else jnp.asarray(a)
                                for a in host)
        return self._style_dev

    def render_stroke_dispatch(self, stroke_patch: np.ndarray, opts,
                               x: int, y: int):
        """Enqueue one stroke; returns (device rgba array, out meta).

        The canvas state advances immediately (as a device future), so the
        session's next stroke can be dispatched before this one's pixels
        reach the host.  Materialize the result with :meth:`fetch` — from a
        worker thread if the caller (e.g. the tornado server) must keep
        serving other sessions while the download round-trip is in flight.
        """
        eng = self.engine
        geom = np.asarray(eng.prepare_geom_input(stroke_patch),
                          np.float32).ravel()
        x = (x // self.down) * self.down
        y = (y // self.down) * self.down
        packed = jnp.asarray(np.concatenate(
            [geom, np.asarray([y, x], np.float32)]))
        z, ws, override, cmask = self._style_arrays(opts)
        rgba, self.canvas = render_stroke_packed(
            eng.gen_cfg, eng.enc_cfg, tuple(eng.enc_res),
            eng.render_mode, self.blend_res, self.blend_margin,
            self.crop_margin, self._params, self.canvas, packed, z, ws,
            override, cmask, quant_scales=eng._quant_key())
        return rgba, {"x": x + self.crop_margin, "y": y + self.crop_margin}

    def fetch(self, rgba) -> np.ndarray:
        """Download one dispatched stroke's uint8 RGBA (blocks on the
        device->host transfer; safe to call off-thread)."""
        img = np.asarray(rgba)
        if self.crop_margin > 0:
            m = self.crop_margin
            img = img[m:-m, m:-m]
        return img

    def render_stroke(self, stroke_patch: np.ndarray, opts,
                      x: int, y: int):
        """stroke_patch: uint8 [W, W, 4]; returns uint8 RGBA + out meta."""
        rgba, meta = self.render_stroke_dispatch(stroke_patch, opts, x, y)
        return self.fetch(rgba), meta
