"""Per-style background-clarity ("UVS") mapping and brush icons.

Rebuild of the reference StyleUVSMapper (forger/ui/mapper.py:16-136): for a
style, render 5 curated medium-thickness geometry patches, measure the 15th-
smallest background S value over known-background pixels (from the thick
variants), and derive ``sfactor = 1 / val``.  At render time
``S' = clamp(sfactor * S)`` with U,V rescaled (see render.map_uvs_s).

Curated geometry is generated procedurally (data/curated_geometry.py) rather
than loaded from bundled image assets.
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

from brushstroke_engine_tpu.data.curated_geometry import (
    curated_geometry_batch, MAPPER_SHAPES, MAPPER_MED_RADIUS,
    MAPPER_THICK_RADIUS,
)
from brushstroke_engine_tpu.engine.render import sfactor_core

logger = logging.getLogger(__name__)


class StyleUVSMapper:
    TOP_K = 15

    def __init__(self, engine=None):
        self.sfactors = {}
        self.engine = engine
        self._geom_med = None
        self._bmask = None
        self._fmask = None

    def _init_geometry(self):
        width = self.engine.patch_width
        med = curated_geometry_batch(MAPPER_SHAPES, MAPPER_MED_RADIUS, width)
        thick = curated_geometry_batch(MAPPER_SHAPES, MAPPER_THICK_RADIUS,
                                       width)
        self._geom_med = jnp.asarray(med[..., None])        # [5, W, W, 1]
        self._fmask = med < 0.01                            # stroke pixels
        self._bmask = jnp.asarray(thick > 0.99)             # certain background

    def get_sfactor(self, brush_opts) -> float:
        style_id = brush_opts.style_id
        if style_id in self.sfactors:
            return self.sfactors[style_id]
        if self._geom_med is None:
            self._init_geometry()
        logger.info(f"Computing clear background mapping of style {style_id}")
        e = self.engine
        sfactor = float(sfactor_core(
            e.gen_cfg, e.enc_cfg, e.enc_res, self.TOP_K,
            e.gen_params, e.gen_state, e.enc_params, e.enc_state,
            self._geom_med, self._bmask,
            None if brush_opts.style_z is None
            else jnp.asarray(brush_opts.style_z[:1], jnp.float32),
            None if brush_opts.style_ws is None
            else jnp.asarray(brush_opts.style_ws[:1], jnp.float32)))
        self.sfactors[style_id] = sfactor
        return sfactor

    def map_style(self, brush_opts, uvs, colors):
        """Host-side remap (the jitted core usually does this on-device)."""
        from brushstroke_engine_tpu.engine.render import map_uvs_s
        sfactor = self.get_sfactor(brush_opts)
        return np.asarray(map_uvs_s(jnp.asarray(uvs), sfactor)), colors

    # ----- icons / color chips (reference mapper.py:96-115) -----

    def _render_single(self, brush_opts):
        if self._geom_med is None:
            self._init_geometry()
        geom = np.asarray(self._geom_med[:1])
        out = self.engine._run_core(geom, brush_opts)
        return out

    def get_colors_raw(self, brush_opts):
        out = self._render_single(brush_opts)
        # colors in render core output are already normalized to [0,1].
        return np.asarray(out["colors"]) * 2.0 - 1.0

    def get_colors(self, brush_opts) -> str:
        colors = ((self.get_colors_raw(brush_opts)[0] / 2 + 0.5) * 255)
        colors = colors.astype(np.uint8)
        return ":".join(
            "rgb(%s)" % ",".join(str(int(x)) for x in colors[..., i])
            for i in range(3))

    def get_brush_icon(self, brush_opts, on_white: bool = True) -> np.ndarray:
        logger.info(f"Rendering icon for style {brush_opts.style_id}")
        out = self._render_single(brush_opts)
        render = np.asarray(out["raw_img"][0])     # [W, W, 3] in [-1, 1]
        if on_white:
            s = np.asarray(out["uvs"][0, ..., 2:3])
            render = render * (1 - s) + s
        return np.clip((render / 2 + 0.5) * 255, 0, 255).astype(np.uint8)
