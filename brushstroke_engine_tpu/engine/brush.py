"""Paint engines: GAN-backed stroke renderers with user color control.

API-compatible rebuild of the reference engines
(reference: forger/ui/brush.py:410-1096 -- GanBrushOptions, PaintEngine,
PaintEngineFactory, TriadGanPaintEngine, CanvasPaintEngine, MockPaintEngine).
The numeric path lives in the single jitted :mod:`render` core; these classes
are thin host-side wrappers handling uint8 <-> device conversion, brush
state, and checkpoint loading.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from brushstroke_engine_tpu.engine.render import render_core
from brushstroke_engine_tpu.models.generator import GeneratorConfig
from brushstroke_engine_tpu.models.geo_encoder import GeoEncoderConfig

logger = logging.getLogger(__name__)


def _prep_color(x):
    """uint8 [0..255] or float [0..1], [3] or [B,3] -> float32 [B,3]."""
    if x is None:
        return None
    c = np.asarray(x)
    if c.dtype == np.uint8:
        c = c.astype(np.float32) / 255.0
    else:
        c = c.astype(np.float32)
    if c.ndim == 1:
        c = c[None]
    return c


class GanBrushOptions:
    """Brush state: style (z or W + noise buffers), user colors, position,
    debug flags (reference brush.py:410-527)."""

    def __init__(self, primary_color=None, secondary_color=None, debug=False):
        self.color0 = _prep_color(primary_color)
        self.color1 = _prep_color(secondary_color)
        self.canvas_color = None
        self.style_z = None
        self.style_id = None
        self.library_id = ""
        self.style_ws = None
        # compat note: the reference stores opts.opacity (brush.py:425) but
        # never reads it anywhere in the render path; we drop the dead field.
        self.debug = debug
        self.position = None          # [B, 2] int64 (y, x)
        self.custom_args: Dict = {}
        self.enable_uvs_mapping = False

    def set_position(self, x, y):
        if np.isscalar(x):
            self.position = np.asarray([[y, x]], np.int64)
        else:
            self.position = np.stack([np.asarray(y), np.asarray(x)],
                                     axis=1).astype(np.int64)

    def get_position(self):
        return self.position

    def set_color(self, color_idx: int, in_color):
        if color_idx == 0:
            self.color0 = _prep_color(in_color)
        elif color_idx == 1:
            self.color1 = _prep_color(in_color)
        elif color_idx == 2:
            self.canvas_color = _prep_color(in_color)
        else:
            logger.error(f"Wrong color idx {color_idx}")

    def set_style(self, style_z, style_id=None):
        self.style_z = None if style_z is None else np.asarray(style_z)
        self.style_id = style_id
        self.style_ws = None

    def set_style_w(self, style_w, style_id=None, custom_args=None):
        self.style_ws = None if style_w is None else np.asarray(style_w)
        self.style_id = style_id
        self.style_z = None
        self.custom_args = dict(custom_args) if custom_args else {}

    def prepare_style(self, batch_size: int):
        def prep(x):
            if x is None:
                return None
            if x.shape[0] != batch_size:
                if x.shape[0] != 1:
                    # Previously broadcast to another batch size: styles are
                    # per-brush (identical rows), so re-broadcast from row 0.
                    x = x[:1]
                reps = (batch_size,) + (1,) * (x.ndim - 1)
                return np.tile(x, reps)
            return x
        self.style_z = prep(self.style_z)
        self.style_ws = prep(self.style_ws)

    def color_override(self, batch_size: int):
        """Returns (override [B,3,3], mask [1,1,3]) or (None, None)."""
        if self.color0 is None and self.color1 is None \
                and self.canvas_color is None:
            return None, None
        override = np.zeros((batch_size, 3, 3), np.float32)
        mask = np.zeros((1, 1, 3), np.float32)
        for idx, col in enumerate([self.color0, self.color1,
                                   self.canvas_color]):
            if col is not None:
                override[:, :, idx] = col
                mask[0, 0, idx] = 1.0
        return override, mask

    def prepare_colors(self, default_colors):
        """[B,3,3] defaults -> colors with user overrides applied (host)."""
        out = np.array(default_colors, np.float32)
        override, mask = self.color_override(out.shape[0])
        if override is None:
            return out
        return mask * override + (1 - mask) * out


class PaintEngine:
    """Base interface (reference brush.py:530-548)."""

    # True for engines with a jit device core (_render_stroke_jax /
    # render_batch); PaintingHelper routes through prepare_render for those
    # and plain render_stroke otherwise (replaces a hasattr check).
    supports_device_render = False

    def __init__(self):
        self.patch_width = 0

    def render_stroke(self, stroke_patch, canvas_patch, opts,
                      **generator_kwargs):
        raise NotImplementedError

    def random_style(self, seed):
        return None

    def summary(self):
        raise NotImplementedError


class GanPaintEngine(PaintEngine):
    """GAN-backed engine core shared by triad/canvas variants.

    Holds the generator + frozen geometry encoder parameter trees and calls
    the jitted render core.
    """

    supports_device_render = True
    color_format = "triad"

    def __init__(self, gen_cfg: GeneratorConfig, gen_params, gen_state,
                 enc_cfg: GeoEncoderConfig, enc_params, enc_state,
                 geom_inject_resolutions=(0,),
                 gan_checkpoint: str = "", encoder_checkpoint: str = ""):
        super().__init__()
        import jax

        self.gen_cfg = gen_cfg
        # Commit the weight trees to the device ONCE.  Checkpoint loading
        # yields host numpy leaves; leaving them in the tree makes every
        # render dispatch re-stage the full weight set host->device (~390 ms
        # per stroke measured over the dev tunnel vs ~10 ms with resident
        # weights -- and a hidden per-call PCIe copy even when co-located).
        # commit_to_default_device also rescues CPU-committed trees (e.g.
        # bundles built under jax.default_device(cpu)), which a bare
        # device_put would silently leave on the host.
        from brushstroke_engine_tpu.utils.util import commit_to_default_device
        self.gen_params, self.gen_state, self.enc_params, self.enc_state = \
            commit_to_default_device(
                (gen_params, gen_state, enc_params, enc_state))
        self.enc_cfg = enc_cfg
        self.enc_res = tuple(geom_inject_resolutions)
        self.gan_checkpoint = gan_checkpoint
        self.encoder_checkpoint = encoder_checkpoint
        self.patch_width = gen_cfg.img_resolution
        self.render_modes = {"clear", "full"}
        self.render_mode = "clear"

        # Multi-chip serving: when set, render_batch shards the request
        # batch over this 1-axis mesh (see set_serving_mesh).
        self.serving_mesh = None
        self._mesh_params = None
        # Static-PTQ int8 serving (enable_int8_serving): per-call-site
        # activation scales baked into subsequent render traces.
        self._int8_scales = None

        # Imported lazily to avoid a cycle (mapper renders via this engine).
        from brushstroke_engine_tpu.engine.mapper import StyleUVSMapper
        self.uvs_mapper = StyleUVSMapper(self)

    def enable_int8_serving(self, calib_batch: int = 4, seed: int = 0):
        """Static-calibration int8 PTQ for the serving path (opt-in).

        Runs ONE eager calibration render on representative stroke
        geometry (diagonal strokes, ``calib_batch`` random styles),
        records each stride-1 conv's activation amax, and bakes the
        resulting scales as constants into every subsequent render trace
        — the synthesis stack then runs on the double-rate int8 MXU with
        NO per-conv amax pass (measured 30.7 -> 23.8 ms for the 256px
        B=128 synthesis block, scripts/microbench_render_parts.py
        --int8_static; quality gates in tests/test_quant.py, PSNR>25 dB).
        Inference-only; call BEFORE warmup so the warmed programs carry
        the scales."""
        from brushstroke_engine_tpu.ops import quant
        w = self.patch_width
        rng = np.random.RandomState(seed)

        def stroke_geom(kind):
            patch = np.zeros((w, w, 4), np.uint8)
            if kind == 0:        # diagonal stroke
                for i in range(w):
                    patch[max(0, i - 4):i + 4, i, 3] = 255
            elif kind == 1:      # fat blob
                patch[w // 4:-w // 4, w // 4:-w // 4, 3] = 255
            else:                # empty canvas
                pass
            return self.prepare_geom_input(patch)

        # Per-site max over several (geometry, style) pairs, plus
        # headroom: static per-tensor scales must cover activations the
        # calibration didn't see, or out-of-range values clip.
        #
        # Calibration runs EAGERLY (eager_calibrate disables jit), and
        # eager dispatch follows operand placement — against a remote /
        # tunneled accelerator every one of the ~1e3 ops in a render pays
        # the link round trip, turning one calibration pass into minutes
        # (measured: paint_image --int8 static never finished inside 10
        # min over the dev tunnel).  The scales are per-site amax floats,
        # so run the passes on the host CPU backend against temporary CPU
        # copies of the weight trees (f32 on CPU vs bf16-grade 'fast'
        # serving passes: equivalent within bf16 rounding, covered by the
        # 1.25x headroom below — do not shrink the headroom on the
        # assumption of exact amax equality).  The CPU trees are passed
        # into the render core explicitly (params override) so engine
        # state is never rebound: a render dispatched concurrently from a
        # server executor thread keeps using the device-resident trees.
        import jax
        cpu = jax.devices("cpu")[0]
        cpu_trees = jax.device_put(
            (self.gen_params, self.gen_state,
             self.enc_params, self.enc_state), cpu)
        per_pass = []
        with jax.default_device(cpu):
            for k in range(max(calib_batch, 1)):
                geom = stroke_geom(k % 3)
                opts = GanBrushOptions()
                opts.set_style(rng.randn(1, self.gen_cfg.z_dim))
                per_pass.append(quant.eager_calibrate(
                    self._run_core, jnp.asarray(geom), opts,
                    params_override=cpu_trees))
        headroom = 1.25
        self._int8_scales = [headroom * max(s[i] for s in per_pass)
                             for i in range(len(per_pass[0]))]
        return self._int8_scales

    def _quant_key(self):
        """Static jit-cache key for int8 serving: a hashable scales tuple
        (None = bf16).  Passed as a STATIC argument so enabling/disabling
        int8 retraces instead of silently reusing the other executable."""
        if not self._int8_scales:
            return None
        return tuple(self._int8_scales)

    def set_serving_mesh(self, mesh):
        """Shard batched serving renders over a 1-axis ``jax.sharding.Mesh``
        (data parallelism over the cross-session request batch: with N
        chips and M concurrent painters, each chip renders ~M/N patches
        per flush).  Parameters are replicated across the mesh once and
        cached.  Pass ``None`` to restore single-device dispatch."""
        self.serving_mesh = mesh
        self._mesh_params = None

    def set_render_mode(self, mode):
        if mode not in self.render_modes:
            raise RuntimeError(f"Render mode should be one of "
                               f"{self.render_modes}")
        self.render_mode = mode

    def summary(self):
        return "{} GAN: {} encoder: {}".format(
            type(self).__name__, self.gan_checkpoint,
            self.encoder_checkpoint)

    def random_style(self, seed):
        # Bit-compatible with reference brush identities (brush.py:667-670).
        return np.random.RandomState(seed=seed).randn(1, self.gen_cfg.z_dim)

    def prepare_geom_input(self, stroke_patch: np.ndarray) -> np.ndarray:
        """W x W x {1,4} uint8 (opaque 255 = FG) -> [1, W, W, 1] float
        (0 = FG stroke, 1 = BG), reference brush.py:672-681."""
        alpha = stroke_patch[:, :, -1:].astype(np.float32) / 255.0
        return (1.0 - alpha)[None]

    def _run_core(self, geom, opts: GanBrushOptions,
                  blended_features=None, return_features=(),
                  params_override=None):
        b = geom.shape[0]
        opts.prepare_style(b)
        override, mask = opts.color_override(b)
        sfactor = None
        if opts.enable_uvs_mapping:
            sfactor = self.uvs_mapper.get_sfactor(opts)
        positions = opts.get_position()
        noise_buffers = opts.custom_args.get("noise_buffers") or None
        if noise_buffers is not None:
            noise_buffers = {k: jnp.asarray(np.asarray(v).reshape(
                np.asarray(v).shape[-2:])) for k, v in noise_buffers.items()}
        gp, gs, ep, es = params_override if params_override is not None \
            else (self.gen_params, self.gen_state,
                  self.enc_params, self.enc_state)
        out = render_core(
            self.gen_cfg, self.enc_cfg, self.enc_res, self.render_mode,
            tuple(return_features), self.color_format,
            gp, gs, ep, es,
            jnp.asarray(geom),
            None if opts.style_z is None else jnp.asarray(opts.style_z,
                                                          jnp.float32),
            None if opts.style_ws is None else jnp.asarray(
                opts.style_ws, jnp.float32),
            None if positions is None else jnp.asarray(positions),
            noise_buffers,
            None if override is None else jnp.asarray(override),
            None if mask is None else jnp.asarray(mask),
            blended_features,
            None if sfactor is None else jnp.asarray(sfactor, jnp.float32),
            quant_scales=self._quant_key())
        return out

    def render_batch(self, geoms, opts_list, blended_features=None,
                     return_features=()):
        """Render B independent single-patch requests as ONE device call
        (cross-session micro-batching for the serving path; beyond the
        reference, whose engine renders one request at a time).

        Args:
          geoms: ``[B, W, W, 1]`` float geometry rows.
          opts_list: B GanBrushOptions; all rows must share style kind
            (all-z or all-ws), position presence, and must not use stored
            noise buffers or UVS mapping (the server groups accordingly).
          blended_features: {res: (feats [B,R,R,C], alpha [B,R,R,1])} or
            None; rows without stored features use alpha=0.

        Returns the raw render-core output dict ('rgba' [B,W,W,4], ...).
        """
        b = geoms.shape[0]
        use_ws = opts_list[0].style_ws is not None
        z = ws = None
        rows = []
        for o in opts_list:
            o.prepare_style(1)
            assert (o.style_ws is not None) == use_ws, \
                "mixed z/ws rows in a render batch"
            assert not o.custom_args.get("noise_buffers"), \
                "stored-noise brushes cannot batch"
            assert not o.enable_uvs_mapping, "uvs-mapped rows cannot batch"
            rows.append(o.style_ws[0] if use_ws else o.style_z[0])
        style = np.stack(rows).astype(np.float32)
        if use_ws:
            ws = style
        else:
            z = style

        has_pos = opts_list[0].get_position() is not None
        positions = None
        if has_pos:
            positions = np.concatenate(
                [np.asarray(o.get_position())[:1] for o in opts_list])

        # Always pass override+mask (zero mask = no-op): one compiled
        # program regardless of which rows carry user colors.
        override = np.zeros((b, 3, 3), np.float32)
        mask = np.zeros((b, 1, 3), np.float32)
        for i, o in enumerate(opts_list):
            ov, mk = o.color_override(1)
            if ov is not None:
                override[i] = ov[0]
                mask[i, 0] = mk[0, 0]

        gp, gs, ep, es = (self.gen_params, self.gen_state,
                          self.enc_params, self.enc_state)
        to_dev = jnp.asarray
        n_pad = 0
        if self.serving_mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = self.serving_mesh
            axis = mesh.axis_names[0]
            n_pad = (-b) % mesh.shape[axis]
            if n_pad:
                def pad_rows(a):
                    a = np.asarray(a)
                    return np.concatenate(
                        [a, np.repeat(a[-1:], n_pad, axis=0)])

                geoms = pad_rows(geoms)
                style = pad_rows(style)
                ws = style if use_ws else None
                z = None if use_ws else style
                if positions is not None:
                    positions = pad_rows(positions)
                override = pad_rows(override)
                mask = pad_rows(mask)
                if blended_features:
                    blended_features = {
                        r: (pad_rows(f), pad_rows(a))
                        for r, (f, a) in blended_features.items()}
            batch_sh = NamedSharding(mesh, P(axis))
            to_dev = lambda a: jax.device_put(np.asarray(a), batch_sh)
            if self._mesh_params is None:
                self._mesh_params = jax.device_put(
                    (gp, gs, ep, es), NamedSharding(mesh, P()))
            gp, gs, ep, es = self._mesh_params
            if blended_features:
                blended_features = {
                    r: (to_dev(f), to_dev(a))
                    for r, (f, a) in blended_features.items()}

        out = render_core(
            self.gen_cfg, self.enc_cfg, self.enc_res, self.render_mode,
            tuple(return_features), self.color_format,
            gp, gs, ep, es,
            to_dev(geoms),
            None if z is None else to_dev(z),
            None if ws is None else to_dev(ws),
            None if positions is None else to_dev(positions),
            None,
            to_dev(override), to_dev(mask),
            blended_features, None,
            quant_scales=self._quant_key())
        if n_pad:
            out = {k: v[:b] for k, v in out.items()}
        return out

    def _render_stroke_jax(self, geom, canvas, opts, **generator_kwargs):
        """Device-side render; returns (rgba [B,W,W,4] float, raw_out dict,
        debug_img or None).  Equivalent of reference _render_stroke_torch."""
        out = self._run_core(geom, opts,
                             blended_features=generator_kwargs.get(
                                 "blended_features"),
                             return_features=generator_kwargs.get(
                                 "return_features", ()))
        debug_img = None
        if opts.debug:
            debug_img = self._make_debug_image(geom, out)
        return out["rgba"], out, debug_img

    def render_stroke(self, stroke_patch, canvas_patch, opts,
                      **generator_kwargs):
        """uint8 W x W x 4 stroke patch -> (uint8 W x W x 4 RGBA, debug)."""
        geom = self.prepare_geom_input(stroke_patch)[..., None]
        geom = geom.reshape(1, self.patch_width, self.patch_width, 1)
        rgba, _, debug_img = self._render_stroke_jax(geom, canvas_patch, opts,
                                                     **generator_kwargs)
        res = np.asarray(rgba[0])
        res = np.clip(res * 255.0, 0, 255).astype(np.uint8)
        return np.ascontiguousarray(res), debug_img

    def _make_debug_image(self, geom, out):
        """Contact sheet: input geometry | u | v | s | composite
        (compact analog of reference _make_debug_image, brush.py:807-875)."""
        pw = self.patch_width
        margin = 5
        uvs = np.asarray(out["uvs"][0])
        rgba = np.clip(np.asarray(out["rgba"][0]) * 255, 0, 255)
        panels = [np.tile(np.asarray(geom[0]) * 255, (1, 1, 3)),
                  *[np.tile(uvs[..., i:i + 1] * 255, (1, 1, 3))
                    for i in range(3)],
                  rgba[..., :3]]
        sheet = np.zeros((pw, len(panels) * (pw + margin), 4), np.uint8)
        x = 0
        for p in panels:
            sheet[:, x:x + pw, :3] = p.astype(np.uint8)
            sheet[:, x:x + pw, 3] = 255
            x += pw + margin
        return np.ascontiguousarray(sheet)


class TriadGanPaintEngine(GanPaintEngine):
    """Color-triad (UVS) engine: composite = sum_k uvs_k * color_k, alpha =
    U + V in clear mode (reference brush.py:720-805)."""

    color_format = "triad"


class CanvasPaintEngine(GanPaintEngine):
    """Canvas-format engine with extra 'stroke'/'canvas' render modes
    (reference brush.py:878-1064)."""

    color_format = "canvas"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.render_modes.add("stroke")
        self.render_modes.add("canvas")


class MockPaintEngine(PaintEngine):
    """Draws a red frame; lets the server/UI stack run with no checkpoint
    (reference brush.py:1067-1096)."""

    def __init__(self, patch_width):
        super().__init__()
        self.patch_width = patch_width

    def render_stroke(self, stroke_patch, canvas_patch, opts,
                      **generator_kwargs):
        result = np.copy(canvas_patch)
        result[:3, :, 0] = 255
        result[:3, :, -1] = 255
        result[-3:, :, 0] = 255
        result[-3:, :, -1] = 255
        result[:, 0, 0] = 255
        result[:, 0, -1] = 255
        result[:, -3:, 0] = 255
        result[:, -3:, -1] = 255
        return result, None

    def summary(self):
        return "mock engine"


class PaintEngineFactory:
    """Build an engine from checkpoints (reference brush.py:550-604).

    Accepts either native checkpoints (orbax/msgpack directories produced by
    this framework) or converted reference pkls via
    :mod:`brushstroke_engine_tpu.utils.checkpoint`.
    """

    @staticmethod
    def create(gan_checkpoint: Optional[str],
               encoder_checkpoint: Optional[str] = None):
        if gan_checkpoint is None:
            logger.warning("Creating MockPaintEngine")
            return MockPaintEngine(256)
        from brushstroke_engine_tpu.utils import checkpoint as ckpt
        bundle = ckpt.load_engine_bundle(gan_checkpoint, encoder_checkpoint)
        cls = TriadGanPaintEngine if bundle.color_format == "triad" \
            else CanvasPaintEngine
        return cls(bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
                   bundle.enc_cfg, bundle.enc_params, bundle.enc_state,
                   geom_inject_resolutions=bundle.geom_inject_resolutions,
                   gan_checkpoint=gan_checkpoint,
                   encoder_checkpoint=encoder_checkpoint or "")
