"""Brush libraries: collections of styles (W vectors + noise buffers, seeds,
or random z's) with icons and interpolation.

Rebuild of the reference library module (forger/ui/library.py:24-253).
Pickle W-libraries are loaded with a torch-free unpickler so reference pkls
(which may contain torch tensors) and native numpy pkls both work.
"""

from __future__ import annotations

import io
import logging
import os
import pickle
import random
import re
import zipfile
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)


class ZipIcons:
    """Thumbnail cache inside a zip (reference library.py:24-46)."""

    def __init__(self, path, extension=".jpg"):
        self.path = path
        self.extension = extension
        self.zip = zipfile.ZipFile(path, mode="a")

    def get_icon(self, key):
        fname = key + self.extension
        if fname in self.zip.namelist():
            with self.zip.open(fname, "r") as f:
                import PIL.Image
                return np.array(PIL.Image.open(f))
        return None

    def set_icon(self, key, npimg):
        import PIL.Image
        fname = key + self.extension
        image = PIL.Image.fromarray(npimg)
        byte_io = io.BytesIO()
        if image.mode == "RGBA":
            image = image.convert("RGB")
        image.save(byte_io, format="JPEG")
        self.zip.writestr(fname, byte_io.getvalue())


def read_zs(saved_file):
    """Parse a saved-seeds txt file -> (seed list, z_dim)."""
    zs = []
    zdim = 0
    if not os.path.isfile(saved_file):
        return zs, zdim
    with open(saved_file) as f:
        for line in f:
            line = line.strip()
            if len(line) > 0 and line[0] != "#":
                try:
                    val = int(line.split()[0])
                    zdim = len(line.split()) - 1
                    zs.append(val)
                except ValueError:
                    logger.error(f"Failed to parse saved seed line {line} "
                                 f"from {saved_file}")
    return zs, zdim


def _interp_style_id(style_id1, style_id2, alpha):
    return "%s_%0.2f__%s" % (str(style_id1), alpha, str(style_id2))


class _TorchFreeUnpickler(pickle.Unpickler):
    """Load reference brush pkls without torch: torch tensors in storage are
    rebuilt as numpy arrays when possible, else skipped."""

    def find_class(self, module, name):
        if module.startswith("torch"):
            import importlib
            try:
                import torch  # CPU torch is available in this image.
                return getattr(importlib.import_module(module), name)
            except Exception:
                raise pickle.UnpicklingError(
                    f"cannot resolve {module}.{name} without torch")
        return super().find_class(module, name)


def _to_numpy(x):
    if x is None:
        return None
    if isinstance(x, np.ndarray):
        return x
    try:
        import torch
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


class BrushLibrary:
    @staticmethod
    def from_arg(arg_val, z_dim=64):
        if os.path.isfile(arg_val):
            return BrushLibrary.from_file(arg_val, z_dim=z_dim)
        m = re.match(r"^rand(\d+)$", arg_val)
        if m is not None:
            return RandomBrushLibrary(int(m.group(1)), zdim=z_dim)
        values = [int(x) for x in arg_val.split(",")]
        if len(values) == 1:
            num_seeds = values[0]
            seeds = list(range(0, max(10000, num_seeds)))
            random.shuffle(seeds)
            return SeedBrushLibrary(seeds[:num_seeds], z_dim)
        return SeedBrushLibrary(values, z_dim)

    @staticmethod
    def from_file(fname, z_dim=64):
        logger.info(f"Parsing file {fname}")
        try:
            res = WBrushLibrary.from_file(fname)
        except Exception:
            logger.info(f"Could not load W library, loading seed library "
                        f"from {fname}")
            res = SeedBrushLibrary.from_file(fname, z_dim=z_dim)
        try:
            res.set_icon_file(fname + ".icons.zip")
        except Exception as e:
            logger.warning(f"Could not open icon zip: {e}")
        return res

    def __init__(self):
        self.iconzip = None
        self.mapper = None

    def set_icon_file(self, icon_zipfile):
        self.iconzip = ZipIcons(icon_zipfile)

    def enable_dynamic_icons(self, style_mapper):
        self.mapper = style_mapper

    def get_style_icon(self, style_id):
        if self.iconzip is not None:
            icon = self.iconzip.get_icon(style_id)
            if icon is not None:
                return icon
        if self.mapper is not None:
            from brushstroke_engine_tpu.engine.brush import GanBrushOptions
            opts = GanBrushOptions()
            self.set_style(style_id, opts)
            icon = self.mapper.get_brush_icon(opts)
            if self.iconzip is not None:
                self.iconzip.set_icon(style_id, icon)
            return icon
        return None

    def get_style_ids(self):
        raise NotImplementedError

    def set_style(self, style_id, brush_options):
        raise NotImplementedError

    def set_interpolated_style(self, style_id1, style_id2, alpha,
                               brush_options):
        raise NotImplementedError


class WBrushLibrary(BrushLibrary):
    """pkl of {style_id: w} or {style_id: {'w': w, 'noise'/...: buffers}}."""

    @staticmethod
    def from_file(fname):
        with open(fname, "rb") as f:
            styles_dict = _TorchFreeUnpickler(f).load()
        if not isinstance(styles_dict, dict) or len(styles_dict) == 0:
            raise ValueError(f"not a W library: {fname}")
        first = next(iter(styles_dict.values()))
        arr = first["w"] if isinstance(first, dict) else first
        if _to_numpy(arr).ndim < 2:
            raise ValueError(f"not a W library: {fname}")
        logger.info(f"Loaded w library with {len(styles_dict)} styles")
        return WBrushLibrary(styles_dict)

    def __init__(self, styles_dict: Dict):
        super().__init__()
        self.styles = styles_dict

    def get_style_ids(self):
        return sorted(self.styles.keys())

    def set_style(self, style_id, brush_options):
        style_info = self.styles[style_id]
        noise = None
        if isinstance(style_info, dict):
            w = style_info["w"]
            if "noise" in style_info:
                noise = style_info["noise"]
            else:
                noise = {k: v for k, v in style_info.items() if k != "w"}
                if len(noise) == 0:
                    noise = None
        else:
            w = style_info
        w = _to_numpy(w)
        if w.ndim == 2:
            w = w[None]  # [1, num_ws, w_dim]
        if noise is not None:
            noise = {k: _to_numpy(v) for k, v in noise.items()}
        brush_options.set_style_w(
            w, style_id=style_id,
            custom_args={"noise_buffers": noise} if noise else {})

    def set_interpolated_style(self, style_id1, style_id2, alpha,
                               brush_options):
        from brushstroke_engine_tpu.engine.brush import GanBrushOptions
        o1, o2 = GanBrushOptions(), GanBrushOptions()
        self.set_style(style_id1, o1)
        self.set_style(style_id2, o2)
        w = o1.style_ws * alpha + o2.style_ws * (1 - alpha)
        custom_args = None
        n1 = o1.custom_args.get("noise_buffers")
        n2 = o2.custom_args.get("noise_buffers")
        if n1 is not None and n2 is not None:
            noise = {k: v * alpha + n2[k] * (1 - alpha)
                     for k, v in n1.items()}
            custom_args = {"noise_buffers": noise}
        brush_options.set_style_w(
            w, style_id=_interp_style_id(style_id1, style_id2, alpha),
            custom_args=custom_args)

    def save(self, fname):
        """Write as a torch-free numpy pkl."""
        with open(fname, "wb") as f:
            pickle.dump(self.styles, f)


class SeedBrushLibrary(BrushLibrary):
    """txt file of z seeds; z = RandomState(seed).randn (bit-compatible with
    the reference so brush identities carry over)."""

    @staticmethod
    def from_file(fname, z_dim=None):
        zs, zdim = read_zs(fname)
        if z_dim is not None:
            zdim = z_dim
        logger.info(f"Loaded seed library with {len(zs)} styles")
        return SeedBrushLibrary(zs, zdim)

    def __init__(self, seeds_list, zdim):
        super().__init__()
        self.zs = seeds_list
        self.zdim = zdim

    def get_style_ids(self):
        return sorted([str(x) for x in self.zs])

    def set_style(self, style_id, brush_options):
        seed = int(style_id)
        z = np.random.RandomState(seed=seed).randn(1, self.zdim)
        brush_options.set_style(z, style_id=style_id)

    def set_interpolated_style(self, style_id1, style_id2, alpha,
                               brush_options):
        from brushstroke_engine_tpu.engine.brush import GanBrushOptions
        o1, o2 = GanBrushOptions(), GanBrushOptions()
        self.set_style(style_id1, o1)
        self.set_style(style_id2, o2)
        z = o1.style_z * alpha + o2.style_z * (1 - alpha)
        brush_options.set_style(
            z, style_id=_interp_style_id(style_id1, style_id2, alpha))


class RandomBrushLibrary(BrushLibrary):
    def __init__(self, num, zdim, random_state=None):
        super().__init__()
        self.num = num
        self.zdim = zdim
        self.rng = random_state if random_state is not None \
            else np.random.RandomState(0)

    def get_style_ids(self):
        return ["rand" + str(x) for x in range(self.num)]

    def set_style(self, style_id, brush_options):
        brush_options.set_style(self.rng.randn(1, self.zdim),
                                style_id=style_id)

    def set_interpolated_style(self, style_id1, style_id2, alpha,
                               brush_options):
        self.set_style(style_id1, brush_options)
