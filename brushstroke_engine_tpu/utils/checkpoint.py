"""Checkpoint I/O: native bundles and reference-PyTorch conversion.

Native format: a single pickle holding dataclass configs (as dicts) + numpy
parameter trees -- self-contained, torch-free, and loadable anywhere.

Reference conversion (the migration path promised by BASELINE.md): loads a
reference snapshot pkl ``{G, D, G_ema, args, encoder, ...}``
(reference: thirdparty/.../training_loop_modified.py:560-578 for the format,
legacy.py:20 for the loader) without executing its embedded source, then maps
every tensor into our layouts:

  * FC weights   [out, in]        -> [in, out]
  * conv weights OIHW             -> HWIO
  * const input  [C, 4, 4]        -> [4, 4, C]
  * D epilogue fc: torch flattens NCHW, we flatten NHWC -> column permute
  * noise_const buffers           -> state['noise']['b{res}.conv{i}.noise_const']
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os
import pickle
import re
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

from brushstroke_engine_tpu.models.generator import (
    GeneratorConfig, make_generator_config,
)
from brushstroke_engine_tpu.models.geo_encoder import GeoEncoderConfig
from brushstroke_engine_tpu.utils import torch_extract as tx

logger = logging.getLogger(__name__)

NATIVE_MAGIC = "brushstroke_engine_tpu.bundle.v1"


@dataclass
class EngineBundle:
    gen_cfg: GeneratorConfig
    gen_params: Dict
    gen_state: Dict
    enc_cfg: GeoEncoderConfig
    enc_params: Dict
    enc_state: Dict
    color_format: str = "triad"
    geom_inject_resolutions: Tuple[int, ...] = (0,)
    extra: Dict = dataclasses.field(default_factory=dict)


# ---------------------------------------------------------------------------
# Native format
# ---------------------------------------------------------------------------

def save_native(path: str, bundle: EngineBundle):
    payload = {
        "magic": NATIVE_MAGIC,
        "gen_cfg": dataclasses.asdict(bundle.gen_cfg),
        "enc_cfg": dataclasses.asdict(bundle.enc_cfg),
        "gen_params": _np_tree(bundle.gen_params),
        "gen_state": _np_tree(bundle.gen_state),
        "enc_params": _np_tree(bundle.enc_params),
        "enc_state": _np_tree(bundle.enc_state),
        "color_format": bundle.color_format,
        "geom_inject_resolutions": tuple(bundle.geom_inject_resolutions),
        "extra": bundle.extra,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=4)


def load_native(path: str) -> EngineBundle:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert payload.get("magic") == NATIVE_MAGIC, f"not a native bundle: {path}"
    gen_cfg_d = dict(payload["gen_cfg"])
    syn = gen_cfg_d.pop("synthesis")
    from brushstroke_engine_tpu.models.synthesis import SynthesisConfig
    for k in ("geom_feature_resolutions", "geom_feature_channels",
              "resample_taps", "pos_encoding_resolutions"):
        if k in syn and syn[k] is not None:
            syn[k] = tuple(syn[k])
    for k in ("posenc_inject_resolutions",):
        if k in gen_cfg_d and gen_cfg_d[k] is not None:
            gen_cfg_d[k] = tuple(gen_cfg_d[k])
    gen_cfg = GeneratorConfig(synthesis=SynthesisConfig(**syn), **gen_cfg_d)
    enc_d = dict(payload["enc_cfg"])
    for k in ("down_filters", "post_filters", "up_filters"):
        if k in enc_d and enc_d[k] is not None:
            enc_d[k] = tuple(enc_d[k])
    enc_cfg = GeoEncoderConfig(**enc_d)
    return EngineBundle(
        gen_cfg=gen_cfg,
        gen_params=payload["gen_params"],
        gen_state=payload["gen_state"],
        enc_cfg=enc_cfg,
        enc_params=payload["enc_params"],
        enc_state=payload["enc_state"],
        color_format=payload["color_format"],
        geom_inject_resolutions=tuple(payload["geom_inject_resolutions"]),
        extra=payload.get("extra", {}),
    )


def _np_tree(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_engine_bundle(gan_checkpoint: str,
                       encoder_checkpoint: Optional[str] = None
                       ) -> EngineBundle:
    """Dispatch native bundle vs reference pkl (reference brush.py:552-604)."""
    try:
        return load_native(gan_checkpoint)
    except Exception:
        logger.info(f"{gan_checkpoint} is not a native bundle; trying "
                    f"reference pkl conversion")
    return convert_reference_snapshot(gan_checkpoint, encoder_checkpoint)


# ---------------------------------------------------------------------------
# Layout conversion primitives
# ---------------------------------------------------------------------------

def fc_from_torch(flat: Dict[str, np.ndarray], prefix: str) -> Dict:
    p = {"weight": np.ascontiguousarray(flat[prefix + ".weight"].T)}
    if prefix + ".bias" in flat:
        p["bias"] = flat[prefix + ".bias"]
    return p


def conv_from_torch(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convtranspose_from_torch(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight IOHW -> HWIO (in, out swapped vs conv)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def epilogue_fc_from_torch(w: np.ndarray, channels: int, res: int = 4
                           ) -> np.ndarray:
    """Reorder the D epilogue fc for NHWC flattening.

    torch: rows index flatten(C, H, W); ours: flatten(H, W, C).
    """
    out_f = w.shape[0]
    w = w.reshape(out_f, channels, res, res)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_f, channels * res * res)
    return np.ascontiguousarray(w.T)


# ---------------------------------------------------------------------------
# Generator conversion
# ---------------------------------------------------------------------------

def convert_generator_state(flat: Dict[str, np.ndarray],
                            cfg: GeneratorConfig) -> Tuple[Dict, Dict]:
    """Flat torch-name tensor map -> (params, state) for generator_apply."""
    params = {"mapping": {}, "synthesis": {}}
    noise = {}
    state: Dict[str, Any] = {}

    for i in range(cfg.mapping_layers):
        params["mapping"][f"fc{i}"] = fc_from_torch(flat, f"mapping.fc{i}")
    if "mapping.embed.weight" in flat:
        params["mapping"]["embed"] = fc_from_torch(flat, "mapping.embed")
    if "mapping.w_avg" in flat:
        state["w_avg"] = flat["mapping.w_avg"]

    for res in cfg.synthesis.block_resolutions:
        b = f"synthesis.b{res}"
        block: Dict[str, Any] = {}
        if res == 4:
            block["const"] = np.ascontiguousarray(
                np.transpose(flat[f"{b}.const"], (1, 2, 0)))
        convs = ["conv1"] if res == 4 else ["conv0", "conv1"]
        for conv in convs:
            block[conv] = {
                "affine": fc_from_torch(flat, f"{b}.{conv}.affine"),
                "weight": conv_from_torch(flat[f"{b}.{conv}.weight"]),
                "bias": flat[f"{b}.{conv}.bias"],
                "noise_strength": np.asarray(
                    flat[f"{b}.{conv}.noise_strength"]),
            }
            nk = f"{b}.{conv}.noise_const"
            if nk in flat:
                noise[f"b{res}.{conv}.noise_const"] = flat[nk]
        if f"{b}.torgb.weight" in flat:
            torgb = {
                "affine": fc_from_torch(flat, f"{b}.torgb.affine"),
                "weight": conv_from_torch(flat[f"{b}.torgb.weight"]),
                "bias": flat[f"{b}.torgb.bias"],
            }
            if f"{b}.torgb.color_bias" in flat:
                torgb["color_bias"] = flat[f"{b}.torgb.color_bias"]
            if f"{b}.torgb.color_affine.weight" in flat:
                torgb["color_affine"] = fc_from_torch(
                    flat, f"{b}.torgb.color_affine")
            block["torgb"] = torgb
        params["synthesis"][f"b{res}"] = block

    state["noise"] = noise
    return params, state


def infer_generator_config(flat: Dict[str, np.ndarray],
                           args: Dict[str, Any]) -> GeneratorConfig:
    """Derive a GeneratorConfig from snapshot args + tensor shapes."""
    # Resolution = largest b{res}.
    resolutions = sorted({int(k.split(".")[1][1:]) for k in flat
                          if k.startswith("synthesis.b")})
    img_resolution = resolutions[-1]
    z_dim = int(flat["mapping.fc0.weight"].shape[1])
    mapping_layers = len({k for k in flat
                          if k.startswith("mapping.fc")
                          and k.endswith(".weight")})
    w_dim = int(flat[f"mapping.fc{mapping_layers - 1}.weight"].shape[0])

    color_format = args.get("color_format", "triad")
    # Prefer the weight layout over args: a separate color_affine FC exists
    # iff color_w_channels > 0 (reference networks.py:424-431) and its input
    # width IS color_w_channels.
    color_key = f"synthesis.b{img_resolution}.torgb.color_affine.weight"
    if color_key in flat:
        color_w_channels = int(flat[color_key].shape[1])
    else:
        color_w_channels = int(args.get("color_w_channels", 0) or 0)

    # Channel plan from conv1 weights: [O, I, k, k] per block.
    chan = {res: int(flat[f"synthesis.b{res}.conv1.weight"].shape[0])
            for res in resolutions}
    channel_max = max(chan.values())
    # channel_base so that min(channel_base // res, channel_max) == chan[res].
    channel_base = max(c * r for r, c in chan.items())

    # Geometry injection: conv0 in_channels exceeding the trunk channels.
    geom_res = []
    geom_ch = []
    for res in resolutions:
        if res == 4:
            continue
        in_ch = int(flat[f"synthesis.b{res}.conv0.weight"].shape[1])
        extra = in_ch - chan[res // 2]
        if extra > 0:
            geom_res.append(res // 2)
            geom_ch.append(extra)

    return make_generator_config(
        z_dim=z_dim, c_dim=int(args.get("c_dim", 0) or 0), w_dim=w_dim,
        img_resolution=img_resolution,
        geom_feature_resolutions=tuple(geom_res),
        geom_feature_channels=tuple(geom_ch),
        color_format=color_format, color_w_channels=color_w_channels,
        channel_base=channel_base, channel_max=channel_max,
        mapping_layers=mapping_layers)


# ---------------------------------------------------------------------------
# Discriminator conversion
# ---------------------------------------------------------------------------

def infer_discriminator_config(flat: Dict[str, np.ndarray],
                               args: Dict[str, Any]):
    """Derive a DiscriminatorConfig from a reference D state dict
    (reference networks.py:957-1007 layout: b{res}.{fromrgb,conv0,conv1,skip},
    b4.{conv,fc,out}, optional mapping.*)."""
    from brushstroke_engine_tpu.models.discriminator import DiscriminatorConfig
    resolutions = sorted({int(k.split(".")[0][1:]) for k in flat
                          if k.startswith("b") and k.split(".")[0][1:].isdigit()})
    img_resolution = resolutions[-1]
    img_channels = int(flat[f"b{img_resolution}.fromrgb.weight"].shape[1])
    chan = {res: int(flat[f"b{res}.conv0.weight"].shape[0])
            for res in resolutions if res > 4}
    chan[4] = int(flat["b4.conv.weight"].shape[0])
    channel_max = max(chan.values())
    channel_base = max(c * r for r, c in chan.items())
    mbstd_num = int(flat["b4.conv.weight"].shape[1]) - chan[4]
    arch = "resnet" if any(".skip." in k for k in flat) else "orig"
    c_dim = int(args.get("c_dim", 0) or 0)
    return DiscriminatorConfig(
        c_dim=c_dim, img_resolution=img_resolution, img_channels=img_channels,
        architecture=arch, channel_base=channel_base, channel_max=channel_max,
        mbstd_num_channels=mbstd_num,
        conv_clamp=args.get("conv_clamp", 256.0))


def convert_discriminator_state(flat: Dict[str, np.ndarray], cfg):
    """Reference D state dict -> our discriminator params pytree."""
    def conv(prefix):
        p = {"weight": conv_from_torch(flat[prefix + ".weight"])}
        if prefix + ".bias" in flat:
            p["bias"] = flat[prefix + ".bias"]
        return p

    params = {}
    for res in cfg.block_resolutions:
        block = {}
        if res == cfg.img_resolution or f"b{res}.fromrgb.weight" in flat:
            block["fromrgb"] = conv(f"b{res}.fromrgb")
        block["conv0"] = conv(f"b{res}.conv0")
        block["conv1"] = conv(f"b{res}.conv1")
        if f"b{res}.skip.weight" in flat:
            block["skip"] = conv(f"b{res}.skip")
        params[f"b{res}"] = block
    ch4 = cfg.channels(4)
    params["b4"] = {
        "conv": conv("b4.conv"),
        "fc": {"weight": epilogue_fc_from_torch(flat["b4.fc.weight"], ch4,
                                                res=4),
               "bias": flat["b4.fc.bias"]},
        "out": fc_from_torch(flat, "b4.out"),
    }
    if any(k.startswith("mapping.") for k in flat):
        # conditional D: embed + fc stack, same MappingNetwork layout
        m = {}
        if "mapping.embed.weight" in flat:
            m["embed"] = fc_from_torch(flat, "mapping.embed")
        i = 0
        while f"mapping.fc{i}.weight" in flat:
            m[f"fc{i}"] = fc_from_torch(flat, f"mapping.fc{i}")
            i += 1
        params["mapping"] = m
    return params


# ---------------------------------------------------------------------------
# Encoder conversion ('sauto' family)
# ---------------------------------------------------------------------------

def encoder_config_from_args(args: Dict[str, Any]) -> GeoEncoderConfig:
    def intlist(v, default):
        if v is None:
            return tuple(default)
        if isinstance(v, str):
            return tuple(int(x) for x in v.split(",") if x)
        return tuple(int(x) for x in v)

    kind = args.get("model_name", "sauto")
    if kind == "sauto":
        return GeoEncoderConfig(
            kind="sauto",
            in_channels=int(args.get("encoder_in_channels", 1)),
            out_channels=int(args.get("decoder_out_channels", 1)),
            preproc=args.get("preproc_type", "none"),
            pre_filters=int(args.get("encoder_pre_filters", 64)),
            down_filters=intlist(args.get("encoder_down_filters"),
                                 (128, 256, 256)),
            post_filters=intlist(args.get("encoder_post_filters"), (32, 16)),
            up_filters=intlist(args.get("decoder_up_filters"),
                               (256, 128, 64)),
            decoder_pre_filters=int(args.get("decoder_pre_filters", -1) or -1),
            neg_slope=args.get("neg_slope"),
        )
    return GeoEncoderConfig(
        kind="conv",
        in_channels=int(args.get("encoder_in_channels", 1)),
        out_channels=int(args.get("decoder_out_channels", 1)),
        preproc=args.get("preproc_type", "none"),
        img_width=int(args.get("width", args.get("img_width", 128))),
        emb_channel=int(args.get("emb_channel", 4)),
        channel_factor=int(args.get("channel_factor", 4)),
        num_layers=int(args.get("enc_layer", 4)),
    )


def convert_encoder_state(flat: Dict[str, np.ndarray],
                          cfg: GeoEncoderConfig) -> Tuple[Dict, Dict]:
    """torch state_dict names -> our geo-encoder (params, state).

    sauto layout: encoder.model.{i} = SingleConvolution whose .conv is a
    Sequential [Conv2d, BN, act] (legacy order) or [Conv2d, act, BN].
    decoder: optional .first Sequential [Conv2d, act, BN], then .model.{i} =
    ScaleUp(.conv.conv Sequential) / ScaleUpV2(.conv Sequential) and an
    optional trailing 1x1 Conv2d.
    """
    params = {"encoder": {}, "decoder": {}}
    state = {"encoder": {}, "decoder": {}}
    bn_idx = 2 if cfg.batchnorm_after_activation else 1

    def single_conv(prefix, bn_index=bn_idx, transpose=False):
        wkey = prefix + ".0.weight"
        conv_w = flat[wkey]
        conv = {
            "weight": convtranspose_from_torch(conv_w) if transpose
            else conv_from_torch(conv_w),
            "bias": flat[prefix + ".0.bias"],
        }
        bn_p = {"scale": flat[f"{prefix}.{bn_index}.weight"],
                "bias": flat[f"{prefix}.{bn_index}.bias"]}
        bn_s = {"mean": flat[f"{prefix}.{bn_index}.running_mean"],
                "var": flat[f"{prefix}.{bn_index}.running_var"]}
        return {"conv": conv, "bn": bn_p}, {"bn": bn_s}

    if cfg.kind == "sauto":
        n_enc = (1 if cfg.pre_filters > 0 else 0) + len(cfg.down_filters) \
            + len(cfg.post_filters)
        for i in range(n_enc):
            p, s = single_conv(f"encoder.model.{i}.conv")
            params["encoder"][f"layer{i}"] = p
            state["encoder"][f"layer{i}"] = s
        if any(k.startswith("decoder.first") for k in flat):
            p, s = single_conv("decoder.first", bn_index=2)
            params["decoder"]["first"] = p
            state["decoder"]["first"] = s
        for i in range(len(cfg.up_filters)):
            if cfg.scale_up_v2:
                p, s = single_conv(f"decoder.model.{i}.conv", bn_index=2,
                                   transpose=True)
            else:
                # ScaleUp: .conv is SingleConvolution -> .conv.conv Sequential
                p, s = single_conv(f"decoder.model.{i}.conv.conv",
                                   bn_index=1)
            params["decoder"][f"up{i}"] = p
            state["decoder"][f"up{i}"] = s
        final_key = f"decoder.model.{len(cfg.up_filters)}.weight"
        if final_key in flat:
            params["decoder"]["final"] = {
                "weight": conv_from_torch(flat[final_key]),
                "bias": flat[f"decoder.model.{len(cfg.up_filters)}.bias"],
            }
        return params, state

    # 'conv' kind: encoder.layer{res}.* / encoder.final.* etc. with
    # Sequential [Conv, act, BN] -> bn index 2.
    enc_names = sorted({k.split(".")[1] for k in flat
                        if k.startswith("encoder.")})
    for name in enc_names:
        p, s = single_conv(f"encoder.{name}", bn_index=2)
        params["encoder"][name] = p
        state["encoder"][name] = s
    dec_names = sorted({k.split(".")[1] for k in flat
                        if k.startswith("decoder.")})
    for name in dec_names:
        transpose = name.startswith("layer")
        p, s = single_conv(f"decoder.{name}", bn_index=2,
                           transpose=transpose)
        params["decoder"][name] = p
        state["decoder"][name] = s
    return params, state


# ---------------------------------------------------------------------------
# TF-legacy (StyleGAN2 TensorFlow pickle) ingestion
# ---------------------------------------------------------------------------

def tf_collect_params(net) -> Dict[str, np.ndarray]:
    """Flatten a (stub-unpickled) dnnlib.tflib Network into name -> array
    (reference legacy.py:75-84: recurse .variables + .components)."""
    state = tx.module_attrs(net)
    out: Dict[str, np.ndarray] = {}

    def recurse(prefix, s):
        for name, value in (s.get("variables") or []):
            out[prefix + name] = np.asarray(value)
        for name, comp in (s.get("components") or {}).items():
            recurse(prefix + name + "/", tx.module_attrs(comp))

    recurse("", state)
    return out


def tf_generator_to_torch_layout(tf_params: Dict[str, np.ndarray],
                                 img_resolution: int
                                 ) -> Dict[str, np.ndarray]:
    """TF variable names/layouts -> the torch-name flat map this module's
    generator converter consumes (reference legacy.py:109-205 mapping
    table: TF conv weights are HWIO -- and stored pre-flipped for up-convs
    -- mod_bias is stored minus one, noise buffers are [1,1,H,W])."""
    # ToRGB_lod{n} aliases (progressive-growing export, legacy.py:159-164).
    for name in list(tf_params):
        m = re.fullmatch(r"ToRGB_lod(\d+)/(.*)", name)
        if m:
            r = img_resolution // (2 ** int(m.group(1)))
            tf_params[f"synthesis/{r}x{r}/ToRGB/{m.group(2)}"] = \
                tf_params[name]
    if any("/Skip/" in k for k in tf_params):
        raise ValueError("resnet-architecture TF pickles are not supported")

    flat: Dict[str, np.ndarray] = {}
    if "dlatent_avg" in tf_params:
        flat["mapping.w_avg"] = tf_params["dlatent_avg"]
    i = 0
    while f"mapping/Dense{i}/weight" in tf_params:
        flat[f"mapping.fc{i}.weight"] = \
            tf_params[f"mapping/Dense{i}/weight"].T
        flat[f"mapping.fc{i}.bias"] = tf_params[f"mapping/Dense{i}/bias"]
        i += 1

    def conv(dst, src, flip=False):
        w = tf_params[f"{src}/weight"]           # [kh, kw, in, out] (TF)
        if flip:
            w = w[::-1, ::-1]
        flat[f"{dst}.weight"] = np.ascontiguousarray(
            np.transpose(w, (3, 2, 0, 1)))        # -> torch OIHW
        flat[f"{dst}.bias"] = tf_params[f"{src}/bias"]

    def modulated(dst, src, noise_idx, flip=False):
        conv(dst, src, flip=flip)
        flat[f"{dst}.noise_strength"] = np.asarray(
            tf_params[f"{src}/noise_strength"])
        flat[f"{dst}.noise_const"] = \
            tf_params[f"synthesis/noise{noise_idx}"][0, 0]
        flat[f"{dst}.affine.weight"] = tf_params[f"{src}/mod_weight"].T
        flat[f"{dst}.affine.bias"] = tf_params[f"{src}/mod_bias"] + 1

    flat["synthesis.b4.const"] = tf_params["synthesis/4x4/Const/const"][0]
    modulated("synthesis.b4.conv1", "synthesis/4x4/Conv", 0)
    res = 8
    while f"synthesis/{res}x{res}/Conv1/weight" in tf_params:
        n = int(math.log2(res))
        modulated(f"synthesis.b{res}.conv0",
                  f"synthesis/{res}x{res}/Conv0_up", 2 * n - 5, flip=True)
        modulated(f"synthesis.b{res}.conv1",
                  f"synthesis/{res}x{res}/Conv1", 2 * n - 4)
        res *= 2
    for r in [4] + [2 ** k for k in range(3, int(math.log2(res)) + 1)]:
        src = f"synthesis/{r}x{r}/ToRGB"
        if f"{src}/weight" in tf_params:
            conv(f"synthesis.b{r}.torgb", src)
            flat[f"synthesis.b{r}.torgb.affine.weight"] = \
                tf_params[f"{src}/mod_weight"].T
            flat[f"synthesis.b{r}.torgb.affine.bias"] = \
                tf_params[f"{src}/mod_bias"] + 1
    return flat


def convert_tf_generator_pkl(path: str, which: str = "Gs"):
    """Load a TF-legacy StyleGAN2 pickle (tuple of (G, D, Gs) Networks,
    reference legacy.py:29-36) and convert its generator to our layouts.

    Returns (gen_cfg, params, state) for :func:`generator_apply` with the
    orig color format (TF pickles predate NeuBE's heads and carry no
    geometry encoder, so this is a generator converter, not a full
    EngineBundle).
    """
    pkl = tx.load_reference_pickle(path)
    if isinstance(pkl, tuple):
        nets = dict(zip(["G", "D", "Gs"], pkl))
    elif isinstance(pkl, dict):
        nets = pkl
    else:
        raise ValueError(f"unexpected TF pickle structure in {path}")
    net = nets.get(which, nets.get("Gs", nets.get("G")))
    attrs = tx.module_attrs(net)
    if int(attrs.get("version", 0)) < 4:
        raise ValueError("TensorFlow pickle version too low (legacy.py:111)")
    kw = dict(attrs.get("static_kwargs") or {})

    tf_params = tf_collect_params(net)
    img_resolution = int(kw.get("resolution", 1024))
    flat = tf_generator_to_torch_layout(tf_params, img_resolution)

    architecture = kw.get("architecture", "skip")
    gen_cfg = make_generator_config(
        z_dim=int(kw.get("latent_size", 512)),
        c_dim=int(kw.get("label_size", 0)),
        w_dim=int(kw.get("dlatent_size", 512)),
        img_resolution=img_resolution,
        img_channels=int(kw.get("num_channels", 3)),
        color_format="orig", architecture=architecture,
        channel_base=int(kw.get("fmap_base", 16384)) * 2,
        channel_max=int(kw.get("fmap_max", 512)),
        conv_clamp=kw.get("conv_clamp"),
        mapping_layers=int(kw.get("mapping_layers", 8)))
    params, state = convert_generator_state(flat, gen_cfg)
    return gen_cfg, params, state


# ---------------------------------------------------------------------------
# Snapshot conversion
# ---------------------------------------------------------------------------

def convert_reference_snapshot(path: str,
                               encoder_checkpoint: Optional[str] = None
                               ) -> EngineBundle:
    """Reference training snapshot pkl -> EngineBundle (G_ema + encoder)."""
    pkl = tx.load_reference_pickle(path)
    assert isinstance(pkl, dict), f"unexpected snapshot structure in {path}"

    raw_args = pkl.get("args", {}) or {}
    if isinstance(raw_args, dict):
        # includes dnnlib.EasyDict stubs (dict subclasses whose data lives
        # in the dict itself -- vars() on those is empty, see r3 fix)
        args = dict(raw_args)
    elif isinstance(raw_args, tx.PersistentStub):
        args = tx.module_attrs(raw_args)
    elif hasattr(raw_args, "__dict__"):
        args = dict(vars(raw_args))    # argparse.Namespace-style args
    else:
        args = {}

    g_obj = pkl.get("G_ema", pkl.get("G"))
    flat_g = tx.flatten_module_state(g_obj)
    gen_cfg = infer_generator_config(flat_g, args)
    gen_params, gen_state = convert_generator_state(flat_g, gen_cfg)

    geom_inject = tuple(args.get("geom_inject_resolutions", (0,)))

    enc_cfg = None
    enc_params = enc_state = None
    enc_ckpt = pkl.get("encoder")
    if enc_ckpt is None and encoder_checkpoint:
        enc_ckpt = tx.load_torch_file(encoder_checkpoint)
    if enc_ckpt is not None:
        enc_args = enc_ckpt.get("args", {})
        if hasattr(enc_args, "__dict__"):
            enc_args = vars(enc_args)
        enc_args = tx.module_attrs(enc_args) if not isinstance(enc_args, dict)\
            else enc_args
        enc_cfg = encoder_config_from_args(enc_args)
        flat_e = {k: tx.to_numpy(v)
                  for k, v in enc_ckpt["model_state"].items()}
        enc_params, enc_state = convert_encoder_state(flat_e, enc_cfg)
    else:
        raise ValueError(
            "No geometry encoder found in snapshot and no encoder checkpoint "
            "given (reference brush.py:588-590)")

    return EngineBundle(
        gen_cfg=gen_cfg, gen_params=gen_params, gen_state=gen_state,
        enc_cfg=enc_cfg, enc_params=enc_params, enc_state=enc_state,
        color_format=args.get("color_format", "triad"),
        geom_inject_resolutions=geom_inject,
        extra={"args": args})
