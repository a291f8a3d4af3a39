#!/usr/bin/env python
"""Measured same-hardware denominator: reference engine vs ours, CPU only.

BASELINE.md's throughput denominator is an *estimate* (the reference
publishes no numbers and no GPU exists in this environment).  This bench
provides the one measured anchor that IS possible here: both frameworks'
production render paths, same snapshot weights, same host CPU
(torch-CPU for the reference via its pure-torch op fallbacks,
upfirdn2d.py:162-164 / bias_act.py:87-89; XLA-CPU for ours).

It builds the reference's own `networks_modified.Generator` + sauto
encoder at the shipped flagship scale (train_flags.txt: 128px,
z=w=64, channel_max 128, geometry injection at encoder levels 0,1),
snapshots them with the reference's pickle layout, then times
engine-level `render_stroke` (the serving unit of work,
reference brush.py:683-805) through both engines.

A CPU ratio is not a GPU/TPU ratio -- it removes the device variable
entirely and compares the two frameworks' production paths on identical
hardware.  Prints one JSON line.
"""

import argparse
import json
import os
import pickle
import sys
import tempfile
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

REF_ROOT = os.environ.get("NEUBE_REFERENCE", "/root/reference")
SG2 = os.path.join(REF_ROOT, "thirdparty", "stylegan2_ada_pytorch")

ZDIM = 64


def _import_ref(name):
    for p in (SG2, REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib
    return importlib.import_module(name)


def _stub_optional_deps():
    """forger.ui.brush pulls torchvision/lpips/skimage; only debug/save
    paths touch them (same stubs as tests/test_reference_parity.py)."""
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if "lpips" not in sys.modules:
        lp = types.ModuleType("lpips")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("lpips unavailable")

        lp.LPIPS = _Unavailable
        sys.modules["lpips"] = lp
    if "skimage" not in sys.modules:
        from PIL import Image
        sk = types.ModuleType("skimage")
        skio = types.ModuleType("skimage.io")
        skio.imread = lambda p: np.asarray(Image.open(p))
        skio.imsave = lambda p, a: Image.fromarray(np.asarray(a)).save(p)
        sk.io = skio
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = skio


# Flagship sauto encoder at reference-factory scale (train_flags.txt).
ENC_ARGS = dict(
    model_name="sauto", encoder_in_channels=1, decoder_out_channels=1,
    encoder_pre_filters=64, encoder_down_filters="128,256,256",
    encoder_post_filters="32,16", decoder_up_filters="256,128,64",
    preproc_type="-11inverse", widths="128,128",
)


def _Ns(d):
    return argparse.Namespace(**d)


def build_snapshot(res: int, path: str):
    """Reference flagship G + encoder -> training-snapshot pkl."""
    import torch
    from brushstroke_engine_tpu.flagship import flagship_encoder_config
    nm = _import_ref("training.networks_modified")
    nets = _import_ref("training.networks")
    factory = _import_ref("forger.experimental.autoenc.factory")
    dnnlib = _import_ref("dnnlib")

    enc_cfg = flagship_encoder_config()
    inject = (0, 1)
    geom_res = [enc_cfg.featuremap_resolution(res, r) for r in inject]
    geom_ch = [enc_cfg.feature_channels(r) for r in inject]

    torch.manual_seed(0)
    G = nm.Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=res, img_channels=3,
        mapping_kwargs=dict(num_layers=8),
        synthesis_kwargs=dict(
            channel_base=16384, channel_max=128, num_fp16_res=0,
            conv_clamp=256, architecture="orig", color_format="triad",
            color_w_channels=0, geom_feature_channels=geom_ch,
            geom_feature_resolutions=geom_res,
        )).eval()
    enc, _ = factory.create_autoencoder(_Ns(ENC_ARGS))
    enc = enc.eval()
    assert enc.feature_channels(0) == geom_ch[0], enc.feature_channels(0)

    # legacy.load_network_pkl validates D as a Module; a tiny D suffices
    # (the paint engine never runs it).
    D = nets.Discriminator(
        c_dim=0, img_resolution=res, img_channels=3, architecture="resnet",
        channel_base=512, channel_max=32, num_fp16_res=0, conv_clamp=256,
        epilogue_kwargs=dict(mbstd_group_size=4)).eval()

    snapshot = {
        "G": G, "D": D, "G_ema": G,
        "training_set_kwargs": None, "augment_pipe": None,
        "args": dnnlib.EasyDict(color_format="triad",
                                geom_inject_resolutions=list(inject)),
        "encoder": {
            "model_state": {k: v for k, v in enc.state_dict().items()},
            "args": _Ns(ENC_ARGS),
        },
    }
    with open(path, "wb") as f:
        pickle.dump(snapshot, f)


def stroke_patch(res):
    patch = np.zeros((res, res, 4), np.uint8)
    yy = (np.sin(np.linspace(0, np.pi, res)) * (res - 8) + 4).astype(int)
    for x, y in enumerate(yy):
        patch[max(0, y - 3):y + 3, x, 3] = 255
    return patch


def time_ref(snapshot_path, res, strokes):
    import torch
    torch.set_grad_enabled(False)
    _stub_optional_deps()
    rb = _import_ref("forger.ui.brush")
    eng = rb.PaintEngineFactory.create(snapshot_path, device="cpu")
    patch = stroke_patch(res)
    geom = eng.prepare_geom_input(patch)

    def one(seed):
        opts = rb.GanBrushOptions()
        opts.set_style(torch.from_numpy(
            np.random.RandomState(seed).randn(1, ZDIM).astype(np.float32)))
        # production path: PaintingHelper calls _render_stroke_torch
        # (brush.py:302-312); engine.render_stroke's own geom assert is
        # broken for its [1,1,W,W] geometry.
        res_t, _raw, _dbg = eng._render_stroke_torch(geom, None, opts)
        return res_t

    one(0)  # warmup
    t0 = time.perf_counter()
    for i in range(strokes):
        one(i + 1)
    return (time.perf_counter() - t0) / strokes


def time_ours(snapshot_path, res, strokes):
    from brushstroke_engine_tpu.engine.brush import (
        PaintEngineFactory, GanBrushOptions)
    eng = PaintEngineFactory.create(snapshot_path)
    patch = stroke_patch(res)

    def one(seed):
        opts = GanBrushOptions()
        opts.set_style(
            np.random.RandomState(seed).randn(1, ZDIM).astype(np.float32))
        out, _dbg = eng.render_stroke(patch, None, opts)
        return out

    one(0)  # warmup + compile
    t0 = time.perf_counter()
    for i in range(strokes):
        one(i + 1)
    return (time.perf_counter() - t0) / strokes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--strokes", type=int, default=4)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        snap = os.path.join(td, "network-snapshot.pkl")
        build_snapshot(args.resolution, snap)
        t_ref = time_ref(snap, args.resolution, args.strokes)
        t_ours = time_ours(snap, args.resolution, args.strokes)

    print(json.dumps({
        "metric": f"render_stroke CPU-vs-CPU ({args.resolution}px, "
                  f"1 core, same snapshot)",
        "ref_torch_cpu_s_per_stroke": round(t_ref, 3),
        "ours_xla_cpu_s_per_stroke": round(t_ours, 3),
        "measured_speedup_same_hardware": round(t_ref / t_ours, 2),
        "note": "framework-path ratio on identical hardware; the TPU "
                "headline's GPU denominator remains an estimate",
    }))


if __name__ == "__main__":
    main()
