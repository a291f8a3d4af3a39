#!/usr/bin/env python
"""One-command pretrained-weights arrival path.

Given local files (or URLs, when network egress exists) for the pretrained
detectors this framework's metric/tool stacks expect, this script runs every
converter + an activation sanity check, installs the verified files into the
weights dir (``$NEUBE_WEIGHTS_DIR``, default ``<repo>/weights``), records
sha256 digests in ``manifest.json``, and prints the detector-kind flip --
after it succeeds, FID/LPIPS/PR/CLIP silently switch from the labeled
``*_random`` fallbacks to the real detectors on next import
(``brushstroke_engine_tpu/utils/weights.py`` registry).

Usage (local files):
    python scripts/fetch_and_verify_weights.py \
        --inception /tmp/pt_inception-2015-12-05.pt \
        --lpips /tmp/lpips_alex.pth --vgg16 /tmp/vgg16.pth \
        --clip /tmp/ViT-B-32.pt --clip_bpe /tmp/bpe_simple_vocab_16e6.txt.gz \
        --reference_pkl /tmp/network-snapshot.pkl

Any subset works; URLs are accepted in place of paths.  Expected digests can
be pinned with --expect inception=<sha256hex> (repeatable); mismatches fail
before install.

Reference anchor: the reference lazily downloads the same detectors from
NVIDIA CDN / package caches (metric_utils.py:236-286); this is the explicit,
verified, egress-free equivalent.
"""

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from brushstroke_engine_tpu.utils import weights as W  # noqa: E402


def _obtain(src: str, workdir: str) -> str:
    """Local path passthrough; URL -> download into workdir."""
    if os.path.exists(src):
        return src
    if "://" in src:
        import urllib.request
        dst = os.path.join(workdir, os.path.basename(src.split("?")[0]))
        print(f"  fetching {src} ...")
        urllib.request.urlretrieve(src, dst)
        return dst
    raise FileNotFoundError(src)


def _verify_inception(path: str) -> str:
    from brushstroke_engine_tpu.metrics import fid, inception
    det = fid.load_detector(path)
    assert det.kind == "inception_v3", det.kind
    assert det.param_count() == inception.PARAM_COUNT, \
        (det.param_count(), inception.PARAM_COUNT)
    img = (np.random.RandomState(0).rand(2, 64, 64, 3) * 255).astype(np.uint8)
    feats = np.asarray(fid.extract_features(img, det))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()
    return f"kind={det.kind} pool=2048 finite"


def _verify_lpips(path: str) -> str:
    import torch
    from brushstroke_engine_tpu.metrics import lpips
    obj = torch.load(path, map_location="cpu", weights_only=False)
    state = obj.get("state_dict", obj) if isinstance(obj, dict) \
        else obj.state_dict()
    model = lpips.LPIPSModel.from_torch_state(
        {k: v.numpy() for k, v in state.items()})
    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    same = float(np.asarray(lpips.lpips_pair(x, x, model))[0])
    diff = float(np.asarray(lpips.lpips_pair(x, y, model))[0])
    assert abs(same) < 1e-6 and np.isfinite(diff) and diff > 0
    return f"d(x,x)={same:.1e} d(x,y)={diff:.4f}"


def _verify_vgg16(path: str) -> str:
    import torch
    from brushstroke_engine_tpu.metrics import pr
    obj = torch.load(path, map_location="cpu", weights_only=False)
    state = obj if isinstance(obj, dict) else obj.state_dict()
    vgg = pr.VGG16Features.from_torch_state(
        {k: v.numpy() for k, v in state.items()})
    assert vgg.kind == "vgg16"
    img = (np.random.RandomState(2).rand(2, 224, 224, 3) * 255)
    feats = np.asarray(pr.vgg16_extract_features(img.astype(np.uint8), vgg))
    assert feats.shape[0] == 2 and np.isfinite(feats).all()
    return f"kind={vgg.kind} feat_dim={feats.shape[1]}"


def _verify_clip(path: str, bpe_path=None) -> str:
    from brushstroke_engine_tpu.tools import clip_model as cm
    cfg, params, tokenizer = cm.load_openai_clip(path, bpe_path)
    img = np.random.RandomState(3).rand(1, 224, 224, 3).astype(np.float32)
    ie = np.asarray(cm.encode_image(cfg, params, img))
    te = np.asarray(cm.encode_text(
        cfg, params, tokenizer(["a painted brush stroke"])))
    assert ie.shape[-1] == cfg.embed_dim == te.shape[-1]
    sim = float((ie @ te.T) / (np.linalg.norm(ie) * np.linalg.norm(te)))
    assert np.isfinite(sim)
    return f"embed_dim={cfg.embed_dim} cos(img,text)={sim:.3f}"


def _verify_reference_pkl(path: str) -> str:
    from brushstroke_engine_tpu.utils.checkpoint import (
        convert_reference_snapshot,
    )
    from brushstroke_engine_tpu.engine.brush import (
        TriadGanPaintEngine, CanvasPaintEngine, GanBrushOptions,
    )
    bundle = convert_reference_snapshot(path)
    cls = TriadGanPaintEngine if bundle.color_format == "triad" \
        else CanvasPaintEngine
    eng = cls(bundle.gen_cfg, bundle.gen_params, bundle.gen_state,
              bundle.enc_cfg, bundle.enc_params, bundle.enc_state,
              geom_inject_resolutions=bundle.geom_inject_resolutions)
    w = eng.patch_width
    patch = np.zeros((w, w, 4), np.uint8)
    patch[w // 4:-w // 4, w // 4:-w // 4, 3] = 255
    opts = GanBrushOptions()
    opts.set_style(np.random.RandomState(0).randn(
        1, bundle.gen_cfg.z_dim).astype(np.float32))
    img, _ = eng.render_stroke(patch, None, opts)
    assert img.shape == (w, w, 4) and img.dtype == np.uint8
    return f"res={w} color_format={bundle.color_format} render ok"


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    for fam in ("inception", "lpips", "vgg16", "clip", "clip_bpe"):
        ap.add_argument(f"--{fam}", default=None,
                        help=f"Path or URL for the {fam} weights")
    ap.add_argument("--reference_pkl", default=None,
                    help="Reference training snapshot pkl to convert-verify "
                         "(verified + digested, not installed)")
    ap.add_argument("--expect", action="append", default=[],
                    metavar="FAMILY=SHA256",
                    help="Pin an expected sha256 digest (repeatable)")
    ap.add_argument("--weights_dir", default=None,
                    help="Override install dir (default: registry dir)")
    args = ap.parse_args(argv)

    if args.weights_dir:
        os.environ["NEUBE_WEIGHTS_DIR"] = args.weights_dir
    expect = dict(e.split("=", 1) for e in args.expect)

    requested = {fam: getattr(args, fam)
                 for fam in ("inception", "lpips", "vgg16", "clip",
                             "clip_bpe")
                 if getattr(args, fam)}
    if not requested and not args.reference_pkl:
        ap.error("nothing to do: pass at least one weights source")

    before = {
        "fid": _kind_probe("fid"), "lpips": _kind_probe("lpips"),
        "clip": _kind_probe("clip"),
    }

    manifest = {}
    workdir = tempfile.mkdtemp(prefix="neube_weights_")
    failures = []
    staged = {}
    for fam, src in requested.items():
        print(f"[{fam}] obtaining {src}")
        try:
            local = _obtain(src, workdir)
            digest = W.sha256_file(local)
            if fam in expect and expect[fam].lower() != digest:
                raise RuntimeError(
                    f"sha256 mismatch: expected {expect[fam]}, got {digest}")
            if fam == "inception":
                note = _verify_inception(local)
            elif fam == "lpips":
                note = _verify_lpips(local)
            elif fam == "vgg16":
                note = _verify_vgg16(local)
            elif fam == "clip":
                note = _verify_clip(local, requested.get("clip_bpe"))
            else:   # clip_bpe: validated through the clip tokenizer load
                note = "bpe vocab staged (validated with --clip)"
            staged[fam] = (local, digest, note)
            print(f"[{fam}] VERIFIED {note} sha256={digest[:16]}...")
        except Exception as e:
            failures.append((fam, str(e)))
            print(f"[{fam}] FAILED: {e}")

    if args.reference_pkl:
        try:
            local = _obtain(args.reference_pkl, workdir)
            note = _verify_reference_pkl(local)
            print(f"[reference_pkl] VERIFIED {note} "
                  f"sha256={W.sha256_file(local)[:16]}...")
        except Exception as e:
            failures.append(("reference_pkl", str(e)))
            print(f"[reference_pkl] FAILED: {e}")

    if failures:
        print("\nNOT installing; fix these first:")
        for fam, msg in failures:
            print(f"  {fam}: {msg}")
        return 1

    # All good: install + manifest.
    os.makedirs(W.weights_dir(), exist_ok=True)
    for fam, (local, digest, note) in staged.items():
        dst = os.path.join(W.weights_dir(), W.CANONICAL[fam][0])
        if os.path.abspath(local) != os.path.abspath(dst):
            shutil.copy2(local, dst)
        manifest[fam] = {"file": W.CANONICAL[fam][0], "sha256": digest,
                         "verified": note}
    if manifest:
        mpath = W.write_manifest(manifest)
        print(f"\nInstalled {len(manifest)} weight file(s) into "
              f"{W.weights_dir()}; manifest: {mpath}")

    after = {
        "fid": _kind_probe("fid", fresh=True),
        "lpips": _kind_probe("lpips", fresh=True),
        "clip": _kind_probe("clip", fresh=True),
    }
    print("Detector kinds (before -> after):")
    for k in before:
        print(f"  {k}: {before[k]} -> {after[k]}")
    return 0


def _kind_probe(which: str, fresh: bool = False) -> str:
    """Current default detector kind (fresh=True resets module caches so the
    probe reflects the just-installed files)."""
    try:
        if which == "fid":
            from brushstroke_engine_tpu.metrics import fid
            if fresh:
                fid.set_default_extractor(None)
                fid._DEFAULT = None
            return fid.default_detector_kind()
        if which == "lpips":
            from brushstroke_engine_tpu.metrics import lpips
            if fresh:
                lpips._DEFAULT_MODEL = None
            m = lpips.get_default_model()
            return getattr(m, "kind", type(m).__name__)
        if which == "clip":
            from brushstroke_engine_tpu.tools import clip_search
            return type(clip_search.default_backbone()).__name__
    except Exception as e:  # keep the report best-effort
        return f"probe-failed: {e}"
    return "?"


if __name__ == "__main__":
    sys.exit(main())
