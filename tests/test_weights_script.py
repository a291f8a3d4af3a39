"""fetch_and_verify_weights.py: verify -> install -> manifest -> kind flip.

Uses a synthetic-but-layout-correct LPIPS state dict (converter correctness
itself is covered by the torch goldens in test_metric_goldens.py and, for
the reference pkl path, tests/test_reference_parity.py)."""

import importlib
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

CONVS = [  # (prefix, cout, cin, k) matching metrics.lpips._ALEX_PLAN
    ("net.slice1.0", 64, 3, 11),
    ("net.slice2.4", 192, 64, 5),
    ("net.slice3.8", 384, 192, 3),
    ("net.slice4.10", 256, 384, 3),
    ("net.slice5.12", 256, 256, 3),
]


def _fake_lpips_file(path):
    rng = np.random.RandomState(0)
    state = {}
    for pre, co, ci, k in CONVS:
        state[f"{pre}.weight"] = torch.from_numpy(
            (np.sqrt(2.0 / (k * k * ci)) * rng.randn(co, ci, k, k))
            .astype(np.float32))
        state[f"{pre}.bias"] = torch.from_numpy(
            0.1 * rng.randn(co).astype(np.float32))
    for i, (_pre, co, *_r) in enumerate(CONVS):
        state[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.randn(1, co, 1, 1)).astype(np.float32) / co)
    torch.save(state, path)
    return path


@pytest.fixture
def weights_env(tmp_path, monkeypatch):
    wdir = str(tmp_path / "weights")
    monkeypatch.setenv("NEUBE_WEIGHTS_DIR", wdir)
    for var in ("NEUBE_FID_DETECTOR", "NEUBE_LPIPS_WEIGHTS",
                "NEUBE_CLIP_WEIGHTS"):
        monkeypatch.delenv(var, raising=False)
    # reset module caches so detector kinds re-resolve under the tmp dir
    from brushstroke_engine_tpu.metrics import fid, lpips
    fid._DEFAULT = None
    lpips._DEFAULT_MODEL = None
    yield wdir
    fid._DEFAULT = None
    lpips._DEFAULT_MODEL = None


def test_verify_install_and_kind_flip(tmp_path, weights_env, capsys):
    favw = importlib.import_module("fetch_and_verify_weights")
    src = _fake_lpips_file(str(tmp_path / "src_lpips.pth"))
    rc = favw.main(["--lpips", src])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[lpips] VERIFIED" in out

    manifest = json.load(open(os.path.join(weights_env, "manifest.json")))
    assert manifest["lpips"]["file"] == "lpips_alex.pt"
    assert len(manifest["lpips"]["sha256"]) == 64
    assert os.path.exists(os.path.join(weights_env, "lpips_alex.pt"))

    # Default-model discovery now picks the installed file up.
    from brushstroke_engine_tpu.metrics import lpips
    from brushstroke_engine_tpu.utils.weights import find_weights
    lpips._DEFAULT_MODEL = None
    assert find_weights("lpips") == os.path.join(weights_env, "lpips_alex.pt")
    model = lpips.get_default_model()
    x = np.zeros((1, 32, 32, 3), np.float32)
    assert float(np.asarray(lpips.lpips_pair(x, x, model))[0]) == 0.0


def test_sha256_pin_mismatch_blocks_install(tmp_path, weights_env, capsys):
    favw = importlib.import_module("fetch_and_verify_weights")
    src = _fake_lpips_file(str(tmp_path / "src_lpips.pth"))
    rc = favw.main(["--lpips", src, "--expect", "lpips=" + "0" * 64])
    assert rc == 1
    assert not os.path.exists(os.path.join(weights_env, "lpips_alex.pt"))
    assert "sha256 mismatch" in capsys.readouterr().out


def test_env_var_overrides_weights_dir(tmp_path, weights_env, monkeypatch):
    from brushstroke_engine_tpu.utils.weights import find_weights
    override = _fake_lpips_file(str(tmp_path / "elsewhere.pth"))
    monkeypatch.setenv("NEUBE_LPIPS_WEIGHTS", override)
    assert find_weights("lpips") == override
    monkeypatch.setenv("NEUBE_LPIPS_WEIGHTS", str(tmp_path / "missing.pth"))
    assert find_weights("lpips") is None


# ---------------------------------------------------------------------------
# Weights-arrival FULL dry run: structure-real (random-valued) files for
# EVERY converter input the script accepts -- torchvision Inception-v3,
# the reference's TorchScript (NVIDIA TF-2015) Inception layout, LPIPS,
# a slim torchvision-layout VGG16, an OpenAI-CLIP state dict + BPE merges,
# and a reference snapshot pkl -- so the real-weights day is zero-risk.
# Values are random; layout/keys/shape relationships are the real ones
# (Inception is full-width because the verifier asserts the exact
# PARAM_COUNT; VGG/CLIP are slim since their verifiers are shape-derived).
# ---------------------------------------------------------------------------

def _fake_torchvision_inception(path):
    from brushstroke_engine_tpu.metrics.inception import CONVS
    rng = np.random.RandomState(0)
    state = {}
    for (name, cin, cout, (kh, kw), _s, _p) in CONVS:
        std = np.sqrt(2.0 / (kh * kw * cin))
        state[f"{name}.conv.weight"] = torch.from_numpy(
            (std * rng.randn(cout, cin, kh, kw)).astype(np.float32))
        state[f"{name}.bn.weight"] = torch.ones(cout)
        state[f"{name}.bn.bias"] = torch.zeros(cout)
        state[f"{name}.bn.running_mean"] = torch.zeros(cout)
        state[f"{name}.bn.running_var"] = torch.ones(cout)
    torch.save(state, path)
    return path


def _fake_nvidia_inception(path):
    from brushstroke_engine_tpu.metrics.inception import (
        CONVS, _CONV_INDEX, _nvidia_name_map)
    rng = np.random.RandomState(1)
    state = {}
    for tv_name, nv_name in _nvidia_name_map().items():
        (_n, cin, cout, (kh, kw), _s, _p) = CONVS[_CONV_INDEX[tv_name]]
        std = np.sqrt(2.0 / (kh * kw * cin))
        state[f"layers.{nv_name}.conv.weight"] = torch.from_numpy(
            (std * rng.randn(cout, cin, kh, kw)).astype(np.float32))
        state[f"layers.{nv_name}.beta"] = torch.zeros(cout)
    torch.save(state, path)
    return path


def _fake_vgg16(path, div=8):
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    rng = np.random.RandomState(2)
    state, idx, cin = {}, 0, 3
    for c in plan:
        if c == "M":
            idx += 1  # MaxPool slot
            continue
        cout = max(c // div, 4)
        std = np.sqrt(2.0 / (9 * cin))
        state[f"features.{idx}.weight"] = torch.from_numpy(
            (std * rng.randn(cout, cin, 3, 3)).astype(np.float32))
        state[f"features.{idx}.bias"] = torch.zeros(cout)
        idx += 2  # conv + ReLU
        cin = cout
    fc_w = 512
    state["classifier.0.weight"] = torch.from_numpy(
        (rng.randn(fc_w, cin * 49) * 0.01).astype(np.float32))
    state["classifier.0.bias"] = torch.zeros(fc_w)
    state["classifier.3.weight"] = torch.from_numpy(
        (rng.randn(fc_w, fc_w) * 0.01).astype(np.float32))
    state["classifier.3.bias"] = torch.zeros(fc_w)
    torch.save(state, path)
    return path


def _fake_clip(path, bpe_path):
    import gzip
    rng = np.random.RandomState(3)
    width, patch, grid, layers, edim = 64, 32, 7, 2, 32

    # BPE merges (first line is a header, as in the published file).
    merges = ["#version: tiny", "t h", "th e</w>", "a n", "an d</w>",
              "i n", "in g</w>", "s t", "st r"]
    with gzip.open(bpe_path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    vocab_size = 256 * 2 + (len(merges) - 1) + 2

    def t(*shape, scale=0.02):
        return torch.from_numpy(
            (scale * rng.randn(*shape)).astype(np.float32))

    state = {
        "visual.conv1.weight": t(width, 3, patch, patch),
        "visual.class_embedding": t(width),
        "visual.positional_embedding": t(grid * grid + 1, width),
        "visual.ln_pre.weight": torch.ones(width),
        "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width),
        "visual.ln_post.bias": torch.zeros(width),
        "visual.proj": t(width, edim),
        "token_embedding.weight": t(vocab_size, width),
        "positional_embedding": t(77, width),
        "ln_final.weight": torch.ones(width),
        "ln_final.bias": torch.zeros(width),
        "text_projection": t(width, edim),
    }
    for prefix, n in (("visual.transformer", layers), ("transformer",
                                                       layers)):
        for i in range(n):
            b = f"{prefix}.resblocks.{i}"
            state.update({
                f"{b}.ln_1.weight": torch.ones(width),
                f"{b}.ln_1.bias": torch.zeros(width),
                f"{b}.attn.in_proj_weight": t(3 * width, width),
                f"{b}.attn.in_proj_bias": torch.zeros(3 * width),
                f"{b}.attn.out_proj.weight": t(width, width),
                f"{b}.attn.out_proj.bias": torch.zeros(width),
                f"{b}.ln_2.weight": torch.ones(width),
                f"{b}.ln_2.bias": torch.zeros(width),
                f"{b}.mlp.c_fc.weight": t(4 * width, width),
                f"{b}.mlp.c_fc.bias": torch.zeros(4 * width),
                f"{b}.mlp.c_proj.weight": t(width, 4 * width),
                f"{b}.mlp.c_proj.bias": torch.zeros(width),
            })
    torch.save(state, path)
    return path


def _fake_reference_pkl(path):
    from tests import test_checkpoint_parity as tcp
    torch.manual_seed(0)
    gen = tcp.TorchGolden(seed=0).eval()
    enc = tcp.TorchGoldenEncoder(seed=1).eval()
    tcp._write_snapshot(path, gen, enc)
    return path


@pytest.mark.slow
def test_weights_arrival_full_dry_run(tmp_path, weights_env, capsys):
    """One invocation with EVERY family: verify -> install -> manifest."""
    favw = importlib.import_module("fetch_and_verify_weights")
    rc = favw.main([
        "--inception", _fake_torchvision_inception(
            str(tmp_path / "inception.pth")),
        "--lpips", _fake_lpips_file(str(tmp_path / "lpips.pth")),
        "--vgg16", _fake_vgg16(str(tmp_path / "vgg16.pth")),
        "--clip", _fake_clip(str(tmp_path / "clip.pt"),
                             str(tmp_path / "bpe.txt.gz")),
        "--clip_bpe", str(tmp_path / "bpe.txt.gz"),
        "--reference_pkl", _fake_reference_pkl(
            str(tmp_path / "network-snapshot.pkl")),
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    for fam in ("inception", "lpips", "vgg16", "clip", "reference_pkl"):
        assert f"[{fam}] VERIFIED" in out, (fam, out)
    manifest = json.load(open(os.path.join(weights_env, "manifest.json")))
    for fam in ("inception", "lpips", "vgg16", "clip", "clip_bpe"):
        assert fam in manifest, manifest.keys()
        assert len(manifest[fam]["sha256"]) == 64


@pytest.mark.slow
def test_weights_arrival_nvidia_torchscript_layout(tmp_path, weights_env,
                                                   capsys):
    """The reference's own detector layout (layers.* TorchScript state,
    metric_utils.py:253) verifies through the same flag."""
    favw = importlib.import_module("fetch_and_verify_weights")
    rc = favw.main(["--inception", _fake_nvidia_inception(
        str(tmp_path / "pt_inception-2015-12-05.pt"))])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[inception] VERIFIED" in out
