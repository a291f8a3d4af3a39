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
