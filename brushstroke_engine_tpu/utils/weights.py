"""Central pretrained-weights registry.

The metric/tool stacks (FID Inception-v3, LPIPS-Alex, VGG16, CLIP ViT-B/32)
ship with full real architectures plus converters, but this environment has
no network egress so the actual pretrained files cannot be fetched; every
consumer falls back to labeled ``*_random`` detectors.  This module is the
single discovery point for the day weights arrive:

  * env override per family (e.g. ``NEUBE_FID_DETECTOR=/path.pt``), or
  * a canonical filename inside ``$NEUBE_WEIGHTS_DIR`` (default ``weights/``
    under the repo root), installed by ``scripts/fetch_and_verify_weights.py``
    which also runs every converter + activation sanity check and records
    sha256 digests in ``manifest.json``.

Reference anchor: the reference downloads these lazily from NVIDIA CDN urls
(metric_utils.py:236-286, lpips package, clip package); a converter-backed
local weights dir is the egress-free equivalent.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional

#: family -> (canonical filename, env var override)
CANONICAL: Dict[str, tuple] = {
    "inception": ("inception_v3.pt", "NEUBE_FID_DETECTOR"),
    "lpips": ("lpips_alex.pt", "NEUBE_LPIPS_WEIGHTS"),
    "vgg16": ("vgg16.pt", "NEUBE_VGG16_WEIGHTS"),
    "clip": ("clip_vitb32.pt", "NEUBE_CLIP_WEIGHTS"),
    "clip_bpe": ("bpe_simple_vocab_16e6.txt.gz", "NEUBE_CLIP_BPE"),
}


def weights_dir() -> str:
    d = os.environ.get("NEUBE_WEIGHTS_DIR")
    if d:
        return d
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo_root, "weights")


def find_weights(family: str) -> Optional[str]:
    """Path to a family's installed weights file, or None (-> random
    fallback).  Env var wins over the weights dir."""
    fname, env = CANONICAL[family]
    p = os.environ.get(env)
    if p:
        return p if os.path.exists(p) else None
    p = os.path.join(weights_dir(), fname)
    return p if os.path.exists(p) else None


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def read_manifest() -> Dict:
    p = os.path.join(weights_dir(), "manifest.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def write_manifest(entries: Dict) -> str:
    os.makedirs(weights_dir(), exist_ok=True)
    p = os.path.join(weights_dir(), "manifest.json")
    merged = read_manifest()
    merged.update(entries)
    with open(p, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    return p
