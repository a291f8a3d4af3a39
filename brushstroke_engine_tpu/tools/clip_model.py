"""Real CLIP vision-text backbone (ViT image encoder + causal text
transformer) as a functional JAX program, with a converter from OpenAI CLIP
state dicts.

The reference's text-driven brush search (forger/util/clip_util.py) drives
a pretrained CLIP; this module supplies the actual architecture so loading
real weights produces semantically meaningful search.  The model config
(patch size, widths, depths, vocab) is DERIVED from the state-dict tensor
shapes, so ViT-B/32, ViT-B/16, and ViT-L/14 checkpoints all load.

Text tokenization is the standard CLIP byte-BPE (bytes-to-unicode + ranked
merges); pass the merges file (``bpe_simple_vocab_16e6.txt[.gz]``) that
ships with every CLIP distribution.  Math follows the published CLIP
architecture: pre-norm transformer blocks with QuickGELU, class-token ViT
with ln_pre/ln_post, EOT-token text features, learned projections to the
shared embedding space; validated against an independent torch golden in
``tests/test_clip_model.py``.
"""

from __future__ import annotations

import gzip
import html
import re
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Byte-BPE tokenizer (the standard CLIP text preprocessing).
# ---------------------------------------------------------------------------

@lru_cache()
def _bytes_to_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(ord("\xa1"), ord("\xac") + 1)) + \
        list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class SimpleTokenizer:
    """CLIP byte-BPE tokenizer; ``bpe_path`` is the merges file shipped
    with CLIP (plain or gzipped)."""

    def __init__(self, bpe_path: str, context_length: int = 77):
        self.context_length = context_length
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]
                  if m]
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {}
        # CLIP's published pattern uses \p{L}/\p{N} (regex module); the
        # stdlib-re ASCII classes below match it for English text.
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+", re.IGNORECASE)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and \
                        word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        tokens = []
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text).strip().lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return tokens

    def __call__(self, texts: List[str]) -> np.ndarray:
        """texts -> [N, context_length] int32 with SOT/EOT + zero pad."""
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, text in enumerate(texts):
            toks = [sot] + self.encode(text)[:self.context_length - 2] + [eot]
            out[i, :len(toks)] = toks
        return out


# ---------------------------------------------------------------------------
# Architecture.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    image_resolution: int
    vision_width: int
    vision_layers: int
    vision_patch: int
    vision_heads: int
    context_length: int
    vocab_size: int
    text_width: int
    text_layers: int
    text_heads: int


def _ln(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(p, x, heads: int, causal: bool):
    """Pre-LN multi-head self-attention, torch in_proj semantics."""
    n, d = x.shape[-2], x.shape[-1]
    qkv = x @ p["qkv_w"] + p["qkv_b"]                    # [.., N, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(t.shape[:-1] + (heads, d // heads)) \
            .swapaxes(-3, -2)                            # [.., H, N, dh]

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    scale = 1.0 / np.sqrt(d // heads)
    logits = (q @ k.swapaxes(-1, -2)) * scale            # [.., H, N, N]
    if causal:
        mask = jnp.tril(jnp.ones((n, n), bool))
        logits = jnp.where(mask, logits, -jnp.inf)
    att = jax.nn.softmax(logits, axis=-1)
    out = (att @ v).swapaxes(-3, -2).reshape(x.shape)    # [.., N, D]
    return out @ p["out_w"] + p["out_b"]


def _block(p, x, heads: int, causal: bool):
    x = x + _attention(p["attn"], _ln(p["ln1"], x), heads, causal)
    h = _ln(p["ln2"], x)
    h = _quick_gelu(h @ p["fc_w"] + p["fc_b"])
    return x + (h @ p["proj_w"] + p["proj_b"])


def encode_image(cfg: CLIPConfig, params: Dict, images) -> jnp.ndarray:
    """[B, H, W, 3] float in [0,1] -> [B, embed_dim] unit vectors."""
    v = params["visual"]
    x = jnp.asarray(images, jnp.float32)
    if x.shape[1:3] != (cfg.image_resolution, cfg.image_resolution):
        x = jax.image.resize(
            x, (x.shape[0], cfg.image_resolution, cfg.image_resolution, 3),
            "bilinear")
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
    x = (x - mean) / std
    p = cfg.vision_patch
    x = jax.lax.conv_general_dilated(
        x, v["conv"], (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))      # [B, g, g, W]
    x = x.reshape(x.shape[0], -1, cfg.vision_width)
    cls = jnp.broadcast_to(v["class_emb"],
                           (x.shape[0], 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1) + v["pos_emb"]
    x = _ln(v["ln_pre"], x)
    for blk in v["blocks"]:
        x = _block(blk, x, cfg.vision_heads, causal=False)
    x = _ln(v["ln_post"], x[:, 0])
    x = x @ v["proj"]
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def encode_text(cfg: CLIPConfig, params: Dict, tokens) -> jnp.ndarray:
    """[N, context_length] int tokens -> [N, embed_dim] unit vectors."""
    t = params["text"]
    tokens = jnp.asarray(tokens, jnp.int32)
    x = t["tok_emb"][tokens] + t["pos_emb"][:tokens.shape[1]]
    for blk in t["blocks"]:
        x = _block(blk, x, cfg.text_heads, causal=True)
    x = _ln(t["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
    x = x[jnp.arange(x.shape[0]), eot] @ t["text_proj"]
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# OpenAI state-dict conversion.
# ---------------------------------------------------------------------------

def _np32(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _convert_blocks(state, prefix, n_layers):
    blocks = []
    for i in range(n_layers):
        b = f"{prefix}.resblocks.{i}"
        blocks.append({
            "ln1": {"scale": _np32(state[f"{b}.ln_1.weight"]),
                    "bias": _np32(state[f"{b}.ln_1.bias"])},
            "attn": {
                "qkv_w": _np32(state[f"{b}.attn.in_proj_weight"]).T,
                "qkv_b": _np32(state[f"{b}.attn.in_proj_bias"]),
                "out_w": _np32(state[f"{b}.attn.out_proj.weight"]).T,
                "out_b": _np32(state[f"{b}.attn.out_proj.bias"]),
            },
            "ln2": {"scale": _np32(state[f"{b}.ln_2.weight"]),
                    "bias": _np32(state[f"{b}.ln_2.bias"])},
            "fc_w": _np32(state[f"{b}.mlp.c_fc.weight"]).T,
            "fc_b": _np32(state[f"{b}.mlp.c_fc.bias"]),
            "proj_w": _np32(state[f"{b}.mlp.c_proj.weight"]).T,
            "proj_b": _np32(state[f"{b}.mlp.c_proj.bias"]),
        })
    return blocks


def from_openai_state(state: Dict) -> (CLIPConfig, Dict):
    """OpenAI CLIP state_dict (ViT visual tower) -> (config, params).

    All shape-derived: works for ViT-B/32, ViT-B/16, ViT-L/14 checkpoints
    (state dicts from ``clip.load(...)`` or the published .pt files'
    ``model.state_dict()``).
    """
    conv = _np32(state["visual.conv1.weight"])           # [W, 3, p, p]
    vision_width, _, patch, _ = conv.shape
    grid = int(np.sqrt(state["visual.positional_embedding"].shape[0] - 1))
    vision_layers = len({
        int(k.split(".")[3]) for k in state
        if k.startswith("visual.transformer.resblocks.")})
    text_layers = len({
        int(k.split(".")[2]) for k in state
        if k.startswith("transformer.resblocks.")})
    embed_dim = _np32(state["text_projection"]).shape[1]
    text_width = _np32(state["ln_final.weight"]).shape[0]
    cfg = CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=grid * patch,
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_patch=patch,
        vision_heads=vision_width // 64,
        context_length=_np32(state["positional_embedding"]).shape[0],
        vocab_size=_np32(state["token_embedding.weight"]).shape[0],
        text_width=text_width,
        text_layers=text_layers,
        text_heads=text_width // 64,
    )
    params = {
        "visual": {
            "conv": np.transpose(conv, (2, 3, 1, 0)),    # -> HWIO
            "class_emb": _np32(state["visual.class_embedding"]),
            "pos_emb": _np32(state["visual.positional_embedding"]),
            "ln_pre": {"scale": _np32(state["visual.ln_pre.weight"]),
                       "bias": _np32(state["visual.ln_pre.bias"])},
            "blocks": _convert_blocks(state, "visual.transformer",
                                      vision_layers),
            "ln_post": {"scale": _np32(state["visual.ln_post.weight"]),
                        "bias": _np32(state["visual.ln_post.bias"])},
            "proj": _np32(state["visual.proj"]),
        },
        "text": {
            "tok_emb": _np32(state["token_embedding.weight"]),
            "pos_emb": _np32(state["positional_embedding"]),
            "blocks": _convert_blocks(state, "transformer", text_layers),
            "ln_final": {"scale": _np32(state["ln_final.weight"]),
                         "bias": _np32(state["ln_final.bias"])},
            "text_proj": _np32(state["text_projection"]),
        },
    }
    return cfg, params


def load_openai_clip(weights_path: str, bpe_path: Optional[str] = None):
    """Load a CLIP .pt/.pth checkpoint -> (config, params, tokenizer).

    Accepts a plain state_dict pickle or a TorchScript archive (via
    torch.jit.load).  The tokenizer requires the BPE merges file.
    """
    import torch
    try:
        obj = torch.load(weights_path, map_location="cpu",
                         weights_only=False)
        state = obj.state_dict() if hasattr(obj, "state_dict") else obj
    except Exception:
        state = torch.jit.load(weights_path, map_location="cpu").state_dict()
    cfg, params = from_openai_state(state)
    # Commit to device once; host-numpy leaves would re-stage the full
    # weight set on every encode batch.
    from brushstroke_engine_tpu.utils.util import commit_to_default_device
    params = commit_to_default_device(params)
    tokenizer = SimpleTokenizer(bpe_path, cfg.context_length) \
        if bpe_path else None
    return cfg, params, tokenizer
