"""Text-driven brush search and optimization.

Rebuild of the reference CLIP tooling (forger/util/clip_util.py):
  * FeatureDictionary (:33-89): embed pre-rendered style thumbnails, answer
    text queries with top-k styles by cosine similarity.
  * ClipStyleOptimizer (:146-284): optimize a style's W+ (+noise) against a
    text embedding with background-clarity and geometry-adherence terms.

The vision/text backbone is pluggable (:class:`ClipBackbone`) and every
backbone carries a ``kind`` label that search outputs print:

* :class:`CLIPBackbone` (``kind="clip"``): the REAL CLIP architecture
  (:mod:`.clip_model` -- ViT image tower + causal text transformer +
  byte-BPE tokenizer) fed by an OpenAI CLIP state dict; with pretrained
  weights, text->style search is semantically meaningful.
* :class:`HashingBackbone` (``kind="hashing"``): a deterministic
  random-projection embedder (words -> hashed bag-of-words -> unit sphere;
  images -> random conv features), the no-weights fallback so the whole
  search/optimization machinery runs and is testable.  Rankings from it
  are NOT semantically meaningful.
"""

from __future__ import annotations

import logging
import pickle
import re
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

logger = logging.getLogger(__name__)

EMBED_DIM = 256


class ClipBackbone:
    """Interface: encode_image([B,H,W,3] float [0,1]) -> [B, D] unit vecs;
    encode_text(list[str]) -> [N, D] unit vectors.  ``kind`` labels the
    backbone in search outputs (semantic vs fallback)."""

    dim = EMBED_DIM
    kind = "abstract"

    def encode_image(self, images) -> jnp.ndarray:
        raise NotImplementedError

    def encode_text(self, texts: List[str]) -> jnp.ndarray:
        raise NotImplementedError


class CLIPBackbone(ClipBackbone):
    """The real CLIP model (tools/clip_model.py) over OpenAI weights."""

    kind = "clip"

    def __init__(self, weights_path: str, bpe_path: Optional[str] = None):
        from brushstroke_engine_tpu.tools import clip_model as cm
        self.cfg, self.params, self.tokenizer = cm.load_openai_clip(
            weights_path, bpe_path)
        self.dim = self.cfg.embed_dim
        self._cm = cm

    def encode_image(self, images) -> jnp.ndarray:
        return self._cm.encode_image(self.cfg, self.params, images)

    def encode_text(self, texts: List[str]) -> jnp.ndarray:
        assert self.tokenizer is not None, \
            "text encoding needs the BPE merges file (bpe_path)"
        return self._cm.encode_text(self.cfg, self.params,
                                    self.tokenizer(texts))


class HashingBackbone(ClipBackbone):
    """Deterministic fallback backbone (no pretrained weights needed);
    NOT semantic -- see module docstring."""

    kind = "hashing"

    def __init__(self, seed: int = 0, dim: int = EMBED_DIM):
        self.dim = dim
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self._conv = 0.1 * jax.random.normal(k1, (8, 8, 3, 64), jnp.float32)
        self._proj = jax.random.normal(k2, (64, dim), jnp.float32) / 8.0
        self._seed = seed

    def encode_image(self, images) -> jnp.ndarray:
        x = jnp.asarray(images, jnp.float32)
        feats = jax.lax.conv_general_dilated(
            x * 2 - 1, self._conv, (8, 8), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        pooled = jnp.mean(jax.nn.relu(feats), axis=(1, 2))
        emb = pooled @ self._proj
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_text(self, texts: List[str]) -> jnp.ndarray:
        out = []
        for text in texts:
            vec = np.zeros(self.dim, np.float64)
            for word in re.findall(r"\w+", text.lower()):
                rng = np.random.RandomState(
                    (hash((word, self._seed)) & 0x7fffffff))
                vec += rng.randn(self.dim)
            n = np.linalg.norm(vec)
            out.append(vec / n if n > 0 else vec)
        return jnp.asarray(np.stack(out), jnp.float32)


def default_backbone() -> ClipBackbone:
    """Real CLIP ViT-B/32 when installed (utils.weights registry), else the
    labeled hashing fallback."""
    from brushstroke_engine_tpu.utils.weights import find_weights
    path = find_weights("clip")
    if path:
        return CLIPBackbone(path, find_weights("clip_bpe"))
    return HashingBackbone()


class FeatureDictionary:
    """Style-thumbnail embedding index for text queries
    (reference clip_util.py:33-89)."""

    def __init__(self, backbone: Optional[ClipBackbone] = None):
        self.backbone = backbone or default_backbone()
        self.keys: List[str] = []
        self.features: Optional[np.ndarray] = None

    def add_images(self, keys: List[str], images):
        """images: [N, H, W, 3] float [0,1] thumbnails."""
        emb = np.asarray(self.backbone.encode_image(images))
        if self.features is None:
            self.features = emb
            self.keys = list(keys)
        else:
            self.features = np.concatenate([self.features, emb], axis=0)
            self.keys.extend(keys)

    def build_from_library(self, library, mapper, width: int = 128):
        """Embed brush icons for every style in a library."""
        from brushstroke_engine_tpu.engine.brush import GanBrushOptions
        ids = library.get_style_ids()
        icons = []
        for style_id in ids:
            opts = GanBrushOptions()
            library.set_style(style_id, opts)
            icons.append(mapper.get_brush_icon(opts).astype(np.float32)
                         / 255.0)
        self.add_images(ids, np.stack(icons))

    def get_top_results(self, query: str, k: int = 10
                        ) -> List[Tuple[str, float]]:
        assert self.features is not None, "dictionary is empty"
        text = np.asarray(self.backbone.encode_text([query]))[0]
        sims = self.features @ text
        order = np.argsort(-sims)[:k]
        return [(self.keys[i], float(sims[i])) for i in order]

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump({"keys": self.keys, "features": self.features}, f)

    @staticmethod
    def load(path: str, backbone: Optional[ClipBackbone] = None
             ) -> "FeatureDictionary":
        with open(path, "rb") as f:
            data = pickle.load(f)
        d = FeatureDictionary(backbone)
        d.keys = data["keys"]
        d.features = data["features"]
        return d


@dataclass(frozen=True)
class ClipOptConfig:
    num_steps: int = 300
    learning_rate: float = 0.02
    clip_weight: float = 1.0
    bg_weight: float = 0.5          # background clarity (uvs S over BG)
    geom_weight: float = 0.5        # geometry adherence (iou_inv)
    noise_reg_weight: float = 10.0
    optimize_noise: bool = False


class ClipStyleOptimizer:
    """Optimize W+ toward a text embedding (reference clip_util.py:146-284).

    Per step: render the current style on a fresh geometry batch, embed the
    white-composited render, maximize cosine similarity to the text
    embedding, plus clarity/adherence regularizers.
    """

    def __init__(self, engine, backbone: Optional[ClipBackbone] = None,
                 cfg: ClipOptConfig = ClipOptConfig()):
        self.engine = engine
        self.backbone = backbone or HashingBackbone()
        self.cfg = cfg

    def optimize(self, text: str, w_init, geometry_batches, seed: int = 0
                 ) -> Dict:
        from brushstroke_engine_tpu.models.generator import generator_apply
        from brushstroke_engine_tpu.models.geo_encoder import \
            geo_encoder_encode
        from brushstroke_engine_tpu.tools.projection import \
            _noise_autocorr_reg
        from brushstroke_engine_tpu.train.losses import compute_iou

        cfg = self.cfg
        engine = self.engine
        gen_cfg = engine.gen_cfg
        text_emb = self.backbone.encode_text([text])[0]
        g_state = {"w_avg": engine.gen_state.get("w_avg"),
                   "noise": engine.gen_state["noise"]}

        params = {"w": jnp.asarray(w_init, jnp.float32)}
        if cfg.optimize_noise:
            rng = np.random.RandomState(seed)
            params["noise"] = {
                k: jnp.asarray(rng.randn(*np.asarray(v).shape), jnp.float32)
                for k, v in engine.gen_state["noise"].items()}
        opt = optax.adam(cfg.learning_rate)
        opt_state = opt.init(params)

        def step_once(params, opt_state, geom):
            feats = geo_encoder_encode(engine.enc_cfg, engine.enc_params,
                                       engine.enc_state, geom,
                                       res=list(engine.enc_res))
            b = geom.shape[0]

            def loss_fn(params):
                ws = jnp.tile(params["w"], (b, 1, 1))
                img, debug, _ = generator_apply(
                    gen_cfg, engine.gen_params, g_state, ws=ws,
                    geom_features=feats, noise_mode="const",
                    noise_buffers=params.get("noise"),
                    return_debug_data=True)
                uvs = debug["uvs"]
                # White-composited render for the image embedding.
                alpha = jnp.sum(uvs[..., :2], axis=-1, keepdims=True)
                rgb = (img + 1) / 2 * alpha + (1 - alpha)
                emb = self.backbone.encode_image(rgb)
                clip_loss = 1.0 - jnp.mean(emb @ text_emb)
                bg_loss = compute_iou(uvs[..., 2], geom[..., 0])
                geom_loss = compute_iou(
                    jnp.sum(uvs[..., :2], axis=-1), 1.0 - geom[..., 0])
                total = cfg.clip_weight * clip_loss \
                    + cfg.bg_weight * bg_loss + cfg.geom_weight * geom_loss
                if "noise" in params:
                    total = total + cfg.noise_reg_weight * \
                        _noise_autocorr_reg(params["noise"])
                return total, clip_loss

            (total, clip_loss), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, clip_loss

        # One dispatch per log interval (see tools/clarity.py): scan over
        # a stacked chunk of geometry batches instead of a host step loop.
        @partial(jax.jit, donate_argnums=(0, 1))
        def run_chunk(params, opt_state, geoms):
            def body(carry, geom):
                params, opt_state = carry
                params, opt_state, total, clip_loss = step_once(
                    params, opt_state, geom)
                return (params, opt_state), (total, clip_loss)
            (params, opt_state), (totals, clips) = jax.lax.scan(
                body, (params, opt_state), geoms)
            return params, opt_state, totals[-1], clips[-1]

        total = clip_loss = jnp.inf
        step = 0
        while step < cfg.num_steps:
            k = min(50, cfg.num_steps - step)
            geoms = jnp.asarray(np.stack(
                [next(geometry_batches) for _ in range(k)]), jnp.float32)
            params, opt_state, total, clip_loss = run_chunk(
                params, opt_state, geoms)
            step += k
            logger.info("clip step %d: total %.4f clip %.4f", step,
                        float(total), float(clip_loss))
        out = {"w": np.asarray(params["w"]), "loss": float(total),
               "clip_loss": float(clip_loss)}
        if "noise" in params:
            out["noise"] = {k: np.asarray(v)
                            for k, v in params["noise"].items()}
        return out
