"""FORDE dual encoder: CLIP-style VisionTransformer + TextTransformer with
StatefulLayer blocks and a global-batch contrastive loss.

Spec: reference README.md:26-56 and BASELINE.json configs (the reference
repo removed this implementation in its LLM pivot; the preprocessing
contract survives in src/data/download_to_drive.py — 224x224x3 float32
images, bert-base-uncased input_ids/attention_mask, max text length 64).

TPU-first design:
  * patch embedding is a reshape + one Dense (a single MXU matmul — no conv
    needed for non-overlapping patches);
  * towers run bf16-capable flash attention; StatefulLayers use the fused
    Pallas multiplex kernel;
  * the contrastive loss computes the full global similarity matrix under
    jit — with the batch sharded over the ``data`` mesh axis XLA inserts
    the embedding all-gather over ICI automatically (the explicit
    shard_map variant lives in parallel/contrastive.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from forde_tpu.core.config import DualEncoderConfig, TowerConfig
from forde_tpu.nn.transformer import FORDETransformerBlock


class VisionTransformer(nn.Module):
    """ViT tower: patchify -> [CLS] + learned pos embed -> FORDE blocks ->
    final norm -> CLS output (README.md:30-34)."""

    config: DualEncoderConfig
    tower: TowerConfig

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg, tw = self.config, self.tower
        dtype = cfg.dtypes.compute
        b, h, w, c = images.shape
        p = cfg.patch_size
        nh, nw = h // p, w // p

        # Non-overlapping patchify as reshape + Dense (one MXU matmul).
        # Cast to the compute dtype BEFORE the patchify transpose: the
        # shuffle is pure data movement, so doing it at bf16 halves its
        # HBM bytes (154 MB -> 77 MB at ViT-B/128; cast_first won the
        # round-5 probe, benchmarks/patch_embed_probe.py / PERF.md).
        patches = images.astype(dtype).reshape(b, nh, p, nw, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, p * p * c)
        x = nn.Dense(tw.d_model, name="patch_embed", dtype=dtype)(patches)

        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, tw.d_model)
        )
        x = jnp.concatenate([jnp.tile(cls.astype(dtype), (b, 1, 1)), x], axis=1)
        # Register tokens (Darcet et al. 2023) pad the sequence to an
        # 8-aligned length: S = 197 would otherwise force a pad-copy of
        # every attention tensor (measured ~18GB/step of pure pad traffic
        # at ViT-B/128). Registers are real learned tokens — no masking,
        # no padding, and they absorb attention sinks as a bonus.
        num_registers = (8 - (nh * nw + 1) % 8) % 8
        if num_registers:
            reg = self.param(
                "register_tokens",
                nn.initializers.normal(stddev=0.02),
                (1, num_registers, tw.d_model),
            )
            x = jnp.concatenate(
                [x, jnp.tile(reg.astype(dtype), (b, 1, 1))], axis=1
            )
        num_tokens = nh * nw + 1 + num_registers
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, num_tokens, tw.d_model),
        )
        x = x + pos.astype(dtype)

        block_cls, remat_mlp = _block_cls(cfg)
        for i in range(tw.num_layers):
            x = block_cls(
                num_heads=tw.num_heads,
                head_dim=tw.head_dim,
                mlp_hidden_dim=tw.mlp_hidden_dim,
                d_model=tw.d_model,
                specialist_gate=cfg.specialist_gate,
                stateful_impl=cfg.stateful_kernel_impl,
                attention_impl=cfg.attention_kernel_impl,
                dropout_rate=tw.dropout_rate,
                dtype=dtype,
                remat_mlp=remat_mlp,
                sense=cfg.sense,
                name=f"block_{i}",
            )(x, None, deterministic)

        x = nn.LayerNorm(name="final_norm", dtype=dtype)(x)
        return x[:, 0, :]  # CLS


def _block_cls(cfg: DualEncoderConfig):
    """Resolve the remat policy: "block" remats whole blocks, "mlp" only
    the StatefulLayer (see DualEncoderConfig.remat)."""
    if cfg.remat in (True, "block"):
        return nn.remat(FORDETransformerBlock, static_argnums=(3,)), False
    return FORDETransformerBlock, cfg.remat == "mlp"


class TextTransformer(nn.Module):
    """Text tower over BERT-style (input_ids, attention_mask); the CLS
    position (index 0) is the sentence embedding (README.md:32-34)."""

    config: DualEncoderConfig
    tower: TowerConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg, tw = self.config, self.tower
        dtype = cfg.dtypes.compute
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)

        x = nn.Embed(
            num_embeddings=cfg.vocab_size,
            features=tw.d_model,
            dtype=dtype,
            name="token_embed",
        )(input_ids)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, cfg.max_text_len, tw.d_model),
        )
        x = x + pos[:, :s].astype(dtype)

        block_cls, remat_mlp = _block_cls(cfg)
        for i in range(tw.num_layers):
            x = block_cls(
                num_heads=tw.num_heads,
                head_dim=tw.head_dim,
                mlp_hidden_dim=tw.mlp_hidden_dim,
                d_model=tw.d_model,
                specialist_gate=cfg.specialist_gate,
                stateful_impl=cfg.stateful_kernel_impl,
                attention_impl=cfg.attention_kernel_impl,
                dropout_rate=tw.dropout_rate,
                dtype=dtype,
                remat_mlp=remat_mlp,
                sense=cfg.sense,
                name=f"block_{i}",
            )(x, attention_mask, deterministic)

        x = nn.LayerNorm(name="final_norm", dtype=dtype)(x)
        return x[:, 0, :]  # CLS


class FORDEDualEncoder(nn.Module):
    """Two towers + projection heads into the shared embedding space +
    learnable temperature (README.md:30-35).

    Uses ``setup()`` (not ``@nn.compact``) so the single-tower entry
    points ``encode_image`` / ``encode_text`` — the serving/retrieval
    surface — share the exact same submodules and param tree as
    ``__call__``."""

    config: DualEncoderConfig

    def setup(self):
        cfg = self.config
        self.vision = VisionTransformer(config=cfg, tower=cfg.vision)
        self.text = TextTransformer(config=cfg, tower=cfg.text)
        self.image_projection = nn.Dense(
            cfg.embed_dim, use_bias=False, dtype=cfg.dtypes.compute
        )
        self.text_projection = nn.Dense(
            cfg.embed_dim, use_bias=False, dtype=cfg.dtypes.compute
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda _key: jnp.array(cfg.logit_scale_init, jnp.float32),
        )

    def __call__(
        self,
        images: jnp.ndarray,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        img_emb = self.encode_image(images, deterministic)
        txt_emb = self.encode_text(input_ids, attention_mask, deterministic)
        return img_emb, txt_emb, self.logit_scale

    def encode_image(self, images, deterministic: bool = True):
        feat = self.vision(images, deterministic)
        return self.image_projection(feat).astype(jnp.float32)

    def encode_text(self, input_ids, attention_mask=None, deterministic=True):
        feat = self.text(input_ids, attention_mask, deterministic)
        return self.text_projection(feat).astype(jnp.float32)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def clip_contrastive_loss(
    img_emb: jnp.ndarray,
    txt_emb: jnp.ndarray,
    logit_scale: jnp.ndarray,
    max_scale: float = 100.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Symmetric InfoNCE over the (global) batch (README.md:35).

    Computes the full cosine-similarity matrix; under pjit with batch
    sharded on ``data``, XLA lowers the cross-batch matmul to an embedding
    all-gather over ICI + local matmuls — no hand-written collective.
    """
    img = l2_normalize(img_emb.astype(jnp.float32))
    txt = l2_normalize(txt_emb.astype(jnp.float32))
    scale = jnp.minimum(jnp.exp(logit_scale), max_scale)
    logits = img @ txt.T * scale  # (B, B)
    labels = jnp.arange(logits.shape[0])
    loss_i = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    loss_t = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
    loss = (loss_i + loss_t) / 2
    acc_i = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    acc_t = jnp.mean(jnp.argmax(logits, axis=0) == labels)
    return loss, {
        "contrastive/acc_img": acc_i,
        "contrastive/acc_txt": acc_t,
        "contrastive/logit_scale": scale,
    }


if __name__ == "__main__":
    # Module smoke test (reference __main__ block pattern).
    from forde_tpu.core.config import vit_tiny_config

    cfg = vit_tiny_config()
    model = FORDEDualEncoder(config=cfg)
    images = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    ids = jnp.ones((2, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), images, ids)
    (img, txt, scale), _ = model.apply(
        variables, images, ids, mutable=["stats_buffer"]
    )
    loss, metrics = clip_contrastive_loss(img, txt, scale)
    print(f"FORDEDualEncoder OK: img {img.shape} txt {txt.shape} "
          f"loss {float(loss):.4f}")
