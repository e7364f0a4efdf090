"""Q-Former (BLIP-2 querying transformer), TPU-native.

The reference vendors BLIP-2's BERT-with-cross-attention
(ref ``graphs/models/minigpt4/models/Qformer.py``) and uses it exclusively
in query mode: 32 learned query tokens self-attend and cross-attend into
the frozen ViT's image tokens (ref ``minigpt4.py:121-149``); word/position
embeddings are pruned (ref ``minigpt4.py:104-109``). This module therefore
implements exactly that live path — a query-only encoder — rather than the
full BertLMHeadModel surface:

- query embeds pass through the embeddings LayerNorm (ref Qformer.py:104-106);
- post-LN BERT blocks: self-attn -> add&norm, cross-attn (on layers where
  ``layer % cross_attention_freq == 0``, ref Qformer.py:388) -> add&norm,
  then the *query* feed-forward branch (intermediate_query/output_query,
  ref Qformer.py:378-485) -> add&norm;
- cross-attention keys/values project from ``encoder_width`` (the ViT
  embed dim, 1408) into the BERT hidden size.

Layers are Python-unrolled (12 layers, heterogeneous structure: only even
layers carry cross-attention params) — negligible compile cost next to the
39-layer scanned ViT and 32-layer scanned LLaMA.

Numerical parity is validated against HF ``Blip2QFormerModel`` in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from certifiedgpt_tpu.models import layers as L
from certifiedgpt_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_freq: int = 2
    encoder_width: int = 1408  # ViT embed dim
    num_query_tokens: int = 32
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def has_cross_attention(self, layer: int) -> bool:
        return layer % self.cross_attention_freq == 0

    @staticmethod
    def blip2() -> "QFormerConfig":
        return QFormerConfig()

    @staticmethod
    def tiny(**overrides) -> "QFormerConfig":
        base = dict(
            hidden_size=32,
            num_layers=4,
            num_heads=4,
            intermediate_size=64,
            cross_attention_freq=2,
            encoder_width=48,
            num_query_tokens=8,
            dtype=jnp.float32,
        )
        base.update(overrides)
        return QFormerConfig(**base)


def _init_layer(key, cfg: QFormerConfig, layer: int) -> Dict[str, Any]:
    keys = jax.random.split(key, 10)
    d, dw = cfg.hidden_size, cfg.encoder_width
    params = {
        "self_q": L.init_dense(keys[0], d, d, dtype=cfg.dtype),
        "self_k": L.init_dense(keys[1], d, d, dtype=cfg.dtype),
        "self_v": L.init_dense(keys[2], d, d, dtype=cfg.dtype),
        "self_out": L.init_dense(keys[3], d, d, dtype=cfg.dtype),
        "self_ln": L.init_layer_norm(d, cfg.dtype),
        "int_q": L.init_dense(keys[4], d, cfg.intermediate_size, dtype=cfg.dtype),
        "out_q": L.init_dense(keys[5], cfg.intermediate_size, d, dtype=cfg.dtype),
        "ffn_ln_q": L.init_layer_norm(d, cfg.dtype),
    }
    if cfg.has_cross_attention(layer):
        params.update(
            {
                "cross_q": L.init_dense(keys[6], d, d, dtype=cfg.dtype),
                "cross_k": L.init_dense(keys[7], dw, d, dtype=cfg.dtype),
                "cross_v": L.init_dense(keys[8], dw, d, dtype=cfg.dtype),
                "cross_out": L.init_dense(keys[9], d, d, dtype=cfg.dtype),
                "cross_ln": L.init_layer_norm(d, cfg.dtype),
            }
        )
    return params


def init_qformer(key, cfg: QFormerConfig) -> Dict[str, Any]:
    k_query, k_layers = jax.random.split(key)
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    return {
        "query_tokens": L.trunc_normal(
            k_query, (1, cfg.num_query_tokens, cfg.hidden_size), dtype=cfg.dtype
        ),
        "embeddings_ln": L.init_layer_norm(cfg.hidden_size, cfg.dtype),
        "layers": {
            f"layer_{i}": _init_layer(layer_keys[i], cfg, i)
            for i in range(cfg.num_layers)
        },
    }


def _attend(q_params, k_params, v_params, out_params, ln_params, x, kv, cfg):
    """One post-LN attention sub-block: attn -> dense -> LN(res + x)."""
    b, s, _ = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    q = L.dense(q_params, x).reshape(b, s, h, dh)
    k = L.dense(k_params, kv).reshape(b, kv.shape[1], h, dh)
    v = L.dense(v_params, kv).reshape(b, kv.shape[1], h, dh)
    attn = multi_head_attention(q, k, v).reshape(b, s, h * dh)
    return L.layer_norm(ln_params, L.dense(out_params, attn) + x, cfg.layer_norm_eps)


def qformer_apply(
    params: Dict[str, Any],
    cfg: QFormerConfig,
    image_embeds: jnp.ndarray,  # [B, S_img, encoder_width]
) -> jnp.ndarray:
    """Query-mode forward: learned queries attend into image tokens.

    Returns [B, num_query_tokens, hidden_size].
    """
    b = image_embeds.shape[0]
    x = jnp.broadcast_to(
        params["query_tokens"].astype(cfg.dtype),
        (b, cfg.num_query_tokens, cfg.hidden_size),
    )
    x = L.layer_norm(params["embeddings_ln"], x, cfg.layer_norm_eps)
    kv_img = image_embeds.astype(cfg.dtype)

    for i in range(cfg.num_layers):
        lp = params["layers"][f"layer_{i}"]
        x = _attend(
            lp["self_q"], lp["self_k"], lp["self_v"], lp["self_out"],
            lp["self_ln"], x, x, cfg,
        )
        if cfg.has_cross_attention(i):
            x = _attend(
                lp["cross_q"], lp["cross_k"], lp["cross_v"], lp["cross_out"],
                lp["cross_ln"], x, kv_img, cfg,
            )
        hidden = L.dense(lp["out_q"], L.gelu(L.dense(lp["int_q"], x)))
        x = L.layer_norm(lp["ffn_ln_q"], hidden + x, cfg.layer_norm_eps)

    return x
