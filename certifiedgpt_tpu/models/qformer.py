"""Q-Former (BLIP-2 querying transformer), TPU-native.

The reference vendors BLIP-2's BERT-with-cross-attention
(ref ``graphs/models/minigpt4/models/Qformer.py``) and uses it exclusively
in query mode: 32 learned query tokens self-attend and cross-attend into
the frozen ViT's image tokens (ref ``minigpt4.py:121-149``); word/position
embeddings are pruned (ref ``minigpt4.py:104-109``). ``qformer_apply``
implements exactly that live path (query-only encoder); the vendored
file's text-conditioned surface (ref ``Qformer.py:968-1130``:
``BertModel`` with text input + ``BertLMHeadModel`` causal head) is
provided by ``qformer_text_apply`` / ``qformer_lm_logits``:

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
    # text-mode surface (ref Qformer.py:968-1130 BertLMHeadModel): BERT
    # vocabulary + absolute positions; only materialized by
    # init_qformer_text / the converter when a checkpoint carries them
    vocab_size: int = 30522
    max_position_embeddings: int = 512

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
            vocab_size=64,
            max_position_embeddings=32,
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


def _attend(q_params, k_params, v_params, out_params, ln_params, x, kv, cfg,
            mask=None):
    """One post-LN attention sub-block: attn -> dense -> LN(res + x)."""
    b, s, _ = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    q = L.dense(q_params, x).reshape(b, s, h, dh)
    k = L.dense(k_params, kv).reshape(b, kv.shape[1], h, dh)
    v = L.dense(v_params, kv).reshape(b, kv.shape[1], h, dh)
    attn = multi_head_attention(q, k, v, mask).reshape(b, s, h * dh)
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


# ----------------------------------------------------------------------
# text-conditioned surface (ref Qformer.py:968-1130)
# ----------------------------------------------------------------------
def init_qformer_text(key, cfg: QFormerConfig) -> Dict[str, Any]:
    """Full param set: query-mode leaves + text embeddings, the per-layer
    TEXT feed-forward branch (ref ``Qformer.py:378-485`` intermediate/
    output vs intermediate_query/output_query) and the causal-LM
    prediction head (ref ``BertOnlyMLMHead``; decoder tied to the word
    embeddings)."""
    k_base, k_word, k_pos, k_txt, k_cls = jax.random.split(key, 5)
    params = init_qformer(k_base, cfg)
    d = cfg.hidden_size
    params["word_embeddings"] = L.init_embedding(
        k_word, cfg.vocab_size, d, dtype=cfg.dtype
    )
    params["position_embeddings"] = L.init_embedding(
        k_pos, cfg.max_position_embeddings, d, dtype=cfg.dtype
    )
    txt_keys = jax.random.split(k_txt, cfg.num_layers * 2)
    for i in range(cfg.num_layers):
        lp = params["layers"][f"layer_{i}"]
        lp["int_txt"] = L.init_dense(
            txt_keys[2 * i], d, cfg.intermediate_size, dtype=cfg.dtype
        )
        lp["out_txt"] = L.init_dense(
            txt_keys[2 * i + 1], cfg.intermediate_size, d, dtype=cfg.dtype
        )
        lp["ffn_ln_txt"] = L.init_layer_norm(d, cfg.dtype)
    params["cls_transform"] = L.init_dense(k_cls, d, d, dtype=cfg.dtype)
    params["cls_ln"] = L.init_layer_norm(d, cfg.dtype)
    params["cls_bias"] = jnp.zeros((cfg.vocab_size,), cfg.dtype)
    return params


def qformer_text_apply(
    params: Dict[str, Any],
    cfg: QFormerConfig,
    input_ids: jnp.ndarray,  # [B, T]
    attention_mask: jnp.ndarray = None,  # [B, T] 1=valid text token
    image_embeds: jnp.ndarray = None,  # [B, S_img, encoder_width] or None
    with_query: bool = True,
    causal: bool = False,
) -> jnp.ndarray:
    """Text-conditioned forward.

    ``with_query``: prepend the learned query tokens (multimodal mode —
    queries cross-attend into ``image_embeds`` on cross layers, text does
    not, ref HF ``Blip2QFormerLayer``/LAVIS ``query_length`` routing).
    ``causal=False``: bidirectional (ITM/ITC); ``causal=True``: UniLM-style
    ITG mask — queries see only queries, text sees all queries + its own
    causal prefix (ref ``BertLMHeadModel`` generation masking).

    Returns [B, (Q+)T, hidden].
    """
    b, t = input_ids.shape
    text = L.embed(params["word_embeddings"], input_ids)
    text = text + L.embed(
        params["position_embeddings"],
        jnp.broadcast_to(jnp.arange(t), (b, t)).astype(jnp.int32),
    )
    nq = cfg.num_query_tokens if with_query else 0
    if with_query:
        query = jnp.broadcast_to(
            params["query_tokens"].astype(text.dtype),
            (b, nq, cfg.hidden_size),
        )
        x = jnp.concatenate([query, text], axis=1)
    else:
        x = text
    x = L.layer_norm(params["embeddings_ln"], x, cfg.layer_norm_eps)

    s = nq + t
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    key_valid = jnp.concatenate(
        [jnp.ones((b, nq), jnp.int32), attention_mask.astype(jnp.int32)], axis=1
    )  # [B, S]
    mask = key_valid[:, None, None, :].astype(bool)  # [B,1,1,S]
    if causal:
        pos = jnp.arange(s)
        is_text_k = pos >= nq
        # query rows attend to queries only; text rows attend to all
        # queries and text positions <= their own
        allowed = jnp.where(
            (pos < nq)[:, None],  # query row
            ~is_text_k[None, :],
            (~is_text_k | (pos[None, :] <= pos[:, None])),
        )  # [S, S]
        mask = mask & allowed[None, None]

    kv_img = None if image_embeds is None else image_embeds.astype(x.dtype)
    for i in range(cfg.num_layers):
        lp = params["layers"][f"layer_{i}"]
        x = _attend(
            lp["self_q"], lp["self_k"], lp["self_v"], lp["self_out"],
            lp["self_ln"], x, x, cfg, mask=mask,
        )
        if with_query:
            xq, xt = x[:, :nq], x[:, nq:]
            if cfg.has_cross_attention(i) and kv_img is not None:
                xq = _attend(
                    lp["cross_q"], lp["cross_k"], lp["cross_v"],
                    lp["cross_out"], lp["cross_ln"], xq, kv_img, cfg,
                )
            hq = L.dense(lp["out_q"], L.gelu(L.dense(lp["int_q"], xq)))
            xq = L.layer_norm(lp["ffn_ln_q"], hq + xq, cfg.layer_norm_eps)
            ht = L.dense(lp["out_txt"], L.gelu(L.dense(lp["int_txt"], xt)))
            xt = L.layer_norm(lp["ffn_ln_txt"], ht + xt, cfg.layer_norm_eps)
            x = jnp.concatenate([xq, xt], axis=1)
        else:
            ht = L.dense(lp["out_txt"], L.gelu(L.dense(lp["int_txt"], x)))
            x = L.layer_norm(lp["ffn_ln_txt"], ht + x, cfg.layer_norm_eps)
    return x


def qformer_lm_logits(
    params: Dict[str, Any], cfg: QFormerConfig, hidden: jnp.ndarray
) -> jnp.ndarray:
    """Causal-LM prediction head: transform -> gelu -> LN -> decoder tied
    to the word embeddings + bias (ref ``BertLMPredictionHead``)."""
    h = L.gelu(L.dense(params["cls_transform"], hidden))
    h = L.layer_norm(params["cls_ln"], h, cfg.layer_norm_eps)
    logits = jnp.einsum(
        "...d,vd->...v",
        h,
        params["word_embeddings"]["embedding"],
        preferred_element_type=jnp.float32,
    )
    return logits + params["cls_bias"].astype(jnp.float32)
