"""LLaMA/Vicuna decoder, TPU-native.

Functional re-design of the decoder the reference drives through HF
``LlamaForCausalLM`` (ref ``graphs/models/minigpt4/models/modeling_llama.py``
wraps it to add label-smoothed CE and per-sample reduction; ref
``base_model.py:181-247`` loads Vicuna-7B frozen). Differences by design:

- **Scan over stacked layers** in the no-cache (training) path: per-layer
  params are stacked on a leading axis and the block runs under
  ``lax.scan`` — one traced block instead of 32 unrolled ones, keeping
  XLA compile time flat in depth.
- **Explicit per-layer KV cache** (see ``init_kv_cache``) in the cached
  path, where layers unroll over independent buffers updated with
  ``lax.dynamic_update_slice`` at a static-shape offset — the fixed-shape
  TPU replacement for HF's dynamic ``past_key_values``, laid out so the
  decode scan's carry aliasing updates each buffer in place.
- **inputs_embeds-first API**: the multimodal path always feeds embeddings
  (image prefix + text), ids are embedded by the caller via
  ``embed_tokens``.
- rotary/RMSNorm/SwiGLU follow the HF-LLaMA conventions exactly so that
  converted checkpoints are bit-compatible (validated by parity tests
  against a randomly-initialized HF model).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from certifiedgpt_tpu.models import layers as L
from certifiedgpt_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # dtype of the (frozen) parameters; activations follow.
    dtype: Any = jnp.bfloat16
    # rematerialize blocks on backward (jax.checkpoint)
    remat: bool = False
    # what the per-block jax.checkpoint may SAVE instead of recomputing
    # (active only with remat=True; full-scale policy x (ms, GB) sweep
    # in docs/DESIGN.md — VERDICT r4 item 2):
    #   "full"     save nothing: backward replays the whole block
    #              (r1-r4 behavior, minimum memory)
    #   "dots"     jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    #              — every plain matmul output survives to backward, so
    #              the recompute is only attention + elementwise
    #              (~100 MB/layer at B=8, S=160)
    #   "dots_all" jax.checkpoint_policies.dots_saveable — also the
    #              attention score/context dots (+[B,H,S,S]/layer)
    remat_policy: str = "full"
    # checkpoint only every k-th decoder block (1 = all of them, the
    # r1-r4 behavior). Layers in between keep their intermediates as
    # ordinary scan residuals, so the backward recompute shrinks to
    # 1/k of the forward at ~(k-1)/k of the no-remat activation cost.
    remat_every: int = 1
    # W8A8 serving mode for COMPUTE-BOUND calls: when the layer kernels
    # are int8 (ops/quantization.quantize_llama), also quantize the
    # activations per row on multi-token calls (prefill), hitting the
    # MXU's double-rate int8 path. Single-token decode keeps the
    # weight-only fused-convert path — it is HBM-bandwidth-bound, so
    # int8 activations buy nothing there. No effect on bf16 kernels.
    act_quant: bool = False
    # int8 KV cache (serving): store cache keys/values as per-row
    # (batch, position, head over head_dim) symmetric int8 with an f32
    # scale sidecar. Decode is bound by HBM reads of weights + cache
    # (cache ≈ 6 GB bf16 at the certify mc_batch — comparable to the
    # int8 weights themselves); int8 halves the cache stream and the
    # convert+rescale fuses into the attention matmul's operand feed.
    # Also halves cache HBM *capacity*, which is what lets the zero-
    # waste mc_batch=100 certify chunk fit one v5e. Off by default:
    # parity tests pin the bf16 path.
    kv_quant: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(**overrides) -> "LlamaConfig":
        """A test-scale config; fp32 so parity checks are exact."""
        base = dict(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=4,
            max_position_embeddings=128,
            dtype=jnp.float32,
        )
        base.update(overrides)
        return LlamaConfig(**base)


# ----------------------------------------------------------------------
# init
# ----------------------------------------------------------------------
def _init_layer(key, cfg: LlamaConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 7)
    d, dh = cfg.hidden_size, cfg.head_dim
    kv = cfg.num_kv_heads * dh
    return {
        "input_layernorm": L.init_rms_norm(d, cfg.dtype),
        "q_proj": L.init_dense(keys[0], d, cfg.num_heads * dh, use_bias=False, dtype=cfg.dtype),
        "k_proj": L.init_dense(keys[1], d, kv, use_bias=False, dtype=cfg.dtype),
        "v_proj": L.init_dense(keys[2], d, kv, use_bias=False, dtype=cfg.dtype),
        "o_proj": L.init_dense(keys[3], cfg.num_heads * dh, d, use_bias=False, dtype=cfg.dtype),
        "post_attention_layernorm": L.init_rms_norm(d, cfg.dtype),
        "gate_proj": L.init_dense(keys[4], d, cfg.intermediate_size, use_bias=False, dtype=cfg.dtype),
        "up_proj": L.init_dense(keys[5], d, cfg.intermediate_size, use_bias=False, dtype=cfg.dtype),
        "down_proj": L.init_dense(keys[6], cfg.intermediate_size, d, use_bias=False, dtype=cfg.dtype),
    }


def init_llama(key, cfg: LlamaConfig) -> Dict[str, Any]:
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    per_layer = [_init_layer(k, cfg) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)
    return {
        "embed_tokens": L.init_embedding(
            k_embed, cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype
        ),
        "layers": stacked,
        "norm": L.init_rms_norm(cfg.hidden_size, cfg.dtype),
        "lm_head": L.init_dense(
            k_head, cfg.hidden_size, cfg.vocab_size, use_bias=False, dtype=cfg.dtype
        ),
    }


def embed_tokens(params, ids: jnp.ndarray) -> jnp.ndarray:
    return L.embed(params["embed_tokens"], ids)


def lm_head_logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project hidden states [..., D] to vocabulary logits (fp32).

    An optional ``bias`` leaf is added when present (HF LLaMA ships a
    bias-free head, so checkpoint conversion never sets one; bench.py
    uses it to bias synthetic weights toward EOS for the early-exit
    serving measurement)."""
    logits = jnp.einsum(
        "...d,dv->...v",
        hidden,
        params["lm_head"]["kernel"],
        preferred_element_type=jnp.float32,
    )
    bias = params["lm_head"].get("bias")
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    return logits


# ----------------------------------------------------------------------
# KV cache
# ----------------------------------------------------------------------
def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int) -> Dict[str, Any]:
    """Per-layer cache leaves (tuples of [B, T, Hkv, Dh]).

    Each layer owns an independent buffer that is read once and updated
    once per decode step, so XLA's while-loop carry aliasing updates it
    in place — a single stacked [L, ...] array restacked through scan ys
    doubles per-token cache HBM traffic (measured 34 -> 18.5 ms/step at
    the certify batch size), and in-place dynamic updates of a stacked
    carry defeat the aliaser entirely.

    With ``cfg.kv_quant`` the k/v buffers are int8 and carry per-row f32
    scale sidecars ``k_scale``/``v_scale`` ([B, T, Hkv, 1] — one f32 per
    head_dim ints = 1/32 of the cache bytes at head_dim 128)."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    dtype = jnp.int8 if cfg.kv_quant else cfg.dtype
    cache = {
        "k": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
        "v": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
    }
    if cfg.kv_quant:
        sshape = shape[:-1] + (1,)
        cache["k_scale"] = tuple(
            jnp.zeros(sshape, jnp.float32) for _ in range(cfg.num_layers)
        )
        cache["v_scale"] = tuple(
            jnp.zeros(sshape, jnp.float32) for _ in range(cfg.num_layers)
        )
    return cache


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------
# remat_policy name -> jax.checkpoint policy factory (thunks so the
# lookup never touches jax.checkpoint_policies at import time)
_REMAT_POLICIES = {
    "full": lambda: None,
    "dots": lambda: jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    "dots_all": lambda: jax.checkpoint_policies.dots_saveable,
}


def _block(
    x: jnp.ndarray,
    lp: Dict[str, Any],
    cfg: LlamaConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    positions: jnp.ndarray,
    mask: jnp.ndarray,
    cache: Optional[Dict[str, jnp.ndarray]],  # per-layer leaves
    cache_offset: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    b, s, d = x.shape
    h, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    # prefill/training only — decode (s==1) is bandwidth-bound
    aq = cfg.act_quant and s > 1

    hidden = L.rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
    q = L.dense(lp["q_proj"], hidden, act_quant=aq).reshape(b, s, h, dh)
    k = L.dense(lp["k_proj"], hidden, act_quant=aq).reshape(b, s, hkv, dh)
    v = L.dense(lp["v_proj"], hidden, act_quant=aq).reshape(b, s, hkv, dh)

    q = L.apply_rotary(q, cos, sin, positions)
    k = L.apply_rotary(k, cos, sin, positions)

    if cache is not None:
        # Write the new keys/values at the static-shape cache offset, then
        # attend over the whole cache; `mask` is expected to hide unwritten
        # and padded slots.
        at = (0, cache_offset, 0, 0)
        if cfg.kv_quant:
            # per-(b, t, head) symmetric int8 over head_dim; the cache
            # stream at decode is int8 + the f32 scale sidecar (1/32 of
            # the cache bytes at head_dim 128). The scales
            # commute out of both attention contractions, so the dots run
            # against the int8 buffers directly (multi_head_attention_kv8)
            # — dequantizing the cache to a bf16 tensor first would write
            # it back through HBM and erase the bandwidth saving.
            from certifiedgpt_tpu.ops.attention import (
                multi_head_attention_kv8,
            )
            from certifiedgpt_tpu.ops.quantization import quantize_rows

            kq, ks_ = quantize_rows(k)
            vq, vs_ = quantize_rows(v)
            cache = {
                "k": lax.dynamic_update_slice(cache["k"], kq, at),
                "v": lax.dynamic_update_slice(cache["v"], vq, at),
                "k_scale": lax.dynamic_update_slice(
                    cache["k_scale"], ks_, at
                ),
                "v_scale": lax.dynamic_update_slice(
                    cache["v_scale"], vs_, at
                ),
            }
            attn = multi_head_attention_kv8(
                q, cache["k"], cache["k_scale"], cache["v"],
                cache["v_scale"], mask,
            )
        else:
            cache = {
                "k": lax.dynamic_update_slice(cache["k"], k, at),
                "v": lax.dynamic_update_slice(cache["v"], v, at),
            }
            attn = multi_head_attention(q, cache["k"], cache["v"], mask)
    else:
        attn = multi_head_attention(q, k, v, mask)

    x = x + L.dense(lp["o_proj"], attn.reshape(b, s, h * dh), act_quant=aq)

    hidden = L.rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
    gate = L.silu(L.dense(lp["gate_proj"], hidden, act_quant=aq))
    up = L.dense(lp["up_proj"], hidden, act_quant=aq)
    x = x + L.dense(lp["down_proj"], gate * up, act_quant=aq)
    return x, cache


def llama_apply(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, D]
    attention_mask: jnp.ndarray,  # [B, Sk] 1=valid over the *key* axis
    positions: jnp.ndarray,  # [B, S] rotary positions of the query tokens
    kv_cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_offset: Optional[jnp.ndarray] = None,  # scalar int32
    compute_logits: bool = True,
    segment_ids: Optional[jnp.ndarray] = None,  # [B, S] packed-segment ids
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Run the decoder.

    Without a cache: full causal self-attention over ``inputs_embeds``
    (``attention_mask`` is [B, S] padding validity). With a cache: the S
    query tokens attend to the cache of length ``max_len`` after their
    keys/values are written at ``cache_offset``; ``attention_mask`` is
    [B, max_len] validity over cache slots.

    ``segment_ids`` (no-cache mode only) isolates packed training
    segments: token i attends to token j only when both carry the same
    segment id (``data/text.pack_train_batch``; block-diagonal causal
    mask). Rotary ``positions`` are the caller's — packed rows restart
    them per segment.

    Returns (logits or None, final_hidden, new_cache).
    """
    b, s, _ = inputs_embeds.shape
    cos, sin = L.rotary_tables(
        cfg.head_dim, cfg.max_position_embeddings, cfg.rope_theta
    )

    if kv_cache is None:
        # causal [1, 1, S, S] AND key-validity [B, 1, 1, S]
        causal = jnp.tril(jnp.ones((s, s), jnp.bool_))[None, None]
        mask = causal & attention_mask[:, None, None, :].astype(jnp.bool_)
        if segment_ids is not None:
            # block-diagonal: queries see only their own packed segment
            # (pad slots carry id 0 and end all-masked — the fp32
            # softmax's tiny-guard returns 0 rows, no NaN)
            same = segment_ids[:, :, None] == segment_ids[:, None, :]
            mask = mask & same[:, None]
    else:
        if segment_ids is not None:
            raise ValueError(
                "segment_ids (packed sequences) is a training-forward "
                "feature; cached prefill/decode is unpacked"
            )
        sk = kv_cache["k"][0].shape[1]
        # Query token i (global position cache_offset + i) may attend to
        # cache slot j iff j <= cache_offset + i and the slot is valid.
        q_pos = cache_offset + jnp.arange(s)[:, None]  # [S, 1]
        k_pos = jnp.arange(sk)[None, :]  # [1, Sk]
        causal = (k_pos <= q_pos)[None, None]  # [1, 1, S, Sk]
        mask = causal & attention_mask[:, None, None, :].astype(jnp.bool_)

    x = inputs_embeds.astype(cfg.dtype)

    if kv_cache is None:
        block = _block
        if cfg.remat:
            if cfg.remat_policy not in _REMAT_POLICIES:
                raise ValueError(
                    f"remat_policy={cfg.remat_policy!r} not in "
                    f"{sorted(_REMAT_POLICIES)}"
                )
            block = jax.checkpoint(
                _block,
                static_argnums=(2,),
                policy=_REMAT_POLICIES[cfg.remat_policy](),
            )

        if cfg.remat and cfg.remat_every > 1:
            # checkpoint only every k-th block: scan over groups of k
            # layers whose FIRST block is rematted; the other k-1 keep
            # their intermediates as ordinary scan residuals. Backward
            # recompute drops to 1/k of the forward for ~(k-1)/k of the
            # no-remat activation memory (policy x time/memory sweep in
            # docs/DESIGN.md).
            k = int(cfg.remat_every)
            if cfg.num_layers % k:
                raise ValueError(
                    f"remat_every={k} must divide num_layers="
                    f"{cfg.num_layers}"
                )
            grouped = jax.tree_util.tree_map(
                lambda a: a.reshape(cfg.num_layers // k, k, *a.shape[1:]),
                params["layers"],
            )

            def gstep(carry, glp):
                y = carry
                for j in range(k):
                    lp = jax.tree_util.tree_map(lambda a: a[j], glp)
                    blk = block if j == 0 else _block
                    y, _ = blk(
                        y, lp, cfg, cos, sin, positions, mask, None, None
                    )
                return y, None

            x, _ = lax.scan(gstep, x, grouped)
        else:

            def step(carry, lp):
                y, _ = block(
                    carry, lp, cfg, cos, sin, positions, mask, None, None
                )
                return y, None

            x, _ = lax.scan(step, x, params["layers"])
        new_cache = None
    else:
        # cached mode (prefill and decode): unrolled layers over
        # independent per-layer buffers — see init_kv_cache for why this
        # beats a scan with stacked cache ys
        keys = tuple(kv_cache.keys())
        new_leaves = {name: [] for name in keys}
        for layer in range(cfg.num_layers):
            lp = jax.tree.map(lambda a: a[layer], params["layers"])
            layer_cache = {name: kv_cache[name][layer] for name in keys}
            x, layer_cache = _block(
                x, lp, cfg, cos, sin, positions, mask, layer_cache,
                cache_offset,
            )
            for name in keys:
                new_leaves[name].append(layer_cache[name])
        new_cache = {name: tuple(new_leaves[name]) for name in keys}

    x = L.rms_norm(params["norm"], x, cfg.rms_norm_eps)

    logits = lm_head_logits(params, x) if compute_logits else None
    return logits, x, new_cache


# ----------------------------------------------------------------------
# loss
# ----------------------------------------------------------------------
IGNORE_INDEX = -100


def cross_entropy_loss(
    logits: jnp.ndarray,  # [B, S, V] (pre-shifted by the caller or not — see below)
    labels: jnp.ndarray,  # [B, S] with IGNORE_INDEX masking
    label_smoothing: float = 0.1,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Label-smoothed CE matching torch.nn.CrossEntropyLoss semantics.

    The reference trains with label_smoothing=0.1 and supports per-sample
    ``reduction='none'`` for candidate ranking (ref modeling_llama.py:105,
    122-123). Shift (predict token t+1 from position t) is applied here:
    logits[:, :-1] vs labels[:, 1:], as in the HF causal-LM convention.
    """
    logits = logits[:, :-1, :].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    per_token = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    per_token = jnp.where(valid, per_token, 0.0)

    counts = jnp.sum(valid, axis=-1)
    if reduction == "none":
        # mean over each sample's valid tokens
        return jnp.sum(per_token, axis=-1) / jnp.maximum(counts, 1)
    if reduction == "sum":
        # per-sample SUM over valid tokens. This is the rank-relevant
        # reduction for candidate scoring: the reference's
        # ``reduction='none'`` does ``loss.view(B, -1).mean(1)`` over the
        # FULL padded length (ref modeling_llama.py:122-123) — a constant
        # divisor per batch — so its ranking equals the sum's, NOT the
        # per-valid-token mean's (which would favor long candidates).
        return jnp.sum(per_token, axis=-1)
    total = jnp.sum(per_token)
    return total / jnp.maximum(jnp.sum(counts), 1)
