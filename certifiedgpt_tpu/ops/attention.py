"""Attention compute ops.

One entry point, ``multi_head_attention``, used by every model in the
framework (EVA ViT, Q-Former self/cross attention, LLaMA decoder). The
default path is plain jnp einsum + fp32 softmax — XLA fuses this well on
TPU and tiles the matmuls onto the MXU. A Pallas flash-attention path can
be slotted in behind the same signature for long sequences (the vision
tower's 1025-token sequence is the main candidate).
``multi_head_attention_kv8`` is the same numerics over an int8-quantized
KV cache; both share the masked-softmax core below.

Shapes follow the [batch, seq, heads, head_dim] convention.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def _masked_softmax(logits: jnp.ndarray, mask) -> jnp.ndarray:
    """fp32 max-shifted softmax over the last axis with True=keep masking
    and a tiny-guard renormalization. The single source of the softmax
    numerics for every attention variant in this module."""
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask, logits, neg)
    weights = jnp.exp(
        logits - lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    )
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)
    return weights / jnp.maximum(
        jnp.sum(weights, axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny
    )


def multi_head_attention(
    q: jnp.ndarray,  # [B, Sq, H, Dh]
    k: jnp.ndarray,  # [B, Sk, H_kv, Dh]
    v: jnp.ndarray,  # [B, Sk, H_kv, Dh]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Sq, Sk]; True=keep
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with fp32 softmax.

    Supports grouped-query attention: when ``H_kv < H`` the key/value heads
    are repeated to match. Returns [B, Sq, H, Dh] in q's dtype.
    """
    h_q, h_kv = q.shape[2], k.shape[2]
    if h_kv != h_q:
        rep = h_q // h_kv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    if scale is None:
        scale = q.shape[-1] ** -0.5

    # [B, H, Sq, Sk], accumulate in fp32 on the MXU.
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    weights = _masked_softmax(logits * jnp.float32(scale), mask)

    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def multi_head_attention_kv8(
    q: jnp.ndarray,  # [B, Sq, H, Dh]
    kq8: jnp.ndarray,  # [B, Sk, H_kv, Dh] int8
    ks: jnp.ndarray,  # [B, Sk, H_kv, 1] f32 per-row scales
    vq8: jnp.ndarray,  # [B, Sk, H_kv, Dh] int8
    vs: jnp.ndarray,  # [B, Sk, H_kv, 1] f32
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over an int8-quantized KV cache WITHOUT materializing a
    dequantized cache tensor.

    ``dequant(kq8) = kq8 * ks`` commutes with both contractions, so the
    per-row scales apply to the small score/weight tensors instead:

        scores = (q @ kq8^T) * ks        (convert rides the MXU feed,
        out    = (weights * vs) @ vq8     like the weight-only int8 dense)

    A naive ``multi_head_attention(q, kq8*ks, vq8*vs, ...)`` makes XLA
    write the bf16 dequantized cache back to HBM — measured to erase the
    entire int8 bandwidth saving at decode shapes. This form keeps the
    HBM stream int8 + the f32 scale sidecar (1/32 of the cache bytes at
    head_dim 128). Grouped-query caches are handled by folding the query
    heads as [B, Sq, H_kv, G, Dh] and contracting against the H_kv cache
    directly — repeating the int8 cache to H heads would materialize the
    very tensor this function exists to avoid.
    """
    b, sq, h, dh = q.shape
    h_kv = kq8.shape[2]
    g = h // h_kv
    if scale is None:
        scale = dh**-0.5

    # [B, Sk, H_kv, 1] -> [B, H_kv, 1, 1, Sk] to broadcast over (G, Sq)
    ks_b = jnp.transpose(ks[..., 0], (0, 2, 1))[:, :, None, None, :]
    vs_b = jnp.transpose(vs[..., 0], (0, 2, 1))[:, :, None, None, :]

    qg = q.reshape(b, sq, h_kv, g, dh)
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, kq8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )  # [B, H_kv, G, Sq, Sk]
    logits = logits * ks_b * jnp.float32(scale)

    if mask is not None:
        # lift [B|1, H|1, Sq, Sk] to the grouped [.., H_kv, G, Sq, Sk]
        if mask.shape[1] == 1:
            mask = mask[:, :, None]  # head-agnostic: broadcast over (H_kv, G)
        else:
            mask = mask.reshape(mask.shape[0], h_kv, g, sq, -1)

    weights = _masked_softmax(logits, mask)

    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd",
        (weights * vs_b).astype(q.dtype),
        vq8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, sq, h, dh).astype(q.dtype)
