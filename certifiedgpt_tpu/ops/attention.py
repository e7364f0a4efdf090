"""Attention compute ops.

One entry point, ``multi_head_attention``, used by every model in the
framework (EVA ViT, Q-Former self/cross attention, LLaMA decoder). The
default path is plain jnp einsum + fp32 softmax — XLA fuses this well on
TPU and tiles the matmuls onto the MXU. A Pallas flash-attention path can
be slotted in behind the same signature for long sequences (the vision
tower's 1025-token sequence is the main candidate).

Shapes follow the [batch, seq, heads, head_dim] convention.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


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
    logits = logits * jnp.float32(scale)

    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask, logits, neg)

    weights = jnp.exp(
        logits - lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    )
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)
    weights = weights / jnp.maximum(
        jnp.sum(weights, axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny
    )

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
    HBM stream int8 + 1/128 scales.
    """
    h_q, h_kv = q.shape[2], kq8.shape[2]
    if h_kv != h_q:
        rep = h_q // h_kv
        kq8 = jnp.repeat(kq8, rep, axis=2)
        ks = jnp.repeat(ks, rep, axis=2)
        vq8 = jnp.repeat(vq8, rep, axis=2)
        vs = jnp.repeat(vs, rep, axis=2)
    if scale is None:
        scale = q.shape[-1] ** -0.5

    # [B, Sk, H, 1] -> [B, H, 1, Sk] to broadcast over the score rows
    ks_b = jnp.transpose(ks[..., 0], (0, 2, 1))[:, :, None, :]
    vs_b = jnp.transpose(vs[..., 0], (0, 2, 1))[:, :, None, :]

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, kq8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    logits = logits * ks_b * jnp.float32(scale)

    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask, logits, neg)

    weights = jnp.exp(
        logits - lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    )
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)
    weights = weights / jnp.maximum(
        jnp.sum(weights, axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny
    )

    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        (weights * vs_b).astype(q.dtype),
        vq8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
