"""Weight-only int8 quantization for the frozen decoder.

The certification pipeline keeps a frozen Vicuna-7B in HBM; bf16 weights
(13.5 GB) crowd a single 16 GB chip. Per-output-channel symmetric int8
halves that to ~6.7 GB with negligible quality impact for a frozen
serving path, letting the full model + KV cache + activations fit one
v5e core (the reference shards nothing and simply requires bigger hosts,
SURVEY.md §3.4).

Layout: a quantized dense leaf is ``{"kernel_q": int8 [in, out],
"scale": f32 [out]}``. ``layers.dense`` dequantizes on the fly —
``(x @ int8) * scale`` — which XLA fuses so the int8 tensor is the only
HBM traffic; compute still runs in the activation dtype on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_kernel(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[in, out] float kernel -> per-out-channel symmetric int8."""
    w = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)  # [out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale}


def dequantize_kernel(qleaf: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    return (
        qleaf["kernel_q"].astype(jnp.float32) * qleaf["scale"][None, :]
    ).astype(dtype)


def quantize_stacked_kernel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[L, in, out] stacked float kernels -> per-(layer, out-channel)
    symmetric int8 — the stacked-layer form of ``quantize_kernel`` and
    the single source of the scheme for both the product path and the
    full-scale bench's direct-at-serving-layout init."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=1)  # [L, out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale[:, None, :]), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale}


def quantize_llama(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every stacked layer kernel of an ``init_llama`` pytree.

    Embeddings, norms and the lm_head stay bf16 (the head's logit
    precision feeds argmax/sampling directly).
    """
    out = dict(params)
    layers = {}
    for mod, leaves in params["layers"].items():
        if "kernel" in leaves:
            layers[mod] = quantize_stacked_kernel(leaves["kernel"])
        else:
            layers[mod] = leaves
    out["layers"] = layers
    return out


def quantized_bytes(params: Dict[str, Any]) -> int:
    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params)
    )
