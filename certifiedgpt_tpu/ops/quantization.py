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
import numpy as np


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


def quantize_rows(x: jnp.ndarray) -> tuple:
    """Dynamic per-row symmetric int8 quantization of an activation
    ``[..., K]``: returns ``(xq int8, xs fp32 [..., 1])`` with
    ``x ≈ xq * xs``. Exact algebra apart from rounding — combined with a
    per-output-channel weight scale, ``(xq @ wq) * xs * ws`` is the
    standard W8A8 factorization. Measured at EVA ViT-g certify shapes
    (M=51k, K=1408): the quant pass adds ~0.1 ms while the int8 MXU
    matmul saves ~25% over bf16 (189-205 TOP/s vs 139-153 TF/s through
    XLA on v5e)."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    return xq, xs


@jax.custom_vjp
def w8a8_matmul(
    x: jnp.ndarray, kernel_q: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """``x [..., in] @ int8 kernel [in, out]`` on the MXU's double-rate
    int8 path: dynamic per-row activation quant, s8 x s8 accumulated
    straight to f32, then the ``* xs * ws`` rescale. Accumulating to f32
    instead of s32 lets XLA fuse the rescale into the matmul epilogue
    (no separate s32->f32 conversion pass over the [..., out] block):
    measured 183 vs 146 TOP/s end-to-end at the ViT qkv certify shape
    (M=51k, K=1408, N=4224) on v5e, vs 139-153 TF/s for bf16 compute.
    f32 accumulation of int8 products is bit-exact up to |acc| = 2^24
    and within 1 ULP above it — noise far below the ~1% quantization
    error of the int8 representation itself.

    Differentiable via a straight-through estimator: the backward pass is
    the fp matmul's (``g @ (kernel_q * scale)^T``), so training THROUGH a
    quantized frozen tower (e.g. the decoder between the loss and the
    trained projection) sees the correct gradient field — ``round()``'s
    zero derivative never appears. The int8 kernel and its scale receive
    no gradient (they are frozen serving artifacts by construction; do
    not mark quantized modules trainable)."""
    xq, xs = quantize_rows(x)
    acc = jnp.einsum(
        "...i,io->...o", xq, kernel_q, preferred_element_type=jnp.float32
    )
    return (acc * xs * scale).astype(x.dtype)


def _w8a8_fwd(x, kernel_q, scale):
    dtype_token = jnp.zeros((0,), x.dtype)
    return w8a8_matmul(x, kernel_q, scale), (dtype_token, kernel_q, scale)


def _w8a8_bwd(res, g):
    dtype_token, kernel_q, scale = res
    w = (kernel_q.astype(jnp.float32) * scale[None, :]).astype(g.dtype)
    gx = jnp.einsum("...o,io->...i", g, w).astype(dtype_token.dtype)
    return (
        gx,
        np.zeros(kernel_q.shape, jax.dtypes.float0),  # int primal: float0
        jnp.zeros_like(scale),
    )


w8a8_matmul.defvjp(_w8a8_fwd, _w8a8_bwd)


def quantize_modules(
    params: Dict[str, Any], modules: tuple = None
) -> Dict[str, Any]:
    """Quantize stacked layer kernels of a ``{"layers": {mod: leaves}}``
    pytree to per-(layer, out-channel) int8, preserving every non-kernel
    leaf (biases etc.). ``modules=None`` quantizes every module that has
    a ``kernel``; top-level leaves (embeddings, norms, heads) are never
    touched."""
    out = dict(params)
    layers = {}
    for mod, leaves in params["layers"].items():
        if (modules is None or mod in modules) and "kernel" in leaves:
            new = {k: v for k, v in leaves.items() if k != "kernel"}
            new.update(quantize_stacked_kernel(leaves["kernel"]))
            layers[mod] = new
        else:
            layers[mod] = leaves
    out["layers"] = layers
    return out


def quantize_llama(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every stacked layer kernel of an ``init_llama`` pytree.

    Embeddings, norms and the lm_head stay bf16 (the head's logit
    precision feeds argmax/sampling directly).
    """
    return quantize_modules(params)


def quantize_eva_vit(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the qkv/proj/fc1/fc2 stacked kernels of an
    ``init_eva_vit`` pytree — the tower's compute-bound matmuls (see
    ``EvaViTConfig.act_quant``); norms, biases, patch embedding and pos
    embedding stay bf16. fc2 was originally excluded (its 4.4x larger
    input made the dynamic-quant pass cost what the int8 matmul saved),
    but with the f32-accumulation epilogue the whole tower measures
    1049 vs 1069 ms/chunk with fc2 int8 at the certify mc_batch."""
    return quantize_modules(params, modules=("qkv", "proj", "fc1", "fc2"))


def quantized_bytes(params: Dict[str, Any]) -> int:
    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params)
    )
