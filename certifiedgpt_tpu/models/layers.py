"""Shared functional building blocks.

Every model in the framework is a pure function over an explicit nested-dict
parameter pytree: ``init_*`` builds params, ``*_apply`` consumes them. This
keeps torch-checkpoint conversion mechanical, makes pjit sharding
annotations explicit, and avoids any framework state.

Conventions:
- activations  [batch, seq, dim]
- dense params {"kernel": [in, out], "bias": [out]} (JAX layout; torch
  ``weight`` [out, in] transposes on conversion)
- norms compute in fp32 regardless of activation dtype (the reference
  upcasts LayerNorm the same way, ref base_model.py:281-287).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------
# initializers
# ----------------------------------------------------------------------
def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32).astype(
        dtype
    )


def init_dense(
    key,
    in_dim: int,
    out_dim: int,
    use_bias: bool = True,
    std: Optional[float] = None,
    dtype=jnp.float32,
):
    if std is None:
        std = 1.0 / math.sqrt(in_dim)
    params = {"kernel": trunc_normal(key, (in_dim, out_dim), std=std, dtype=dtype)}
    if use_bias:
        params["bias"] = jnp.zeros((out_dim,), dtype=dtype)
    return params


def dense(params, x: jnp.ndarray, act_quant: bool = False) -> jnp.ndarray:
    if "kernel_q" in params and act_quant:
        # W8A8: dynamic per-row activation quant x per-out-channel weight
        # scale — ``(xq @ wq) * xs * ws`` is exact apart from rounding.
        # int8 x int8 hits the MXU's double-rate int8 path (measured
        # 1.3-1.6x over bf16 at ViT-g/prefill shapes through XLA on v5e);
        # only worth it on compute-bound shapes — callers gate it on
        # batch*seq, decode stays on the weight-only path below.
        # Differentiable (straight-through vjp) — see w8a8_matmul.
        from certifiedgpt_tpu.ops.quantization import w8a8_matmul

        out = w8a8_matmul(x, params["kernel_q"], params["scale"])
    elif "kernel_q" in params:
        # weight-only int8 (ops/quantization.py). The per-output-channel
        # scale commutes with the contraction, so apply it AFTER the
        # matmul: the operand read is then a pure int8->bf16 convert
        # (exact for |q|<=127; XLA fuses it into the MXU feed, measured
        # 1.55x over dequantize-then-matmul at decode shapes) and the
        # scale multiplies only the small [..., out] result in fp32.
        out = (
            jnp.einsum(
                "...i,io->...o",
                x,
                params["kernel_q"].astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            * params["scale"]
        ).astype(x.dtype)
    else:
        out = jnp.einsum(
            "...i,io->...o", x, params["kernel"],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


# ----------------------------------------------------------------------
# norms (fp32 compute)
# ----------------------------------------------------------------------
def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = normed * params["scale"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32
    )
    return out.astype(x.dtype)


def init_rms_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def rms_norm(params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * params["scale"].astype(jnp.float32)).astype(x.dtype)


# ----------------------------------------------------------------------
# embeddings
# ----------------------------------------------------------------------
def init_embedding(key, vocab: int, dim: int, std=0.02, dtype=jnp.float32):
    return {"embedding": trunc_normal(key, (vocab, dim), std=std, dtype=dtype)}


def embed(params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embedding"], ids, axis=0)


# ----------------------------------------------------------------------
# rotary position embedding (HF-LLaMA-compatible rotate-half convention)
# ----------------------------------------------------------------------
def rotary_tables(
    head_dim: int, max_len: int, theta: float = 10000.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute [max_len, head_dim] cos/sin tables in fp32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [max_len, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(
    x: jnp.ndarray,  # [B, S, H, Dh]
    cos: jnp.ndarray,  # [max_len, Dh]
    sin: jnp.ndarray,
    positions: jnp.ndarray,  # [B, S] int32
) -> jnp.ndarray:
    c = jnp.take(cos, positions, axis=0)[:, :, None, :]  # [B, S, 1, Dh]
    s = jnp.take(sin, positions, axis=0)[:, :, None, :]
    x32 = x.astype(jnp.float32)
    out = x32 * c + _rotate_half(x32) * s
    return out.astype(x.dtype)


# ----------------------------------------------------------------------
# activations
# ----------------------------------------------------------------------
def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # exact (erf) variant — matches torch.nn.GELU default used by the
    # reference's ViT/BERT stacks.
    return jax.nn.gelu(x, approximate=False)


def ln_dense(
    params,
    x: jnp.ndarray,
    ln_params,
    eps: float = 1e-6,
    act_quant: bool = False,
) -> jnp.ndarray:
    """``dense(params, layer_norm(ln_params, x))`` with, on the W8A8
    path, the LN and the per-row activation quant fused into one Pallas
    HBM pass (ops/quantization.ln_quant_rows — the qkv/fc1 input glue
    of the serving tower, docs/DESIGN.md §8). Forward-only on that path,
    like the inline quantize_rows consumers it replaces; the fallback
    reproduces the unfused chain exactly."""
    if "kernel_q" in params and act_quant:
        from certifiedgpt_tpu.ops.quantization import ln_quant_rows

        xq, xs = ln_quant_rows(
            x, ln_params["scale"], ln_params["bias"], eps
        )
        out = (
            jnp.einsum(
                "...i,io->...o", xq, params["kernel_q"],
                preferred_element_type=jnp.float32,
            )
            * xs
            * params["scale"]
        ).astype(x.dtype)
        if "bias" in params:
            out = out + params["bias"].astype(out.dtype)
        return out
    return dense(params, layer_norm(ln_params, x, eps), act_quant=act_quant)


def gelu_dense(params, x: jnp.ndarray, act_quant: bool = False) -> jnp.ndarray:
    """``dense(params, gelu(x))`` with, on the W8A8 path, the gelu and
    the per-row activation quant fused into one Pallas HBM pass
    (ops/quantization.w8a8_gelu_matmul — the ViT fc2 glue was the
    largest non-matmul cost in the serving tower, docs/DESIGN.md §8)."""
    if "kernel_q" in params and act_quant:
        from certifiedgpt_tpu.ops.quantization import w8a8_gelu_matmul

        out = w8a8_gelu_matmul(x, params["kernel_q"], params["scale"])
        if "bias" in params:
            out = out + params["bias"].astype(out.dtype)
        return out
    return dense(params, gelu(x), act_quant=act_quant)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)
