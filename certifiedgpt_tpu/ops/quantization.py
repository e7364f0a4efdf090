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


# ----------------------------------------------------------------------
# fused gelu + row-quant (ViT fc2 input)
# ----------------------------------------------------------------------
_GELU_QUANT_TILES = (256, 128)  # TM=512 crashes the Mosaic compiler (r3)


def _erf_approx(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — an
    order below bf16 resolution). Pallas TPU has no erf primitive."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_quant_kernel(x_ref, xq_ref, xs_ref):
    x = x_ref[...].astype(jnp.float32)
    g = 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))
    # round through the activation dtype first: the unfused chain
    # quantizes the bf16 gelu *output* — keep serving bit-aligned with
    # the fallback apart from the erf approximation
    g = g.astype(x_ref.dtype).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-8) / 127.0
    xq_ref[...] = jnp.clip(jnp.round(g / xs), -127, 127).astype(jnp.int8)
    xs_ref[...] = xs


def _gelu_quant_pallas(x2d: jnp.ndarray, tile_m: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, h = x2d.shape
    return pl.pallas_call(
        _gelu_quant_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, h), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec(
                (tile_m, h), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (tile_m, h), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2d)


def gelu_quant_rows(x: jnp.ndarray, interpret: bool = False) -> tuple:
    """``quantize_rows(gelu(x))`` in ONE pass over HBM.

    The XLA chain for the ViT fc2 input (erf gelu -> per-row absmax ->
    scale/round to int8 over a [tokens, 6144] bf16 hidden) is the
    largest glue cost in the serving tower — VPU-transcendental-bound,
    with several HBM passes. The fused Pallas kernel measures 12.0 vs
    14.9 ms isolated and 24.2 vs 27.2 ms for the whole W8A8 MLP block at
    certify shapes (M=102400, 1408->6144->1408, v5e). gelu uses the A-S
    erf approximation (error 1.5e-7, below bf16 ulp — parity-neutral).

    Falls back to the exact XLA chain off-TPU or when no tile divides
    the row count (``interpret=True`` forces the kernel for CPU tests).
    """
    rows = int(np.prod(x.shape[:-1]))
    if interpret or jax.default_backend() == "tpu":
        tile = next((t for t in _GELU_QUANT_TILES if rows % t == 0), None)
        if tile is not None:
            x2d = x.reshape(rows, x.shape[-1])
            xq, xs = _gelu_quant_pallas(x2d, tile, interpret)
            return (
                xq.reshape(x.shape),
                xs.reshape(*x.shape[:-1], 1),
            )
    return quantize_rows(jax.nn.gelu(x, approximate=False))


def _ln_quant_kernel(x_ref, s_ref, b_ref, xq_ref, xs_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = h * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    # round through the activation dtype first: the unfused chain
    # quantizes the bf16 LN *output*, and serving must match it bitwise
    h = h.astype(x_ref.dtype).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-8) / 127.0
    xq_ref[...] = jnp.clip(jnp.round(h / xs), -127, 127).astype(jnp.int8)
    xs_ref[...] = xs


def _ln_quant_pallas(x2d, scale, bias, eps, tile_m, interpret):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x2d.shape
    return pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec(
                (tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2d, scale.reshape(1, k), bias.reshape(1, k))


def _ln_chain_xla(x, scale, bias, eps):
    # inline fp32 LN (identical math to models.layers.layer_norm — kept
    # local so ops/ does not depend on models/)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return quantize_rows(out.astype(x.dtype))


def ln_quant_rows(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    interpret: bool = False,
) -> tuple:
    """``quantize_rows(layer_norm(x))`` in ONE HBM pass on TPU.

    The qkv/fc1 input glue of the W8A8 ViT serving tower (fp32 LN ->
    per-row absmax -> int8 round over [tokens, 1408]) costs ~2.1 ms
    in-graph per site at certify shapes through XLA; the fused Pallas
    kernel brings the LN+quant+matmul composite from 10.7 to 9.1 ms.
    No approximations — the same fp32 LN math, rounded through bf16
    before quantizing like the unfused chain — but the VPU may reduce
    mean/variance in a different order than XLA, so outputs can differ
    in the last fp32 ulp (which can flip an int8 round by 1; measured
    identical at certify shapes, not guaranteed). Falls back to the
    exact XLA chain off-TPU or when no tile divides the row count.
    Forward-only, like
    the inline ``quantize_rows`` consumers it replaces (``round()`` has
    no useful gradient; nothing differentiates through the frozen
    serving tower).
    """
    rows = int(np.prod(x.shape[:-1]))
    if interpret or jax.default_backend() == "tpu":
        tile = next((t for t in _GELU_QUANT_TILES if rows % t == 0), None)
        if tile is not None:
            x2d = x.reshape(rows, x.shape[-1])
            xq, xs = _ln_quant_pallas(x2d, scale, bias, eps, tile, interpret)
            return (
                xq.reshape(x.shape),
                xs.reshape(*x.shape[:-1], 1),
            )
    return _ln_chain_xla(x, scale, bias, eps)


@jax.custom_vjp
def w8a8_gelu_matmul(
    x: jnp.ndarray, kernel_q: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """``gelu(x) [..., in] @ int8 kernel`` with the gelu and the dynamic
    per-row activation quant fused into one Pallas pass on TPU
    (``gelu_quant_rows``); algebra identical to
    ``w8a8_matmul(gelu(x), ...)``. Backward is the straight-through
    fp path ``(g @ w^T) * gelu'(x)`` — exact for the unquantized
    matmul, same estimator family as ``w8a8_matmul``."""
    xq, xs = gelu_quant_rows(x)
    acc = jnp.einsum(
        "...i,io->...o", xq, kernel_q, preferred_element_type=jnp.float32
    )
    return (acc * xs * scale).astype(x.dtype)


def _w8a8_gelu_fwd(x, kernel_q, scale):
    return w8a8_gelu_matmul(x, kernel_q, scale), (x, kernel_q, scale)


def _w8a8_gelu_bwd(res, g):
    x, kernel_q, scale = res
    w = (kernel_q.astype(jnp.float32) * scale[None, :]).astype(g.dtype)
    gh = jnp.einsum("...o,io->...i", g, w).astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    # d/dx gelu(x) = Phi(x) + x * phi(x)
    cdf = 0.5 * (1.0 + jax.lax.erf(x32 * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * x32 * x32) * (1.0 / np.sqrt(2.0 * np.pi))
    gx = (gh * (cdf + x32 * pdf)).astype(x.dtype)
    return (
        gx,
        np.zeros(kernel_q.shape, jax.dtypes.float0),
        jnp.zeros_like(scale),
    )


w8a8_gelu_matmul.defvjp(_w8a8_gelu_fwd, _w8a8_gelu_bwd)


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
