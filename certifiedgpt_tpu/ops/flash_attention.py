"""Flash attention (Pallas TPU kernel).

Online-softmax attention that never materializes the [S, S] score matrix
in HBM — the classic flash recurrence tiled for the MXU. Motivation: the
EVA ViT-g tower runs 1025-token sequences at Monte-Carlo batch sizes
(certification) and batch 48+ (training); unfused attention would stream
B*H*S*S fp32 scores through HBM per layer.

Design:
- inputs are laid out [BH, S, D] (batch*heads flattened) with D padded to
  the 128-lane width by the wrapper; padded D columns are zero so they
  add nothing to q.k or the output.
- grid = (BH, q_tiles, k_tiles), k innermost. The running max ``m``,
  normalizer ``l`` and output accumulator live in VMEM scratch that
  persists across the sequential k iterations of one (bh, q_tile).
- optional causal masking (for decoder prefill) and a sequence-length
  mask for the padded tail tile, both computed from static sizes.
- fp32 accumulation throughout; inputs may be bf16.

The public wrapper ``flash_attention(q, k, v, causal=...)`` takes the
framework's [B, S, H, D] convention and handles padding/reshaping.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # [1, TQ, D]
    k_ref,  # [1, TK, D]
    v_ref,  # [1, TK, D]
    out_ref,  # [1, TQ, D]
    m_ref,  # [TQ, 1] scratch
    l_ref,  # [TQ, 1] scratch
    acc_ref,  # [TQ, D] scratch
    *,
    seq_len: int,
    tile_q: int,
    tile_k: int,
    causal: bool,
    scale: float,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # [TQ, D]
    k = k_ref[0].astype(jnp.float32)  # [TK, D]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, TK]

    # mask the padded tail and (optionally) the causal future
    q_pos = qi * tile_q + jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, tile_k), 0
    )
    k_pos = ki * tile_k + jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, tile_k), 1
    )
    mask = k_pos < seq_len
    if causal:
        mask = mask & (k_pos <= q_pos)
    scores = jnp.where(mask, scores, _NEG_INF)

    m_prev = m_ref[:]  # [TQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)  # [TQ, TK]
    l_new = l_ref[:] * correction + jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0].astype(jnp.float32)  # [TK, D]
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, D]
    acc_ref[:] = acc_ref[:] * correction + pv
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(ki == num_k - 1)
    def _finalize():
        out_ref[0] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(out_ref.dtype)


def _flash_bhsd(
    q: jnp.ndarray,  # [BH, S_pad, D_pad]
    k: jnp.ndarray,
    v: jnp.ndarray,
    seq_len: int,
    causal: bool,
    scale: float,
    tile_q: int,
    tile_k: int,
) -> jnp.ndarray:
    bh, s_pad, d = q.shape
    num_q = s_pad // tile_q
    num_k = s_pad // tile_k
    kernel = functools.partial(
        _flash_kernel,
        seq_len=seq_len,
        tile_q=tile_q,
        tile_k=tile_k,
        causal=causal,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(bh, num_q, num_k),
        in_specs=[
            pl.BlockSpec(
                (1, tile_q, d), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_k, d), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_k, d), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q, d), lambda b, i, j: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # bh and q tiles are independent — Mosaic may pipeline them;
            # only the k loop carries the online-softmax state
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def flash_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,  # [B, S, H, D]   (self-attention: same S)
    v: jnp.ndarray,
    causal: bool = False,
    scale: Optional[float] = None,
    tile_q: int = 128,
    tile_k: int = 128,
    interpret_fallback: bool = True,
) -> jnp.ndarray:
    """Self-attention via the flash kernel; [B, S, H, D] in and out.

    Head dim and sequence pad to the TPU tile grid internally. On non-TPU
    backends falls back to the plain fused-XLA attention op.
    """
    if jax.default_backend() != "tpu" and interpret_fallback:
        from certifiedgpt_tpu.ops.attention import multi_head_attention

        mask = None
        if causal:
            s = q.shape[1]
            mask = jnp.tril(jnp.ones((s, s), jnp.bool_))[None, None]
        return multi_head_attention(q, k, v, mask, scale=scale)

    b, s, h, d = q.shape
    if scale is None:
        scale = d**-0.5

    d_pad = int(np.ceil(d / _LANES) * _LANES)
    s_pad = int(np.ceil(s / tile_q) * tile_q)
    s_pad = int(np.ceil(s_pad / tile_k) * tile_k)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    out = _flash_bhsd(
        prep(q), prep(k), prep(v), s, causal, float(scale), tile_q, tile_k
    )
    out = out[:, :s, :d].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))


def builtin_flash_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Non-causal self-attention via jax's built-in Pallas TPU flash
    kernel with FULL-sequence blocks.

    At EVA ViT-g shapes (B=50, H=16, S=1025->1152, D=88->128) the
    full-block configuration measures 9.8 ms vs 21.9 ms for the XLA
    einsum+softmax path and 50 ms for the kernel's default 128-tiles —
    one grid cell per (batch, head) keeps the whole softmax in VMEM with
    no inter-tile recurrence overhead. Sequence padding is masked with
    segment ids; head-dim zero-padding adds nothing to q.k or the output.
    Falls back to the fused-XLA path off-TPU.
    """
    if jax.default_backend() != "tpu":
        from certifiedgpt_tpu.ops.attention import multi_head_attention

        return multi_head_attention(q, k, v, scale=scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as _kernel,
    )

    b, s, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    d_pad = int(np.ceil(d / _LANES) * _LANES)
    s_pad = int(np.ceil(s / _LANES) * _LANES)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, S, D]
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))

    seg = jnp.broadcast_to(
        jnp.where(jnp.arange(s_pad) < s, 0, 1).astype(jnp.int32), (b, s_pad)
    )
    blocks = BlockSizes(
        block_q=s_pad, block_k_major=s_pad, block_k=s_pad, block_b=1,
        block_q_major_dkv=s_pad, block_k_major_dkv=s_pad,
        block_k_dkv=s_pad, block_q_dkv=s_pad,
        block_k_major_dq=s_pad, block_k_dq=s_pad, block_q_dq=s_pad,
    )
    out = _kernel(
        prep(q), prep(k), prep(v),
        segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=float(scale),
        block_sizes=blocks,
    )
    return jnp.transpose(out[:, :, :s, :d], (0, 2, 1, 3))


def _cls_split_kernel(q_ref, k_ref, v_ref, kc_ref, vc_ref, out_ref):
    """Full-block attention over N patch keys + a rank-1 cls-key merge.

    Operands are [1, 1, TQ/N, Dp] blocks of pre-scaled queries (the
    producer folds ``head_dim**-0.5 * log2(e)`` into the q weights, so
    the kernel runs ``exp2`` with no per-score multiply) and bf16 keys/
    values. The cls key/value ride in [1, 1, 8, Dp] blocks (row 0 real).
    No masking anywhere: N is an exact lane multiple by construction.
    """
    q = q_ref[0, 0]  # [TQ, Dp] bf16, pre-scaled
    k = k_ref[0, 0]  # [N, Dp]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, N] — already in the log2 domain
    # cls score as a VPU reduce, not an N=1 matvec (Mosaic's matvec
    # lowering trips a bf16->f32 vector.broadcast verifier error)
    kc = kc_ref[0, 0, 0:1, :].astype(jnp.float32)  # [1, Dp]
    s_c = jnp.sum(q.astype(jnp.float32) * kc, axis=1, keepdims=True)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_c)
    p = jnp.exp2(scores - m)
    e_c = jnp.exp2(s_c - m)  # [TQ, 1]
    l = jnp.sum(p, axis=-1, keepdims=True) + e_c
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, Dp]
    vc = vc_ref[0, 0, 0:1, :].astype(jnp.float32)
    out_ref[0, 0] = ((pv + e_c * vc) / l).astype(out_ref.dtype)


#: factor producers fold into q so kernels exp2 without rescaling
CLS_SPLIT_Q_PREMUL_LOG2E = float(np.log2(np.e))


def cls_split_attention_parts(
    qp: jnp.ndarray,  # [B, H, N, Dp] patch queries, PRE-SCALED (see note)
    kp: jnp.ndarray,  # [B, H, N, Dp]
    vp: jnp.ndarray,
    qc: jnp.ndarray,  # [B, H, 1, Dp] cls query (pre-scaled)
    kc: jnp.ndarray,  # [B, H, 1, Dp]
    vc: jnp.ndarray,
):
    """Exact-sequence attention for ViT's [cls + N patches] tokens.

    EVA ViT-g's S = 1025 forces the generic kernels to pad 1025->1152
    (1.27x matmul FLOPs AND 1.27x softmax VPU work, plus masking).
    Splitting the single cls token out makes the patch block EXACTLY
    N = 1024 = 8x128 — no padding, no masks — with the cls key folded
    into each patch row's softmax as a rank-1 online merge inside the
    kernel, and the (single) cls query row done in XLA. Crucially the
    producer emits the split operands DIRECTLY from the qkv matmul
    (``models/eva_vit.py::_vit_block`` slices ``hidden`` BEFORE the
    einsum), because Pallas operands must be materialized: slicing
    after the matmul costs three full [B,H,S,Dp] copies (measured
    6.3 ms/layer-call at certify shapes — more than the kernel itself).

    PRE-SCALING CONTRACT: q operands carry ``head_dim**-0.5 * log2(e)``
    (``CLS_SPLIT_Q_PREMUL_LOG2E``) folded into the qkv weights, so the
    kernel computes softmax via ``exp2`` with zero per-score multiplies;
    the log2 factor cancels in the softmax normalization.

    Measured (v5e, B=50, H=16, N=1024, Dp=128): 5.5 ms vs 12.0 ms for
    the builtin full-seq-block kernel fed from the same operands.
    Returns ``(out_cls [B,H,1,Dp], out_patches [B,H,N,Dp])`` — the
    split-stream tower (``models/eva_vit.py::_vit_block_split``) keeps
    the parts separate so no concat copy exists per layer. Off-TPU:
    exact XLA fallback.
    """
    b, h, n, d = qp.shape
    ln2 = float(np.log(2.0))

    if jax.default_backend() != "tpu" or n % _LANES != 0:
        # reassemble and run the XLA path (scale=ln2 undoes the log2e
        # pre-scale: softmax(s_tilde * ln2) == softmax(s))
        from certifiedgpt_tpu.ops.attention import multi_head_attention

        bshd = lambda x: jnp.transpose(x, (0, 2, 1, 3))  # noqa: E731
        q = jnp.concatenate([qc, qp], axis=2)
        k = jnp.concatenate([kc, kp], axis=2)
        v = jnp.concatenate([vc, vp], axis=2)
        out = multi_head_attention(bshd(q), bshd(k), bshd(v), scale=ln2)
        out = jnp.transpose(out, (0, 2, 1, 3))
        return out[:, :, :1], out[:, :, 1:]

    tile_q = next(t for t in (512, 256, 128) if n % t == 0)
    kc8 = jnp.pad(kc, ((0, 0), (0, 0), (0, 7), (0, 0)))
    vc8 = jnp.pad(vc, ((0, 0), (0, 0), (0, 7), (0, 0)))
    out_p = pl.pallas_call(
        _cls_split_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), qp.dtype),
        grid=(b, h, n // tile_q),
        in_specs=[
            pl.BlockSpec((1, 1, tile_q, d), lambda bb, hh, qi: (bb, hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, d), lambda bb, hh, qi: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, d), lambda bb, hh, qi: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, d), lambda bb, hh, qi: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, d), lambda bb, hh, qi: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_q, d), lambda bb, hh, qi: (bb, hh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qp, kp, vp, kc8, vc8)

    # cls query row: one query over [cls + N] keys — negligible, XLA
    s_p = jnp.einsum(
        "bhqd,bhkd->bhqk", qc, kp, preferred_element_type=jnp.float32
    )  # [B, H, 1, N] (log2 domain)
    s_cc = jnp.sum(
        qc.astype(jnp.float32) * kc.astype(jnp.float32), axis=-1,
        keepdims=True,
    )  # [B, H, 1, 1]
    m = jnp.maximum(jnp.max(s_p, axis=-1, keepdims=True), s_cc)
    w_p = jnp.exp2(s_p - m)
    w_c = jnp.exp2(s_cc - m)
    denom = jnp.sum(w_p, axis=-1, keepdims=True) + w_c
    out_c = (
        jnp.einsum(
            "bhqk,bhkd->bhqd", w_p.astype(vp.dtype), vp,
            preferred_element_type=jnp.float32,
        )
        + w_c * vc.astype(jnp.float32)
    ) / denom
    return out_c.astype(out_p.dtype), out_p


def cls_split_attention(
    qp: jnp.ndarray, kp: jnp.ndarray, vp: jnp.ndarray,
    qc: jnp.ndarray, kc: jnp.ndarray, vc: jnp.ndarray,
) -> jnp.ndarray:
    """Concatenated-convenience form of ``cls_split_attention_parts``:
    returns [B, H, 1+N, Dp] with the cls row FIRST (the model's token
    order). Production uses the parts form (no concat copy)."""
    out_c, out_p = cls_split_attention_parts(qp, kp, vp, qc, kc, vc)
    return jnp.concatenate([out_c, out_p], axis=2)


def builtin_flash_attention_bhsd(
    q: jnp.ndarray,  # [B, H, S, D_pad] (head dim already lane-padded)
    k: jnp.ndarray,
    v: jnp.ndarray,
    true_head_dim: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """The builtin full-sequence-block kernel on operands ALREADY in the
    kernel's [B, H, S, D_pad] layout (only the sequence pad + segment
    masking happens here). Producers that can emit this layout directly —
    the ViT's head-padded fused qkv matmul (models/eva_vit.py) — skip the
    transpose+head-pad pass entirely: measured 15.5 -> 12.2 ms per
    qkv+attention at EVA ViT-g certify shapes, identical outputs. The
    softmax scale comes from ``true_head_dim`` (the zero-padded lanes add
    nothing to q.k). Returns [B, H, S, D_pad]. Off-TPU falls back to the
    XLA path on the same layout.
    """
    b, h, s, d_pad = q.shape
    if scale is None:
        scale = true_head_dim**-0.5
    if jax.default_backend() != "tpu":
        from certifiedgpt_tpu.ops.attention import multi_head_attention

        bshd = lambda x: jnp.transpose(x, (0, 2, 1, 3))  # noqa: E731
        out = multi_head_attention(bshd(q), bshd(k), bshd(v), scale=scale)
        return jnp.transpose(out, (0, 2, 1, 3))

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as _kernel,
    )

    s_pad = int(np.ceil(s / _LANES) * _LANES)
    pad = lambda x: jnp.pad(  # noqa: E731
        x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
    )
    seg = jnp.broadcast_to(
        jnp.where(jnp.arange(s_pad) < s, 0, 1).astype(jnp.int32), (b, s_pad)
    )
    blocks = BlockSizes(
        block_q=s_pad, block_k_major=s_pad, block_k=s_pad, block_b=1,
        block_q_major_dkv=s_pad, block_k_major_dkv=s_pad,
        block_k_dkv=s_pad, block_q_dkv=s_pad,
        block_k_major_dq=s_pad, block_k_dq=s_pad, block_q_dq=s_pad,
    )
    out = _kernel(
        pad(q), pad(k), pad(v),
        segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=float(scale),
        block_sizes=blocks,
    )
    return out[:, :, :s, :]
