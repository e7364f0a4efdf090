#!/usr/bin/env python
"""r3 experiment: cls-split exact-1024 attention vs the builtin kernel.

EVA ViT-g's sequence is 1025 = 1 cls + 32x32 patches. The builtin
full-seq flash kernel pads S 1025->1152 (9x128) and masks — 1.27x padded
matmul FLOPs and 1.27x padded softmax VPU work. Splitting the cls token
out makes the main attention EXACTLY 1024 (8x128, no mask, no padding):

  patch rows: softmax over [1024 patch keys + 1 cls key]
              = full-block attention over Kp with a rank-1 online merge
                of the cls key, all inside one Pallas cell
  cls row:    1 query over 1025 keys — negligible, plain XLA

Candidates at certify shapes (B=50, H=16, S=1025, D=88->128, bf16):
  builtin   current production kernel (S->1152 full-seq blocks)
  cls_TQxxx custom kernel, q tile xxx, K resident (1024)

Usage: python -u scripts/bench_cls_split_attention.py [batch]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cls_kernel(q_ref, k_ref, v_ref, kc_ref, vc_ref, out_ref, *, scale):
    # q [1,1,TQ,D], k/v [1,1,1024,D], kc/vc [1,1,8,D] (row 0 real)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [TQ, 1024] fp32
    # cls score as a VPU reduce, not a N=1 matvec — Mosaic's matvec
    # lowering trips a bf16->f32 vector.broadcast verification error
    kc = kc_ref[0, 0, 0:1, :].astype(jnp.float32)  # [1, D]
    s_c = jnp.sum(
        q.astype(jnp.float32) * kc, axis=1, keepdims=True
    ) * scale  # [TQ, 1]
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_c)
    p = jnp.exp(scores - m)
    e_c = jnp.exp(s_c - m)  # [TQ, 1]
    l = jnp.sum(p, axis=-1, keepdims=True) + e_c
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, D]
    vc = vc_ref[0, 0, 0:1, :].astype(jnp.float32)  # [1, D]
    out_ref[0, 0] = ((pv + e_c * vc) / l).astype(out_ref.dtype)


def cls_split_attention(qp, kp, vp, true_head_dim, tile_q=1024):
    """qp/kp/vp [B, H, 1025, Dp] (cls at index 0) -> [B, H, 1025, Dp]."""
    b, h, s, d = qp.shape
    assert s == 1025
    scale = true_head_dim ** -0.5
    q_cls, q_p = qp[:, :, :1], qp[:, :, 1:]
    k_cls, k_p = kp[:, :, :1], kp[:, :, 1:]
    v_cls, v_p = vp[:, :, :1], vp[:, :, 1:]
    kc8 = jnp.pad(k_cls, ((0, 0), (0, 0), (0, 7), (0, 0)))
    vc8 = jnp.pad(v_cls, ((0, 0), (0, 0), (0, 7), (0, 0)))

    kernel = functools.partial(_cls_kernel, scale=scale)
    num_q = 1024 // tile_q
    out_p = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, 1024, d), qp.dtype),
        grid=(b, h, num_q),
        in_specs=[
            pl.BlockSpec((1, 1, tile_q, d), lambda bb, hh, qi: (bb, hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1024, d), lambda bb, hh, qi: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1024, d), lambda bb, hh, qi: (bb, hh, 0, 0),
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
    )(q_p, k_p, v_p, kc8, vc8)

    # cls row: 1 query over all 1025 keys — plain XLA, negligible
    s_cls = jnp.einsum(
        "bhqd,bhkd->bhqk", q_cls, kp, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(s_cls, axis=-1)
    out_cls = jnp.einsum(
        "bhqk,bhkd->bhqd", w.astype(vp.dtype), vp,
        preferred_element_type=jnp.float32,
    ).astype(qp.dtype)
    return jnp.concatenate([out_cls, out_p], axis=2)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    float(np.asarray(out[0]))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(out[0]))
    return (time.time() - t0) / reps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    H, S, D, DP = 16, 1025, 88, 128
    key = jax.random.PRNGKey(0)

    from certifiedgpt_tpu.ops.flash_attention import (
        builtin_flash_attention_bhsd,
    )

    # inputs generated ONCE on device — the timed paths see only the
    # attention op (the earlier in-jit RNG added ~10 ms of threefry)
    mask = (jnp.arange(DP) < D).astype(jnp.bfloat16)
    q, k, v = (
        jax.random.normal(
            jax.random.fold_in(key, i), (B, H, S, DP), jnp.bfloat16
        ) * mask
        for i in range(3)
    )
    # sync via a scalar pull — block_until_ready is a no-op through
    # the axon tunnel (CLAUDE.md)
    float(np.asarray(q[0, 0, 0, 0]) + np.asarray(k[0, 0, 0, 0])
          + np.asarray(v[0, 0, 0, 0]))

    @jax.jit
    def builtin_path(q, k, v):
        out = builtin_flash_attention_bhsd(q, k, v, D)
        return jnp.sum(out[:, 0, 0, 0]), out

    def make_cls(tile_q):
        @jax.jit
        def cls_path(q, k, v):
            out = cls_split_attention(q, k, v, D, tile_q=tile_q)
            return jnp.sum(out[:, 0, 0, 0]), out

        return cls_path

    t_b = timeit(builtin_path, q, k, v)
    _, ref = builtin_path(q, k, v)
    print(f"builtin(1152)   {t_b*1e3:7.2f} ms", flush=True)

    for tq in (1024, 512, 256):
        try:
            fn = make_cls(tq)
            t = timeit(fn, q, k, v)
            _, out = fn(q, k, v)
            diff = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32)
            )))
            print(f"cls_TQ{tq:<8} {t*1e3:7.2f} ms  maxdiff={diff:.4f}",
                  flush=True)
        except Exception as exc:
            print(f"cls_TQ{tq} FAILED: {type(exc).__name__}: {exc}"[:400],
                  flush=True)


if __name__ == "__main__":
    main()
