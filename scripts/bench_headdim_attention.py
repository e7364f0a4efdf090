#!/usr/bin/env python
"""r5 experiment (VERDICT r4 item 7): can head-dim-exact (D=88) ViT
attention beat the padded D=128 path?

EVA ViT-g has head_dim 88; the serving stack pads it to 128 everywhere
(`_qkv_headpadded` emits padded operands, the cls-split kernel consumes
128-lane blocks), which is 1.45x the algebraic attention FLOPs
(ref graphs/models/minigpt4/models/eva_vit.py:425-438 for the scale
facts). r3 asserted "the MXU contracts 128 lanes regardless, so no
kernel can recover it" — this script MEASURES that claim and the one
structural alternative, all interleaved in ONE process (one-shot TPU
timings drift across processes):

1. ``qk88 / qk128``: the raw score dot q@k^T at kernel shapes with
   D=88 vs D=128 contraction. If the MXU lane-quantization argument is
   right, the times match (a 88-lane contraction occupies a full
   128-lane pass); Pallas cannot even express an 88-lane block (block
   last dims must be 128-multiples), so exact-D inside the kernel is
   off the table regardless — this probes the best case.
2. ``pv88 / pv128``: the context dot p@v with output dim 88 vs 128 —
   output columns are also 128-lane-quantized.
3. ``qkv_padded / qkv_exact(+repad)``: the one place exact-D provably
   removes MXU work: the qkv GEMM's output columns (3*16*88 = 4224 =
   33x128 exact vs 3*16*128 = 6144 padded, -31% GEMM FLOPs). But the
   kernel needs 128-padded heads, so the exact GEMM must be followed by
   a repad pass ([M,3,16,88] -> pad -> [M,6144]) whose HBM cost
   (read+write ~2x the padded tensor) competes against the GEMM saving.
   Adopt if exact+repad < padded by >=10% of the attention stage,
   else record the rejection in docs/DESIGN.md §7.

Usage: python -u scripts/bench_headdim_attention.py [--heads 16]
       [--tokens 102400] [--trials 5] [--int8]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--heads", type=int, default=16,
                        help="heads per raw-dot probe (memory-bound cap)")
    parser.add_argument("--tokens", type=int, default=102400,
                        help="qkv GEMM rows (certify chunk: 100 x 1024)")
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--int8", action="store_true",
                        help="qkv GEMM probes in the serving int8 path")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    N = 1024  # patch block (cls-split exact)
    H = args.heads
    M = args.tokens
    d_model = 1408

    def t_min(fn, *xs):
        """min-of-trials wall time; sync by pulling one scalar."""
        out = fn(*xs)
        _sync(out)
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            _sync(fn(*xs))
            times.append(time.time() - t0)
        return min(times)

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf[..., :1, :1].astype(jnp.float32)))

    # ---- 1/2: raw attention dots, D=88 vs D=128 ----------------------
    probes = {}
    qkpv = {}
    for D in (88, 128):
        q = jnp.asarray(rng.randn(H, N, D).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.randn(H, N, D).astype(np.float32), jnp.bfloat16)
        p = jnp.asarray(
            rng.rand(H, N, N).astype(np.float32) / N, jnp.bfloat16
        )
        v = jnp.asarray(rng.randn(H, N, D).astype(np.float32), jnp.bfloat16)

        qk = jax.jit(lambda a, b: jnp.einsum(
            "hqd,hkd->hqk", a, b, preferred_element_type=jnp.float32))
        pv = jax.jit(lambda a, b: jnp.einsum(
            "hqk,hkd->hqd", a, b, preferred_element_type=jnp.float32))
        qkpv[D] = (qk, pv, q, k, p, v)

    # TRULY interleaved trials: every probe warms first, then trials
    # round-robin across all four (a sequential per-D loop let a tunnel
    # slow patch skew one arm — observed 33.6 vs 25.0 ms for the same
    # D=128 dot in two runs)
    dot_fns = {}
    for D, (qk, pv, q, k, p, v) in qkpv.items():
        dot_fns[f"qk{D}_ms"] = (qk, (q, k))
        dot_fns[f"pv{D}_ms"] = (pv, (p, v))
    for fn, xs in dot_fns.values():
        _sync(fn(*xs))  # warm/compile
    dot_times = {name: [] for name in dot_fns}
    for _ in range(args.trials):
        for name, (fn, xs) in dot_fns.items():
            t0 = time.time()
            _sync(fn(*xs))
            dot_times[name].append(time.time() - t0)
    for name, ts in dot_times.items():
        probes[name] = round(1e3 * min(ts), 3)

    # ---- 3: qkv GEMM, padded vs exact(+repad) ------------------------
    cols_exact, cols_pad = 3 * 16 * 88, 3 * 16 * 128
    x32 = rng.randn(M, d_model).astype(np.float32)
    if args.int8:
        from certifiedgpt_tpu.ops.quantization import (
            quantize_kernel,
            w8a8_matmul,
        )

        x = jnp.asarray(x32, jnp.bfloat16)
        q_e = quantize_kernel(
            jnp.asarray(rng.randn(d_model, cols_exact).astype(np.float32))
        )
        q_p = quantize_kernel(
            jnp.asarray(rng.randn(d_model, cols_pad).astype(np.float32))
        )

        gemm_exact = jax.jit(
            lambda a: w8a8_matmul(a, q_e["kernel_q"], q_e["scale"])
        )
        gemm_pad = jax.jit(
            lambda a: w8a8_matmul(a, q_p["kernel_q"], q_p["scale"])
        )
    else:
        x = jnp.asarray(x32, jnp.bfloat16)
        w_e = jnp.asarray(
            rng.randn(d_model, cols_exact).astype(np.float32), jnp.bfloat16
        )
        w_p = jnp.asarray(
            rng.randn(d_model, cols_pad).astype(np.float32), jnp.bfloat16
        )
        gemm_exact = jax.jit(lambda a: a @ w_e)
        gemm_pad = jax.jit(lambda a: a @ w_p)

    @jax.jit
    def repad(y):
        # [M, 3*16*88] -> per-head pad 88->128 -> [M, 3*16*128]
        y = y.reshape(M, 3 * 16, 88)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 40)))
        return y.reshape(M, cols_pad)

    gemm_exact_repad = jax.jit(lambda a: repad(gemm_exact(a)))

    probes["qkv_padded_ms"] = round(1e3 * t_min(gemm_pad, x), 3)
    probes["qkv_exact_ms"] = round(1e3 * t_min(gemm_exact, x), 3)
    probes["qkv_exact_repad_ms"] = round(
        1e3 * t_min(gemm_exact_repad, x), 3
    )

    report = {
        "metric": "headdim_exact_ab",
        "device": getattr(jax.devices()[0], "device_kind", "?"),
        "heads": H,
        "tokens": M,
        "int8": args.int8,
        **probes,
        # the decision numbers
        "qk_ratio_88_over_128": round(
            probes["qk88_ms"] / probes["qk128_ms"], 3
        ),
        "pv_ratio_88_over_128": round(
            probes["pv88_ms"] / probes["pv128_ms"], 3
        ),
        "qkv_exact_repad_over_padded": round(
            probes["qkv_exact_repad_ms"] / probes["qkv_padded_ms"], 3
        ),
    }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
