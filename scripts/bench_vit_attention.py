#!/usr/bin/env python
"""Compare attention impls at EVA ViT-g shapes on the live chip.

B=50 (bench mc_batch), H=16, S=1025, D=88, bf16, no mask. Candidates:
- current XLA einsum+softmax path (materializes [B,H,S,S])
- jax builtin Pallas TPU flash_attention, S padded to 1152, D padded to 128
- same with D=88 unpadded (if the kernel accepts it)

Usage: python -u scripts/bench_vit_attention.py [batch]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(np.asarray(out[0]))  # sync on the scalar
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(out[0]))
    return (time.time() - t0) / reps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    H, S, D = 16, 1025, 88
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    from certifiedgpt_tpu.ops.attention import multi_head_attention

    key = jax.random.PRNGKey(0)
    scale = D ** -0.5

    @jax.jit
    def xla_path(key):
        q, k, v = (
            jax.random.normal(jax.random.fold_in(key, i), (B, S, H, D), jnp.bfloat16)
            for i in range(3)
        )
        out = multi_head_attention(q, k, v)
        return jnp.sum(out[:, 0, 0, 0]), out

    SP = 1152  # 9 x 128
    blocks = BlockSizes(
        block_q=128, block_k_major=128, block_k=128, block_b=1,
        block_q_major_dkv=128, block_k_major_dkv=128,
        block_k_dkv=128, block_q_dkv=128,
        block_k_major_dq=128, block_k_dq=128, block_q_dq=128,
    )

    def make_flash(DP):
        @jax.jit
        def flash_path(key):
            q, k, v = (
                jax.random.normal(
                    jax.random.fold_in(key, i), (B, S, H, D), jnp.bfloat16
                )
                for i in range(3)
            )
            # layout [B,H,S,D], pad S -> SP (and D -> DP)
            def prep(x):
                x = jnp.transpose(x, (0, 2, 1, 3))
                return jnp.pad(x, ((0, 0), (0, 0), (0, SP - S), (0, DP - D)))

            qp, kp, vp = prep(q), prep(k), prep(v)
            seg = jnp.where(jnp.arange(SP) < S, 0, 1).astype(jnp.int32)
            seg = jnp.broadcast_to(seg, (B, SP))
            out = flash_attention(
                qp, kp, vp,
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=scale, block_sizes=blocks,
            )
            out = jnp.transpose(out[:, :, :S, :D], (0, 2, 1, 3))
            return jnp.sum(out[:, 0, 0, 0]), out

        return flash_path

    t_xla, (_, ref) = timeit(xla_path, key), xla_path(key)
    print(f"xla            {t_xla*1e3:7.1f} ms", flush=True)

    for DP in (128, 96):
        try:
            fp = make_flash(DP)
            t = timeit(fp, key)
            _, out = fp(key)
            diff = float(
                jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
            )
            print(f"flash D->{DP:<4} {t*1e3:7.1f} ms  maxdiff={diff:.4f}", flush=True)
        except Exception as exc:
            print(f"flash D->{DP} FAILED: {type(exc).__name__}: {exc}"[:300], flush=True)


if __name__ == "__main__":
    main()
