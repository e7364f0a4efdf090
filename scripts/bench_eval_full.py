#!/usr/bin/env python
"""Full-scale eval/generate throughput (the reference's main inference
path, ref ``minigpt4_eval_agent.py:86-124``).

Measures the EvalAgent hot loop — per-batch noise + ViT encode +
prefill + greedy KV-cache decode + host token decode — at reference
scale with the shipped serving stack (W8A8 + int8 KV + cls-split ViT),
over a batch-size sweep. Two loop disciplines:

- ``sync``: the agent's exact semantics — ``np.asarray`` on each
  batch's tokens before the next dispatch (one batch in flight).
- ``pipelined``: dispatch ``--window`` batches ahead and decode the
  oldest while later ones run (the certify samplers' discipline).

Images are pre-staged on device and the timed region excludes the
host->device image transfer: through this image's axon tunnel a
115 MB/batch transfer costs seconds (unrepresentative of real PCIe/DMA
rates — CLAUDE.md), and in the real agent the threaded Loader prefetch
overlaps it. Host token-decode IS included (it is part of the loop).

Usage:
  python -u scripts/bench_eval_full.py [--batch-sizes 16,32,64,96]
         [--steps 6] [--sigma 0.5] [--window 4] [--early-exit]
         [--eos-bias 5.9] [--max-new-tokens 10] [--seq-len 96]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-sizes", type=str, default="16,32,64,96")
    parser.add_argument("--steps", type=int, default=6)
    parser.add_argument("--sigma", type=float, default=0.5)
    parser.add_argument(
        "--window", type=str, default="4",
        help="comma list: each window size measured interleaved per "
        "batch size (e.g. 2,4 pins the shipped default vs the table)",
    )
    parser.add_argument("--seq-len", type=int, default=96)
    parser.add_argument("--max-new-tokens", type=int, default=10)
    parser.add_argument("--early-exit", action="store_true")
    parser.add_argument("--eos-bias", type=float, default=None)
    parser.add_argument("--small", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_full_int8_params, chip_peak_tflops, flops_per_draw
    from certifiedgpt_tpu.data.text import (
        BatchSpec,
        ByteTokenizer,
        build_gen_batch,
        decode_until_eos,
    )
    from certifiedgpt_tpu.models.minigpt4 import (
        MiniGPT4Config,
        generate_greedy,
        init_minigpt4,
    )
    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model
    from certifiedgpt_tpu.agents.finetune import add_input_noise

    if args.small:
        cfg = MiniGPT4Config.small()
        params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    else:
        from certifiedgpt_tpu.models.eva_vit import EvaViTConfig
        from certifiedgpt_tpu.models.llama import LlamaConfig

        cfg = MiniGPT4Config(
            vit=EvaViTConfig(attn_impl="flash_cls", act_quant=True),
            llama=LlamaConfig(act_quant=True, kv_quant=True),
        )
        params = build_full_int8_params(cfg)

    tok = ByteTokenizer()
    if args.eos_bias is not None:
        vocab_size = params["llama"]["lm_head"]["kernel"].shape[-1]
        params["llama"]["lm_head"]["bias"] = (
            jnp.zeros((vocab_size,), jnp.float32)
            .at[tok.eos_token_id].set(args.eos_bias)
        )
    model = MiniGPT4Model(cfg, params, tok)
    eos, pad = tok.eos_token_id, tok.pad_token_id
    sigma, max_new = args.sigma, args.max_new_tokens

    # same two-program split as EvalAgent._build_generate (fusing the
    # threefry draw into the cached decode crashes this TPU backend)
    @jax.jit
    def noise_fn(image, rng):
        return add_input_noise(rng, image, sigma, "gaussian")

    @jax.jit
    def decode_fn(params, batch):
        return generate_greedy(
            params, cfg, batch, max_new, eos, pad,
            early_exit=args.early_exit,
        )

    spec = BatchSpec(seq_len=args.seq_len, num_img_tokens=cfg.num_img_tokens)
    instruction = (
        "<Img><ImageHere></Img> [vqa] Based on the image, "
        "what animal is this?"
    )
    tflop_sample = flops_per_draw(cfg, args.seq_len, max_new) / 1e12
    peak = chip_peak_tflops(jax.devices()[0])
    rng_np = np.random.RandomState(0)
    size = cfg.vit.img_size
    report = {"mode": "early_exit" if args.early_exit else "scan",
              "sigma": sigma, "rows": []}

    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        text = build_gen_batch(tok, [instruction] * bs, spec)
        text = {k: jnp.asarray(v) for k, v in text.items()}
        # pre-staged device images (see module docstring); distinct
        # per-step tensors so no cross-step caching can hide work
        images = [
            jnp.asarray(rng_np.randn(bs, size, size, 3).astype(np.float32))
            for _ in range(args.steps)
        ]

        def run_batch(step):
            batch = dict(text)
            batch["image"] = noise_fn(
                images[step % args.steps], jax.random.fold_in(
                    jax.random.PRNGKey(7), step
                )
            )
            return decode_fn(model.params, batch)

        def host_decode(tokens):
            return [decode_until_eos(tok, row) for row in np.asarray(tokens)]

        host_decode(run_batch(0))  # compile + first-touch, untimed

        # sync: the agent's one-batch-in-flight loop
        t0 = time.time()
        for step in range(args.steps):
            host_decode(run_batch(step))
        dt_sync = time.time() - t0

        # pipelined: window batches in flight, decode the oldest
        from collections import deque

        results = [("sync", dt_sync)]
        for win in [int(w) for w in args.window.split(",")]:
            pending = deque()
            t0 = time.time()
            for step in range(args.steps):
                pending.append(run_batch(step))
                if len(pending) > win:
                    host_decode(pending.popleft())
            while pending:
                host_decode(pending.popleft())
            results.append((f"pipelined(w={win})", time.time() - t0))

        for name, dt in results:
            n = args.steps * bs
            row = {
                "batch_size": bs,
                "loop": name,
                "samples_per_sec": round(n / dt, 2),
                "ms_per_batch": round(1000 * dt / args.steps, 1),
                "mfu": round(n * tflop_sample / dt / peak, 3),
            }
            report["rows"].append(row)
            print(
                f"bs={bs:3d} {name:9s} {row['samples_per_sec']:7.2f} "
                f"samples/s  {row['ms_per_batch']:8.1f} ms/batch  "
                f"MFU {row['mfu']:.3f}", flush=True,
            )

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
