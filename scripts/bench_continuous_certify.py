#!/usr/bin/env python
"""Dataset-scale certify throughput: serial loop vs continuous batching.

Certifies N_IMAGES synthetic images at (n0, n) in both modes with the
same full-scale serving stack as bench.py and reports wall-clock
images/hour. The serial mode's waste is the per-image partial chunk —
``(-n0) % mc + (-n) % mc`` rows per image (zero at mc=50, 13% at the
shipped mc=96) — plus the dispatch bubbles between phases/images;
continuous batching packs draws from multiple questions into every
chunk (smoothing/continuous.py).

Usage:
  python -u scripts/bench_continuous_certify.py [--small] [--images 20]
         [--n 1000] [--n0 100] [--mc-batch 50]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--images", type=int, default=20)
    parser.add_argument("--n", type=int, default=1000)
    parser.add_argument("--n0", type=int, default=100)
    parser.add_argument("--mc-batch", type=int, default=None)
    parser.add_argument("--seq-len", type=int, default=96)
    parser.add_argument("--max-new-tokens", type=int, default=10)
    parser.add_argument("--sigma", type=float, default=0.5)
    parser.add_argument("--skip-serial", action="store_true")
    parser.add_argument("--skip-continuous", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_full_int8_params
    from certifiedgpt_tpu.data.text import ByteTokenizer
    from certifiedgpt_tpu.models.minigpt4 import MiniGPT4Config, init_minigpt4
    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model
    from certifiedgpt_tpu.smoothing.classifier import (
        AnswerVocabulary,
        make_noisy_generate_fn,
        make_sample_fn,
    )
    from certifiedgpt_tpu.smoothing.continuous import ContinuousCertifier
    from certifiedgpt_tpu.smoothing.smoothing import Smooth

    if args.small:
        cfg = MiniGPT4Config.small()
        params = init_minigpt4(jax.random.PRNGKey(0), cfg)
        mc = args.mc_batch or 100
    else:
        from certifiedgpt_tpu.models.eva_vit import EvaViTConfig
        from certifiedgpt_tpu.models.llama import LlamaConfig

        cfg = MiniGPT4Config(
            vit=EvaViTConfig(attn_impl="flash", act_quant=True),
            llama=LlamaConfig(act_quant=True, kv_quant=True),
        )
        params = build_full_int8_params(cfg)
        mc = args.mc_batch or 50

    model = MiniGPT4Model(cfg, params, ByteTokenizer())
    vocab_answers = ["cat", "dog", "bird", "2", "yes", "no"]
    rng = np.random.RandomState(0)
    size = cfg.vit.img_size
    items = [
        {
            "image": rng.randn(size, size, 3).astype(np.float32),
            "instruction_input": (
                f"<Img><ImageHere></Img> [vqa] question {i}: what is this?"
            ),
            "question_id": i,
            "gt_answers": vocab_answers,
        }
        for i in range(args.images)
    ]

    waste = ((-args.n0) % mc + (-args.n) % mc) / (args.n0 + args.n)
    print(f"mc={mc} serial partial-chunk waste = {waste:.1%}", flush=True)

    report = {}

    if not args.skip_serial:
        gen = make_noisy_generate_fn(
            model, args.sigma, mc, args.max_new_tokens, seq_len=args.seq_len
        )
        # warm the compile outside the timed region (both modes pay it once)
        warm = make_sample_fn(
            model, items[0]["instruction_input"],
            AnswerVocabulary(vocab_answers), args.sigma, mc_batch=mc,
            max_new_tokens=args.max_new_tokens, seq_len=args.seq_len, gen=gen,
        )
        warm(items[0]["image"], mc, seed=999)
        t0 = time.time()
        for idx, item in enumerate(items):
            vocab = AnswerVocabulary(item["gt_answers"])
            sample_fn = make_sample_fn(
                model, item["instruction_input"], vocab, args.sigma,
                mc_batch=mc, max_new_tokens=args.max_new_tokens,
                seq_len=args.seq_len, gen=gen,
            )
            smooth = Smooth(sample_fn, vocab.num_classes, args.sigma)
            smooth.certify(item["image"], args.n0, args.n, 0.001, seed=idx)
        dt = time.time() - t0
        report["serial_s_per_image"] = dt / args.images
        report["serial_images_per_hour"] = 3600 * args.images / dt
        print(
            f"serial     {dt:.1f}s = {dt/args.images:.2f} s/img = "
            f"{3600*args.images/dt:.1f} img/h", flush=True,
        )

    if not args.skip_continuous:
        certifier = ContinuousCertifier(
            model, sigma=args.sigma, n0=args.n0, n=args.n, alpha=0.001,
            mc_batch=mc, max_new_tokens=args.max_new_tokens,
            seq_len=args.seq_len, num_slots=8,
        )
        # warm the mixed-gen compile with one dummy chunk, using the
        # certifier's OWN host banks converted exactly as run() converts
        # them — hand-built arrays with different dtypes (e.g. int32 vs
        # the banks' int64) would silently compile a SECOND full-scale
        # pipeline and corrupt the timing
        certifier.gen(
            model.params, certifier._image_bank,
            jnp.asarray(certifier._ids_bank),
            jnp.asarray(certifier._am_bank),
            jnp.asarray(certifier._pos_bank),
            jnp.asarray(np.zeros((mc,), np.int32)),
            jax.random.PRNGKey(0), args.sigma,
        )
        t0 = time.time()
        certifier.run(
            items, lambda s: s,
            lambda it: AnswerVocabulary(it["gt_answers"]), seed=7,
        )
        dt = time.time() - t0
        report["continuous_s_per_image"] = dt / args.images
        report["continuous_images_per_hour"] = 3600 * args.images / dt
        print(
            f"continuous {dt:.1f}s = {dt/args.images:.2f} s/img = "
            f"{3600*args.images/dt:.1f} img/h", flush=True,
        )

    if len(report) == 4:
        report["speedup"] = (
            report["continuous_images_per_hour"]
            / report["serial_images_per_hour"]
        )
        print(f"speedup x{report['speedup']:.3f}", flush=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
