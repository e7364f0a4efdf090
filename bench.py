#!/usr/bin/env python
"""Headline benchmark: smoothed certification throughput.

Measures the BASELINE.json north-star configuration — certify ONE VQAv2
image at n=1000 noise draws, sigma=0.5 — through the full TPU pipeline:
on-device Gaussian noise -> EVA-ViT encode -> Q-Former -> projection ->
greedy KV-cache decode -> host answer->label mapping -> Clopper-Pearson
certification. Model: ``MiniGPT4Config.small()`` (structurally complete,
random weights; checkpoint-scale weights are not shipped in this image).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ...}
``vs_baseline`` is target_seconds / measured_seconds vs the <10 s v4-8
target (>1.0 beats the target).
"""

import json
import time

import numpy as np


def main():
    import jax

    from certifiedgpt_tpu.data.text import BatchSpec, ByteTokenizer, build_gen_batch
    from certifiedgpt_tpu.models.minigpt4 import (
        MiniGPT4Config,
        init_minigpt4,
    )
    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model
    from certifiedgpt_tpu.smoothing.classifier import AnswerVocabulary, make_sample_fn
    from certifiedgpt_tpu.smoothing.smoothing import Smooth

    sigma = 0.5
    n0, n, alpha = 100, 1000, 0.001
    mc_batch = 100
    max_new_tokens = 10

    cfg = MiniGPT4Config.small()
    params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    model = MiniGPT4Model(cfg, params, ByteTokenizer())

    vocab = AnswerVocabulary(["cat", "dog", "bird", "2", "yes", "no"])
    instruction = (
        "<Img><ImageHere></Img> [vqa] Based on the image, respond to this "
        "question with a short answer: what animal is this?"
    )
    sample_fn = make_sample_fn(
        model, instruction, vocab, sigma,
        mc_batch=mc_batch, max_new_tokens=max_new_tokens, seq_len=96,
    )
    smooth = Smooth(sample_fn, vocab.num_classes, sigma)

    rng = np.random.RandomState(0)
    image = rng.randn(cfg.vit.img_size, cfg.vit.img_size, 3).astype(np.float32)

    # warmup: compile the noisy-generate graph
    sample_fn(image, mc_batch, seed=123)

    t0 = time.time()
    label, radius = smooth.certify(image, n0=n0, n=n, alpha=alpha, seed=7)
    seconds = time.time() - t0

    target = 10.0  # <10 s on v4-8 (BASELINE.md north star)
    print(
        json.dumps(
            {
                "metric": "certify_1_image_n1000_sigma0.5_smallmodel_seconds",
                "value": round(seconds, 3),
                "unit": "s",
                "vs_baseline": round(target / seconds, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
