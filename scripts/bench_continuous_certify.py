#!/usr/bin/env python
"""Dataset-scale certify throughput: serial loop vs continuous batching.

Certifies N_IMAGES synthetic images at (n0, n) in both modes with the
same full-scale serving stack as bench.py and reports wall-clock
images/hour. The serial mode's waste is the per-image partial chunk —
``(-n0) % mc + (-n) % mc`` rows per image (zero at mc=50, 13% at the
shipped mc=96) — plus the dispatch bubbles between phases/images;
continuous batching packs draws from multiple questions into every
chunk (smoothing/continuous.py).

r4 additions (VERDICT r3 items 1 and 4):

- ``--sigma-grid 0.25,0.5,1.0 --n-grid 200,1000,400``: a ragged per-
  sigma draw-budget sweep — the continuous scheduler's claimed real use
  case, where each sigma's budget leaves large partial chunks that the
  serial loop burns per image and the packer fills. Both modes share
  ONE compiled pipeline across the whole grid (sigma and the budget
  are runtime values).
- ``--early-abstain``: exact sequential stopping (docs/DESIGN.md §3).
- ``--label-split K``: replace the answer->label mapping with a
  deterministic text-hash into K classes. Device work and host decode
  are untouched (the hash runs on the decoded text exactly where
  label_of would); labels just split ~uniformly, so the run becomes
  abstain-heavy — the measurable stand-in for a real abstain-heavy
  dataset, which random weights cannot produce (they answer the same
  garbage for every draw).

Usage:
  python -u scripts/bench_continuous_certify.py [--small] [--images 20]
         [--n 1000] [--n0 100] [--mc-batch 50] [--sigma-grid ...]
         [--n-grid ...] [--early-abstain] [--label-split 2]
"""

import argparse
import hashlib
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


class _SplitVocab:
    """AnswerVocabulary veneer that hashes the decoded text PLUS a
    per-image draw counter into K ~uniform classes (abstain-heavy
    synthetic labels; see module docstring).

    The counter is load-bearing (r5): measured at full scale, the
    random-weight model decodes the SAME garbage text for essentially
    every noise draw of an image, so hashing the text alone maps all
    draws to one class — pA ~ 1, zero abstains, and the early-abstain
    rule never fires (the r4 text-only split measured serial/continuous
    draws identical at 8800/8800). Folding the draw index in makes the
    label stream ~uniform over K — the stand-in for a model whose
    answers genuinely vary under noise — while device work and host
    decode stay untouched (the hash still runs on the decoded text,
    exactly where AnswerVocabulary.label_of would)."""

    def __init__(self, k: int):
        self.num_classes = int(k)
        self.other_label = 0
        self._draw = 0

    def label_of(self, text: str) -> int:
        self._draw += 1
        payload = f"{text}#{self._draw}".encode()
        digest = hashlib.blake2b(payload, digest_size=4).digest()
        return int.from_bytes(digest, "little") % self.num_classes

    def text_of(self, label: int) -> str:
        return f"<class{label}>"


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
    parser.add_argument(
        "--sigma-grid", type=str, default=None,
        help="comma list of sigmas; with --n-grid, a ragged per-sigma "
        "budget sweep (images certified at EVERY sigma)",
    )
    parser.add_argument(
        "--n-grid", type=str, default=None,
        help="comma list of estimation budgets, one per --sigma-grid entry",
    )
    parser.add_argument("--early-abstain", action="store_true")
    parser.add_argument(
        "--ab-early-abstain", action="store_true",
        help="measure early-abstain OFF then ON for each mode in one "
        "process (same compiled pipelines; interleaved A/B)",
    )
    parser.add_argument(
        "--early-stop-radius", type=float, default=None,
        help="success-certain stopping target R (smoothing.py): active in "
        "the ON arm of --ab-early-abstain (or with --early-abstain). Set "
        "R >= the largest ACHIEVABLE radius_grid point — at n=1000, "
        "alpha=0.001 the max pA_bar is 0.9931 so radius caps at 2.46*sigma "
        "and unreachable grid cells need no cover (docs/EXPERIMENTS.md).",
    )
    parser.add_argument(
        "--label-split", type=int, default=None,
        help="hash decoded answers into K classes (abstain-heavy labels)",
    )
    parser.add_argument(
        "--mode", choices=("certify", "predict"), default="certify",
        help="predict: the two-sided-test decision pass (n0=0; the ON "
        "arm uses the completion-certain rule, "
        "smoothing.predict_stop_certain)",
    )
    parser.add_argument(
        "--alpha", type=float, default=0.001,
        help="significance level (certify lower bound / predict test)",
    )
    parser.add_argument("--skip-serial", action="store_true")
    parser.add_argument("--skip-continuous", action="store_true")
    args = parser.parse_args()
    if args.mode == "predict" and args.early_stop_radius is not None:
        parser.error("--early-stop-radius applies to certify only")

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
    from certifiedgpt_tpu.smoothing.continuous import (
        ContinuousCertifier,
        make_mixed_generate_fn,
    )
    from certifiedgpt_tpu.smoothing.smoothing import Smooth

    if args.small:
        cfg = MiniGPT4Config.small()
        params = init_minigpt4(jax.random.PRNGKey(0), cfg)
        mc = args.mc_batch or 100
    else:
        from certifiedgpt_tpu.models.eva_vit import EvaViTConfig
        from certifiedgpt_tpu.models.llama import LlamaConfig

        cfg = MiniGPT4Config(
            vit=EvaViTConfig(attn_impl="flash_cls", act_quant=True),
            llama=LlamaConfig(act_quant=True, kv_quant=True),
        )
        params = build_full_int8_params(cfg)
        mc = args.mc_batch or 96

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

    if args.label_split:
        build_vocab = lambda item: _SplitVocab(args.label_split)  # noqa: E731
    else:
        build_vocab = lambda item: AnswerVocabulary(item["gt_answers"])  # noqa: E731

    if args.sigma_grid:
        sigmas = [float(s) for s in args.sigma_grid.split(",")]
        ns = (
            [int(v) for v in args.n_grid.split(",")]
            if args.n_grid else [args.n] * len(sigmas)
        )
        assert len(ns) == len(sigmas), "--n-grid must match --sigma-grid"
    else:
        sigmas, ns = [args.sigma], [args.n]
    cells = len(sigmas) * args.images  # one certificate per (sigma, image)

    for sig, n_est in zip(sigmas, ns):
        waste = ((-args.n0) % mc + (-n_est) % mc) / (args.n0 + n_est)
        print(
            f"mc={mc} sigma={sig} n={n_est}: serial partial-chunk waste = "
            f"{waste:.1%}", flush=True,
        )

    report = {
        "cells": cells,
        "mode": args.mode,
        "alpha": args.alpha,
        "early_abstain": args.early_abstain,
        "early_stop_radius": args.early_stop_radius,
        "label_split": args.label_split,
        "sigma_grid": sigmas,
        "n_grid": ns,
    }

    gen = None
    mixed_gen = None

    def measure_serial(early, tag):
        # ONE compiled pipeline across the whole grid: sigma is a runtime
        # scalar of the noise graph, the budget only changes chunk counts
        nonlocal gen
        if gen is None:
            gen = make_noisy_generate_fn(
                model, sigmas[0], mc, args.max_new_tokens,
                seq_len=args.seq_len,
            )
            warm = make_sample_fn(
                model, items[0]["instruction_input"], build_vocab(items[0]),
                sigmas[0], mc_batch=mc, max_new_tokens=args.max_new_tokens,
                seq_len=args.seq_len, gen=gen,
            )
            warm(items[0]["image"], mc, seed=999)
        draws_used = 0
        t0 = time.time()
        for si, (sig, n_est) in enumerate(zip(sigmas, ns)):
            for idx, item in enumerate(items):
                vocab = build_vocab(item)
                sample_fn = make_sample_fn(
                    model, item["instruction_input"], vocab, sig,
                    mc_batch=mc, max_new_tokens=args.max_new_tokens,
                    seq_len=args.seq_len, gen=gen,
                )
                smooth = Smooth(sample_fn, vocab.num_classes, sig)
                if args.mode == "predict":
                    smooth.predict(
                        item["image"], n_est, args.alpha,
                        seed=1000 * si + idx, early_stop=early,
                    )
                else:
                    smooth.certify(
                        item["image"], args.n0, n_est, args.alpha,
                        seed=1000 * si + idx,
                        early_abstain=early,
                        early_stop_radius=(
                            args.early_stop_radius if early else None
                        ),
                    )
                draws_used += smooth.last_draws
        dt = time.time() - t0
        report[f"serial{tag}_s_per_cell"] = dt / cells
        report[f"serial{tag}_cells_per_hour"] = 3600 * cells / dt
        report[f"serial{tag}_draws"] = draws_used
        print(
            f"serial{tag}     {dt:.1f}s = {dt/cells:.2f} s/cell = "
            f"{3600*cells/dt:.1f} cells/h (draws labeled: {draws_used})",
            flush=True,
        )

    def measure_continuous(early, tag):
        nonlocal mixed_gen
        if mixed_gen is None:
            mixed_gen = make_mixed_generate_fn(
                model, mc, args.max_new_tokens, num_slots=8,
                seq_len=args.seq_len,
            )
            # warm with one dummy chunk using bank-exact dtypes (a dtype
            # mismatch would silently compile a SECOND full-scale pipeline)
            img = cfg.vit.img_size
            mixed_gen(
                model.params,
                jnp.zeros((8, img, img, 3), jnp.float32),
                jnp.asarray(np.zeros((8, args.seq_len), np.int64)),
                jnp.asarray(np.zeros((8, args.seq_len), np.int64)),
                jnp.asarray(np.zeros((8,), np.int64)),
                jnp.asarray(np.zeros((mc,), np.int32)),
                jax.random.PRNGKey(0), sigmas[0],
            )
        draws_used = 0
        t0 = time.time()
        for si, (sig, n_est) in enumerate(zip(sigmas, ns)):
            certifier = ContinuousCertifier(
                model, sigma=sig,
                n0=0 if args.mode == "predict" else args.n0,
                n=n_est, alpha=args.alpha,
                mc_batch=mc, max_new_tokens=args.max_new_tokens,
                seq_len=args.seq_len, num_slots=8, gen=mixed_gen,
                mode=args.mode,
                early_abstain=early,
                early_stop_radius=(
                    args.early_stop_radius if early else None
                ),
            )
            decided = []
            certifier.run(
                items, lambda s: s, build_vocab, seed=7 + si,
                on_result=lambda res, job: decided.append(job.decoded),
            )
            draws_used += sum(decided)
        dt = time.time() - t0
        report[f"continuous{tag}_s_per_cell"] = dt / cells
        report[f"continuous{tag}_cells_per_hour"] = 3600 * cells / dt
        report[f"continuous{tag}_draws"] = draws_used
        print(
            f"continuous{tag} {dt:.1f}s = {dt/cells:.2f} s/cell = "
            f"{3600*cells/dt:.1f} cells/h (draws labeled: {draws_used})",
            flush=True,
        )

    if args.ab_early_abstain:
        # interleaved on/off A/B in ONE process (cross-process TPU
        # timings drift — CLAUDE.md): the early-abstain throughput claim
        if not args.skip_serial:
            measure_serial(False, "_off")
            measure_serial(True, "_on")
        if not args.skip_continuous:
            measure_continuous(False, "_off")
            measure_continuous(True, "_on")
    else:
        if not args.skip_serial:
            measure_serial(args.early_abstain, "")
        if not args.skip_continuous:
            measure_continuous(args.early_abstain, "")
        if "serial_cells_per_hour" in report and (
            "continuous_cells_per_hour" in report
        ):
            report["speedup"] = (
                report["continuous_cells_per_hour"]
                / report["serial_cells_per_hour"]
            )
            print(f"speedup x{report['speedup']:.3f}", flush=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
