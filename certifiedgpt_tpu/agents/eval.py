"""Eval agent (``image_text_eval``).

Rebuild of the reference eval loop
(ref ``agents/minigpt4_eval_agent.py:52-124``): load finetuned weights,
greedy-generate answers for the val split through ONE jit-compiled
batched decode, clean them up, and score with the official VQA protocol.
The reference's latent bugs are fixed-forward rather than ported: the
tuple/dict result bug (ref ``:100-104``), the missing-``self`` static
methods, and the reliance on dataset keys the val split never emits
(SURVEY.md §2.3).

Aux metrics kept from the reference (ref ``:126-166``): exact match,
token-level F1, and an answer-bias counter (how often the model emits its
single most frequent answer). BERTScore is gated behind availability.
"""

from __future__ import annotations

import functools
import json
import os
from collections import Counter, deque
from typing import Any, Dict, List

import jax
import numpy as np

from certifiedgpt_tpu.agents.base import BaseAgent
from certifiedgpt_tpu.agents.finetune import add_input_noise
from certifiedgpt_tpu.common.registry import registry
from certifiedgpt_tpu.data.loader import Loader, shard_batch
from certifiedgpt_tpu.data.text import BatchSpec, build_gen_batch, clean_answer
from certifiedgpt_tpu.models.minigpt4 import generate_greedy
from certifiedgpt_tpu.vqa_tools.vqa import VQA
from certifiedgpt_tpu.vqa_tools.vqa_eval import VQAEval, normalize_answer


def maybe_bertscore(predictions, references, logger):
    """BERTScore F1 when the optional ``bert_score`` package exists
    (ref ``minigpt4_eval_agent.py:159-166``); None otherwise."""
    try:
        from bert_score import score as bert_score_fn
    except ImportError:
        logger.warning("bert_score not installed; skipping BERTScore")
        return None
    try:
        _, _, f1 = bert_score_fn(predictions, references, lang="en")
        return float(f1.mean())
    except Exception as exc:
        logger.warning("BERTScore failed: %s", exc)
        return None


def split_noise_sample_keys(rng):
    """Disjoint (noise, sampling) streams for one eval step.

    The per-step folded key feeds two consumers — the input-noise draw
    and the decoder's sampling path; JAX keys are single-use by
    contract, so both must derive from a split, never the raw key.
    """
    noise_rng, sample_rng = jax.random.split(rng)
    return noise_rng, sample_rng


def token_f1(prediction: str, reference: str) -> float:
    """Token-level F1 (ref ``minigpt4_eval_agent.py:129-149``)."""
    pred = normalize_answer(prediction).split()
    ref = normalize_answer(reference).split()
    if not pred or not ref:
        return float(pred == ref)
    common = Counter(pred) & Counter(ref)
    overlap = sum(common.values())
    if overlap == 0:
        return 0.0
    precision = overlap / len(pred)
    recall = overlap / len(ref)
    return 2 * precision * recall / (precision + recall)


@registry.register_agent("image_text_eval")
class EvalAgent(BaseAgent):
    def __init__(self, config):
        super().__init__(config)
        run = self.run_cfg
        self.batch_size = int(run.get("batch_size", 4))
        self.seq_len = int(run.get("seq_len", 128))
        self.max_new_tokens = int(run.get("max_new_tokens", 10))
        self.noise_level = float(run.get("noise_level", 0.0))
        self.noise_dist = str(run.get("noise_dist", "gaussian"))
        self.seed = int(run.get("seed", 42))

        # conversation wrapping (ref eval agent uses CONV_VISION_minigptv2
        # with a blanked system prompt, ref minigpt4_eval_agent.py:80-81)
        self.conv_template = run.get("conv_template")

        finetuned = self.load_finetuned(
            {"llama_proj": self.model.params["llama_proj"]}
        )
        if finetuned is not None:
            self.model.params["llama_proj"] = finetuned["llama_proj"]

        self._generate = self._build_generate()

    def wrap_instructions(self, instructions):
        from certifiedgpt_tpu.models.conversation import wrap_instruction

        return [
            wrap_instruction(inst, self.conv_template)
            for inst in instructions
        ]

    def _build_generate(self):
        cfg = self.model.cfg
        eos = self.model.tokenizer.eos_token_id
        pad = self.model.tokenizer.pad_token_id
        max_new = self.max_new_tokens
        noise_level, noise_dist = self.noise_level, self.noise_dist
        run = self.run_cfg
        # decode knobs surfaced like the reference generate
        # (ref minigpt_base.py:374-388); greedy is the default eval path
        num_beams = int(run.get("num_beams", 1))
        do_sample = bool(run.get("do_sample", False))
        temperature = float(run.get("temperature", 1.0))
        top_p = float(run.get("top_p", 0.9))
        length_penalty = float(run.get("length_penalty", 1.0))
        repetition_penalty = float(run.get("repetition_penalty", 1.0))
        min_length = int(run.get("min_length", 1))
        if num_beams > 1 and (
            do_sample or repetition_penalty != 1.0 or min_length > 1
        ):
            self.logger.warning(
                "num_beams>1: do_sample/repetition_penalty/min_length are "
                "not applied by beam search"
            )

        early_exit = bool(run.get("early_exit", False))

        # the noise draw is a separate compiled program from the decode
        # graph — fusing the threefry RNG into the full-scale cached
        # generate crashes this image's TPU backend (see
        # smoothing/classifier.py for the verified bisect)
        @jax.jit
        def noise_fn(image, rng):
            return add_input_noise(rng, image, noise_level, noise_dist)

        @jax.jit
        def decode_fn(params, batch, rng):
            if num_beams > 1:
                from certifiedgpt_tpu.models.minigpt4 import generate_beam

                return generate_beam(
                    params, cfg, batch, max_new, eos, pad,
                    num_beams=num_beams, length_penalty=length_penalty,
                )
            if do_sample or repetition_penalty != 1.0 or min_length > 1:
                from certifiedgpt_tpu.models.minigpt4 import generate

                return generate(
                    params, cfg, batch, max_new, eos, pad,
                    do_sample=do_sample, temperature=temperature,
                    top_p=top_p, min_length=min_length,
                    repetition_penalty=repetition_penalty, rng=rng,
                    early_exit=early_exit,
                )
            return generate_greedy(
                params, cfg, batch, max_new, eos, pad, early_exit=early_exit
            )

        def gen(params, batch, rng):
            batch = dict(batch)
            # JAX keys are single-use: the smoothing-noise draw and the
            # token-sampling path must consume DISJOINT streams (feeding
            # one key to both correlates the noise with do_sample draws)
            noise_rng, sample_rng = split_noise_sample_keys(rng)
            batch["image"] = noise_fn(batch["image"], noise_rng)
            return decode_fn(params, batch, sample_rng)

        return gen

    # ------------------------------------------------------------------
    def create_loader(self) -> Loader:
        import jax as _jax

        if _jax.process_count() > 1:
            raise NotImplementedError(
                "eval/certify are single-controller per host (DESIGN.md §1); "
                "run them on one process — multi-process SPMD is the train "
                "path's mode"
            )
        names = list(self.config.datasets.keys())
        for pos, name in enumerate(names):
            builder_cls = registry.get_builder_class(name)
            datasets = builder_cls().build_datasets()
            for split in ("val", "test"):
                if split in datasets:
                    if pos + 1 < len(names):
                        # one dataset per eval run (the reference scores
                        # one benchmark per config) — say so instead of
                        # silently ignoring the rest
                        self.logger.warning(
                            "eval scores only '%s'; ignoring configured "
                            "datasets %s (run them as separate configs)",
                            name, names[pos + 1:],
                        )
                    # eval is single-controller per host (DESIGN.md §1):
                    # the whole dataset is scored on one process, so pin
                    # process_count=1 — multi-process would otherwise
                    # split batches and break the global padding below
                    return Loader(
                        datasets[split],
                        batch_size=self.batch_size,
                        shuffle=False,
                        drop_last=False,
                        num_workers=int(self.run_cfg.get("num_workers", 4)),
                        process_index=0,
                        process_count=1,
                    )
        raise RuntimeError("No val/test split configured for eval")

    def decode_tokens(self, tokens: np.ndarray) -> List[str]:
        from certifiedgpt_tpu.data.text import decode_until_eos

        return [
            clean_answer(decode_until_eos(self.model.tokenizer, row))
            for row in tokens
        ]

    # ------------------------------------------------------------------
    def run(self) -> Dict[str, Any]:
        loader = self.create_loader()
        spec = BatchSpec(
            seq_len=self.seq_len, num_img_tokens=self.model.cfg.num_img_tokens
        )
        rng = jax.random.PRNGKey(self.seed)
        predictions: List[Dict[str, Any]] = []
        gt_annotations: List[dict] = []
        gt_questions: List[dict] = []

        # Output-side pipelining: keep up to run.dispatch_window batches'
        # generate calls in flight (JAX dispatch is async) and only force
        # the device->host token transfer once the window fills, so the
        # host-side token decode + next batch's prep overlap device
        # compute instead of serializing behind it. Same knob as the
        # certify schedulers. Measured at full scale
        # (scripts/bench_eval_full.py, BENCH.md): 32.5 -> 34.8 samples/s
        # at the shipped batch sizes; ~1% once the device saturates at
        # bs>=64. Each window slot pins one batch's device inputs
        # (~bs * img^2 * 3 * 4 bytes), so the default stays small.
        window = max(1, int(self.run_cfg.get("dispatch_window", 2)))
        # same construction-time guard as the certify schedulers
        # (classifier.check_dispatch_window_hbm): a large user-set window
        # would otherwise OOM mid-run with no earlier signal. The slot
        # row count is the PADDED batch (what actually ships to device).
        from certifiedgpt_tpu.parallel.mesh import batch_divisor as _bd
        from certifiedgpt_tpu.smoothing.classifier import (
            check_dispatch_window_hbm,
        )

        padded_bs = -(-self.batch_size // _bd(self.mesh)) * _bd(self.mesh)
        check_dispatch_window_hbm(
            window, padded_bs, self.model.cfg.vit.img_size,
            logger=self.logger,
        )
        inflight: deque = deque()

        def consume(entry) -> None:
            tokens_dev, n, batch = entry
            tokens = np.asarray(tokens_dev)[:n]
            answers = self.decode_tokens(tokens)
            gt_lists = batch.get("gt_answers", [[] for _ in range(n)])
            for i, ans in enumerate(answers):
                qid = int(batch["question_id"][i])
                predictions.append({"question_id": qid, "answer": ans})
                gt_annotations.append(
                    {
                        "question_id": qid,
                        "image_id": qid,
                        "question_type": batch.get(
                            "question_type", ["unknown"] * n
                        )[i],
                        "answer_type": batch.get(
                            "answer_type", ["unknown"] * n
                        )[i],
                        "answers": [
                            {"answer": a, "answer_id": j + 1}
                            for j, a in enumerate(gt_lists[i])
                        ],
                    }
                )
                gt_questions.append(
                    {
                        "question_id": qid,
                        "image_id": qid,
                        "question": batch.get("question", [""] * n)[i],
                    }
                )

        for step, batch in enumerate(loader):
            text = build_gen_batch(
                self.model.tokenizer,
                self.wrap_instructions(batch["instruction_input"]),
                spec,
            )
            n = batch["image"].shape[0]
            # pad every batch to one fixed, mesh-divisible size: one
            # compiled generate graph serves every step (a second shape
            # means a second multi-minute XLA compile at full scale);
            # padded rows are dropped after decode
            from certifiedgpt_tpu.parallel.mesh import batch_divisor

            n_data = batch_divisor(self.mesh)
            pad_to = -(-self.batch_size // n_data) * n_data
            if n < pad_to:
                reps = pad_to - n
                images = np.concatenate(
                    [batch["image"], np.repeat(batch["image"][-1:], reps, 0)]
                )
                text = {
                    key: np.concatenate(
                        [val, np.repeat(val[-1:], reps, 0)], axis=0
                    )
                    for key, val in text.items()
                }
            else:
                images = batch["image"]
            dev = shard_batch(
                {"image": images.astype(np.float32), **text}, self.mesh
            )
            tokens_dev = self._generate(
                self.model.params, dev, jax.random.fold_in(rng, step)
            )
            inflight.append((tokens_dev, n, batch))
            if len(inflight) >= window:
                consume(inflight.popleft())
        while inflight:
            consume(inflight.popleft())

        n_empty = sum(1 for a in gt_annotations if not a["answers"])
        if gt_annotations and 0 < n_empty < len(gt_annotations):
            # partial annotation files are out of the official protocol's
            # contract: VQAEval scores an answerless question 0.0 and
            # keeps it in the accuracy denominator, while the aux
            # exact/f1 metrics below exclude it — flag the population
            # mismatch instead of letting two metrics silently disagree
            self.logger.warning(
                "%d/%d questions have no ground-truth answers; official "
                "accuracy counts them as 0.0 while exact/f1 exclude them",
                n_empty, len(gt_annotations),
            )
        if not any(a["answers"] for a in gt_annotations):
            # test split (NO question has ground truth): emit the
            # official VQA submission format and stop (ref testvqav2
            # flow). Keyed on every annotation, not just the first — a
            # val run whose first question happens to lack answers must
            # still be scored.
            path = os.path.join(self.output_dir, "vqa_test_predictions.json")
            with open(path, "w") as handle:
                json.dump(predictions, handle)
            self.logger.info(
                "wrote %d test predictions to %s", len(predictions), path
            )
            return {"num_questions": len(predictions), "predictions_path": path}

        # official protocol scoring
        vqa = VQA(
            {"annotations": gt_annotations}, {"questions": gt_questions}
        )
        res = vqa.load_res(predictions)
        scorer = VQAEval(vqa, res, n=2)
        accuracy = scorer.evaluate()

        # aux metrics (ref :126-166). Guard per-entry: a mixed val set
        # where SOME questions lack answers reaches this point (only the
        # all-answerless case returns above as a test split, and the
        # warning above flagged the population mismatch), so an
        # answerless entry must not crash the already-computed eval here.
        gt_first = {
            a["question_id"]: a["answers"][0]["answer"]
            for a in gt_annotations
            if a["answers"]
        }
        scored = [p for p in predictions if p["question_id"] in gt_first]
        exact = float(
            np.mean(
                [
                    normalize_answer(p["answer"])
                    == normalize_answer(gt_first[p["question_id"]])
                    for p in scored
                ]
            )
        ) if scored else 0.0
        f1 = float(
            np.mean(
                [
                    token_f1(p["answer"], gt_first[p["question_id"]])
                    for p in scored
                ]
            )
        ) if scored else 0.0
        counts = Counter(normalize_answer(p["answer"]) for p in predictions)
        bias_answer, bias_count = (
            counts.most_common(1)[0] if counts else ("", 0)
        )

        bert_f1 = None
        if self.run_cfg.get("bertscore", False):
            bert_f1 = maybe_bertscore(
                [p["answer"] for p in scored],
                [gt_first[p["question_id"]] for p in scored],
                self.logger,
            )

        results = {
            "overall_accuracy": accuracy["overall"],
            "per_answer_type": accuracy["perAnswerType"],
            "per_question_type": accuracy["perQuestionType"],
            "exact_match": exact,
            "token_f1": f1,
            "answer_bias": {
                "answer": bias_answer,
                "fraction": bias_count / max(len(predictions), 1),
            },
            "num_questions": len(predictions),
            "noise_level": self.noise_level,
        }
        if bert_f1 is not None:
            results["bertscore_f1"] = bert_f1
        with open(
            os.path.join(self.output_dir, "eval_results.json"), "w"
        ) as handle:
            json.dump(
                {"summary": results, "predictions": predictions}, handle, indent=2
            )
        self.logger.info("eval results: %s", results)
        return results
