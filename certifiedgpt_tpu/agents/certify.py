"""Certify agent (``certify`` mode).

The reference routes ``certify`` to an EMPTY agent file
(ref ``launch.py:97-99``, ``agents/minigpt4_certify_agent.py`` is 0
bytes); this implements the intended capability (SURVEY.md §3.3):

for each (image, question) in the certification subset:
    vocab   <- fixed label set from the question's candidate answers
    g       <- Smooth(noisy generate -> normalize -> label, sigma)
    (c, R)  <- g.certify(x, n0, n, alpha)
    correct <- c maps to an answer the humans gave (VQA consensus > 0)

and reports certified accuracy over an l2-radius grid plus the
abstention rate (ref ``README.md:94-104`` table shape). Per-image rows
stream to ``certify_results.jsonl`` in the output dir; the summary goes
to ``certify_summary.json``.

Run-block knobs: ``noise_level`` (sigma), ``certify_n0``, ``certify_n``,
``certify_alpha``, ``mc_batch``, ``max_new_tokens``, ``radius_grid``,
``max_images``, ``seq_len``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

from certifiedgpt_tpu.agents.base import BaseAgent
from certifiedgpt_tpu.common.registry import registry
from certifiedgpt_tpu.smoothing.classifier import AnswerVocabulary, make_sample_fn
from certifiedgpt_tpu.smoothing.smoothing import ABSTAIN, Smooth
from certifiedgpt_tpu.vqa_tools.vqa_eval import VQAEval


def certify_seed(base_seed: int, index: int, sigma: float) -> int:
    """Per-image RNG seed with sigma folded in.

    In a ``run.sigma_grid`` sweep, seeding image *i* with ``seed + i``
    for every sigma would make the sigma=0.25 and sigma=0.5 certificates
    of one image consume IDENTICAL uniform draws scaled differently —
    each certificate stays individually valid (the guarantee conditions
    only on the per-sigma noise distribution, which is correct), but the
    sweep's rows would be correlated estimates. Folding sigma's bit
    pattern through a 64-bit finalizer makes every (image, sigma) cell
    an independent stream (docs/DESIGN.md §4).

    62 bits are kept: truncating to 31 would make birthday collisions
    likely at dataset scale (~95 expected colliding pairs over 214k
    VQAv2 questions x a 3-sigma grid — byte-identical noise streams,
    exactly the correlation this function removes), while bit 63 stays
    clear so ``seed + _ESTIMATION_SEED_OFFSET`` (smoothing.py) can never
    overflow int64.
    """
    sigma_bits = int(np.float64(sigma).view(np.uint64))
    h = (base_seed * 0x9E3779B97F4A7C15 + index) & 0xFFFFFFFFFFFFFFFF
    h ^= sigma_bits
    # splitmix64 finalizer
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return int((h ^ (h >> 31)) & 0x3FFFFFFFFFFFFFFF)


class SmoothedVQAAgentBase(BaseAgent):
    """Shared plumbing for certify / smoothing_predict."""

    def __init__(self, config):
        super().__init__(config)
        run = self.run_cfg
        self.sigma = float(run.get("noise_level", 0.5))
        self.alpha = float(run.get("certify_alpha", 0.001))
        self.mc_batch = int(run.get("mc_batch", 32))
        self.max_new_tokens = int(run.get("max_new_tokens", 10))
        self.seq_len = int(run.get("seq_len", 64))
        self.max_images = run.get("max_images")
        self.noise_dist = str(run.get("noise_dist", "gaussian"))
        # stop the decode scan once every MC row has emitted EOS — real
        # answers are 1-4 tokens, so serving skips most of the decode
        # budget (models/minigpt4.py generate early_exit)
        self.early_exit = bool(run.get("early_exit", False))
        # exact early stopping of the estimation pass: early_abstain
        # stops a draw budget the moment the outcome is already certain
        # — statistically free, bit-identical result (certify:
        # smoothing.min_count_for_lower_bound; predict: the
        # completion-certain corner checks of predict_stop_certain);
        # early_stop_radius=R (certify only) additionally stops once
        # radius >= R is guaranteed, reporting the conservative floor
        # (set R >= the largest ACHIEVABLE radius_grid point to keep
        # the summary table identical to the full-budget run's)
        self.early_abstain = bool(run.get("early_abstain", False))
        esr = run.get("early_stop_radius")
        self.early_stop_radius = float(esr) if esr is not None else None
        self.seed = int(run.get("seed", 42))

        import jax as _jax

        if _jax.process_count() > 1:
            raise NotImplementedError(
                "certify/predict are single-controller per host "
                "(DESIGN.md §1); the MC axis shards within a slice — run "
                "on one process"
            )

        finetuned = self.load_finetuned({"llama_proj": self.model.params["llama_proj"]})
        if finetuned is not None:
            self.model.params["llama_proj"] = finetuned["llama_proj"]

        # keep mc_batch compatible with the mesh batch axes (the MC axis
        # shards over dcn x data) instead of failing at the first image
        from certifiedgpt_tpu.parallel.mesh import batch_divisor

        n_data = batch_divisor(self.mesh)
        if n_data > 1 and self.mc_batch % n_data != 0:
            rounded = max((self.mc_batch // n_data), 1) * n_data
            self.logger.warning(
                "mc_batch %d not divisible by mesh data axis %d; using %d",
                self.mc_batch, n_data, rounded,
            )
            self.mc_batch = rounded

        # one compiled noisy-generate graph per sigma for the whole run
        # (the prompt is a runtime argument; re-tracing per image would
        # dominate wall-clock at full scale)
        self._gen_cache = {}

        # profiler honoring the reference's config keys, here applied to
        # the certification hot path (profile_step = image index)
        from certifiedgpt_tpu.common.profiling import Profiler

        self.profiler = Profiler(run)

    def eval_dataset(self):
        names = list(self.config.datasets.keys())
        for pos, name in enumerate(names):
            builder_cls = registry.get_builder_class(name)
            datasets = builder_cls().build_datasets()
            for split in ("val", "test", "train"):
                if split in datasets:
                    if pos + 1 < len(names):
                        self.logger.warning(
                            "certify uses only '%s'; ignoring configured "
                            "datasets %s (run them as separate configs)",
                            name, names[pos + 1:],
                        )
                    return datasets[split]
        raise RuntimeError("No dataset configured for certification")

    def wrap_instruction(self, instruction: str) -> str:
        from certifiedgpt_tpu.models.conversation import wrap_instruction

        return wrap_instruction(
            instruction, self.run_cfg.get("conv_template")
        )

    def build_vocab(self, item, dataset=None) -> AnswerVocabulary:
        """Label-set construction (``run.vocab_mode``):
        - ``per_question`` (default): the item's candidate answers + OTHER
        - ``global``: top-``vocab_top_k`` answers over the whole dataset's
          annotations (standard VQA-classifier vocabulary), built once.
        Both are fixed before sampling, as Cohen's guarantee requires.
        """
        mode = str(self.run_cfg.get("vocab_mode", "per_question"))
        if mode == "global":
            if not hasattr(self, "_global_vocab"):
                if dataset is None or not getattr(dataset, "annotations", None):
                    raise RuntimeError(
                        "vocab_mode=global needs a dataset with annotations"
                    )
                self._global_vocab = AnswerVocabulary.from_annotations(
                    dataset.annotations,
                    top_k=int(self.run_cfg.get("vocab_top_k", 3000)),
                )
                self.logger.info(
                    "global answer vocabulary: %d classes",
                    self._global_vocab.num_classes,
                )
            return self._global_vocab
        if not item.get("gt_answers"):
            raise RuntimeError(
                "Certification needs ground-truth candidate answers to fix "
                "the label set (Cohen's guarantee); configure the "
                "'evalvqav2' dataset, not a train/test split"
            )
        return AnswerVocabulary(item["gt_answers"])

    def smoothed_classifier(self, item, dataset=None) -> (Smooth, AnswerVocabulary):
        vocab = self.build_vocab(item, dataset)
        # sigma is a runtime argument of the compiled pipeline (the noise
        # graph traces it as a scalar; the generate graph never sees it),
        # so ONE cached gen serves every sigma of a run.sigma_grid sweep —
        # no per-sigma recompile (classifier.make_noisy_generate_fn).
        if "gen" not in self._gen_cache:
            from certifiedgpt_tpu.smoothing.classifier import (
                make_noisy_generate_fn,
            )

            self._gen_cache["gen"] = make_noisy_generate_fn(
                self.model,
                self.sigma,
                self.mc_batch,
                self.max_new_tokens,
                seq_len=self.seq_len,
                mesh=self.mesh,
                noise_dist=self.noise_dist,
                early_exit=self.early_exit,
            )
        sample_fn = make_sample_fn(
            self.model,
            self.wrap_instruction(item["instruction_input"]),
            vocab,
            self.sigma,
            mc_batch=self.mc_batch,
            max_new_tokens=self.max_new_tokens,
            seq_len=self.seq_len,
            mesh=self.mesh,
            noise_dist=self.noise_dist,
            gen=self._gen_cache["gen"],
            window=int(self.run_cfg.get("dispatch_window", 4)),
        )
        return Smooth(sample_fn, vocab.num_classes, self.sigma), vocab

    def make_continuous(self, n0: int, n: int, mode: str = "certify"):
        """Continuous-batching scheduler over the (cached) mixed-chunk
        pipeline — shared by certify (``mode="certify"``) and predict
        (``mode="predict"``, n0=0); one compiled gen serves both since
        the finalization statistics live on the host."""
        from certifiedgpt_tpu.smoothing.continuous import (
            ContinuousCertifier,
            make_mixed_generate_fn,
        )

        if "mixed_gen" not in self._gen_cache:
            self._gen_cache["mixed_gen"] = make_mixed_generate_fn(
                self.model,
                self.mc_batch,
                self.max_new_tokens,
                int(self.run_cfg.get("active_images", 8)),
                seq_len=self.seq_len,
                mesh=self.mesh,
                noise_dist=self.noise_dist,
                early_exit=self.early_exit,
            )
        return ContinuousCertifier(
            self.model,
            sigma=self.sigma,
            n0=n0,
            n=n,
            alpha=self.alpha,
            mc_batch=self.mc_batch,
            max_new_tokens=self.max_new_tokens,
            seq_len=self.seq_len,
            num_slots=int(self.run_cfg.get("active_images", 8)),
            mesh=self.mesh,
            noise_dist=self.noise_dist,
            early_exit=self.early_exit,
            window=int(self.run_cfg.get("dispatch_window", 4)),
            gen=self._gen_cache["mixed_gen"],
            mode=mode,
            # certify: abstain-certain + radius-floor stopping; predict:
            # completion-certain stopping (predict_stop_certain) — both
            # exact, both behind run.early_abstain
            early_abstain=self.early_abstain,
            early_stop_radius=(
                self.early_stop_radius if mode == "certify" else None
            ),
        )

    def _continuous_run(
        self,
        dataset,
        limit: int,
        *,
        mode: str,
        n0: int,
        results_name: str,
        summary_name: str,
        extra_row_fields,
        finalize_summary,
        log_row=None,
    ) -> Dict[str, Any]:
        """Shared continuous-batching loop for certify AND predict
        (``run.continuous: true``): draws from MULTIPLE questions packed
        into shared mc_batch chunks (smoothing/continuous.py) — removes
        the per-image partial-chunk waste and phase bubbles of the serial
        loops. Results are equally valid (i.i.d. draws either way) but
        the RNG stream differs from the serial mode, so outputs are not
        bit-identical across the two modes at sigma > 0.

        ``extra_row_fields(row, res)`` adds the mode-specific jsonl
        fields; ``finalize_summary(rows)`` builds the mode's summary dict
        (throughput keys are appended here). Rows carry
        ``elapsed_seconds`` — cumulative wall-clock at finalization time,
        deliberately NOT the serial schema's per-image ``seconds`` (in
        this mode images overlap and results land out of order, so a
        per-image duration does not exist)."""
        from certifiedgpt_tpu.smoothing.continuous import LazySlice

        scheduler = self.make_continuous(n0, self.n, mode=mode)
        # lazy view: the scheduler pulls/decodes each image when it
        # reaches a slot and drops it when its result lands —
        # materializing dataset[:limit] up front would hold ~2.4 MB of
        # pixels per image (tens of GB at VQAv2-val scale) in host RAM
        items = LazySlice(dataset, limit)
        rows: List[Dict[str, Any]] = []
        results_path = os.path.join(self.output_dir, results_name)
        t0 = time.time()
        with open(results_path, "w") as sink:
            def on_result(res, job):
                label = res["label"]
                text = (
                    job.vocab.text_of(label) if label != ABSTAIN
                    else "<abstain>"
                )
                correct = self.label_correct(
                    label, job.vocab, job.item["gt_answers"]
                )
                row = {
                    "index": res["index"],
                    "question_id": int(job.item["question_id"]),
                    "label": int(label),
                    "answer": text,
                    "correct": bool(correct),
                    "abstain": label == ABSTAIN,
                    "elapsed_seconds": round(time.time() - t0, 3),
                    "sigma": self.sigma,
                    "n": self.n,
                    # draws decoded for this image (< n0 + n when the
                    # early-stopping rules fired; the freed budget was
                    # packed with other images' draws)
                    "draws": int(job.decoded),
                }
                extra_row_fields(row, res)
                rows.append(row)
                sink.write(json.dumps(row) + "\n")
                sink.flush()
                if log_row is not None:
                    log_row(row)

            scheduler.run(
                items,
                self.wrap_instruction,
                lambda item: self.build_vocab(item, dataset),
                seed=certify_seed(self.seed, 0, self.sigma),
                on_result=on_result,
                # same profiling knobs as the serial loops, keyed on the
                # dispatched chunk index (run.profile_step)
                on_chunk=lambda ci: self.profiler.maybe_start(0, ci),
            )
        elapsed = time.time() - t0
        rows.sort(key=lambda r: r["index"])
        summary = finalize_summary(rows)
        # wall-clock per image is the throughput metric in this mode
        summary["mean_seconds_per_image"] = elapsed / max(len(rows), 1)
        summary["continuous"] = True
        summary["images_per_hour"] = 3600.0 / max(
            summary["mean_seconds_per_image"], 1e-9
        )
        with open(
            os.path.join(self.output_dir, summary_name), "w"
        ) as handle:
            json.dump(summary, handle, indent=2)
        self.logger.info("%s summary: %s", mode, summary)
        return summary

    @staticmethod
    def is_correct(label_text: str, gt_answers: List[str]) -> bool:
        """A predicted label counts as correct when the official consensus
        accuracy against the human answers is positive."""
        return VQAEval.answer_accuracy(label_text, gt_answers) > 0.0

    @classmethod
    def label_correct(cls, label: int, vocab, gt_answers: List[str]) -> bool:
        """Label-level correctness for certify/predict rows.

        The catch-all OTHER class means "none of the candidate answers"
        and is NEVER correct — its display text "<other>" would
        otherwise normalize (punctuation stripped) to the legitimate VQA
        answer "other" and score as a match whenever the humans answered
        "other" (which, when it happens, is a distinct vocab class with
        its own id)."""
        if label == ABSTAIN or label == vocab.other_label:
            return False
        return cls.is_correct(vocab.text_of(label), gt_answers)


@registry.register_agent("image_text_certify")
class CertifyAgent(SmoothedVQAAgentBase):
    def __init__(self, config):
        super().__init__(config)
        run = self.run_cfg
        self.n0 = int(run.get("certify_n0", 100))
        self.n = int(run.get("certify_n", 1000))
        self.radius_grid = [
            float(r) for r in run.get("radius_grid", [0.5, 1.0, 2.0, 3.0])
        ]

    def run(self) -> Dict[str, Any]:
        sigma_grid = self.run_cfg.get("sigma_grid")
        if sigma_grid:
            # multi-sigma certification sweep (BASELINE.json config #5):
            # one summary per sigma, plus the combined grid. The dataset
            # is sigma-independent — build it ONCE (re-parsing/joining
            # the VQAv2 annotation JSONs per sigma costs minutes of
            # redundant host I/O), and the compiled pipeline is shared
            # too (sigma is a runtime scalar).
            dataset = self.eval_dataset()
            sweep = {}
            base_out = self.output_dir
            for sigma in [float(s) for s in sigma_grid]:
                self.sigma = sigma
                self.output_dir = os.path.join(base_out, f"sigma_{sigma}")
                os.makedirs(self.output_dir, exist_ok=True)
                sweep[str(sigma)] = self._run_single(dataset)
            self.output_dir = base_out
            with open(os.path.join(base_out, "certify_sweep.json"), "w") as handle:
                json.dump(sweep, handle, indent=2)
            self.logger.info("sigma sweep complete: %s", list(sweep))
            return {"sweep": sweep}
        return self._run_single()

    def _run_single(self, dataset=None) -> Dict[str, Any]:
        if dataset is None:
            dataset = self.eval_dataset()
        limit = int(self.max_images) if self.max_images else len(dataset)
        if self.run_cfg.get("continuous", False):
            return self._run_continuous(dataset, min(limit, len(dataset)))
        rows: List[Dict[str, Any]] = []
        results_path = os.path.join(self.output_dir, "certify_results.jsonl")

        with open(results_path, "w") as sink:
            for idx in range(min(limit, len(dataset))):
                item = dataset[idx]
                smooth, vocab = self.smoothed_classifier(item, dataset)
                self.profiler.maybe_start(0, idx)
                t0 = time.time()
                label, radius = smooth.certify(
                    item["image"], self.n0, self.n, self.alpha,
                    seed=certify_seed(self.seed, idx, self.sigma),
                    early_abstain=self.early_abstain,
                    early_stop_radius=self.early_stop_radius,
                )
                dt = time.time() - t0
                text = vocab.text_of(label) if label != ABSTAIN else "<abstain>"
                correct = self.label_correct(label, vocab, item["gt_answers"])
                row = {
                    "index": idx,
                    "question_id": int(item["question_id"]),
                    "label": int(label),
                    "answer": text,
                    "radius": float(radius),
                    "correct": bool(correct),
                    "abstain": label == ABSTAIN,
                    "seconds": round(dt, 3),
                    "sigma": self.sigma,
                    "n0": self.n0,
                    "n": self.n,
                    # draws actually labeled (< n0 + n when early
                    # stopping fired; device work additionally includes
                    # up to window x mc_batch in-flight draws)
                    "draws": int(smooth.last_draws),
                }
                rows.append(row)
                sink.write(json.dumps(row) + "\n")
                sink.flush()
                self.logger.info(
                    "certify[%d] qid=%s label=%s radius=%.3f correct=%s (%.2fs)",
                    idx, row["question_id"], text, radius, correct, dt,
                )

        summary = self.summarize(rows)
        with open(
            os.path.join(self.output_dir, "certify_summary.json"), "w"
        ) as handle:
            json.dump(summary, handle, indent=2)
        self.logger.info("certify summary: %s", summary)
        return summary

    def _run_continuous(self, dataset, limit: int) -> Dict[str, Any]:
        """Continuous-batching certify (see ``_continuous_run``)."""
        def extra_row_fields(row, res):
            row["radius"] = float(res["radius"])
            row["n0"] = self.n0

        def log_row(row):
            self.logger.info(
                "certify[%d] qid=%s label=%s radius=%.3f correct=%s "
                "(%.1fs elapsed)",
                row["index"], row["question_id"], row["answer"],
                row["radius"], row["correct"], row["elapsed_seconds"],
            )

        return self._continuous_run(
            dataset, limit,
            mode="certify", n0=self.n0,
            results_name="certify_results.jsonl",
            summary_name="certify_summary.json",
            extra_row_fields=extra_row_fields,
            finalize_summary=self.summarize,
            log_row=log_row,
        )

    def summarize(self, rows: List[Dict[str, Any]]) -> Dict[str, Any]:
        total = len(rows)
        if total == 0:
            return {"total": 0}
        abstain = sum(1 for r in rows if r["abstain"])
        certified_acc = {
            str(r): sum(
                1 for row in rows if row["correct"] and row["radius"] >= r
            )
            / total
            for r in self.radius_grid
        }
        return {
            "total": total,
            "sigma": self.sigma,
            "n0": self.n0,
            "n": self.n,
            "alpha": self.alpha,
            "abstention_rate": abstain / total,
            "standard_accuracy": sum(1 for r in rows if r["correct"]) / total,
            "certified_accuracy_at_radius": certified_acc,
            # < n0 + n when early_abstain / early_stop_radius fired
            "mean_draws_per_image": float(
                np.mean([r["draws"] for r in rows if "draws" in r])
            ) if any("draws" in r for r in rows) else float(self.n0 + self.n),
            # continuous-mode rows carry only cumulative elapsed_seconds;
            # _continuous_run overwrites this with wall-clock / images
            "mean_seconds_per_image": float(
                np.mean([r["seconds"] for r in rows if "seconds" in r])
            ) if any("seconds" in r for r in rows) else 0.0,
        }


@registry.register_agent("image_text_predict")
class PredictAgent(SmoothedVQAAgentBase):
    """``smoothing_predict`` mode: Smooth.predict over the subset (the
    reference falls back to the plain eval agent here,
    ref ``launch.py:94-96``; this is the real implementation)."""

    def __init__(self, config):
        super().__init__(config)
        self.n = int(self.run_cfg.get("predict_n", 100))

    def run(self) -> Dict[str, Any]:
        dataset = self.eval_dataset()
        limit = int(self.max_images) if self.max_images else len(dataset)
        if self.run_cfg.get("continuous"):
            return self._run_continuous(dataset, min(limit, len(dataset)))
        rows: List[Dict[str, Any]] = []
        results_path = os.path.join(self.output_dir, "predict_results.jsonl")

        with open(results_path, "w") as sink:
            for idx in range(min(limit, len(dataset))):
                item = dataset[idx]
                smooth, vocab = self.smoothed_classifier(item, dataset)
                self.profiler.maybe_start(0, idx)
                t0 = time.time()
                label = smooth.predict(
                    item["image"], self.n, self.alpha,
                    seed=certify_seed(self.seed, idx, self.sigma),
                    # completion-certain stopping: decision bit-identical
                    # to the full budget (smoothing.predict_stop_certain)
                    early_stop=self.early_abstain,
                )
                dt = time.time() - t0
                text = vocab.text_of(label) if label != ABSTAIN else "<abstain>"
                correct = self.label_correct(label, vocab, item["gt_answers"])
                row = {
                    "index": idx,
                    "question_id": int(item["question_id"]),
                    "label": int(label),
                    "answer": text,
                    "correct": bool(correct),
                    "abstain": label == ABSTAIN,
                    "seconds": round(dt, 3),
                    "sigma": self.sigma,
                    "n": self.n,
                    # draws actually labeled (< n when early stopping
                    # fired; the device additionally sinks up to
                    # window x mc_batch in-flight draws)
                    "draws": int(smooth.last_draws),
                }
                rows.append(row)
                sink.write(json.dumps(row) + "\n")
                sink.flush()

        total = len(rows)
        summary = {
            "total": total,
            "sigma": self.sigma,
            "n": self.n,
            "alpha": self.alpha,
            "accuracy": sum(1 for r in rows if r["correct"]) / max(total, 1),
            "abstention_rate": sum(1 for r in rows if r["abstain"]) / max(total, 1),
            "mean_seconds_per_image": float(
                np.mean([r["seconds"] for r in rows]) if rows else 0.0
            ),
            # < n when run.early_abstain's completion-certain rule fired
            "mean_draws_per_image": float(
                np.mean([r["draws"] for r in rows]) if rows else float(self.n)
            ),
        }
        with open(
            os.path.join(self.output_dir, "predict_summary.json"), "w"
        ) as handle:
            json.dump(summary, handle, indent=2)
        self.logger.info("predict summary: %s", summary)
        return summary

    def _run_continuous(self, dataset, limit: int) -> Dict[str, Any]:
        """Continuous-batching predict: same scheduler as continuous
        certify (mode="predict", n0=0, top-2 binomial finalization on the
        host) — see ``_continuous_run``."""
        def finalize_summary(rows):
            total = len(rows)
            return {
                "total": total,
                "sigma": self.sigma,
                "n": self.n,
                "alpha": self.alpha,
                "accuracy": sum(
                    1 for r in rows if r["correct"]
                ) / max(total, 1),
                "abstention_rate": sum(
                    1 for r in rows if r["abstain"]
                ) / max(total, 1),
                # < n when run.early_abstain's completion-certain rule
                # fired (the freed budget repacks with other images)
                "mean_draws_per_image": float(
                    np.mean([r["draws"] for r in rows])
                ) if rows else float(self.n),
            }

        return self._continuous_run(
            dataset, limit,
            mode="predict", n0=0,
            results_name="predict_results.jsonl",
            summary_name="predict_summary.json",
            extra_row_fields=lambda row, res: None,
            finalize_summary=finalize_summary,
        )
