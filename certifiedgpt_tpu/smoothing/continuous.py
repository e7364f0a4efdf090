"""Continuous-batching dataset certification.

The serial certify loop (``agents/certify.py``) runs one image at a
time: every chunk holds ``mc_batch`` noisy copies of ONE image, so the
final chunk of each phase wastes ``(-n) % mc_batch`` rows (13% of the
whole run at the shipped mc_batch=96, n0=100, n=1000), and the device
idles between an image's phases while the host finishes decoding.

This module packs draws from MULTIPLE questions into every chunk. Two
observations make that a pure scheduling change:

- A certification draw is just "noisy copy of image i through the
  model"; Cohen's estimation draws do NOT depend on the selection
  result at dispatch time (the top class c_A only enters the
  *statistics*), so all n0 + n draws of an image can be enqueued the
  moment it becomes active — the first n0 decoded labels form the
  selection counts, the rest the estimation counts, exactly the two
  independent streams ``Smooth.certify`` consumes.
- The compiled pipeline already takes the prompt as a runtime argument
  (``smoothing/classifier.py``); extending it to per-ROW prompts is a
  device-side gather from a fixed bank of ``num_slots`` active images,
  so mixed chunks share the single full-scale XLA compilation.

Draw validity: every row is an independent N(0, sigma^2) perturbation
drawn from a counter-based key regardless of which image it lands on,
so each image's draws are i.i.d. — the guarantee is unchanged. The RNG
stream differs from the serial mode's per-image seeds (documented in
docs/DESIGN.md); certificates are equally valid, not bit-identical.

No reference counterpart (the reference's certify agent is an empty
file, ref ``agents/minigpt4_certify_agent.py``); this is the
dataset-scale serving mode for the capability.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from certifiedgpt_tpu.data.text import (
    BatchSpec,
    build_gen_batch,
    decode_until_eos,
)
from certifiedgpt_tpu.models.minigpt4 import generate_greedy
from certifiedgpt_tpu.parallel.mesh import batch_divisor, data_sharding
from certifiedgpt_tpu.smoothing.smoothing import (
    ABSTAIN,
    certify_from_counts,
    min_count_for_lower_bound,
    predict_from_counts,
    predict_stop_certain,
)


def make_mixed_generate_fn(
    model,
    mc_batch: int,
    max_new_tokens: int,
    num_slots: int,
    seq_len: int = 64,
    mesh=None,
    noise_dist: str = "gaussian",
    early_exit: bool = False,
):
    """Compiled mixed-chunk pipeline.

    Returns ``fn(params, image_bank, ids_bank, am_bank, pos_bank,
    row_slot, key, sigma) -> tokens [mc_batch, T]`` where the banks hold
    the ``num_slots`` active images/prompts and ``row_slot[mc_batch]``
    assigns each row to a slot. Mirrors
    ``classifier.make_noisy_generate_fn`` (same noise/generate split —
    fusing the RNG into the decode graph crashes this image's TPU
    backend — and the same ``noise_dist`` semantics incl. the uniform
    bug-compat mode) with the image/prompt tile replaced by a bank
    gather.
    """
    cfg = model.cfg
    eos = model.tokenizer.eos_token_id
    pad = model.tokenizer.pad_token_id

    mc_sharding = None
    if mesh is not None and batch_divisor(mesh) > 1:
        n_data = batch_divisor(mesh)
        if mc_batch % n_data != 0:
            raise ValueError(
                f"mc_batch {mc_batch} must be divisible by the mesh batch "
                f"axes dcn*data ({n_data})"
            )
        mc_sharding = lambda ndim: data_sharding(mesh, ndim)  # noqa: E731

    @jax.jit
    def noise_fn(image_bank, row_slot, key, sigma_val):
        images = image_bank[row_slot]  # [mc, H, W, C] gather
        if noise_dist == "uniform":
            # same bug-compat semantics as the serial noise_fn
            # (classifier.make_noisy_generate_fn)
            draw = jax.random.uniform(key, images.shape, images.dtype)
        else:
            draw = jax.random.normal(key, images.shape, images.dtype)
        images = images + sigma_val * draw
        if mc_sharding is not None:
            images = jax.lax.with_sharding_constraint(
                images, mc_sharding(images.ndim)
            )
        return images

    @jax.jit
    def gen_fn(params, images, ids_bank, am_bank, pos_bank, row_slot):
        batch = {
            "image": images,
            "input_ids": ids_bank[row_slot],
            "attention_mask": am_bank[row_slot],
            "img_pos": pos_bank[row_slot],
        }
        if mc_sharding is not None:
            batch = {
                k: jax.lax.with_sharding_constraint(v, mc_sharding(v.ndim))
                for k, v in batch.items()
            }
        return generate_greedy(
            params, cfg, batch, max_new_tokens, eos, pad,
            early_exit=early_exit,
        )

    @jax.jit
    def set_image_slot(image_bank, slot, image):
        return jax.lax.dynamic_update_slice(
            image_bank, image[None], (slot, 0, 0, 0)
        )

    def fn(params, image_bank, ids_bank, am_bank, pos_bank, row_slot, key,
           sigma):
        if ids_bank.shape != (num_slots, seq_len):
            # every distinct (num_slots, prompt length) is a separate XLA
            # compilation of the FULL pipeline (~minutes at scale) —
            # reject the mismatch instead of silently re-tracing, like
            # the serial pipeline's seq_len guard
            raise ValueError(
                f"ids_bank shape {ids_bank.shape} != (num_slots, seq_len) "
                f"({num_slots}, {seq_len}): rebuild the banks to match "
                "this gen's BatchSpec"
            )
        images = noise_fn(image_bank, row_slot, key, jnp.float32(sigma))
        return gen_fn(params, images, ids_bank, am_bank, pos_bank, row_slot)

    fn.noise_fn = noise_fn
    fn.gen_fn = gen_fn
    fn.set_image_slot = set_image_slot
    fn._cache_size = gen_fn._cache_size
    return fn


class LazySlice:
    """``len``+``__getitem__`` view of ``dataset[:limit]`` that decodes
    items on access — the certify agent passes this so the scheduler
    never holds more than the active images in host RAM."""

    def __init__(self, dataset, limit: int):
        self._ds = dataset
        self._limit = int(limit)

    def __len__(self) -> int:
        return self._limit

    def __getitem__(self, idx: int):
        if not 0 <= idx < self._limit:
            raise IndexError(idx)
        return self._ds[idx]


class _ImageJob:
    __slots__ = (
        "index", "item", "vocab", "slot", "enqueued", "decoded",
        "sel_counts", "est_counts", "n0", "n", "result", "c_a",
    )

    def __init__(self, index, n0, n):
        # item/vocab are loaded LAZILY at slot-assignment time (``load``):
        # materializing every decoded image up front would hold the whole
        # dataset's pixels in host RAM (~2.4 MB/image at 448px — tens of
        # GB at VQAv2-val scale) when only <= num_slots are ever active
        self.index = index
        self.item: Optional[dict] = None
        self.vocab = None
        self.slot: Optional[int] = None
        self.enqueued = 0  # draws dispatched
        self.decoded = 0  # draws whose labels landed
        self.n0 = n0
        self.n = n
        self.sel_counts: Optional[np.ndarray] = None
        self.est_counts: Optional[np.ndarray] = None
        self.result: Optional[Dict[str, Any]] = None
        self.c_a: Optional[int] = None  # selection top class, cached

    def load(self, item: dict, vocab) -> None:
        self.item = item
        self.vocab = vocab
        self.sel_counts = np.zeros(vocab.num_classes, np.int64)
        self.est_counts = np.zeros(vocab.num_classes, np.int64)

    @property
    def total(self) -> int:
        return self.n0 + self.n

    def record(self, label: int) -> None:
        # first n0 decoded labels = selection stream, rest = estimation
        if label >= self.vocab.num_classes:
            raise ValueError(
                f"label {label} >= num_classes {self.vocab.num_classes}"
            )
        if self.decoded < self.n0:
            self.sel_counts[label] += 1
        else:
            self.est_counts[label] += 1
        self.decoded += 1


class ContinuousCertifier:
    """Certify a stream of (image, question) items with mixed chunks.

    ``wrap_instruction`` maps an item's instruction to the final prompt;
    ``build_vocab`` maps an item to its fixed ``AnswerVocabulary`` (both
    supplied by the agent so serial and continuous modes share them).
    """

    def __init__(
        self,
        model,
        *,
        sigma: float,
        n0: int,
        n: int,
        alpha: float,
        mc_batch: int,
        max_new_tokens: int,
        seq_len: int,
        num_slots: int = 8,
        mesh=None,
        noise_dist: str = "gaussian",
        early_exit: bool = False,
        window: int = 4,
        gen=None,
        mode: str = "certify",
        early_abstain: bool = False,
        early_stop_radius: Optional[float] = None,
    ):
        if mode not in ("certify", "predict"):
            raise ValueError(f"mode must be certify|predict, got {mode!r}")
        if mode == "predict" and early_stop_radius is not None:
            # predict reports no radius — there is nothing for a
            # radius-floor stopping target to guarantee
            raise ValueError("early_stop_radius applies to certify only")
        if mode == "predict" and int(n0) != 0:
            # predict has no selection phase — every draw feeds the
            # top-2 binomial test (Smooth.predict semantics)
            raise ValueError("predict mode requires n0=0")
        if int(num_slots) < 1:
            raise ValueError(f"num_slots must be >= 1, got {num_slots}")
        if int(n) < 1:
            # zero estimation draws would consume every job without
            # dispatching a row and die as a bogus "scheduler bug" at the
            # end of run() (the serial Smooth abstains on n=0; here a
            # loud config error beats a silent all-abstain run)
            raise ValueError(f"n must be >= 1, got {n}")
        if int(window) < 1:
            # window=0 would dispatch nothing and surface as a bogus
            # "scheduler bug" error at the end of run()
            raise ValueError(f"window must be >= 1, got {window}")
        # in-flight noisy-image buffers can OOM the chip with no earlier
        # signal — turn that into a construction-time config error
        import logging

        from certifiedgpt_tpu.smoothing.classifier import (
            check_dispatch_window_hbm,
        )

        check_dispatch_window_hbm(
            window, mc_batch, model.cfg.vit.img_size,
            logger=logging.getLogger(__name__),
        )
        self.mode = mode
        self.model = model
        self.sigma = float(sigma)
        self.n0, self.n, self.alpha = int(n0), int(n), float(alpha)
        self.mc_batch = int(mc_batch)
        self.seq_len = int(seq_len)
        self.num_slots = int(num_slots)
        self.window = int(window)
        # exact early-stopping thresholds (see smoothing.py
        # min_count_for_lower_bound): abstain-certain frees the job's
        # remaining draw budget the moment no continuation can certify —
        # and in THIS scheduler the freed budget immediately packs the
        # next image's draws into the same chunks, so the saving converts
        # directly to images/hour (the serial loop can only skip chunks
        # past its dispatch window)
        self._m_abstain = (
            min_count_for_lower_bound(0.5, self.n, self.alpha)
            if early_abstain and mode == "certify" else None
        )
        # predict's completion-certain rule (smoothing.predict_stop_certain):
        # exact corner checks on the monotone two-sided p-value, same
        # zero-alpha deterministic-implication argument
        self._predict_early = bool(early_abstain) and mode == "predict"
        self._m_success = None
        if early_stop_radius is not None and self.sigma > 0:
            from scipy.stats import norm as _norm

            m = min_count_for_lower_bound(
                float(_norm.cdf(float(early_stop_radius) / self.sigma)),
                self.n, self.alpha,
            )
            if m <= self.n:
                self._m_success = m
        self.gen = gen or make_mixed_generate_fn(
            model, mc_batch, max_new_tokens, num_slots,
            seq_len=seq_len, mesh=mesh, noise_dist=noise_dist,
            early_exit=early_exit,
        )
        cfg = model.cfg
        self._spec = BatchSpec(
            seq_len=seq_len, num_img_tokens=cfg.num_img_tokens
        )
        img = cfg.vit.img_size
        self._image_bank = jnp.zeros((self.num_slots, img, img, 3), jnp.float32)
        self._ids_bank = np.zeros((self.num_slots, seq_len), np.int64)
        self._am_bank = np.zeros((self.num_slots, seq_len), np.int64)
        self._pos_bank = np.zeros((self.num_slots,), np.int64)

    # ------------------------------------------------------------------
    def _assign_slot(self, job: _ImageJob, slot: int, instruction: str):
        job.slot = slot
        self._image_bank = self.gen.set_image_slot(
            self._image_bank, slot, jnp.asarray(job.item["image"], jnp.float32)
        )
        prompt = build_gen_batch(
            self.model.tokenizer, [instruction], self._spec
        )
        self._ids_bank[slot] = prompt["input_ids"][0]
        self._am_bank[slot] = prompt["attention_mask"][0]
        self._pos_bank[slot] = prompt["img_pos"][0]

    def _early_decided(self, job: _ImageJob) -> bool:
        """True when the job's final outcome is already certain —
        certify: abstain-certain or success past the radius-floor target
        (``min_count_for_lower_bound``); predict: every completion of
        the remaining draws returns the same decision
        (``predict_stop_certain``). No alpha spent either way. Only
        meaningful once the selection stream is complete (c_A fixed;
        predict has n0=0, so every decoded draw counts)."""
        if self.mode == "predict":
            return self._predict_early and predict_stop_certain(
                job.est_counts, self.n - job.decoded, self.alpha
            )
        if (self._m_abstain is None and self._m_success is None) or (
            job.decoded < job.n0
        ):
            return False
        if job.c_a is None:
            job.c_a = int(np.argmax(job.sel_counts))
        c = int(job.est_counts[job.c_a])
        k = job.decoded - job.n0
        if self._m_abstain is not None and c + (self.n - k) < self._m_abstain:
            return True
        return self._m_success is not None and c >= self._m_success

    def _finalize(self, job: _ImageJob) -> Dict[str, Any]:
        # the decision rules live in smoothing.py (certify_from_counts /
        # predict_from_counts) — shared with the serial Smooth class so
        # the two modes cannot diverge
        if self.mode == "predict":
            label = predict_from_counts(job.est_counts, self.alpha)
            return {"label": label, "radius": 0.0, "index": job.index}
        label, radius = certify_from_counts(
            job.sel_counts, job.est_counts, self.n, self.alpha, self.sigma
        )
        return {"label": label, "radius": radius, "index": job.index}

    # ------------------------------------------------------------------
    def run(
        self,
        items: Sequence[dict],
        wrap_instruction: Callable[[str], str],
        build_vocab,
        seed: int = 0,
        on_result: Optional[Callable[[dict, _ImageJob], None]] = None,
        on_chunk: Optional[Callable[[int], None]] = None,
    ) -> List[Dict[str, Any]]:
        """``items`` is only INDEXED lazily (any ``len``+``__getitem__``
        sequence works, incl. a torch-style dataset): each item's decoded
        image is pulled when the job reaches a slot and dropped when its
        result lands, so host RAM holds O(num_slots + window) images, not
        the dataset. ``on_chunk(chunk_idx)`` fires before each dispatch
        (the agent hooks the profiler there)."""
        jobs: deque = deque(
            _ImageJob(idx, self.n0, self.n) for idx in range(len(items))
        )
        results: List[Optional[Dict[str, Any]]] = [None] * len(jobs)

        active: List[Optional[_ImageJob]] = [None] * self.num_slots
        decode_queue: deque = deque()  # (pending tokens, [jobs per row])
        base_key = jax.random.PRNGKey(seed)
        chunk_idx = 0
        tokenizer = self.model.tokenizer

        def refill_slots():
            for slot in range(self.num_slots):
                while active[slot] is None and jobs:
                    job = jobs.popleft()
                    item = items[job.index]
                    vocab = build_vocab(item)
                    job.load(item, vocab)
                    if vocab.num_classes < 2:
                        # degenerate label set: abstain without spending
                        # draws (same guard as Smooth.certify) — the slot
                        # stays free for the next job
                        job.result = {
                            "label": ABSTAIN, "radius": 0.0,
                            "index": job.index,
                        }
                        results[job.index] = job.result
                        if on_result:
                            on_result(job.result, job)
                        continue
                    self._assign_slot(
                        job, slot,
                        wrap_instruction(job.item["instruction_input"]),
                    )
                    active[slot] = job

        def build_chunk():
            """FIFO over active slots; rows of the next chunk."""
            rows, row_jobs = [], []
            for slot in range(self.num_slots):
                job = active[slot]
                if job is None:
                    continue
                take = min(job.total - job.enqueued,
                           self.mc_batch - len(rows))
                rows.extend([slot] * take)
                row_jobs.extend([job] * take)
                job.enqueued += take
                if job.enqueued >= job.total:
                    # fully dispatched: the slot's DEVICE data is still
                    # referenced only by already-enqueued chunks, so the
                    # slot can host the next image immediately — the
                    # bank gather happens at dispatch time
                    active[slot] = None
                if len(rows) == self.mc_batch:
                    break
            return rows, row_jobs

        def dispatch():
            nonlocal chunk_idx
            refill_slots()
            rows, row_jobs = build_chunk()
            if not rows:
                return False
            if on_chunk:
                on_chunk(chunk_idx)
            fill = len(rows)
            while len(rows) < self.mc_batch:  # tail of the whole run
                rows.append(rows[-1])
                row_jobs.append(None)  # padding rows: decoded but unused
            tokens = self.gen(
                self.model.params,
                self._image_bank,
                jnp.asarray(self._ids_bank),
                jnp.asarray(self._am_bank),
                jnp.asarray(self._pos_bank),
                jnp.asarray(rows, jnp.int32),
                jax.random.fold_in(base_key, chunk_idx),
                self.sigma,
            )
            chunk_idx += 1
            decode_queue.append((tokens, row_jobs[:fill]))
            return True

        for _ in range(self.window):
            if not dispatch():
                break

        while decode_queue:
            tokens, row_jobs = decode_queue.popleft()
            tokens = np.asarray(tokens)  # sync on the oldest chunk
            dispatch()  # keep the device fed while the host decodes
            for i, job in enumerate(row_jobs):
                if job is None or job.result is not None:
                    # padding row, or a row of a job whose outcome was
                    # already early-decided — its label can no longer
                    # change anything (the certificate is final)
                    continue
                text = decode_until_eos(tokenizer, tokens[i])
                job.record(job.vocab.label_of(text))
                done = job.decoded >= job.total
                if not done and self._early_decided(job):
                    done = True
                    # cancel the job's remaining budget: draws not yet
                    # enqueued never dispatch (the freed slot refills
                    # with the next image at the next dispatch); rows
                    # already in flight are decoded and skipped above
                    if job.slot is not None and active[job.slot] is job:
                        active[job.slot] = None
                if done:
                    # _finalize on the partial counts is exact here: the
                    # abstain-certain case is below m_abstain by
                    # construction (same ABSTAIN as full budget) and the
                    # success case reports the guaranteed floor radius
                    job.result = self._finalize(job)
                    results[job.index] = job.result
                    if on_result:
                        on_result(job.result, job)
                    job.item = None  # release the decoded image's pixels

        missing = [i for i, r in enumerate(results) if r is None]
        if missing:
            raise RuntimeError(
                f"continuous certify finished with unfinalized images "
                f"{missing[:5]} — scheduler bug"
            )
        return results  # ordered by dataset index
