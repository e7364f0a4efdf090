"""Decoder-to-label certification mapping (the capability the reference
describes but never implemented — SURVEY.md §2.4 note b, hard part #1).

``Smooth`` needs a discrete classifier; MiniGPT-4 emits free text. The
bridge, built BEFORE any sampling so Cohen's guarantee holds:

1. ``AnswerVocabulary`` — a fixed label set per question (normalized
   candidate answers + one catch-all OTHER class). Normalization is the
   official VQA pipeline (``vqa_tools.vqa_eval.normalize_answer``), so a
   certified label agrees with the accuracy metric's notion of equality.
2. ``make_sample_fn`` — binds a question onto ONE jit-compiled pipeline
   shared across the whole run: tile the clean image to a Monte-Carlo
   batch, add Gaussian noise on device (counter-based keys; contrast ref
   ``smoothing.py:96`` which hard-codes CUDA noise), run the full
   encode->greedy-decode graph, and return token ids. The host decodes
   tokens to strings and maps them to label ids. The MC axis is the
   batch axis, so on a mesh it shards data-parallel over ICI (SURVEY.md
   §5.7). Both the prompt AND sigma are runtime arguments of the
   compiled graphs, so every (question, sigma) of a dataset sweep reuses
   the same compilation.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from certifiedgpt_tpu.data.loader import shard_batch
from certifiedgpt_tpu.data.text import (
    BatchSpec,
    build_gen_batch,
    clean_answer,
    decode_until_eos,
)
from certifiedgpt_tpu.parallel.mesh import batch_divisor, data_sharding
from certifiedgpt_tpu.models.minigpt4 import generate_greedy
from certifiedgpt_tpu.vqa_tools.vqa_eval import normalize_answer


class AnswerVocabulary:
    """Fixed, order-stable label set; the last class id is OTHER."""

    def __init__(self, answers: Sequence[str]):
        seen: Dict[str, int] = {}
        for ans in answers:
            norm = normalize_answer(ans)
            if norm and norm not in seen:
                seen[norm] = len(seen)
        self.index = seen
        self.labels: List[str] = list(seen.keys())

    @classmethod
    def from_annotations(
        cls, annotations: Sequence[dict], top_k: int = 3000
    ) -> "AnswerVocabulary":
        """Global label set: the top-K most frequent normalized answers
        over a whole annotation set — the standard VQA-classifier
        vocabulary, as an alternative to per-question candidate sets.
        The set is fixed before any sampling, as Cohen's guarantee
        requires."""
        from collections import Counter

        counts: Counter = Counter()
        for ann in annotations:
            for a in ann.get("answers", []):
                norm = normalize_answer(a.get("answer", ""))
                if norm:
                    counts[norm] += 1
        ordered = [t for t, _ in counts.most_common(top_k)]
        return cls(ordered)

    @property
    def other_label(self) -> int:
        return len(self.labels)

    @property
    def num_classes(self) -> int:
        return len(self.labels) + 1  # + OTHER

    def label_of(self, text: str) -> int:
        norm = normalize_answer(clean_answer(text))
        return self.index.get(norm, self.other_label)

    def text_of(self, label: int) -> str:
        if 0 <= label < len(self.labels):
            return self.labels[label]
        return "<other>"


# memory_stats is a device query (slow through the axon tunnel) and the
# model footprint is static after load — probe each device once per
# process, not once per image
_MEM_STATS_CACHE: Dict[int, Optional[dict]] = {}


def check_dispatch_window_hbm(
    window: int,
    mc_batch: int,
    img_size: int,
    device=None,
    logger=None,
    stats: Optional[dict] = None,
) -> int:
    """Bytes-estimate guard for the async dispatch look-ahead.

    Every in-flight chunk owns a ``[mc_batch, img, img, 3]`` fp32
    noisy-image buffer from the moment it is enqueued (~240 MB at the
    full-scale mc=100), so ``window x mc_batch`` can OOM a 16 GB chip
    mid-run with no earlier signal. Called at sampler construction:
    raises when the buffers alone exceed the device's free HBM (a config
    error beats a mid-run OOM), warns past half of it (the running
    chunk's working set — KV cache, activations — needs the rest).
    Returns the estimated bytes; skips silently when the backend exposes
    no memory stats (CPU tests).
    """
    est = int(window) * int(mc_batch) * int(img_size) ** 2 * 3 * 4
    if stats is None:
        device = device or jax.devices()[0]
        key = id(device)
        if key not in _MEM_STATS_CACHE:
            get = getattr(device, "memory_stats", None)
            try:
                _MEM_STATS_CACHE[key] = get() if callable(get) else None
            except Exception:
                _MEM_STATS_CACHE[key] = None
        stats = _MEM_STATS_CACHE[key]
    if not stats or "bytes_limit" not in stats:
        return est
    free = int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
    if est > free:
        raise ValueError(
            f"dispatch window x mc_batch needs ~{est / 1e9:.1f} GB of HBM "
            f"for in-flight noisy-image buffers but only {free / 1e9:.1f} GB "
            f"is free (window={window}, mc_batch={mc_batch}, "
            f"img={img_size}); lower run.dispatch_window or run.mc_batch"
        )
    if est > free // 2 and logger is not None:
        logger.warning(
            "dispatch window buffers (~%.1f GB, window=%d x mc_batch=%d) "
            "exceed half the free HBM (%.1f GB); the running chunk's "
            "KV cache/activations share the rest — consider a smaller "
            "run.dispatch_window",
            est / 1e9, window, mc_batch, free / 1e9,
        )
    return est


def make_noisy_generate_fn(
    model,
    sigma: float,
    mc_batch: int,
    max_new_tokens: int,
    seq_len: int = 64,
    mesh=None,
    noise_dist: str = "gaussian",
    early_exit: bool = False,
):
    """Build the compiled noisy-forward for a model.

    Returns ``fn(image_hwc, prompt_batch, key) -> token ids [mc_batch, T]``
    where ``prompt_batch`` comes from ``build_gen_batch`` for batch=1 and
    is tiled to the MC batch inside the compiled graph.
    """
    cfg = model.cfg
    eos = model.tokenizer.eos_token_id
    pad = model.tokenizer.pad_token_id

    # Monte-Carlo sharding: on a mesh, the mc axis is the batch axis —
    # noise draws split across chips over ICI, and across slices over DCN
    # when the mesh has a dcn axis (SURVEY.md §5.7: the MC axis is THE
    # scalable axis of certification; each draw is independent, so only
    # the tiny count gather ever crosses DCN).
    mc_sharding = None
    if mesh is not None and batch_divisor(mesh) > 1:
        n_data = batch_divisor(mesh)
        if mc_batch % n_data != 0:
            raise ValueError(
                f"mc_batch {mc_batch} must be divisible by the mesh batch "
                f"axes dcn*data ({n_data})"
            )
        mc_sharding = lambda ndim: data_sharding(mesh, ndim)  # noqa: E731

    # NOTE: params are an explicit argument — closing over them would bake
    # hundreds of MB of weights into the jaxpr as constants and stall
    # compilation.
    #
    # The noise draw is a SEPARATE compiled program from the generate
    # graph: fusing the threefry RNG into the full-scale unrolled-decode
    # graph crashes this image's TPU backend (verified bisect — the same
    # HLO minus the in-graph RNG compiles and runs), and the split costs
    # only one extra ~3 ms dispatch per chunk.
    # sigma is a TRACED argument, not a baked constant: the expensive
    # generate graph never depends on it, and with a runtime sigma the
    # noise graph doesn't either — so a multi-sigma certification sweep
    # (run.sigma_grid) reuses ONE compiled pipeline instead of paying a
    # full-scale recompile (~minutes on TPU) per sigma.
    @jax.jit
    def noise_fn(image, key, sigma_val):
        # tile the single sample to the Monte-Carlo batch; the fused Pallas
        # path draws the Gaussian on-core (ops/noise.py), the XLA fallback
        # covers CPU tests and the uniform bug-compat mode.
        if noise_dist == "uniform":
            # sigma=0 multiplies the draw away — same output as no draw
            images = jnp.broadcast_to(image[None], (mc_batch,) + image.shape)
            images = images + sigma_val * jax.random.uniform(
                key, images.shape, images.dtype
            )
        else:
            from certifiedgpt_tpu.ops.noise import noisy_tile

            images = noisy_tile(image, mc_batch, sigma_val, key)
        if mc_sharding is not None:
            images = jax.lax.with_sharding_constraint(
                images, mc_sharding(images.ndim)
            )
        return images

    @jax.jit
    def gen_fn(params, images, input_ids, attention_mask, img_pos):
        batch = {
            "image": images,
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "img_pos": img_pos,
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

    def tile_prompt(input_ids, attention_mask, img_pos):
        """Tile a [1, S] prompt to the MC batch once per question —
        callers cache the result instead of re-broadcasting per chunk."""
        tiled = []
        for value in (input_ids, attention_mask):
            arr = jnp.broadcast_to(value, (mc_batch,) + value.shape[1:])
            if mc_sharding is not None:
                arr = jax.device_put(arr, mc_sharding(arr.ndim))
            tiled.append(arr)
        pos = jnp.broadcast_to(img_pos, (mc_batch,))
        if mc_sharding is not None:
            pos = jax.device_put(pos, mc_sharding(1))
        return tiled[0], tiled[1], pos

    def fn(
        params, image, input_ids, attention_mask, img_pos, key,
        sigma_override=None,
    ):
        if input_ids.shape[-1] != seq_len:
            # every distinct prompt length is a separate XLA compilation
            # of the full pipeline — reject the mismatch instead of
            # silently re-tracing (callers bind one seq_len per run)
            raise ValueError(
                f"prompt length {input_ids.shape[-1]} != gen seq_len "
                f"{seq_len}: rebuild the prompt with the gen's BatchSpec"
            )
        sv = sigma if sigma_override is None else sigma_override
        images = noise_fn(image, key, jnp.float32(sv))
        if input_ids.shape[0] != mc_batch:  # untiled [1, S] prompt
            input_ids, attention_mask, img_pos = tile_prompt(
                input_ids, attention_mask, img_pos
            )
        return gen_fn(params, images, input_ids, attention_mask, img_pos)

    # expose the generate graph's compile-cache size for the
    # one-compile-per-sigma regression check (common/metrics.py), and the
    # stage functions so tests can assert the MC axis REALLY carries a
    # P("data", ...) sharding end to end (XLA silently replicating the
    # batch would still produce correct labels — at 1/n_data the speed)
    fn._cache_size = gen_fn._cache_size
    fn.tile_prompt = tile_prompt
    fn.noise_fn = noise_fn
    fn.gen_fn = gen_fn
    return fn


def make_sample_fn(
    model,
    instruction: str,
    vocab: AnswerVocabulary,
    sigma: float,
    mc_batch: int = 32,
    max_new_tokens: int = 10,
    seq_len: int = 64,
    mesh=None,
    noise_dist: str = "gaussian",
    early_exit: bool = False,
    gen=None,
    window: int = 4,
) -> Callable[[np.ndarray, int, int], np.ndarray]:
    """Bind (model, question prompt, vocab, sigma) into the
    ``sample_fn(x, num, seed) -> labels`` interface of ``Smooth``.

    Pass a pre-built ``gen`` (from ``make_noisy_generate_fn``) when
    certifying many questions at the same (mc_batch, shapes): the prompt
    and sigma are runtime arguments, so ONE compiled graph serves the
    whole dataset — and every sigma of a sweep — instead of re-tracing
    per image (the certify agents do this). ``window`` bounds the async
    dispatch look-ahead (run.dispatch_window — same knob as the
    continuous scheduler): each in-flight chunk owns a noisy-image
    buffer in HBM, so shrink it on memory-tight chips.
    """
    if int(window) < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    import logging

    check_dispatch_window_hbm(
        window, mc_batch, model.cfg.vit.img_size,
        logger=logging.getLogger(__name__),
    )
    spec = BatchSpec(seq_len=seq_len, num_img_tokens=model.cfg.num_img_tokens)
    prompt = build_gen_batch(model.tokenizer, [instruction], spec)
    prompt = shard_batch(prompt, None)  # single-sample host arrays -> device
    if gen is None:
        gen = make_noisy_generate_fn(
            model,
            sigma,
            mc_batch,
            max_new_tokens,
            seq_len=seq_len,
            mesh=mesh,
            noise_dist=noise_dist,
            early_exit=early_exit,
        )
    tokenizer = model.tokenizer

    # tile the prompt to the MC batch ONCE at bind time (22+ chunks per
    # image would otherwise re-broadcast the same constant arrays)
    if hasattr(gen, "tile_prompt"):
        p_ids, p_am, p_pos = gen.tile_prompt(
            prompt["input_ids"], prompt["attention_mask"], prompt["img_pos"]
        )
    else:
        p_ids, p_am, p_pos = (
            prompt["input_ids"], prompt["attention_mask"], prompt["img_pos"]
        )

    def sample_fn(
        x: np.ndarray, num: int, seed: int, should_stop=None
    ) -> np.ndarray:
        """``should_stop(labels_so_far) -> bool`` (optional) is polled
        after each chunk's labels land; when it fires, the labels drawn
        so far are returned (a PREFIX of the full-budget stream — chunk
        keys fold in the chunk index, independent of ``num``, so an
        early-stopped run sees bit-identical draws to the full run's
        first k). Chunks already dispatched when it fires are abandoned
        (their device work is sunk — the look-ahead ``window`` bounds
        that waste)."""
        image = jnp.asarray(x, jnp.float32)
        labels = np.empty((num,), np.int64)
        base_key = jax.random.PRNGKey(seed)
        n_chunks = (num + mc_batch - 1) // mc_batch

        # Dispatch chunks asynchronously (JAX queues them on device) so
        # host token-decode work overlaps device compute — but with a
        # BOUNDED look-ahead: every dispatched chunk owns a
        # [mc_batch, H, W, C] noisy-image buffer from the moment it is
        # enqueued (~240 MB at the full-scale mc=100), so enqueueing all
        # chunks of a Cohen-standard n=100k run up front would request
        # hundreds of GB of HBM on a chip the model already nearly
        # fills. A window of a few chunks gives the same overlap.
        from collections import deque

        pending: "deque" = deque()

        def dispatch(chunk):
            pending.append(
                gen(
                    model.params,
                    image,
                    p_ids,
                    p_am,
                    p_pos,
                    jax.random.fold_in(base_key, chunk),
                    sigma_override=sigma,
                )
            )

        for chunk in range(min(window, n_chunks)):
            dispatch(chunk)
        done = 0
        next_chunk = min(window, n_chunks)
        while pending:
            tokens = np.asarray(pending.popleft())  # sync on the oldest
            if next_chunk < n_chunks:
                dispatch(next_chunk)
                next_chunk += 1
            take = min(mc_batch, num - done)
            for i in range(take):
                labels[done + i] = vocab.label_of(
                    decode_until_eos(tokenizer, tokens[i])
                )
            done += take
            if done >= num:
                break
            if should_stop is not None and should_stop(labels[:done]):
                return labels[:done]
        return labels

    return sample_fn
