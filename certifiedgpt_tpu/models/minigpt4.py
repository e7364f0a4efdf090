"""MiniGPT-4 multimodal assembly, TPU-native.

The reference's MiniGPT-4 (ref ``graphs/models/minigpt4/models/minigpt4.py``
and ``minigpt_base.py``) glues EVA ViT -> ln_vision -> Q-Former ->
llama_proj -> Vicuna. Its prompt assembly walks samples in a Python loop
with ``.item()`` syncs (ref ``minigpt_base.py:145-203``) — a host/device
ping-pong XLA cannot compile. This re-design keeps the math and changes
the data contract to fixed shapes:

- The host-side collator (``certifiedgpt_tpu/data/text.py``) emits
  ``input_ids [B,S]``, ``attention_mask [B,S]``, ``labels [B,S]`` and
  ``img_pos [B]`` — the position where each sample's 32 image-query
  embeddings belong (their slots hold pad ids in ``input_ids``).
- On device, text embeddings are computed for the whole batch and the
  image embeddings are scattered in with one vmapped
  ``lax.dynamic_update_slice`` — no per-sample concat, no dynamic shapes.
- Training uses right-padding; generation uses left-padding so that every
  sample's prompt ends at the same offset and greedy decode proceeds from
  one static cache position (the fixed-shape equivalent of the
  reference's left-pad batching, ref ``minigpt_base.py:401-412``).

Component layout of the parameter pytree:
``{"vit", "ln_vision", "qformer", "llama_proj", "llama"}`` — ``llama_proj``
is the only trainable leaf in the default config, matching the reference
(ref ``minigpt4.py:76-78``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from certifiedgpt_tpu.models import layers as L
from certifiedgpt_tpu.models.eva_vit import EvaViTConfig, eva_vit_apply, init_eva_vit
from certifiedgpt_tpu.models.llama import (
    LlamaConfig,
    cross_entropy_loss,
    embed_tokens,
    init_kv_cache,
    init_llama,
    llama_apply,
)
from certifiedgpt_tpu.models.qformer import QFormerConfig, init_qformer, qformer_apply


@dataclasses.dataclass(frozen=True)
class MiniGPT4Config:
    vit: EvaViTConfig = dataclasses.field(default_factory=EvaViTConfig.eva_vit_g)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig.blip2)
    llama: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    max_txt_len: int = 160  # answer-token budget (ref config max_txt_len)
    max_context_len: int = 3800  # ref minigpt_base.py:36
    label_smoothing: float = 0.1

    @staticmethod
    def tiny(**overrides) -> "MiniGPT4Config":
        vit = EvaViTConfig.tiny()
        base = dict(
            vit=vit,
            qformer=QFormerConfig.tiny(encoder_width=vit.embed_dim),
            llama=LlamaConfig.tiny(),
            max_txt_len=16,
            max_context_len=128,
        )
        base.update(overrides)
        return MiniGPT4Config(**base)

    @staticmethod
    def small(**overrides) -> "MiniGPT4Config":
        """Bench-scale config: structurally complete (448px vision tower,
        cross-attn Q-Former, multi-layer decoder) at a size that fits one
        chip with random weights — used by bench.py and the graft entry."""
        vit = EvaViTConfig(
            img_size=224, patch_size=14, embed_dim=768, depth=12,
            num_heads=12, mlp_hidden=3072,
        )
        base = dict(
            vit=vit,
            qformer=QFormerConfig(
                hidden_size=768, num_layers=6, num_heads=12,
                intermediate_size=3072, encoder_width=vit.embed_dim,
            ),
            llama=LlamaConfig(
                vocab_size=32000, hidden_size=1024, intermediate_size=2816,
                num_layers=8, num_heads=16, num_kv_heads=16,
                max_position_embeddings=512,
            ),
            max_txt_len=32,
            max_context_len=512,
        )
        base.update(overrides)
        return MiniGPT4Config(**base)

    @property
    def num_img_tokens(self) -> int:
        return self.qformer.num_query_tokens


def init_minigpt4(key, cfg: MiniGPT4Config, skip: tuple = ()) -> Dict[str, Any]:
    """Random-init the model pytree. ``skip`` names top-level subtrees to
    OMIT ("vit"/"llama"): a caller about to overwrite a tower with
    converted checkpoint weights must not pay the random init first —
    at full scale that is ~16 GB of bf16 trunc_normal briefly coexisting
    with the converted weights on a 16 GB chip."""
    k_vit, k_q, k_l, k_proj = jax.random.split(key, 4)
    out = {
        "ln_vision": L.init_layer_norm(cfg.vit.embed_dim, cfg.vit.dtype),
        "qformer": init_qformer(k_q, cfg.qformer),
        # the projection trains, keep it fp32 (optimizer-friendly); it is
        # cast to the LLaMA activation dtype on use.
        "llama_proj": L.init_dense(
            k_proj, cfg.qformer.hidden_size, cfg.llama.hidden_size, dtype=jnp.float32
        ),
    }
    if "vit" not in skip:
        out["vit"] = init_eva_vit(k_vit, cfg.vit)
    if "llama" not in skip:
        out["llama"] = init_llama(k_l, cfg.llama)
    return out


TRAINABLE_DEFAULT = ("llama_proj",)


def split_params(
    params: Dict[str, Any], trainable_keys: Tuple[str, ...] = TRAINABLE_DEFAULT
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Partition the pytree into (trainable, frozen) by top-level key."""
    trainable = {k: v for k, v in params.items() if k in trainable_keys}
    frozen = {k: v for k, v in params.items() if k not in trainable_keys}
    return trainable, frozen


def merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    return {**frozen, **trainable}


# ----------------------------------------------------------------------
# vision path
# ----------------------------------------------------------------------
def encode_img(
    params: Dict[str, Any], cfg: MiniGPT4Config, images: jnp.ndarray
) -> jnp.ndarray:
    """images [B, H, W, C] -> projected image tokens [B, 32, llama_hidden].

    ViT -> ln_vision -> Q-Former queries -> llama_proj
    (ref ``minigpt4.py:121-149``).
    """
    feats = eva_vit_apply(params["vit"], cfg.vit, images)
    # ln_vision is a plain torch nn.LayerNorm in the reference
    # (ref ``base_model.py:160``) — default eps 1e-5, NOT the ViT's
    # internal 1e-6 (ref ``eva_vit.py:436``)
    feats = L.layer_norm(params["ln_vision"], feats, eps=1e-5)
    queries = qformer_apply(params["qformer"], cfg.qformer, feats)
    out = L.dense(params["llama_proj"], queries.astype(jnp.float32))
    return out.astype(cfg.llama.dtype)


# ----------------------------------------------------------------------
# multimodal embedding assembly (fixed shape)
# ----------------------------------------------------------------------
def assemble_embeds(
    params: Dict[str, Any],
    cfg: MiniGPT4Config,
    input_ids: jnp.ndarray,  # [B, S]
    img_embeds: jnp.ndarray,  # [B, T_img, D]
    img_pos: jnp.ndarray,  # [B] int32 — start slot of the image span
) -> jnp.ndarray:
    text_embeds = embed_tokens(params["llama"], input_ids)

    def put(row_embeds, row_img, pos):
        return lax.dynamic_update_slice(row_embeds, row_img, (pos, 0))

    return jax.vmap(put)(text_embeds, img_embeds.astype(text_embeds.dtype), img_pos)


def assemble_packed_embeds(
    params: Dict[str, Any],
    cfg: MiniGPT4Config,
    input_ids: jnp.ndarray,  # [R, S] packed rows
    img_embeds: jnp.ndarray,  # [R, K, T_img, D] one image per segment
    img_pos: jnp.ndarray,  # [R, K] int32 — image span start per segment
) -> jnp.ndarray:
    """Packed-row variant of ``assemble_embeds``: each row holds K
    segments (``data/text.pack_train_batch``), each with its own image
    span. K is static and small, so the scatter unrolls."""
    text_embeds = embed_tokens(params["llama"], input_ids)

    def put_row(row_embeds, row_imgs, row_pos):
        acc = row_embeds
        for j in range(row_imgs.shape[0]):  # static K
            acc = lax.dynamic_update_slice(
                acc, row_imgs[j], (row_pos[j], 0)
            )
        return acc

    return jax.vmap(put_row)(
        text_embeds, img_embeds.astype(text_embeds.dtype), img_pos
    )


# ----------------------------------------------------------------------
# training forward
# ----------------------------------------------------------------------
def minigpt4_loss(
    params: Dict[str, Any],
    cfg: MiniGPT4Config,
    batch: Dict[str, jnp.ndarray],
    reduction: str = "mean",
    img_embeds: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CE loss on answer tokens (ref ``minigpt_base.py:320-365`` semantics:
    label-smoothed CE, -100 masking outside the answer span).

    batch keys: image [B,H,W,C], input_ids [B,S], attention_mask [B,S],
    labels [B,S], img_pos [B]. Pass precomputed ``img_embeds`` to skip
    the vision tower (candidate ranking runs many text variants over the
    same images — see ``rank_answers``).

    Packed batches (``data/text.pack_train_batch``; ``run.pack_sequences``)
    carry ``segment_ids``/``positions`` [R,S] and ``img_pos`` [R,K] for
    B = R*K images: the decoder runs block-diagonal causal attention with
    per-segment rotary positions, supervising the identical answer
    tokens over ~1/K of the padded rows (loss-parity test in
    ``tests/test_pack_sequences.py``).
    """
    if img_embeds is None:
        img_embeds = encode_img(params, cfg, batch["image"])
    if "segment_ids" in batch:
        rows, k = batch["img_pos"].shape
        seg_budget = batch["input_ids"].shape[1] // k
        if seg_budget > cfg.llama.max_position_embeddings:
            # per-segment rotary positions restart at 0 but are only
            # bounded by the fixed seq_len//pack segment budget
            # (data/text.pack_train_batch) — past the rotary table,
            # jnp.take's fill mode silently NaNs, so fail loud at trace
            # time exactly like the unpacked branch below
            raise ValueError(
                f"run.seq_len//pack_sequences={seg_budget} exceeds the "
                f"decoder's max_position_embeddings="
                f"{cfg.llama.max_position_embeddings}; packed per-"
                f"segment rotary positions past the table would "
                f"silently NaN"
            )
        embeds = assemble_packed_embeds(
            params, cfg, batch["input_ids"],
            img_embeds.reshape(rows, k, *img_embeds.shape[1:]),
            batch["img_pos"],
        )
        logits, _, _ = llama_apply(
            params["llama"], cfg.llama, embeds, batch["attention_mask"],
            batch["positions"], segment_ids=batch["segment_ids"],
        )
    else:
        embeds = assemble_embeds(
            params, cfg, batch["input_ids"], img_embeds, batch["img_pos"]
        )
        if embeds.shape[1] > cfg.llama.max_position_embeddings:
            # jnp.take's fill mode would silently NaN every position past
            # the rotary table — fail loud at trace time instead (the
            # packed branch above checks its seq_len//pack segment
            # budget against the same bound)
            raise ValueError(
                f"run.seq_len={embeds.shape[1]} exceeds the decoder's "
                f"max_position_embeddings="
                f"{cfg.llama.max_position_embeddings}; rotary positions "
                f"past the table would silently NaN"
            )
        positions = jnp.broadcast_to(
            jnp.arange(embeds.shape[1]), embeds.shape[:2]
        ).astype(jnp.int32)
        logits, _, _ = llama_apply(
            params["llama"], cfg.llama, embeds, batch["attention_mask"],
            positions,
        )
    return cross_entropy_loss(
        logits, batch["labels"], cfg.label_smoothing, reduction=reduction
    )


# ----------------------------------------------------------------------
# generation (fixed-shape lax.scan decode; greedy or nucleus sampling)
# ----------------------------------------------------------------------
def _select_token(
    logits: jnp.ndarray,  # [B, V] fp32
    *,
    do_sample: bool,
    temperature: float,
    top_p: float,
    rng: Optional[jnp.ndarray],
) -> jnp.ndarray:
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_p < 1.0:
        # nucleus: keep the smallest prefix of sorted probs with mass >= top_p
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # index of last kept
        cutoff = jnp.take_along_axis(
            sorted_logits, cutoff_idx[:, None], axis=-1
        )
        logits = jnp.where(logits < cutoff, jnp.finfo(jnp.float32).min, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def _apply_repetition_penalty(
    logits: jnp.ndarray, counts: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """HF convention: seen tokens' positive logits divide by the penalty,
    negative logits multiply."""
    if penalty == 1.0:
        return logits
    seen = counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def generate(
    params: Dict[str, Any],
    cfg: MiniGPT4Config,
    batch: Dict[str, jnp.ndarray],
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    *,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 0.9,
    min_length: int = 1,
    repetition_penalty: float = 1.0,
    rng: Optional[jnp.ndarray] = None,
    early_exit: bool = False,
) -> jnp.ndarray:
    """Batched decode with a KV cache (greedy default; nucleus sampling,
    repetition penalty and min-length per the knobs the reference's
    generate surfaces, ref ``minigpt_base.py:374-388``).

    ``batch`` carries a *left-padded* prompt (image [B,H,W,C],
    input_ids [B,S], attention_mask [B,S], img_pos [B]), so every sample's
    last prompt token sits at slot S-1 and decoding proceeds from a single
    static cache offset — the jit-able equivalent of HF ``generate`` with
    left padding (ref ``minigpt_base.py:407-427``).

    Returns generated token ids [B, max_new_tokens]; positions after a
    sample's EOS are filled with ``pad_token_id``.
    """
    img_embeds = encode_img(params, cfg, batch["image"])
    embeds = assemble_embeds(params, cfg, batch["input_ids"], img_embeds, batch["img_pos"])
    b, s, _ = embeds.shape
    total = s + max_new_tokens
    mask = batch["attention_mask"].astype(jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # rotary positions: left pads get position 0, real tokens count up.
    prompt_positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0).astype(jnp.int32)
    prompt_len = jnp.sum(mask, axis=1).astype(jnp.int32)  # per-sample true length

    cache = init_kv_cache(cfg.llama, b, total)
    # validity over cache slots: prompt part follows the prompt mask; the
    # decode part becomes valid as tokens are emitted (monotonic, so mark
    # all future decode slots valid — causal masking hides unwritten ones).
    cache_mask = jnp.concatenate(
        [mask, jnp.ones((b, max_new_tokens), jnp.int32)], axis=1
    )

    # prefill: only the LAST position's logits are needed — skip the
    # [B, S, vocab] lm_head matmul over the whole prompt (saves
    # ~B*S*d*vocab FLOPs and a multi-hundred-MB fp32 buffer per chunk)
    _, hidden, cache = llama_apply(
        params["llama"],
        cfg.llama,
        embeds,
        cache_mask,
        prompt_positions,
        kv_cache=cache,
        cache_offset=jnp.int32(0),
        compute_logits=False,
    )
    from certifiedgpt_tpu.models.llama import lm_head_logits

    logits_last = lm_head_logits(params["llama"], hidden[:, -1, :])
    vocab = logits_last.shape[-1]
    # token-count table for the repetition penalty. When the penalty is
    # off (the greedy certify/eval hot path) keep a 1-wide dummy instead:
    # the per-step [B, vocab] scatter-add sits on the scan's critical
    # path and costs real decode time on TPU.
    track_counts = repetition_penalty != 1.0
    counts0 = jnp.zeros((b, vocab if track_counts else 1), jnp.int32)

    def pick(step_logits, counts, t, key):
        step_logits = _apply_repetition_penalty(
            step_logits.astype(jnp.float32), counts, repetition_penalty
        )
        if min_length > 1:
            step_logits = jnp.where(
                (jnp.arange(vocab)[None, :] == eos_token_id) & (t + 1 < min_length),
                jnp.finfo(jnp.float32).min,
                step_logits,
            )
        return _select_token(
            step_logits,
            do_sample=do_sample,
            temperature=temperature,
            top_p=top_p,
            rng=key,
        )

    first = pick(logits_last, counts0, jnp.int32(0), jax.random.fold_in(rng, 0))
    if track_counts:
        counts0 = counts0.at[jnp.arange(b), first].add(1)

    def step(carry, t):
        cache, token, positions, done, counts = carry
        tok_embed = embed_tokens(params["llama"], token[:, None])
        logits, _, cache = llama_apply(
            params["llama"],
            cfg.llama,
            tok_embed,
            cache_mask,
            positions[:, None],
            kv_cache=cache,
            cache_offset=s + t,
        )
        key = jax.random.fold_in(rng, t + 1)
        new_token = pick(logits[:, -1, :], counts, t + 1, key)
        if track_counts:
            counts = counts.at[jnp.arange(b), new_token].add(1)
        out_token = jnp.where(done, pad_token_id, token)
        done = done | (token == eos_token_id)
        new_token = jnp.where(done, eos_token_id, new_token)
        return (cache, new_token, positions + 1, done, counts), out_token

    positions0 = prompt_len  # next rotary position per sample
    done0 = jnp.zeros((b,), jnp.bool_)
    if not early_exit:
        _, tokens = lax.scan(
            step,
            (cache, first, positions0, done0, counts0),
            jnp.arange(max_new_tokens),
        )
        return tokens.T  # [B, max_new_tokens]

    # early_exit: identical math under lax.while_loop — stop decoding the
    # moment every row has emitted its EOS. Real VQA answers are 1-4
    # tokens, so a serving run skips most of the max_new_tokens budget;
    # outputs are bit-identical to the scan path (post-EOS slots are pad
    # either way; pinned by test).
    out0 = jnp.full((b, max_new_tokens), jnp.int32(pad_token_id))

    def cond(state):
        t, _, _, _, done, _, _ = state
        return (t < max_new_tokens) & ~jnp.all(done)

    def body(state):
        t, cache, token, positions, done, counts, out = state
        (cache, new_token, positions, done, counts), out_token = step(
            (cache, token, positions, done, counts), t
        )
        out = lax.dynamic_update_slice(
            out, out_token[:, None], (jnp.int32(0), t)
        )
        return t + 1, cache, new_token, positions, done, counts, out

    state = (jnp.int32(0), cache, first, positions0, done0, counts0, out0)
    return lax.while_loop(cond, body, state)[-1]


def generate_greedy(
    params: Dict[str, Any],
    cfg: MiniGPT4Config,
    batch: Dict[str, jnp.ndarray],
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    early_exit: bool = False,
) -> jnp.ndarray:
    """Greedy decode (the certification/eval hot path)."""
    return generate(
        params, cfg, batch, max_new_tokens, eos_token_id, pad_token_id,
        do_sample=False, repetition_penalty=1.0, min_length=1,
        early_exit=early_exit,
    )


def generate_beam(
    params: Dict[str, Any],
    cfg: MiniGPT4Config,
    batch: Dict[str, jnp.ndarray],
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    *,
    num_beams: int = 3,
    length_penalty: float = 1.0,
) -> jnp.ndarray:
    """Beam-search decode (the reference generate's ``num_beams``/
    ``length_penalty`` knobs, ref ``minigpt_base.py:374-388``), fully
    compiled: beams flatten into the batch axis, every step is one
    cached forward + a top-k over [beams * vocab] per sample, and the KV
    cache is gathered on beam reorder. Finished beams freeze their score;
    the winner maximizes ``score / generated_length**length_penalty``
    (normalizing by the generated-token count — HF divides by the full
    prompt+generated length, so rankings can differ when
    ``length_penalty != 1``). Returns [B, max_new_tokens] token ids of
    the best beam.
    """
    img_embeds = encode_img(params, cfg, batch["image"])
    embeds = assemble_embeds(
        params, cfg, batch["input_ids"], img_embeds, batch["img_pos"]
    )
    b, s, d = embeds.shape
    k = num_beams
    total = s + max_new_tokens
    mask = batch["attention_mask"].astype(jnp.int32)
    prompt_positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0).astype(jnp.int32)
    prompt_len = jnp.sum(mask, axis=1).astype(jnp.int32)

    # prefill once per sample, then tile the cache across beams
    cache = init_kv_cache(cfg.llama, b, total)
    cache_mask = jnp.concatenate(
        [mask, jnp.ones((b, max_new_tokens), jnp.int32)], axis=1
    )
    _, hidden, cache = llama_apply(
        params["llama"], cfg.llama, embeds, cache_mask, prompt_positions,
        kv_cache=cache, cache_offset=jnp.int32(0), compute_logits=False,
    )
    from certifiedgpt_tpu.models.llama import lm_head_logits

    logp0 = jax.nn.log_softmax(
        lm_head_logits(params["llama"], hidden[:, -1, :]), axis=-1
    )  # [B, V]
    vocab = logp0.shape[-1]

    top_logp, top_tok = jax.lax.top_k(logp0, k)  # [B, K]

    # cache leaves are per-layer [B, T, H, Dh]; tile the batch axis
    cache = jax.tree.map(lambda x: jnp.repeat(x, k, axis=0), cache)
    flat_mask = jnp.repeat(cache_mask, k, axis=0)  # [B*K, total]

    scores0 = top_logp.reshape(b * k)  # cumulative logprob per beam
    tokens0 = top_tok.reshape(b * k).astype(jnp.int32)
    done0 = tokens0 == eos_token_id
    lengths0 = jnp.ones((b * k,), jnp.int32)
    out0 = jnp.full((b * k, max_new_tokens), pad_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(tokens0)
    positions0 = jnp.repeat(prompt_len, k, axis=0)  # next rotary position

    neg_inf = jnp.float32(-1e30)

    def step(carry, t):
        cache, out, tokens, scores, done, positions, lengths = carry
        tok_embed = embed_tokens(params["llama"], tokens[:, None])
        logits, _, cache = llama_apply(
            params["llama"], cfg.llama, tok_embed, flat_mask,
            positions[:, None], kv_cache=cache, cache_offset=s + t,
        )
        logp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32), -1)
        # finished beams may only extend with eos at no cost
        eos_only = jnp.full((vocab,), neg_inf).at[eos_token_id].set(0.0)
        logp = jnp.where(done[:, None], eos_only[None, :], logp)

        cand = scores[:, None] + logp  # [B*K, V]
        cand = cand.reshape(b, k * vocab)
        new_scores, flat_idx = jax.lax.top_k(cand, k)  # [B, K]
        beam_idx = flat_idx // vocab  # which parent beam
        tok_idx = (flat_idx % vocab).astype(jnp.int32)

        # global indices into the flattened beam axis
        gather = (jnp.arange(b)[:, None] * k + beam_idx).reshape(b * k)
        cache = jax.tree.map(lambda val: val[gather], cache)
        out = out[gather]
        done = done[gather]
        lengths = lengths[gather]
        positions = positions[gather]

        new_tokens = tok_idx.reshape(b * k)
        out = out.at[:, t + 1].set(
            jnp.where(done, pad_token_id, new_tokens)
        )
        lengths = lengths + jnp.where(done, 0, 1)
        done = done | (new_tokens == eos_token_id)
        return (
            cache, out, new_tokens, new_scores.reshape(b * k), done,
            positions + 1, lengths,
        ), None

    carry = (cache, out0, tokens0, scores0, done0, positions0, lengths0)
    if max_new_tokens > 1:
        carry, _ = lax.scan(step, carry, jnp.arange(max_new_tokens - 1))
    _, out, _, scores, _, _, lengths = carry

    # pick the best beam per sample by length-penalized score
    norm = scores.reshape(b, k) / (
        lengths.reshape(b, k).astype(jnp.float32) ** length_penalty
    )
    best = jnp.argmax(norm, axis=-1)
    return out.reshape(b, k, max_new_tokens)[jnp.arange(b), best]


def rank_answers(
    params: Dict[str, Any],
    cfg: MiniGPT4Config,
    batches: Dict[str, Dict[str, jnp.ndarray]],
) -> jnp.ndarray:
    """Rank candidate answers per sample by per-sample CE loss
    (the reference's ``multi_select``, ref ``minigpt_base.py:450-467``).

    ``batches`` maps candidate answer -> a train-layout batch where every
    sample carries that candidate as the answer. Returns [B, n_candidates]
    rank indices (best first).

    Scoring uses the per-sample SUM of token losses: the reference's
    ``reduction='none'`` averages over the FULL padded length (a constant
    divisor shared by all candidates, ref ``modeling_llama.py:122-123``),
    so its ranking is the sum's — a per-valid-token mean would instead
    systematically favor longer candidates. The vision tower runs ONCE:
    every candidate batch carries the same images, so the (dominant)
    image encoding is shared across candidates.
    """
    losses = []
    img_embeds = None
    for _, cand_batch in batches.items():
        if img_embeds is None:
            img_embeds = encode_img(params, cfg, cand_batch["image"])
        losses.append(
            minigpt4_loss(
                params, cfg, cand_batch, reduction="sum",
                img_embeds=img_embeds,
            )
        )
    all_losses = jnp.stack(losses, axis=-1)  # [B, n_cand]
    return jnp.argsort(all_losses, axis=-1)
