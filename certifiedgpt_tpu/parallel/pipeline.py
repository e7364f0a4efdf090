"""GPipe-style pipeline parallelism for the decoder training forward.

The reference's only distribution strategy is data parallelism (its
trainer wraps the model in per-core torch_xla processes — ref
``agents/minigpt4_finetune_agent.py:52-74``); this repo adds tensor
parallelism (``parallel/mesh.partition_llama``) and, here, the third
classic axis: **pipeline parallelism** over the decoder's layer stack,
for decoders whose parameters exceed one device even after int8 + TP.

TPU-native design (no torch-style stage modules or NCCL send/recv):

- The decoder layers already live as ONE stacked ``[L, ...]`` pytree
  scanned by ``models/llama.llama_apply``. Pipelining is therefore just
  a sharding: the leading layer axis splits over a ``pipe`` mesh axis
  (``partition_llama_pipeline``), each device holding ``L/P``
  contiguous blocks — no per-stage module surgery.
- The schedule is a ``jax.shard_map`` GPipe loop: a ``lax.scan`` over
  ``M + P - 1`` ticks in which every device applies its local layer
  slice to its current activation buffer and ``lax.ppermute`` rotates
  the activations one stage forward along the ICI ring. Stage 0
  ingests microbatch ``t`` at tick ``t``; stage ``P-1`` emits
  microbatch ``t-(P-1)``. Bubble fraction is the textbook
  ``(P-1)/(M+P-1)``.
- Gradients need no hand-written backward schedule: ``ppermute``
  transposes to the reverse permutation under AD, so
  ``jax.grad`` through the shard_map IS the reverse pipeline. The
  trainable ``llama_proj`` sits upstream of the decoder, so its
  gradient rides the full reverse schedule — equivalence-tested
  against the single-mesh ``llama_apply`` in
  ``tests/test_pipeline_parallel.py``.
- Composes with data parallelism: on a ``(pipe, data)`` mesh the
  microbatch batch dim shards over ``data`` (each pipeline rank
  processes its own batch shard; the two axes never interact).

Numerics: same blocks, same order, same dtypes as the sequential
decoder — parity tests pass at ~1e-6 (XLA's compile-order float
reassociation between the two programs; the schedule itself reorders
no math). Final ``rms_norm`` + ``lm_head`` run outside the shard_map
on the gathered hidden states (replicated; shard them over a ``model``
axis via ``partition_llama`` when combining pp x tp).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from certifiedgpt_tpu.models import layers as L
from certifiedgpt_tpu.models.llama import (
    _REMAT_POLICIES,
    _block,
    LlamaConfig,
    lm_head_logits,
)


def partition_llama_pipeline(
    llama_params: Dict[str, Any], mesh: Mesh
) -> Dict[str, Any]:
    """Place the decoder for pipeline parallelism: every stacked
    ``layers`` leaf shards its leading ``[L]`` axis over ``pipe`` (each
    stage holds only its own blocks' weights — the HBM point of pp);
    embed/norm/lm_head replicate (shard those over ``model`` via
    ``partition_llama`` when composing pp x tp)."""
    if "pipe" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'pipe' axis")
    out: Dict[str, Any] = {}
    for top, sub in llama_params.items():
        if top == "layers":
            out[top] = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P("pipe"))
                ),
                sub,
            )
        else:
            out[top] = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), sub
            )
    return out


def _stage_block(cfg: LlamaConfig):
    """The per-layer block, rematted exactly as ``llama_apply`` does."""
    if not cfg.remat:
        return _block
    if cfg.remat_policy not in _REMAT_POLICIES:
        raise ValueError(
            f"remat_policy={cfg.remat_policy!r} not in "
            f"{sorted(_REMAT_POLICIES)}"
        )
    return jax.checkpoint(
        _block, static_argnums=(2,),
        policy=_REMAT_POLICIES[cfg.remat_policy](),
    )


def pipeline_llama_apply(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, D]
    attention_mask: jnp.ndarray,  # [B, S] 1=valid
    positions: jnp.ndarray,  # [B, S]
    mesh: Mesh,
    n_micro: int,
    segment_ids: Optional[jnp.ndarray] = None,  # [B, S] packed ids
    compute_logits: bool = True,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Training-forward of the decoder, GPipe-pipelined over the
    ``pipe`` mesh axis (see module docstring). Mask/position semantics
    are identical to the no-cache branch of ``llama_apply`` —
    including packed ``segment_ids`` block-diagonal isolation.

    Returns ``(logits or None, final_hidden)``; no KV cache (pp is a
    training-forward strategy here — serving fits one chip at int8,
    docs/DESIGN.md)."""
    n_pipe = int(mesh.shape["pipe"])
    b, s, d = inputs_embeds.shape
    if cfg.num_layers % n_pipe:
        raise ValueError(
            f"num_layers={cfg.num_layers} does not divide into "
            f"pipe={n_pipe} stages"
        )
    if b % n_micro:
        raise ValueError(
            f"batch={b} does not divide into n_micro={n_micro} "
            f"microbatches"
        )
    if cfg.remat and cfg.remat_every != 1:
        raise ValueError(
            "the pipelined forward supports per-layer remat only "
            "(remat_every=1); the full-scale sweep rejected every-k "
            "checkpointing anyway (docs/DESIGN.md)"
        )
    mb = b // n_micro
    n_data = int(mesh.shape.get("data", 1))
    if mb % n_data:
        raise ValueError(
            f"microbatch={mb} rows do not divide over the data axis "
            f"({n_data}); lower n_micro or the data-parallel degree"
        )

    cos, sin = L.rotary_tables(
        cfg.head_dim, cfg.max_position_embeddings, cfg.rope_theta
    )
    # same mask construction as llama_apply's no-cache branch
    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))[None, None]
    mask = causal & attention_mask[:, None, None, :].astype(jnp.bool_)
    if segment_ids is not None:
        same = segment_ids[:, :, None] == segment_ids[:, None, :]
        mask = mask & same[:, None]

    x_mb = inputs_embeds.astype(cfg.dtype).reshape(n_micro, mb, s, d)
    mask_mb = jnp.broadcast_to(mask, (b, 1, s, s)).reshape(
        n_micro, mb, 1, s, s
    )
    pos_mb = positions.reshape(n_micro, mb, s)
    block = _stage_block(cfg)

    # batch rows shard over 'data' when present; everything microbatch-
    # indexed stays replicated over 'pipe' (each stage dynamic-indexes
    # the microbatch it currently holds)
    row = ("data",) if n_data > 1 else (None,)
    xspec = P(None, *row, None, None)
    mspec = P(None, *row, None, None, None)
    pspec = P(None, *row, None)

    def pp_local(layers_loc, x_loc, m_loc, p_loc):
        idx = lax.axis_index("pipe")

        def apply_stage(y, m, p):
            def step(carry, lp):
                out, _ = block(carry, lp, cfg, cos, sin, p, m, None, None)
                return out, None

            y, _ = lax.scan(step, y, layers_loc)
            return y

        def tick(carry, t):
            buf, outs = carry
            # stage 0 ingests microbatch t (clipped re-reads past M are
            # garbage that the masked output write never selects)
            feed = lax.dynamic_index_in_dim(
                x_loc, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            buf = jnp.where(idx == 0, feed, buf)
            # this stage currently holds microbatch t - idx
            k = jnp.clip(t - idx, 0, n_micro - 1)
            m = lax.dynamic_index_in_dim(m_loc, k, 0, keepdims=False)
            p = lax.dynamic_index_in_dim(p_loc, k, 0, keepdims=False)
            y = apply_stage(buf, m, p)
            # last stage emits microbatch t - (P-1)
            om = t - (n_pipe - 1)
            ok = jnp.clip(om, 0, n_micro - 1)
            write = (idx == n_pipe - 1) & (om >= 0)
            cur = lax.dynamic_index_in_dim(outs, ok, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, cur), ok, 0
            )
            # rotate activations one stage forward along the ring
            y = lax.ppermute(
                y, "pipe",
                [(i, (i + 1) % n_pipe) for i in range(n_pipe)],
            )
            return (y, outs), None

        buf0 = jnp.zeros_like(x_loc[0])
        outs0 = jnp.zeros_like(x_loc)
        (_, outs), _ = lax.scan(
            tick, (buf0, outs0), jnp.arange(n_micro + n_pipe - 1)
        )
        # outputs live on the last stage only; the masked psum
        # replicates them over 'pipe' without touching float math
        outs = lax.psum(
            jnp.where(idx == n_pipe - 1, outs, jnp.zeros_like(outs)),
            "pipe",
        )
        return outs

    layer_specs = jax.tree.map(lambda _: P("pipe"), params["layers"])
    outs = jax.shard_map(
        pp_local,
        mesh=mesh,
        in_specs=(layer_specs, xspec, mspec, pspec),
        out_specs=xspec,
        check_vma=False,
    )(params["layers"], x_mb, mask_mb, pos_mb)

    x = outs.reshape(b, s, d)
    x = L.rms_norm(params["norm"], x, cfg.rms_norm_eps)
    logits = lm_head_logits(params, x) if compute_logits else None
    return logits, x


def pipeline_minigpt4_loss(
    params: Dict[str, Any],
    cfg,  # MiniGPT4Config
    batch: Dict[str, jnp.ndarray],
    mesh: Mesh,
    n_micro: int,
    reduction: str = "mean",
) -> jnp.ndarray:
    """``models/minigpt4.minigpt4_loss`` with the decoder forward
    pipelined over the ``pipe`` mesh axis — identical supervision
    semantics (packed or unpacked), bit-compatible loss (equivalence-
    tested). The vision tower / Q-Former / projection run data-parallel
    as usual; only the decoder streams through the pipeline."""
    from certifiedgpt_tpu.models.llama import cross_entropy_loss
    from certifiedgpt_tpu.models.minigpt4 import (
        assemble_embeds,
        assemble_packed_embeds,
        encode_img,
    )

    img_embeds = encode_img(params, cfg, batch["image"])
    if "segment_ids" in batch:
        rows, k = batch["img_pos"].shape
        seg_budget = batch["input_ids"].shape[1] // k
        if seg_budget > cfg.llama.max_position_embeddings:
            raise ValueError(
                f"run.seq_len//pack_sequences={seg_budget} exceeds the "
                f"decoder's max_position_embeddings="
                f"{cfg.llama.max_position_embeddings}"
            )
        embeds = assemble_packed_embeds(
            params, cfg, batch["input_ids"],
            img_embeds.reshape(rows, k, *img_embeds.shape[1:]),
            batch["img_pos"],
        )
        logits, _ = pipeline_llama_apply(
            params["llama"], cfg.llama, embeds, batch["attention_mask"],
            batch["positions"], mesh, n_micro,
            segment_ids=batch["segment_ids"],
        )
    else:
        embeds = assemble_embeds(
            params, cfg, batch["input_ids"], img_embeds, batch["img_pos"]
        )
        if embeds.shape[1] > cfg.llama.max_position_embeddings:
            raise ValueError(
                f"run.seq_len={embeds.shape[1]} exceeds the decoder's "
                f"max_position_embeddings="
                f"{cfg.llama.max_position_embeddings}"
            )
        positions = jnp.broadcast_to(
            jnp.arange(embeds.shape[1]), embeds.shape[:2]
        ).astype(jnp.int32)
        logits, _ = pipeline_llama_apply(
            params["llama"], cfg.llama, embeds, batch["attention_mask"],
            positions, mesh, n_micro,
        )
    return cross_entropy_loss(
        logits, batch["labels"], cfg.label_smoothing, reduction=reduction
    )
