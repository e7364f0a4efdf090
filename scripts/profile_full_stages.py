#!/usr/bin/env python
"""Stage-split profile of the full-scale certify pipeline on the live chip.

Times, at reference scale (ViT-g/448, Q-Former-12, int8 7B decoder) and
the bench mc_batch: the ViT alone, full encode (ViT+QFormer+proj), decoder
prefill, and the complete noisy-generate chunk. Decode time is the
remainder. Sync is via pulling a small scalar (axon's block_until_ready is
a no-op — see CLAUDE.md).

Usage: python -u scripts/profile_full_stages.py [mc_batch] [attn] [flags...]
  attn: vit attention impl — flash (default) | xla | flash_custom
  flags: "aq" enables the W8A8 serving mode (int8 ViT qkv/proj/fc1 +
         dynamic activation quant); "kvq" enables the int8 KV cache
         (docs/DESIGN.md)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])  # compile + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])  # device stream is in-order
    return (time.time() - t0) / reps


def main():
    mc_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import jax
    import jax.numpy as jnp

    from bench import build_full_int8_params, chip_peak_tflops, flops_per_draw
    from certifiedgpt_tpu.data.text import ByteTokenizer
    from certifiedgpt_tpu.models.eva_vit import eva_vit_apply
    from certifiedgpt_tpu.models.llama import init_kv_cache, llama_apply
    from certifiedgpt_tpu.models.minigpt4 import MiniGPT4Config, encode_img
    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model
    from certifiedgpt_tpu.smoothing.classifier import (
        AnswerVocabulary,
        make_sample_fn,
    )

    from certifiedgpt_tpu.models.eva_vit import EvaViTConfig

    attn = sys.argv[2] if len(sys.argv) > 2 else "flash"
    flags = set(sys.argv[3:])
    aq = "aq" in flags
    kvq = "kvq" in flags
    from certifiedgpt_tpu.models.llama import LlamaConfig

    cfg = MiniGPT4Config(
        vit=EvaViTConfig(attn_impl=attn, act_quant=aq),
        llama=LlamaConfig(act_quant=aq, kv_quant=kvq),
    )
    params = build_full_int8_params(cfg)
    print(f"vit attn_impl={attn}", flush=True)
    print("params built", flush=True)

    seq_len, new_tokens = 96, 10

    @jax.jit
    def vit_only(p, key):
        images = jax.random.normal(key, (mc_batch, 448, 448, 3), jnp.float32)
        return jnp.sum(eva_vit_apply(p["vit"], cfg.vit, images)[:, 0, 0])

    @jax.jit
    def encode_only(p, key):
        images = jax.random.normal(key, (mc_batch, 448, 448, 3), jnp.float32)
        return jnp.sum(encode_img(p, cfg, images)[:, 0, 0])

    @jax.jit
    def prefill_only(p, key):
        embeds = jax.random.normal(
            key, (mc_batch, seq_len, cfg.llama.hidden_size), jnp.bfloat16
        )
        mask = jnp.ones((mc_batch, seq_len + new_tokens), jnp.int32)
        positions = jnp.broadcast_to(
            jnp.arange(seq_len), (mc_batch, seq_len)
        ).astype(jnp.int32)
        cache = init_kv_cache(cfg.llama, mc_batch, seq_len + new_tokens)
        _, hidden, _ = llama_apply(
            p["llama"], cfg.llama, embeds, mask, positions,
            kv_cache=cache, cache_offset=jnp.int32(0), compute_logits=False,
        )
        return jnp.sum(hidden[:, -1, 0])

    key = jax.random.PRNGKey(0)
    t_vit = timeit(vit_only, params, key)
    print(f"vit_only      {t_vit*1e3:8.1f} ms", flush=True)
    t_enc = timeit(encode_only, params, key)
    print(f"encode_full   {t_enc*1e3:8.1f} ms", flush=True)
    t_pre = timeit(prefill_only, params, key)
    print(f"prefill       {t_pre*1e3:8.1f} ms", flush=True)

    model = MiniGPT4Model(cfg, params, ByteTokenizer())
    vocab = AnswerVocabulary(["cat", "dog", "bird", "2", "yes", "no"])
    sample_fn = make_sample_fn(
        model,
        "<Img><ImageHere></Img> [vqa] Based on the image, respond to this "
        "question with a short answer: what animal is this?",
        vocab, 0.5, mc_batch=mc_batch, max_new_tokens=new_tokens,
        seq_len=seq_len,
    )
    rng = np.random.RandomState(0)
    image = rng.randn(448, 448, 3).astype(np.float32)
    sample_fn(image, mc_batch, seed=1)  # compile
    t0 = time.time()
    for r in range(3):
        sample_fn(image, mc_batch, seed=r)
    t_chunk = (time.time() - t0) / 3
    peak = chip_peak_tflops(jax.devices()[0])
    print(f"full_chunk    {t_chunk*1e3:8.1f} ms", flush=True)
    t_dec = t_chunk - t_enc - t_pre
    print(f"decode+rest   {t_dec*1e3:8.1f} ms (remainder)", flush=True)

    tflop = flops_per_draw(cfg, seq_len, new_tokens) * mc_batch / 1e12
    v = cfg.vit
    vit_tflop = mc_batch * v.depth * (
        8 * v.seq_len * v.embed_dim**2
        + 4 * v.seq_len**2 * v.embed_dim
        + 4 * v.seq_len * v.embed_dim * v.mlp_hidden
    ) / 1e12
    lc = cfg.llama
    per_tok = (4 * lc.hidden_size**2 + 2 * lc.hidden_size * lc.num_kv_heads
               * lc.head_dim * 2 + 6 * lc.hidden_size * lc.intermediate_size)
    pre_tflop = mc_batch * lc.num_layers * (
        seq_len * per_tok + 4 * seq_len**2 * lc.hidden_size
    ) / 1e12
    print(
        f"chunk TFLOP={tflop:.1f}  "
        f"vit eff={vit_tflop/t_vit:.0f} TFLOP/s ({vit_tflop/t_vit/peak:.0%})  "
        f"prefill eff={pre_tflop/t_pre:.0f} TFLOP/s ({pre_tflop/t_pre/peak:.0%})  "
        f"chunk eff={tflop/t_chunk:.0f} TFLOP/s ({tflop/t_chunk/peak:.0%})",
        flush=True,
    )


if __name__ == "__main__":
    main()
