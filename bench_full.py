#!/usr/bin/env python
"""Full-scale certification benchmark (single chip).

Runs the COMPLETE MiniGPT-4 pipeline at reference scale — EVA ViT-g/14 at
448px (39 layers, 1.0B), 12-layer Q-Former, Vicuna-7B-architecture decoder
with weight-only int8 quantization (ops/quantization.py) — and certifies
one image at n=1000, sigma=0.5 through the compiled noisy-generate graph.
Weights are seeded-random at the checkpoint shapes (real checkpoints are
not shipped in this image); the compute cost is identical to a real run.

Slower than bench.py (~5-8 min total: device init + one large XLA
compile + the measured run). Prints one JSON line like bench.py; the
baseline is the <10 s v4-8 target converted to this chip's compute
(v4-8 = 4 x 275 bf16 TFLOPs vs one v5e = 197 -> 55.8 s of
single-v5e-equivalent work). The Monte-Carlo axis is embarrassingly
parallel, so multi-chip scaling is linear (see
__graft_entry__.dryrun_multichip for the sharded-step validation).
"""

import functools
import json
import time

import numpy as np


def build_full_int8_params(cfg):
    """Init the full model directly at serving layout: bf16 towers,
    int8-quantized decoder kernels — module-by-module so peak HBM stays
    ~one fp32 layer-stack above the final 9.2 GB footprint."""
    import jax
    import jax.numpy as jnp

    from certifiedgpt_tpu.models import layers as L
    from certifiedgpt_tpu.models.eva_vit import init_eva_vit
    from certifiedgpt_tpu.models.qformer import init_qformer

    lc = cfg.llama

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def init_q_module(key, in_dim, out_dim):
        w = 0.02 * jax.random.normal(
            key, (lc.num_layers, in_dim, out_dim), jnp.float32
        )
        absmax = jnp.max(jnp.abs(w), axis=1)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale[:, None, :]), -127, 127).astype(jnp.int8)
        return {"kernel_q": q, "scale": scale}

    key = jax.random.PRNGKey(0)
    d, dh = lc.hidden_size, lc.head_dim
    kvd, inter = lc.num_kv_heads * dh, lc.intermediate_size
    mods = {
        "q_proj": (d, lc.num_heads * dh), "k_proj": (d, kvd),
        "v_proj": (d, kvd), "o_proj": (lc.num_heads * dh, d),
        "gate_proj": (d, inter), "up_proj": (d, inter), "down_proj": (inter, d),
    }
    layers = {
        name: init_q_module(jax.random.fold_in(key, i), di, do)
        for i, (name, (di, do)) in enumerate(mods.items())
    }
    layers["input_layernorm"] = {"scale": jnp.ones((lc.num_layers, d), jnp.bfloat16)}
    layers["post_attention_layernorm"] = {
        "scale": jnp.ones((lc.num_layers, d), jnp.bfloat16)
    }
    llama = {
        "embed_tokens": {
            "embedding": 0.02 * jax.random.normal(
                jax.random.fold_in(key, 100), (lc.vocab_size, d), jnp.bfloat16
            )
        },
        "layers": layers,
        "norm": {"scale": jnp.ones((d,), jnp.bfloat16)},
        "lm_head": {
            "kernel": 0.02 * jax.random.normal(
                jax.random.fold_in(key, 101), (d, lc.vocab_size), jnp.bfloat16
            )
        },
    }
    return {
        "vit": jax.jit(functools.partial(init_eva_vit, cfg=cfg.vit))(
            jax.random.fold_in(key, 200)
        ),
        "ln_vision": L.init_layer_norm(cfg.vit.embed_dim, jnp.bfloat16),
        "qformer": jax.jit(functools.partial(init_qformer, cfg=cfg.qformer))(
            jax.random.fold_in(key, 201)
        ),
        "llama_proj": L.init_dense(
            jax.random.fold_in(key, 202),
            cfg.qformer.hidden_size, d, dtype=jnp.float32,
        ),
        "llama": llama,
    }


def main():
    import jax

    from certifiedgpt_tpu.data.text import ByteTokenizer
    from certifiedgpt_tpu.models.minigpt4 import MiniGPT4Config
    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model
    from certifiedgpt_tpu.smoothing.classifier import AnswerVocabulary, make_sample_fn
    from certifiedgpt_tpu.smoothing.smoothing import Smooth

    sigma, n0, n, alpha = 0.5, 100, 1000, 0.001
    mc_batch = 48

    cfg = MiniGPT4Config()  # full reference scale
    params = build_full_int8_params(cfg)
    model = MiniGPT4Model(cfg, params, ByteTokenizer())

    vocab = AnswerVocabulary(["cat", "dog", "bird", "2", "yes", "no"])
    instruction = (
        "<Img><ImageHere></Img> [vqa] Based on the image, respond to this "
        "question with a short answer: what animal is this?"
    )
    sample_fn = make_sample_fn(
        model, instruction, vocab, sigma,
        mc_batch=mc_batch, max_new_tokens=10, seq_len=96,
    )
    smooth = Smooth(sample_fn, vocab.num_classes, sigma)

    rng = np.random.RandomState(0)
    image = rng.randn(448, 448, 3).astype(np.float32)

    sample_fn(image, mc_batch, seed=123)  # compile

    t0 = time.time()
    smooth.certify(image, n0=n0, n=n, alpha=alpha, seed=7)
    seconds = time.time() - t0

    # v4-8 target (<10 s on 4x275 bf16 TFLOPs) in single-v5e-equivalents
    target_chip_seconds = 10.0 * (4 * 275.0) / 197.0
    print(
        json.dumps(
            {
                "metric": "certify_1_image_n1000_sigma0.5_fullscale_int8_seconds",
                "value": round(seconds, 2),
                "unit": "s",
                "vs_baseline": round(target_chip_seconds / seconds, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
