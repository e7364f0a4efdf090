import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certifiedgpt_tpu.models.llama import (
    LlamaConfig,
    embed_tokens,
    init_llama,
    llama_apply,
)
from certifiedgpt_tpu.ops.quantization import (
    dequantize_kernel,
    quantize_kernel,
    quantize_llama,
    quantized_bytes,
)


def test_quantize_dequantize_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q = quantize_kernel(w)
    assert q["kernel_q"].dtype == jnp.int8
    back = dequantize_kernel(q, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # per-channel int8: error bounded by scale/2 per channel
    scale = np.asarray(q["scale"])
    assert np.all(err <= scale[None, :] * 0.51)


def test_quantized_llama_matches_fp():
    cfg = LlamaConfig.tiny()
    params = init_llama(jax.random.PRNGKey(0), cfg)
    qparams = quantize_llama(params)

    # weight memory shrinks ~4x for the stacked kernels
    fp_bytes = quantized_bytes(params["layers"])
    q_bytes = quantized_bytes(qparams["layers"])
    assert q_bytes < fp_bytes / 2.5

    b, s = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    ref, _, _ = llama_apply(params, cfg, x, mask, pos)
    out, _, _ = llama_apply(qparams, cfg, x, mask, pos)

    ref = np.asarray(ref)
    out = np.asarray(out)
    # random-init logits are near-uniform, so argmax is fragile under any
    # perturbation; require strong-majority agreement plus tight relative
    # logit error (the meaningful bound for trained weights)
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree > 0.7
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1
