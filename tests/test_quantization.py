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
    quantize_eva_vit,
    quantize_kernel,
    quantize_llama,
    quantize_rows,
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


def test_quantize_rows_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(7, 33).astype(np.float32) * 3.0)
    xq, xs = quantize_rows(x)
    assert xq.dtype == jnp.int8 and xs.shape == (7, 1)
    back = np.asarray(xq, np.float32) * np.asarray(xs)
    err = np.abs(back - np.asarray(x))
    assert np.all(err <= np.asarray(xs) * 0.51)


def test_w8a8_dense_matches_fp():
    """The W8A8 path (per-row activation x per-channel weight scales)
    approximates the fp matmul; on bf16-kernel params act_quant must be
    an exact no-op."""
    from certifiedgpt_tpu.models import layers as L

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(5, 24).astype(np.float32))
    params = L.init_dense(jax.random.PRNGKey(3), 24, 16)
    ref = L.dense(params, x)

    # bf16/fp kernel: act_quant flag is ignored
    same = L.dense(params, x, act_quant=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(same))

    qp = dict(quantize_kernel(params["kernel"]))
    qp["bias"] = params["bias"]
    out = L.dense(qp, x, act_quant=True)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9
    )
    assert rel < 0.05


def test_w8a8_dense_gradient_is_straight_through():
    """Training THROUGH a W8A8-quantized frozen tower must see the fp
    matmul's gradient field (straight-through vjp), not round()'s zero
    derivative — e.g. finetuning llama_proj backprops through the
    act_quant decoder blocks."""
    from certifiedgpt_tpu.models import layers as L
    from certifiedgpt_tpu.ops.quantization import dequantize_kernel

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(6, 24).astype(np.float32))
    params = L.init_dense(jax.random.PRNGKey(6), 24, 16)
    qp = dict(quantize_kernel(params["kernel"]))
    qp["bias"] = params["bias"]
    deq = {"kernel": dequantize_kernel(qp, jnp.float32), "bias": params["bias"]}

    g_q = jax.grad(lambda x: jnp.sum(jnp.sin(L.dense(qp, x, act_quant=True))))(x)
    g_fp = jax.grad(lambda x: jnp.sum(jnp.sin(L.dense(deq, x))))(x)
    g_q, g_fp = np.asarray(g_q), np.asarray(g_fp)
    cos = (g_q * g_fp).sum() / (
        np.linalg.norm(g_q) * np.linalg.norm(g_fp) + 1e-12
    )
    assert cos > 0.99
    assert np.abs(g_q - g_fp).max() / (np.abs(g_fp).max() + 1e-12) < 0.1


def test_w8a8_vit_matches_fp():
    from certifiedgpt_tpu.models.eva_vit import (
        EvaViTConfig,
        eva_vit_apply,
        init_eva_vit,
    )
    import dataclasses

    cfg = EvaViTConfig.tiny(depth=3)
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        np.random.RandomState(4).randn(2, cfg.img_size, cfg.img_size, 3),
        jnp.float32,
    )
    ref = np.asarray(eva_vit_apply(params, cfg, images))

    qcfg = dataclasses.replace(cfg, act_quant=True)
    qparams = quantize_eva_vit(params)
    # all four tower matmuls are int8 in the serving mode
    assert "kernel_q" in qparams["layers"]["fc2"]
    assert "kernel_q" in qparams["layers"]["qkv"]
    out = np.asarray(eva_vit_apply(qparams, qcfg, images))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.12


def test_w8a8_llama_prefill_matches_fp():
    cfg = LlamaConfig.tiny(act_quant=True)
    ref_cfg = LlamaConfig.tiny()
    params = init_llama(jax.random.PRNGKey(0), ref_cfg)
    qparams = quantize_llama(params)

    b, s = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    ref, _, _ = llama_apply(params, ref_cfg, x, mask, pos)
    out, _, _ = llama_apply(qparams, cfg, x, mask, pos)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / (
        np.abs(np.asarray(ref)).max() + 1e-9
    )
    assert rel < 0.1


def test_kv8_attention_matches_dequantized_attention():
    """multi_head_attention_kv8 must equal attention over the explicitly
    dequantized cache — the scale commuting is exact algebra, so the only
    difference is bf16 rounding of the weight*scale product (fp32 here)."""
    import jax

    from certifiedgpt_tpu.ops.attention import (
        multi_head_attention,
        multi_head_attention_kv8,
    )
    from certifiedgpt_tpu.ops.quantization import quantize_rows

    b, sq, sk, h, dh = 2, 3, 7, 4, 16
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, sq, h, dh), jnp.float32)
    k = jax.random.normal(keys[1], (b, sk, h, dh), jnp.float32)
    v = jax.random.normal(keys[2], (b, sk, h, dh), jnp.float32)
    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    mask = (
        jax.random.uniform(jax.random.PRNGKey(3), (b, 1, sq, sk)) > 0.3
    )
    # ensure no fully-masked row
    mask = mask.at[..., 0].set(True)

    ref = multi_head_attention(
        q,
        kq.astype(jnp.float32) * ks,
        vq.astype(jnp.float32) * vs,
        mask,
    )
    got = multi_head_attention_kv8(q, kq, ks, vq, vs, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # grouped-query: an H_kv < H cache must match the repeated-head
    # reference WITHOUT the kv8 path materializing a repeated cache
    # (it contracts the grouped queries against the H_kv cache directly)
    kq2, ks2 = quantize_rows(k[:, :, :2])
    vq2, vs2 = quantize_rows(v[:, :, :2])
    ref_g = multi_head_attention(
        q,
        kq2.astype(jnp.float32) * ks2,
        vq2.astype(jnp.float32) * vs2,
        mask,
    )
    got_g = multi_head_attention_kv8(q, kq2, ks2, vq2, vs2, mask)
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(ref_g), atol=2e-5
    )


def test_gelu_quant_rows_kernel_matches_xla_chain():
    """The fused Pallas gelu+row-quant (interpret mode on CPU) vs the
    exact XLA chain: scales match to the erf-approx error and every
    int8 code agrees within one quantization bucket."""
    from certifiedgpt_tpu.ops.quantization import gelu_quant_rows

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(256, 384).astype(np.float32) * 3).astype(
        jnp.bfloat16
    )
    xq_k, xs_k = gelu_quant_rows(x, interpret=True)
    xq_r, xs_r = quantize_rows(jax.nn.gelu(x, approximate=False))
    np.testing.assert_allclose(
        np.asarray(xs_k), np.asarray(xs_r), rtol=1e-4
    )
    dq_k = np.asarray(xq_k, np.float32) * np.asarray(xs_k)
    dq_r = np.asarray(xq_r, np.float32) * np.asarray(xs_r)
    assert np.abs(dq_k - dq_r).max() <= 1.01 * np.asarray(xs_r).max()
    # codes differ only where rounding is borderline
    assert np.abs(
        np.asarray(xq_k, np.int32) - np.asarray(xq_r, np.int32)
    ).max() <= 1


def test_gelu_dense_matches_dense_of_gelu():
    """layers.gelu_dense on a quantized leaf (CPU -> XLA fallback path)
    must equal dense(gelu(x)) bit-for-bit, and fall back exactly for
    unquantized leaves."""
    from certifiedgpt_tpu.models import layers as L

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(10, 24).astype(np.float32))
    params = L.init_dense(jax.random.PRNGKey(2), 24, 16)
    qp = dict(quantize_kernel(params["kernel"]))
    qp["bias"] = params["bias"]

    fused = L.gelu_dense(qp, x, act_quant=True)
    chain = L.dense(qp, L.gelu(x), act_quant=True)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(chain))

    fused_fp = L.gelu_dense(params, x)
    chain_fp = L.dense(params, L.gelu(x))
    np.testing.assert_array_equal(np.asarray(fused_fp), np.asarray(chain_fp))


def test_w8a8_gelu_matmul_gradient_matches_fp_gelu_matmul():
    """w8a8_gelu_matmul's straight-through backward must equal the fp
    gradient of gelu(x) @ dequantized_w (the estimator w8a8_matmul +
    jax.nn.gelu compose to)."""
    from certifiedgpt_tpu.ops.quantization import w8a8_gelu_matmul

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(6, 24).astype(np.float32))
    leaf = quantize_kernel(
        jnp.asarray(0.1 * rng.randn(24, 16).astype(np.float32))
    )
    w_fp = dequantize_kernel(leaf, jnp.float32)

    g_q = jax.grad(
        lambda x: jnp.sum(
            jnp.sin(w8a8_gelu_matmul(x, leaf["kernel_q"], leaf["scale"]))
        )
    )(x)
    g_fp = jax.grad(
        lambda x: jnp.sum(jnp.sin(jax.nn.gelu(x, approximate=False) @ w_fp))
    )(x)
    g_q, g_fp = np.asarray(g_q), np.asarray(g_fp)
    cos = (g_q * g_fp).sum() / (
        np.linalg.norm(g_q) * np.linalg.norm(g_fp) + 1e-12
    )
    assert cos > 0.99
    assert np.abs(g_q - g_fp).max() / (np.abs(g_fp).max() + 1e-12) < 0.1


def test_ln_quant_rows_kernel_matches_xla_chain():
    """The fused Pallas LN+row-quant (interpret mode on CPU) vs the
    exact chain — same fp32 ops, only reduction order differs."""
    from certifiedgpt_tpu.models import layers as L
    from certifiedgpt_tpu.ops.quantization import ln_quant_rows

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(256, 384).astype(np.float32) * 2).astype(
        jnp.bfloat16
    )
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(384).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(384).astype(np.float32))

    xq_k, xs_k = ln_quant_rows(x, scale, bias, eps=1e-6, interpret=True)
    ln = {"scale": scale, "bias": bias}
    xq_r, xs_r = quantize_rows(L.layer_norm(ln, x, eps=1e-6))
    np.testing.assert_allclose(
        np.asarray(xs_k), np.asarray(xs_r), rtol=1e-4
    )
    assert np.abs(
        np.asarray(xq_k, np.int32) - np.asarray(xq_r, np.int32)
    ).max() <= 1


def test_ln_dense_matches_dense_of_layer_norm():
    """layers.ln_dense (CPU -> XLA fallback) must equal
    dense(layer_norm(x)) bit-for-bit on quantized and fp leaves."""
    from certifiedgpt_tpu.models import layers as L

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(10, 24).astype(np.float32))
    ln = L.init_layer_norm(24)
    params = L.init_dense(jax.random.PRNGKey(9), 24, 16)
    qp = dict(quantize_kernel(params["kernel"]))
    qp["bias"] = params["bias"]

    fused = L.ln_dense(qp, x, ln, act_quant=True)
    chain = L.dense(qp, L.layer_norm(ln, x), act_quant=True)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(chain))

    fused_fp = L.ln_dense(params, x, ln)
    chain_fp = L.dense(params, L.layer_norm(ln, x))
    np.testing.assert_array_equal(np.asarray(fused_fp), np.asarray(chain_fp))
