import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certifiedgpt_tpu.ops.attention import multi_head_attention
from certifiedgpt_tpu.ops.flash_attention import flash_attention


def test_flash_fallback_matches_reference_on_cpu():
    """On non-TPU backends the wrapper falls back to the XLA op."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 64, 4, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 64, 4, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 64, 4, 32).astype(np.float32))
    ref = multi_head_attention(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    mask = jnp.tril(jnp.ones((64, 64), bool))[None, None]
    ref_c = multi_head_attention(q, k, v, mask)
    out_c = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), atol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas kernel needs TPU"
)
def test_flash_kernel_matches_reference_on_tpu():
    rng = np.random.RandomState(0)
    for (b, s, h, d, causal) in [(2, 200, 4, 88, False), (2, 333, 4, 64, True)]:
        q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None] if causal else None
        ref = multi_head_attention(q, k, v, mask)
        out = flash_attention(q, k, v, causal=causal, interpret_fallback=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2
        )


def test_vit_flash_config_runs():
    import dataclasses

    from certifiedgpt_tpu.models.eva_vit import (
        EvaViTConfig,
        eva_vit_apply,
        init_eva_vit,
    )

    cfg = dataclasses.replace(EvaViTConfig.tiny(), attn_impl="flash")
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.img_size, cfg.img_size, 3))
    out = eva_vit_apply(params, cfg, imgs)
    assert out.shape == (2, cfg.seq_len, cfg.embed_dim)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="builtin flash kernel is TPU-only"
)
def test_builtin_flash_matches_xla_on_tpu():
    from certifiedgpt_tpu.ops.attention import multi_head_attention
    from certifiedgpt_tpu.ops.flash_attention import builtin_flash_attention

    b, s, h, d = 4, 1025, 16, 88
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d), jnp.bfloat16)
    ref = multi_head_attention(q, k, v)
    out = builtin_flash_attention(q, k, v)
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert diff < 5e-3, diff


def test_builtin_flash_cpu_fallback_matches_xla():
    """Off-TPU the wrapper must route to the XLA path exactly."""
    from certifiedgpt_tpu.ops.attention import multi_head_attention
    from certifiedgpt_tpu.ops.flash_attention import builtin_flash_attention

    if jax.default_backend() == "tpu":
        pytest.skip("covered by the TPU parity test")
    b, s, h, d = 2, 33, 4, 8
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (b, s, h, d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d))
    np.testing.assert_allclose(
        np.asarray(builtin_flash_attention(q, k, v)),
        np.asarray(multi_head_attention(q, k, v)),
        atol=1e-6,
    )


def test_vit_flash_headpadded_qkv_matches_xla_path():
    """The flash path computes qkv via the head-padded fused einsum
    (matmul emits the [B,H,S,Dp] kernel layout directly); its tower
    output must equal the plain xla-path tower — same algebra, zero
    lanes contribute nothing."""
    import dataclasses

    import numpy as np

    from certifiedgpt_tpu.models.eva_vit import (
        EvaViTConfig,
        eva_vit_apply,
        init_eva_vit,
    )

    base = EvaViTConfig.tiny()
    params = init_eva_vit(jax.random.PRNGKey(3), base)
    # non-trivial biases so the padded-layout bias add is exercised
    params["layers"]["q_bias"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(4), params["layers"]["q_bias"].shape
    )
    params["layers"]["v_bias"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), params["layers"]["v_bias"].shape
    )
    imgs = jax.random.normal(
        jax.random.PRNGKey(6), (2, base.img_size, base.img_size, 3)
    )
    ref = eva_vit_apply(params, dataclasses.replace(base, attn_impl="xla"), imgs)
    out = eva_vit_apply(params, dataclasses.replace(base, attn_impl="flash"), imgs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_vit_flash_cls_split_matches_xla_path():
    """attn_impl="flash_cls" (cls-split exact-(S-1) attention with the
    softmax scale * log2(e) folded into the q weights and exp2 softmax)
    must reproduce the plain xla tower — the log2 factor cancels in the
    softmax normalization. Uses grid 16 so S-1 = 256 is a lane multiple
    and the cls-split branch (CPU fallback) actually runs."""
    import dataclasses

    import numpy as np

    from certifiedgpt_tpu.models.eva_vit import (
        EvaViTConfig,
        eva_vit_apply,
        init_eva_vit,
    )

    base = EvaViTConfig.tiny(img_size=32, patch_size=2)
    assert (base.seq_len - 1) % 128 == 0
    params = init_eva_vit(jax.random.PRNGKey(3), base)
    params["layers"]["q_bias"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(4), params["layers"]["q_bias"].shape
    )
    params["layers"]["v_bias"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), params["layers"]["v_bias"].shape
    )
    imgs = jax.random.normal(
        jax.random.PRNGKey(6), (2, base.img_size, base.img_size, 3)
    )
    ref = eva_vit_apply(params, dataclasses.replace(base, attn_impl="xla"), imgs)
    out = eva_vit_apply(
        params, dataclasses.replace(base, attn_impl="flash_cls"), imgs
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )
    # non-lane-multiple S falls back to the "flash" branch, still exact
    small = EvaViTConfig.tiny()
    params_s = init_eva_vit(jax.random.PRNGKey(7), small)
    imgs_s = jax.random.normal(
        jax.random.PRNGKey(8), (2, small.img_size, small.img_size, 3)
    )
    ref_s = eva_vit_apply(
        params_s, dataclasses.replace(small, attn_impl="xla"), imgs_s
    )
    out_s = eva_vit_apply(
        params_s, dataclasses.replace(small, attn_impl="flash_cls"), imgs_s
    )
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(ref_s), atol=2e-5, rtol=1e-5
    )


def test_vit_flash_cls_split_int8_premul_folds_into_scale():
    """With int8 ViT kernels the q pre-scale folds into the f32 dequant
    scale, NOT the int8 weights; the quantized flash_cls tower must
    equal the quantized xla tower (identical quantization error)."""
    import dataclasses

    import numpy as np

    from certifiedgpt_tpu.models.eva_vit import (
        EvaViTConfig,
        eva_vit_apply,
        init_eva_vit,
    )
    from certifiedgpt_tpu.ops.quantization import quantize_eva_vit

    base = EvaViTConfig.tiny(img_size=32, patch_size=2)
    params = quantize_eva_vit(init_eva_vit(jax.random.PRNGKey(9), base))
    imgs = jax.random.normal(
        jax.random.PRNGKey(10), (2, base.img_size, base.img_size, 3)
    )
    ref = eva_vit_apply(params, dataclasses.replace(base, attn_impl="xla"), imgs)
    out = eva_vit_apply(
        params, dataclasses.replace(base, attn_impl="flash_cls"), imgs
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas kernel needs TPU"
)
def test_cls_split_kernel_matches_xla_on_tpu():
    """The real Pallas cls-split kernel vs the XLA reference at a
    head_dim-88 shape (bf16 tolerance)."""
    import math

    from certifiedgpt_tpu.ops.flash_attention import (
        CLS_SPLIT_Q_PREMUL_LOG2E,
        cls_split_attention,
    )

    rng = np.random.RandomState(0)
    b, h, n, d, dp = 2, 4, 256, 88, 128
    prem = (d ** -0.5) * CLS_SPLIT_Q_PREMUL_LOG2E

    def mk(key):
        x = rng.randn(b, h, n + 1, dp).astype(np.float32)
        x[..., d:] = 0.0
        return jnp.asarray(x, jnp.bfloat16)

    q, k, v = mk(0), mk(1), mk(2)
    qs = (q.astype(jnp.float32) * prem).astype(jnp.bfloat16)
    out = cls_split_attention(
        qs[:, :, 1:], k[:, :, 1:], v[:, :, 1:],
        qs[:, :, :1], k[:, :, :1], v[:, :, :1],
    )
    ref = multi_head_attention(
        jnp.transpose(q, (0, 2, 1, 3)),
        jnp.transpose(k, (0, 2, 1, 3)),
        jnp.transpose(v, (0, 2, 1, 3)),
        scale=d ** -0.5,
    )
    ref = jnp.transpose(ref, (0, 2, 1, 3))
    diff = float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)
    )))
    assert diff < 2e-2, diff
