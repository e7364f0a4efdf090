import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certifiedgpt_tpu.models.eva_vit import (
    EvaViTConfig,
    eva_vit_apply,
    init_eva_vit,
    patchify,
)
from certifiedgpt_tpu.models.qformer import (
    QFormerConfig,
    init_qformer,
    qformer_apply,
)
from certifiedgpt_tpu.models.convert import (
    convert_qformer_state_dict,
    interpolate_pos_embed,
)


def test_vit_forward_shapes():
    cfg = EvaViTConfig.tiny()
    params = init_eva_vit(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.img_size, cfg.img_size, 3))
    out = eva_vit_apply(params, cfg, imgs)
    assert out.shape == (2, cfg.seq_len, cfg.embed_dim)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_patchify_matches_torch_conv():
    """Patch embedding as unfold+matmul must equal Conv2d(stride=patch)."""
    torch = pytest.importorskip("torch")
    cfg = EvaViTConfig.tiny(img_size=28, patch_size=14, embed_dim=16)
    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 28, 28, 3).astype(np.float32)
    conv_w = rng.randn(16, 3, 14, 14).astype(np.float32)
    conv_b = rng.randn(16).astype(np.float32)

    ref = torch.nn.functional.conv2d(
        torch.tensor(imgs).permute(0, 3, 1, 2),
        torch.tensor(conv_w),
        torch.tensor(conv_b),
        stride=14,
    )
    ref = ref.flatten(2).transpose(1, 2).numpy()  # [B, N, D]

    patches = patchify(jnp.asarray(imgs), cfg)
    kernel = jnp.asarray(conv_w.reshape(16, -1).T)
    ours = patches @ kernel + jnp.asarray(conv_b)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_pos_embed_interpolation_shapes():
    pos = np.random.RandomState(0).randn(1, 1 + 16 * 16, 8).astype(np.float32)
    out = interpolate_pos_embed(pos, 32 * 32)
    assert out.shape == (1, 1 + 32 * 32, 8)
    # identity when grids match
    same = interpolate_pos_embed(pos, 16 * 16)
    np.testing.assert_allclose(same, pos)


def test_qformer_forward_shapes():
    cfg = QFormerConfig.tiny()
    params = init_qformer(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 9, cfg.encoder_width))
    out = qformer_apply(params, cfg, img)
    assert out.shape == (2, cfg.num_query_tokens, cfg.hidden_size)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_qformer_parity_with_hf_blip2():
    """Converted HF Blip2QFormerModel weights reproduce its outputs."""
    torch = pytest.importorskip("torch")
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    hf_cfg = Blip2QFormerConfig(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=64,
        cross_attention_frequency=2,
        encoder_hidden_size=48,
    )
    torch.manual_seed(0)
    hf = Blip2QFormerModel(hf_cfg).eval()

    cfg = QFormerConfig.tiny()
    params = convert_qformer_state_dict(hf.state_dict(), cfg)

    rng = np.random.RandomState(1)
    n_query = cfg.num_query_tokens
    query = rng.randn(1, n_query, 32).astype(np.float32) * 0.02
    img = rng.randn(2, 9, 48).astype(np.float32)

    params["query_tokens"] = jnp.asarray(query)

    with torch.no_grad():
        ref = hf(
            query_embeds=torch.tensor(query).expand(2, -1, -1),
            encoder_hidden_states=torch.tensor(img),
        ).last_hidden_state.numpy()

    ours = qformer_apply(params, cfg, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)
