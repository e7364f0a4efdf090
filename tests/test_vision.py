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


def test_qformer_text_parity_with_hf_blip2():
    """Text-conditioned (query+text) forward matches HF Blip2QFormerModel
    with query_length routing — the vendored BertModel text surface
    (ref Qformer.py:677-966)."""
    torch = pytest.importorskip("torch")
    from transformers import Blip2QFormerConfig, Blip2QFormerModel
    from transformers.models.blip_2.modeling_blip_2 import Blip2TextEmbeddings

    hf_cfg = Blip2QFormerConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=64,
        cross_attention_frequency=2,
        encoder_hidden_size=48,
        max_position_embeddings=32,
        use_qformer_text_input=True,
    )
    torch.manual_seed(1)
    hf = Blip2QFormerModel(hf_cfg).eval()
    te = Blip2TextEmbeddings(hf_cfg).eval()

    cfg = QFormerConfig.tiny()
    sd = dict(hf.state_dict())
    sd["embeddings.word_embeddings.weight"] = te.word_embeddings.weight
    sd["embeddings.position_embeddings.weight"] = te.position_embeddings.weight
    params = convert_qformer_state_dict(sd, cfg)
    assert "int_txt" in params["layers"]["layer_0"]

    rng = np.random.RandomState(2)
    nq, t, b = cfg.num_query_tokens, 6, 2
    query = rng.randn(1, nq, 32).astype(np.float32) * 0.02
    params["query_tokens"] = jnp.asarray(query)
    img = rng.randn(b, 9, 48).astype(np.float32)
    ids = rng.randint(0, 64, (b, t))
    text_mask = np.ones((b, t), np.int64)
    text_mask[1, -2:] = 0  # ragged text

    with torch.no_grad():
        text_emb = te(input_ids=torch.tensor(ids))
        concat = torch.cat(
            [torch.tensor(query).expand(b, -1, -1), text_emb], dim=1
        )
        full_mask = torch.cat(
            [torch.ones((b, nq), dtype=torch.long), torch.tensor(text_mask)],
            dim=1,
        )
        ref = hf(
            query_embeds=concat,
            query_length=nq,
            attention_mask=full_mask,
            encoder_hidden_states=torch.tensor(img),
        ).last_hidden_state.numpy()

    from certifiedgpt_tpu.models.qformer import qformer_text_apply

    ours = qformer_text_apply(
        params, cfg, jnp.asarray(ids),
        attention_mask=jnp.asarray(text_mask),
        image_embeds=jnp.asarray(img),
    )
    # padded text rows may diverge (HF still computes them); compare the
    # valid positions
    ours = np.asarray(ours)
    np.testing.assert_allclose(ours[0], ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        ours[1, : nq + t - 2], ref[1, : nq + t - 2], atol=2e-4, rtol=1e-3
    )


def test_qformer_text_causal_mode():
    """ITG mask: earlier text logits are independent of later tokens, and
    query outputs are independent of the text entirely."""
    from certifiedgpt_tpu.models.qformer import (
        init_qformer_text,
        qformer_lm_logits,
        qformer_text_apply,
    )

    cfg = QFormerConfig.tiny()
    params = init_qformer_text(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    ids = rng.randint(0, cfg.vocab_size, (1, 6))
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % cfg.vocab_size
    img = rng.randn(1, 9, cfg.encoder_width).astype(np.float32)

    h1 = qformer_text_apply(
        params, cfg, jnp.asarray(ids), image_embeds=jnp.asarray(img), causal=True
    )
    h2 = qformer_text_apply(
        params, cfg, jnp.asarray(ids2), image_embeds=jnp.asarray(img), causal=True
    )
    nq = cfg.num_query_tokens
    l1 = np.asarray(qformer_lm_logits(params, cfg, h1[:, nq:]))
    l2 = np.asarray(qformer_lm_logits(params, cfg, h2[:, nq:]))
    np.testing.assert_allclose(l1[:, :-1], l2[:, :-1], atol=1e-5)
    assert not np.allclose(l1[:, -1], l2[:, -1])
    # queries see only queries under the ITG mask
    np.testing.assert_allclose(
        np.asarray(h1[:, :nq]), np.asarray(h2[:, :nq]), atol=1e-6
    )


def test_qformer_lm_head_matches_torch_oracle():
    """Prediction head (transform->gelu->LN->tied decoder+bias) vs torch."""
    torch = pytest.importorskip("torch")

    cfg = QFormerConfig.tiny()
    d, v = cfg.hidden_size, cfg.vocab_size
    torch.manual_seed(4)
    dense = torch.nn.Linear(d, d)
    lnorm = torch.nn.LayerNorm(d, eps=cfg.layer_norm_eps)
    word = torch.nn.Embedding(v, d)
    bias = torch.nn.Parameter(torch.randn(v) * 0.02)

    sd = {
        "cls.predictions.transform.dense.weight": dense.weight,
        "cls.predictions.transform.dense.bias": dense.bias,
        "cls.predictions.transform.LayerNorm.weight": lnorm.weight,
        "cls.predictions.transform.LayerNorm.bias": lnorm.bias,
        "cls.predictions.bias": bias,
        "embeddings.word_embeddings.weight": word.weight,
        "embeddings.position_embeddings.weight": torch.randn(
            cfg.max_position_embeddings, d
        ),
    }
    # converter needs the core keys too; reuse a tiny HF model's layers
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    hf = Blip2QFormerModel(
        Blip2QFormerConfig(
            vocab_size=v, hidden_size=d, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            cross_attention_frequency=cfg.cross_attention_freq,
            encoder_hidden_size=cfg.encoder_width,
        )
    )
    sd.update(hf.state_dict())
    params = convert_qformer_state_dict(sd, cfg)

    from certifiedgpt_tpu.models.qformer import qformer_lm_logits

    rng = np.random.RandomState(5)
    hidden = rng.randn(2, 5, d).astype(np.float32)
    with torch.no_grad():
        h = torch.nn.functional.gelu(dense(torch.tensor(hidden)))
        h = lnorm(h)
        ref = (h @ word.weight.T + bias).numpy()
    ours = np.asarray(qformer_lm_logits(params, cfg, jnp.asarray(hidden)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
