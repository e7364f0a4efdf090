"""Checkpoint-converter coverage with synthetic torch-layout state dicts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certifiedgpt_tpu.models.convert import (
    convert_eva_vit_state_dict,
    convert_qformer_state_dict,
)
from certifiedgpt_tpu.models.eva_vit import EvaViTConfig, eva_vit_apply
from certifiedgpt_tpu.models.qformer import QFormerConfig, qformer_apply


def _eva_state_dict(cfg, rng, ckpt_grid=None):
    """BEiT-style torch layout (ref eva_vit.py naming)."""
    d = cfg.embed_dim
    grid = ckpt_grid or cfg.grid
    sd = {
        "cls_token": rng.randn(1, 1, d).astype(np.float32),
        "pos_embed": rng.randn(1, grid * grid + 1, d).astype(np.float32),
        "patch_embed.proj.weight": rng.randn(
            d, 3, cfg.patch_size, cfg.patch_size
        ).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(d).astype(np.float32),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(d, np.float32)
        sd[b + "norm1.bias"] = np.zeros(d, np.float32)
        sd[b + "attn.qkv.weight"] = rng.randn(3 * d, d).astype(np.float32)
        sd[b + "attn.q_bias"] = rng.randn(d).astype(np.float32)
        sd[b + "attn.v_bias"] = rng.randn(d).astype(np.float32)
        sd[b + "attn.proj.weight"] = rng.randn(d, d).astype(np.float32)
        sd[b + "attn.proj.bias"] = rng.randn(d).astype(np.float32)
        sd[b + "norm2.weight"] = np.ones(d, np.float32)
        sd[b + "norm2.bias"] = np.zeros(d, np.float32)
        sd[b + "mlp.fc1.weight"] = rng.randn(cfg.mlp_hidden, d).astype(np.float32)
        sd[b + "mlp.fc1.bias"] = rng.randn(cfg.mlp_hidden).astype(np.float32)
        sd[b + "mlp.fc2.weight"] = rng.randn(d, cfg.mlp_hidden).astype(np.float32)
        sd[b + "mlp.fc2.bias"] = rng.randn(d).astype(np.float32)
    return sd


def test_eva_vit_converter_roundtrip():
    cfg = EvaViTConfig.tiny()
    rng = np.random.RandomState(0)
    sd = _eva_state_dict(cfg, rng)
    params = convert_eva_vit_state_dict(sd, cfg)

    # kernel layout: torch [out, in] -> jax [in, out]
    np.testing.assert_allclose(
        np.asarray(params["layers"]["qkv"]["kernel"][1]),
        sd["blocks.1.attn.qkv.weight"].T,
        atol=1e-6,
    )
    # conv kernel flattens in (C, ph, pw) order matching patchify
    d = cfg.embed_dim
    np.testing.assert_allclose(
        np.asarray(params["patch_embed"]["kernel"]),
        sd["patch_embed.proj.weight"].reshape(d, -1).T,
        atol=1e-6,
    )
    # forward runs at the converted shapes
    imgs = jax.random.normal(
        jax.random.PRNGKey(0), (2, cfg.img_size, cfg.img_size, 3)
    )
    out = eva_vit_apply(params, cfg, imgs)
    assert out.shape == (2, cfg.seq_len, cfg.embed_dim)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_eva_vit_converter_interpolates_pos_embed():
    """A 224px-grid checkpoint loads into a 448px-grid config."""
    cfg = EvaViTConfig.tiny(img_size=56)  # grid 4
    rng = np.random.RandomState(1)
    sd = _eva_state_dict(cfg, rng, ckpt_grid=2)  # checkpoint at grid 2
    params = convert_eva_vit_state_dict(sd, cfg)
    assert params["pos_embed"].shape == (1, cfg.seq_len, cfg.embed_dim)


def test_pos_embed_interpolation_matches_torch_bicubic():
    """Pin the resize kernel: the reference interpolates with torch
    F.interpolate bicubic (Keys a=-0.75, align_corners=False, ref
    eva_vit.py:401); jax.image.resize's 'bicubic' is the a=-0.5 kernel
    and differs at every position. Conversion fidelity of real
    checkpoints depends on matching torch exactly."""
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from certifiedgpt_tpu.models.convert import interpolate_pos_embed

    rng = np.random.RandomState(3)
    g_old, g_new, d = 4, 8, 6
    pos = rng.randn(1, g_old * g_old + 1, d).astype(np.float32)
    out = interpolate_pos_embed(pos, g_new * g_new)

    patch = torch.from_numpy(pos[0, 1:].reshape(g_old, g_old, d))
    ref = F.interpolate(
        patch.permute(2, 0, 1)[None], size=(g_new, g_new),
        mode="bicubic", align_corners=False,
    )[0].permute(1, 2, 0).reshape(g_new * g_new, d).numpy()
    np.testing.assert_allclose(out[0, 1:], ref, atol=1e-6)
    np.testing.assert_allclose(out[0, :1], pos[0, :1], atol=0)


def test_qformer_converter_blip2_prefix():
    """The vendored-BERT key dialect with the Qformer.bert. scope."""
    cfg = QFormerConfig.tiny()
    rng = np.random.RandomState(0)
    d, dw, inter = cfg.hidden_size, cfg.encoder_width, cfg.intermediate_size

    def lin(shape_out, shape_in):
        return (
            rng.randn(shape_out, shape_in).astype(np.float32),
            rng.randn(shape_out).astype(np.float32),
        )

    sd = {"query_tokens": rng.randn(1, cfg.num_query_tokens, d).astype(np.float32)}
    p = "Qformer.bert."
    sd[p + "embeddings.LayerNorm.weight"] = np.ones(d, np.float32)
    sd[p + "embeddings.LayerNorm.bias"] = np.zeros(d, np.float32)
    for i in range(cfg.num_layers):
        b = p + f"encoder.layer.{i}."
        for name, (o, n) in {
            "attention.self.query": (d, d),
            "attention.self.key": (d, d),
            "attention.self.value": (d, d),
            "attention.output.dense": (d, d),
            "intermediate_query.dense": (inter, d),
            "output_query.dense": (d, inter),
        }.items():
            w, bias = lin(o, n)
            sd[b + name + ".weight"] = w
            sd[b + name + ".bias"] = bias
        sd[b + "attention.output.LayerNorm.weight"] = np.ones(d, np.float32)
        sd[b + "attention.output.LayerNorm.bias"] = np.zeros(d, np.float32)
        sd[b + "output_query.LayerNorm.weight"] = np.ones(d, np.float32)
        sd[b + "output_query.LayerNorm.bias"] = np.zeros(d, np.float32)
        if cfg.has_cross_attention(i):
            for name, (o, n) in {
                "crossattention.self.query": (d, d),
                "crossattention.self.key": (d, dw),
                "crossattention.self.value": (d, dw),
                "crossattention.output.dense": (d, d),
            }.items():
                w, bias = lin(o, n)
                sd[b + name + ".weight"] = w
                sd[b + name + ".bias"] = bias
            sd[b + "crossattention.output.LayerNorm.weight"] = np.ones(d, np.float32)
            sd[b + "crossattention.output.LayerNorm.bias"] = np.zeros(d, np.float32)

    params = convert_qformer_state_dict(sd, cfg, prefix=p)
    assert "query_tokens" in params
    np.testing.assert_allclose(
        np.asarray(params["layers"]["layer_0"]["cross_k"]["kernel"]),
        sd[p + "encoder.layer.0.crossattention.self.key.weight"].T,
        atol=1e-6,
    )
    img = jax.random.normal(jax.random.PRNGKey(2), (2, 7, dw))
    out = qformer_apply(params, cfg, img)
    assert out.shape == (2, cfg.num_query_tokens, cfg.hidden_size)
    assert bool(jnp.all(jnp.isfinite(out)))
