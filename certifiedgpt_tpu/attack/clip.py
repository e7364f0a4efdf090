"""CLIP encoders (image ViT + modified ResNet, causal text tower), JAX.

The reference *describes* a targeted black-box attack against a
CLIP-ensemble surrogate (RN50/RN101, ViT-B/16, ViT-B/32, ViT-L/14;
ref ``README.md:62-64,108-120``) but ships no code (SURVEY.md §2.9).
These functional encoders provide the surrogate ensemble:

- ``clip_vit_image``: pre-LN ViT with class embedding, QuickGELU MLPs,
  ``ln_post`` + projection — the OpenAI/HF CLIP vision tower.
- ``clip_text``: causal transformer with EOT-token pooling + projection.
- ``clip_resnet_image``: the modified ResNet (3-conv stem with avgpool
  antialiasing, bottlenecks with avgpool downsample, attention-pool
  head) of the RN50/RN101 CLIP variants.

Converters accept HF ``CLIPModel`` state dicts (ViT/text; parity-tested)
and the OpenAI ``visual.*`` checkpoint layout for the ResNets.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from certifiedgpt_tpu.models import layers as L
from certifiedgpt_tpu.ops.attention import multi_head_attention

CLIP_LN_EPS = 1e-5


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


# ======================================================================
# ViT image tower
# ======================================================================
@dataclasses.dataclass(frozen=True)
class ClipViTConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def b32() -> "ClipViTConfig":
        return ClipViTConfig()

    @staticmethod
    def b16() -> "ClipViTConfig":
        return ClipViTConfig(patch_size=16)

    @staticmethod
    def l14() -> "ClipViTConfig":
        return ClipViTConfig(
            patch_size=14, hidden_size=1024, num_layers=24, num_heads=16,
            intermediate_size=4096, projection_dim=768,
        )

    @staticmethod
    def tiny(**overrides) -> "ClipViTConfig":
        base = dict(
            image_size=28, patch_size=14, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, projection_dim=16,
        )
        base.update(overrides)
        return ClipViTConfig(**base)


def _init_clip_block(key, d: int, inter: int, dtype) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
    return {
        "ln1": L.init_layer_norm(d, dtype),
        "q": L.init_dense(keys[0], d, d, dtype=dtype),
        "k": L.init_dense(keys[1], d, d, dtype=dtype),
        "v": L.init_dense(keys[2], d, d, dtype=dtype),
        "out": L.init_dense(keys[3], d, d, dtype=dtype),
        "ln2": L.init_layer_norm(d, dtype),
        "fc1": L.init_dense(keys[4], d, inter, dtype=dtype),
        "fc2": L.init_dense(keys[5], inter, d, dtype=dtype),
    }


def _clip_block(lp, x, num_heads: int, causal_mask: Optional[jnp.ndarray]):
    b, s, d = x.shape
    dh = d // num_heads
    h = L.layer_norm(lp["ln1"], x, CLIP_LN_EPS)
    q = L.dense(lp["q"], h).reshape(b, s, num_heads, dh)
    k = L.dense(lp["k"], h).reshape(b, s, num_heads, dh)
    v = L.dense(lp["v"], h).reshape(b, s, num_heads, dh)
    attn = multi_head_attention(q, k, v, causal_mask)
    x = x + L.dense(lp["out"], attn.reshape(b, s, d))
    h = L.layer_norm(lp["ln2"], x, CLIP_LN_EPS)
    return x + L.dense(lp["fc2"], quick_gelu(L.dense(lp["fc1"], h)))


def init_clip_vit(key, cfg: ClipViTConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 4)
    patch_in = 3 * cfg.patch_size * cfg.patch_size
    return {
        "patch_embed": {  # CLIP's patch conv has no bias
            "kernel": L.trunc_normal(
                keys[0], (patch_in, cfg.hidden_size), dtype=cfg.dtype
            )
        },
        "class_embedding": L.trunc_normal(
            keys[1], (cfg.hidden_size,), dtype=cfg.dtype
        ),
        "pos_embed": L.trunc_normal(
            keys[2], (cfg.seq_len, cfg.hidden_size), dtype=cfg.dtype
        ),
        "ln_pre": L.init_layer_norm(cfg.hidden_size, cfg.dtype),
        "layers": [
            _init_clip_block(
                keys[3 + i], cfg.hidden_size, cfg.intermediate_size, cfg.dtype
            )
            for i in range(cfg.num_layers)
        ],
        "ln_post": L.init_layer_norm(cfg.hidden_size, cfg.dtype),
        "proj": L.trunc_normal(
            keys[-1], (cfg.hidden_size, cfg.projection_dim), dtype=cfg.dtype
        ),
    }


def clip_vit_image(
    params: Dict[str, Any], cfg: ClipViTConfig, images: jnp.ndarray
) -> jnp.ndarray:
    """images [B, H, W, 3] (CLIP-normalized) -> embeddings [B, proj]."""
    b, hh, ww, c = images.shape
    p, g = cfg.patch_size, cfg.grid
    x = images.astype(cfg.dtype).reshape(b, g, p, g, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, g * g, c * p * p)
    x = L.dense(params["patch_embed"], x)
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None], (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]
    x = L.layer_norm(params["ln_pre"], x, CLIP_LN_EPS)
    for lp in params["layers"]:
        x = _clip_block(lp, x, cfg.num_heads, None)
    pooled = L.layer_norm(params["ln_post"], x[:, 0], CLIP_LN_EPS)
    return pooled @ params["proj"]


# ======================================================================
# text tower
# ======================================================================
@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    max_len: int = 77
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    projection_dim: int = 512
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(**overrides) -> "ClipTextConfig":
        base = dict(
            vocab_size=100, max_len=16, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, projection_dim=16,
        )
        base.update(overrides)
        return ClipTextConfig(**base)


def init_clip_text(key, cfg: ClipTextConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 3)
    return {
        "token_embedding": L.init_embedding(
            keys[0], cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype
        ),
        "pos_embed": L.trunc_normal(
            keys[1], (cfg.max_len, cfg.hidden_size), dtype=cfg.dtype
        ),
        "layers": [
            _init_clip_block(
                keys[2 + i], cfg.hidden_size, cfg.intermediate_size, cfg.dtype
            )
            for i in range(cfg.num_layers)
        ],
        "ln_final": L.init_layer_norm(cfg.hidden_size, cfg.dtype),
        "proj": L.trunc_normal(
            keys[-1], (cfg.hidden_size, cfg.projection_dim), dtype=cfg.dtype
        ),
    }


def clip_text(
    params: Dict[str, Any], cfg: ClipTextConfig, token_ids: jnp.ndarray
) -> jnp.ndarray:
    """token_ids [B, S] (EOT = max id in each row) -> embeddings [B, proj]."""
    b, s = token_ids.shape
    x = L.embed(params["token_embedding"], token_ids) + params["pos_embed"][:s][None]
    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))[None, None]
    for lp in params["layers"]:
        x = _clip_block(lp, x, cfg.num_heads, causal)
    x = L.layer_norm(params["ln_final"], x, CLIP_LN_EPS)
    # pool at the EOT token (highest token id, the CLIP convention)
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = x[jnp.arange(b), eot]
    return pooled @ params["proj"]


# ======================================================================
# modified ResNet image tower (RN50 / RN101)
# ======================================================================
@dataclasses.dataclass(frozen=True)
class ClipResNetConfig:
    layers: tuple = (3, 4, 6, 3)  # RN50; RN101 = (3, 4, 23, 3)
    width: int = 64
    image_size: int = 224
    embed_dim: int = 1024  # RN50 attnpool output; RN101 = 512
    heads: int = 32
    dtype: Any = jnp.float32

    @staticmethod
    def rn50() -> "ClipResNetConfig":
        return ClipResNetConfig()

    @staticmethod
    def rn101() -> "ClipResNetConfig":
        return ClipResNetConfig(layers=(3, 4, 23, 3), embed_dim=512)

    @staticmethod
    def tiny(**overrides) -> "ClipResNetConfig":
        base = dict(
            layers=(1, 1, 1, 1), width=8, image_size=32, embed_dim=32, heads=4
        )
        base.update(overrides)
        return ClipResNetConfig(**base)


def _init_conv(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    return {
        "kernel": L.trunc_normal(
            key, (kh, kw, cin, cout), std=fan_in**-0.5, dtype=dtype
        )
    }


def _conv(params, x, stride=1):
    """Conv with torch-style symmetric padding ((k-1)//2 per side).

    XLA's "SAME" pads asymmetrically (extra on the right) for stride-2
    3x3 convs, which shifts every window one pixel vs torch's pad=1 —
    explicit padding keeps converted OpenAI checkpoints exact."""
    kh, kw = params["kernel"].shape[:2]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    return jax.lax.conv_general_dilated(
        x, params["kernel"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _init_bn(c, dtype):
    return {
        "scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype),
    }


def _bn(params, x, eps=1e-5):
    inv = jax.lax.rsqrt(params["var"].astype(jnp.float32) + eps)
    out = (x.astype(jnp.float32) - params["mean"]) * inv
    return (out * params["scale"] + params["bias"]).astype(x.dtype)


def _avg_pool(x, window=2):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, window, window, 1),
        "VALID",
    ) / (window * window)


def _init_bottleneck(key, cin, cout, stride, dtype):
    keys = jax.random.split(key, 4)
    expansion = 4
    params = {
        "conv1": _init_conv(keys[0], 1, 1, cin, cout, dtype),
        "bn1": _init_bn(cout, dtype),
        "conv2": _init_conv(keys[1], 3, 3, cout, cout, dtype),
        "bn2": _init_bn(cout, dtype),
        "conv3": _init_conv(keys[2], 1, 1, cout, cout * expansion, dtype),
        "bn3": _init_bn(cout * expansion, dtype),
    }
    if stride > 1 or cin != cout * expansion:
        params["downsample"] = {
            "conv": _init_conv(keys[3], 1, 1, cin, cout * expansion, dtype),
            "bn": _init_bn(cout * expansion, dtype),
        }
    return params


def _bottleneck(lp, x, stride):
    out = jax.nn.relu(_bn(lp["bn1"], _conv(lp["conv1"], x)))
    out = jax.nn.relu(_bn(lp["bn2"], _conv(lp["conv2"], out)))
    if stride > 1:  # CLIP: avgpool *before* conv3 (anti-aliased downsample)
        out = _avg_pool(out, stride)
    out = _bn(lp["bn3"], _conv(lp["conv3"], out))
    if "downsample" in lp:
        identity = x
        if stride > 1:
            identity = _avg_pool(identity, stride)
        identity = _bn(lp["downsample"]["bn"], _conv(lp["downsample"]["conv"], identity))
    else:
        identity = x
    return jax.nn.relu(out + identity)


def init_clip_resnet(key, cfg: ClipResNetConfig) -> Dict[str, Any]:
    w, dtype = cfg.width, cfg.dtype
    keys = jax.random.split(key, 8 + sum(cfg.layers))
    params: Dict[str, Any] = {
        "conv1": _init_conv(keys[0], 3, 3, 3, w // 2, dtype),
        "bn1": _init_bn(w // 2, dtype),
        "conv2": _init_conv(keys[1], 3, 3, w // 2, w // 2, dtype),
        "bn2": _init_bn(w // 2, dtype),
        "conv3": _init_conv(keys[2], 3, 3, w // 2, w, dtype),
        "bn3": _init_bn(w, dtype),
    }
    ki = 3
    cin = w
    for stage, blocks in enumerate(cfg.layers):
        cout = w * (2**stage)
        stage_params = []
        for b in range(blocks):
            stride = 1 if (b > 0 or stage == 0) else 2
            stage_params.append(_init_bottleneck(keys[ki], cin, cout, stride, dtype))
            ki += 1
            cin = cout * 4
        params[f"layer{stage + 1}"] = stage_params

    # attention pool head
    spatial = cfg.image_size // 32
    embed_in = w * 8 * 4
    kq, kk, kv, kp, kpos = jax.random.split(keys[ki], 5)
    params["attnpool"] = {
        "pos_embed": L.trunc_normal(
            kpos, (spatial * spatial + 1, embed_in), dtype=dtype
        ),
        "q": L.init_dense(kq, embed_in, embed_in, dtype=dtype),
        "k": L.init_dense(kk, embed_in, embed_in, dtype=dtype),
        "v": L.init_dense(kv, embed_in, embed_in, dtype=dtype),
        "proj": L.init_dense(kp, embed_in, cfg.embed_dim, dtype=dtype),
    }
    return params


def clip_resnet_image(
    params: Dict[str, Any], cfg: ClipResNetConfig, images: jnp.ndarray
) -> jnp.ndarray:
    """images [B, H, W, 3] -> embeddings [B, embed_dim]."""
    x = images.astype(cfg.dtype)
    # 3-conv stem, stride-2 first conv, avgpool at the end
    x = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x, stride=2)))
    x = jax.nn.relu(_bn(params["bn2"], _conv(params["conv2"], x)))
    x = jax.nn.relu(_bn(params["bn3"], _conv(params["conv3"], x)))
    x = _avg_pool(x, 2)
    for stage in range(4):
        blocks = params[f"layer{stage + 1}"]
        for b, lp in enumerate(blocks):
            stride = 1 if (b > 0 or stage == 0) else 2
            x = _bottleneck(lp, x, stride)

    # attention pooling: mean token queries the spatial grid
    b, hh, ww, c = x.shape
    tokens = x.reshape(b, hh * ww, c)
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)
    tokens = tokens + params["attnpool"]["pos_embed"][None]
    ap = params["attnpool"]
    heads = cfg.heads
    dh = c // heads
    q = L.dense(ap["q"], tokens[:, :1]).reshape(b, 1, heads, dh)
    k = L.dense(ap["k"], tokens).reshape(b, -1, heads, dh)
    v = L.dense(ap["v"], tokens).reshape(b, -1, heads, dh)
    pooled = multi_head_attention(q, k, v).reshape(b, c)
    return L.dense(ap["proj"], pooled)


# ======================================================================
# HF CLIPModel converter (vision ViT + text)
# ======================================================================
def convert_hf_clip(sd: Dict[str, Any], vit_cfg: ClipViTConfig,
                    text_cfg: ClipTextConfig) -> Dict[str, Dict[str, Any]]:
    """HF ``CLIPModel.state_dict()`` -> {"vision": ..., "text": ...}."""

    def _np(t):
        return t.detach().cpu().float().numpy() if hasattr(t, "detach") else np.asarray(t)

    def lin(prefix):
        return {
            "kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T, vit_cfg.dtype),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]), vit_cfg.dtype),
        }

    def ln(prefix):
        return {
            "scale": jnp.asarray(_np(sd[prefix + ".weight"]), vit_cfg.dtype),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]), vit_cfg.dtype),
        }

    def block(prefix):
        return {
            "ln1": ln(prefix + ".layer_norm1"),
            "q": lin(prefix + ".self_attn.q_proj"),
            "k": lin(prefix + ".self_attn.k_proj"),
            "v": lin(prefix + ".self_attn.v_proj"),
            "out": lin(prefix + ".self_attn.out_proj"),
            "ln2": ln(prefix + ".layer_norm2"),
            "fc1": lin(prefix + ".mlp.fc1"),
            "fc2": lin(prefix + ".mlp.fc2"),
        }

    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    vision = {
        "patch_embed": {
            "kernel": jnp.asarray(
                conv.reshape(conv.shape[0], -1).T, vit_cfg.dtype
            )
        },
        "class_embedding": jnp.asarray(
            _np(sd["vision_model.embeddings.class_embedding"]), vit_cfg.dtype
        ),
        "pos_embed": jnp.asarray(
            _np(sd["vision_model.embeddings.position_embedding.weight"]),
            vit_cfg.dtype,
        ),
        "ln_pre": ln("vision_model.pre_layrnorm")
        if "vision_model.pre_layrnorm.weight" in sd
        else ln("vision_model.pre_layernorm"),
        "layers": [
            block(f"vision_model.encoder.layers.{i}")
            for i in range(vit_cfg.num_layers)
        ],
        "ln_post": ln("vision_model.post_layernorm"),
        "proj": jnp.asarray(_np(sd["visual_projection.weight"]).T, vit_cfg.dtype),
    }
    text = {
        "token_embedding": {
            "embedding": jnp.asarray(
                _np(sd["text_model.embeddings.token_embedding.weight"]),
                text_cfg.dtype,
            )
        },
        "pos_embed": jnp.asarray(
            _np(sd["text_model.embeddings.position_embedding.weight"]),
            text_cfg.dtype,
        ),
        "layers": [
            block(f"text_model.encoder.layers.{i}")
            for i in range(text_cfg.num_layers)
        ],
        "ln_final": ln("text_model.final_layer_norm"),
        "proj": jnp.asarray(_np(sd["text_projection.weight"]).T, text_cfg.dtype),
    }
    return {"vision": vision, "text": text}


# ======================================================================
# OpenAI CLIP ResNet converter (``visual.*`` checkpoint layout)
# ======================================================================
def convert_openai_clip_resnet(
    sd: Dict[str, Any], cfg: ClipResNetConfig
) -> Dict[str, Any]:
    """OpenAI CLIP ``visual.*`` ResNet state_dict -> ``init_clip_resnet``
    pytree (the RN50/RN101 surrogates of the attack stage,
    ref README.md:114-115). Conv kernels go [O, I, kh, kw] -> HWIO;
    BatchNorm running stats map onto the folded-at-inference leaves;
    ``downsample`` is OpenAI's AvgPool("-1")+Conv("0")+BN("1") sequence;
    the attention pool maps q/k/v/c_proj and the positional embedding."""

    def _np(t):
        return (
            t.detach().cpu().float().numpy() if hasattr(t, "detach")
            else np.asarray(t)
        )

    dt = cfg.dtype

    def conv(key):
        return {"kernel": jnp.asarray(_np(sd[key + ".weight"]).transpose(2, 3, 1, 0), dt)}

    def bn(key):
        return {
            "scale": jnp.asarray(_np(sd[key + ".weight"]), dt),
            "bias": jnp.asarray(_np(sd[key + ".bias"]), dt),
            "mean": jnp.asarray(_np(sd[key + ".running_mean"]), dt),
            "var": jnp.asarray(_np(sd[key + ".running_var"]), dt),
        }

    def lin(key):
        return {
            "kernel": jnp.asarray(_np(sd[key + ".weight"]).T, dt),
            "bias": jnp.asarray(_np(sd[key + ".bias"]), dt),
        }

    params: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = conv(f"visual.conv{i}")
        params[f"bn{i}"] = bn(f"visual.bn{i}")

    for stage, blocks in enumerate(cfg.layers):
        stage_params = []
        for b in range(blocks):
            base = f"visual.layer{stage + 1}.{b}"
            lp = {
                "conv1": conv(base + ".conv1"), "bn1": bn(base + ".bn1"),
                "conv2": conv(base + ".conv2"), "bn2": bn(base + ".bn2"),
                "conv3": conv(base + ".conv3"), "bn3": bn(base + ".bn3"),
            }
            if base + ".downsample.0.weight" in sd:
                lp["downsample"] = {
                    "conv": conv(base + ".downsample.0"),
                    "bn": bn(base + ".downsample.1"),
                }
            stage_params.append(lp)
        params[f"layer{stage + 1}"] = stage_params

    params["attnpool"] = {
        "pos_embed": jnp.asarray(
            _np(sd["visual.attnpool.positional_embedding"]), dt
        ),
        "q": lin("visual.attnpool.q_proj"),
        "k": lin("visual.attnpool.k_proj"),
        "v": lin("visual.attnpool.v_proj"),
        "proj": lin("visual.attnpool.c_proj"),
    }
    return params
