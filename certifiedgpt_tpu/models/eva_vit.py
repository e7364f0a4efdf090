"""EVA ViT-g/14 vision encoder, TPU-native.

Re-designs the reference's EVA ViT (ref
``graphs/models/minigpt4/models/eva_vit.py:425-438``: img_size=448,
patch=14, embed_dim=1408, depth=39, heads=16, mlp_ratio=4.3637, qkv_bias)
as a functional JAX model:

- patch embedding is an unfold + matmul (identical math to the reference's
  Conv2d(3, D, 14, stride 14), but expressed as one big MXU matmul);
- BEiT-style attention: packed biasless qkv kernel with separate q/v bias
  vectors and an implicit zero k bias (the torch layout the eva_vit_g.pth
  checkpoint stores);
- pre-norm blocks, exact-GELU MLP, no final norm (the reference's
  ``use_mean_pooling=False`` path returns the raw token sequence and the
  caller applies its own ``ln_vision``, ref minigpt4.py:121-149);
- one ``lax.scan`` over 39 stacked layers;
- drop-path/stochastic-depth is omitted: the encoder is frozen in every
  supported config, so the train-time-only regularizer is dead weight.

The forward returns the full 1025-token sequence ([cls] + 32x32 patches at
448px) like the reference (``eva_vit.py:359-362``, head removed).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from certifiedgpt_tpu.models import layers as L
from certifiedgpt_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class EvaViTConfig:
    img_size: int = 448
    patch_size: int = 14
    in_channels: int = 3
    embed_dim: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_hidden: int = 6144  # round(1408 * 4.3637)
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    # rematerialize each block on backward: trades ~depth x activation
    # memory for recompute (jax.checkpoint; SURVEY.md hbm guidance)
    remat: bool = False
    # attention implementation: "xla" (default; XLA's fused lowering),
    # "flash" (jax's builtin TPU flash kernel, full-sequence blocks —
    # 2.2x over XLA at ViT-g scale; XLA fallback off-TPU),
    # "flash_cls" (r3 production: cls-split exact-(S-1) Pallas kernel,
    # ~2.2x over "flash" at certify shapes; falls back to "flash" when
    # S-1 is not a lane multiple, exact XLA fallback off-TPU), or
    # "flash_custom" (the hand-written kernel in ops/flash_attention)
    attn_impl: str = "xla"
    # W8A8 serving mode: when the qkv/proj/fc1/fc2 kernels are
    # int8-quantized (ops/quantization.quantize_eva_vit), also quantize
    # their activations per row so the matmuls run on the MXU's
    # double-rate int8 path. No effect on unquantized (bf16) params.
    act_quant: bool = False

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # +cls

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @staticmethod
    def eva_vit_g() -> "EvaViTConfig":
        return EvaViTConfig()

    @staticmethod
    def tiny(**overrides) -> "EvaViTConfig":
        base = dict(
            img_size=28,
            patch_size=14,
            embed_dim=32,
            depth=2,
            num_heads=4,
            mlp_hidden=64,
            dtype=jnp.float32,
        )
        base.update(overrides)
        return EvaViTConfig(**base)


def _init_layer(key, cfg: EvaViTConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 4)
    d = cfg.embed_dim
    return {
        "norm1": L.init_layer_norm(d, cfg.dtype),
        "qkv": L.init_dense(keys[0], d, 3 * d, use_bias=False, dtype=cfg.dtype),
        "q_bias": jnp.zeros((d,), cfg.dtype),
        "v_bias": jnp.zeros((d,), cfg.dtype),
        "proj": L.init_dense(keys[1], d, d, dtype=cfg.dtype),
        "norm2": L.init_layer_norm(d, cfg.dtype),
        "fc1": L.init_dense(keys[2], d, cfg.mlp_hidden, dtype=cfg.dtype),
        "fc2": L.init_dense(keys[3], cfg.mlp_hidden, d, dtype=cfg.dtype),
    }


def init_eva_vit(key, cfg: EvaViTConfig) -> Dict[str, Any]:
    k_patch, k_cls, k_pos, k_layers = jax.random.split(key, 4)
    patch_in = cfg.in_channels * cfg.patch_size * cfg.patch_size
    layer_keys = jax.random.split(k_layers, cfg.depth)
    per_layer = [_init_layer(k, cfg) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)
    return {
        "patch_embed": L.init_dense(k_patch, patch_in, cfg.embed_dim, dtype=cfg.dtype),
        "cls_token": L.trunc_normal(k_cls, (1, 1, cfg.embed_dim), dtype=cfg.dtype),
        "pos_embed": L.trunc_normal(
            k_pos, (1, cfg.seq_len, cfg.embed_dim), dtype=cfg.dtype
        ),
        "layers": stacked,
    }


def patchify(images: jnp.ndarray, cfg: EvaViTConfig) -> jnp.ndarray:
    """[B, H, W, C] -> [B, num_patches, C*P*P] in torch-conv (C, ph, pw) order.

    The flatten order matches Conv2d weight layout [D, C, P, P] so that a
    converted conv kernel reproduces the reference patch embedding exactly.
    """
    b, h, w, c = images.shape
    p, g = cfg.patch_size, cfg.grid
    x = images.reshape(b, g, p, g, p, c)
    # -> [B, gh, gw, C, ph, pw]
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, g * g, c * p * p)


def _qkv_headpadded(
    lp: Dict[str, Any], hidden: jnp.ndarray, cfg: EvaViTConfig,
    q_premul: float = 1.0, ln: Dict[str, Any] = None,
):
    """Emit q, k, v directly in the flash kernel's [B, H, S, Dp] layout.

    The qkv kernel is reshaped per-head and zero-padded to the 128-lane
    head width, and the einsum writes the transposed-padded layout as
    the matmul OUTPUT — folding the separate split/reshape/transpose/
    head-pad pass into the matmul epilogue (measured 15.5 -> 12.2 ms per
    qkv+attention at ViT-g certify shapes, bit-identical outputs; the
    zero lanes add nothing to q.k or the attention output). q/v biases
    land in the padded layout; the BEiT k bias is identically zero
    (ref ``eva_vit.py:156-185`` qkv-bias layout).

    ``q_premul`` folds a static factor (e.g. the softmax scale, or
    scale*log2(e) for the exp2 cls-split kernel) into the q WEIGHTS and
    q bias — a few-M-element multiply on the weight tensor instead of a
    full [B, H, S, Dp] activation pass per layer."""
    b, s, _ = hidden.shape
    h, dh = cfg.num_heads, cfg.head_dim
    dp = -(-dh // 128) * 128
    if ln is not None and not ("kernel_q" in lp["qkv"] and cfg.act_quant):
        # only the W8A8 branch fuses the LN (ln_quant_rows below); the
        # bf16/weight-only paths apply it here so callers can always
        # hand over the raw residual stream
        hidden = L.layer_norm(ln, hidden, cfg.layer_norm_eps)

    def pad_w(w, premul=False):  # [K, 3*H*dh] -> [K, 3, H, dp]
        w4 = w.reshape(w.shape[0], 3, h, dh)
        if premul and q_premul != 1.0:
            w4 = w4.at[:, 0].multiply(jnp.asarray(q_premul, w4.dtype))
        return jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, dp - dh)))

    def pad_s(sv, premul=False):  # [3*H*dh] -> [3, H, dp]
        sv3 = sv.reshape(3, h, dh)
        if premul and q_premul != 1.0:
            # int8 kernels: fold the factor into the f32 dequant scale
            # (multiplying the int8 weights themselves would corrupt them)
            sv3 = sv3.at[0].multiply(jnp.asarray(q_premul, sv3.dtype))
        return jnp.pad(sv3, ((0, 0), (0, 0), (0, dp - dh)))

    p = lp["qkv"]
    if "kernel_q" in p and cfg.act_quant:
        from certifiedgpt_tpu.ops.quantization import (
            ln_quant_rows,
            quantize_rows,
        )

        if ln is not None:
            # serving split-stream path: pre-attention LN and the
            # activation quant fuse into one Pallas HBM pass
            # (ops/quantization.ln_quant_rows; exact XLA fallback)
            xq, xs = ln_quant_rows(
                hidden, ln["scale"], ln["bias"], cfg.layer_norm_eps
            )
        else:
            xq, xs = quantize_rows(hidden)
        acc = jnp.einsum(
            "bsk,kthd->tbhsd", xq, pad_w(p["kernel_q"]),
            preferred_element_type=jnp.float32,
        )
        y = (
            acc * xs[None, :, None, :, :]
            * pad_s(p["scale"], premul=True)[:, None, :, None, :]
        ).astype(hidden.dtype)
    elif "kernel_q" in p:
        acc = jnp.einsum(
            "bsk,kthd->tbhsd", hidden,
            pad_w(p["kernel_q"]).astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
        y = (
            acc * pad_s(p["scale"], premul=True)[:, None, :, None, :]
        ).astype(hidden.dtype)
    else:
        acc = jnp.einsum(
            "bsk,kthd->tbhsd", hidden,
            pad_w(p["kernel"], premul=True).astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
        y = acc.astype(hidden.dtype)

    qb = jnp.pad(
        lp["q_bias"].reshape(h, dh), ((0, 0), (0, dp - dh))
    ).astype(y.dtype)
    if q_premul != 1.0:
        qb = qb * jnp.asarray(q_premul, qb.dtype)
    vb = jnp.pad(
        lp["v_bias"].reshape(h, dh), ((0, 0), (0, dp - dh))
    ).astype(y.dtype)
    return y[0] + qb[None, :, None, :], y[1], y[2] + vb[None, :, None, :]


def _vit_block(x: jnp.ndarray, lp: Dict[str, Any], cfg: EvaViTConfig) -> jnp.ndarray:
    b, s, d = x.shape
    h, dh = cfg.num_heads, cfg.head_dim

    hidden = L.layer_norm(lp["norm1"], x, cfg.layer_norm_eps)
    aq = cfg.act_quant
    if cfg.attn_impl in ("flash", "flash_cls"):
        # jax's built-in TPU flash kernel with full-sequence blocks —
        # measured 2.2x over the XLA path at ViT-g/448 certify batches —
        # fed by the head-padded fused qkv (no transpose/pad pass; see
        # _qkv_headpadded). XLA fallback off-TPU. ("flash_cls" lands
        # here only when S-1 is not a lane multiple — the eligible case
        # routes to the split-stream scan in eva_vit_apply before any
        # block runs.)
        from certifiedgpt_tpu.ops.flash_attention import (
            builtin_flash_attention_bhsd,
        )

        qp, kp, vp = _qkv_headpadded(lp, hidden, cfg)
        attn_p = builtin_flash_attention_bhsd(qp, kp, vp, dh)
        attn = jnp.transpose(attn_p[..., :dh], (0, 2, 1, 3))  # [B,S,H,dh]
    else:
        qkv = L.dense(lp["qkv"], hidden, act_quant=aq)  # biasless [B, S, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + lp["q_bias"].astype(q.dtype)
        v = v + lp["v_bias"].astype(v.dtype)  # k bias is identically zero
        q = q.reshape(b, s, h, dh)
        k = k.reshape(b, s, h, dh)
        v = v.reshape(b, s, h, dh)
        if cfg.attn_impl == "flash_custom":
            from certifiedgpt_tpu.ops.flash_attention import flash_attention

            attn = flash_attention(q, k, v)
        elif cfg.attn_impl == "xla":
            attn = multi_head_attention(q, k, v)
        else:
            # a typo ("Flash", "flash-custom") must not silently fall
            # back to the slow path and eat the measured attention win
            raise ValueError(
                f"unknown attn_impl {cfg.attn_impl!r}: "
                "use 'xla', 'flash', 'flash_cls' or 'flash_custom'"
            )
    x = x + L.dense(lp["proj"], attn.reshape(b, s, d), act_quant=aq)

    hidden = L.layer_norm(lp["norm2"], x, cfg.layer_norm_eps)
    hidden = L.gelu_dense(
        lp["fc2"], L.dense(lp["fc1"], hidden, act_quant=aq), act_quant=aq
    )
    return x + hidden


def _vit_block_split(
    xc: jnp.ndarray,  # [B, 1, D] cls residual stream
    xp: jnp.ndarray,  # [B, N, D] patch residual stream
    lp: Dict[str, Any],
    cfg: EvaViTConfig,
):
    """The flash_cls layer on a SPLIT residual stream.

    r3 production path: the cls/patch split lives across the WHOLE
    tower — patchify emits the parts separately and they only
    concatenate once after the last layer — so no per-layer slice or
    concat copies exist at all. LN/MLP/residual are per-token and apply
    to each part independently; attention consumes both parts via the
    cls-split kernel (ops/flash_attention.py::cls_split_attention_parts:
    the qkv einsums on each part write the kernel's operands directly —
    Pallas inputs must be materialized, so any post-matmul slice would
    cost full-tensor copies, measured 6.3 ms/layer-call at certify
    shapes). Softmax scale * log2(e) is folded into the q weights; the
    kernel runs exp2.
    """
    from certifiedgpt_tpu.ops.flash_attention import (
        CLS_SPLIT_Q_PREMUL_LOG2E,
        cls_split_attention_parts,
    )

    b = xp.shape[0]
    d, dh = cfg.embed_dim, cfg.head_dim
    aq = cfg.act_quant
    prem = (dh ** -0.5) * CLS_SPLIT_Q_PREMUL_LOG2E

    qp, kp, vp = _qkv_headpadded(lp, xp, cfg, q_premul=prem, ln=lp["norm1"])
    qc, kc, vc = _qkv_headpadded(lp, xc, cfg, q_premul=prem, ln=lp["norm1"])
    out_c, out_p = cls_split_attention_parts(qp, kp, vp, qc, kc, vc)
    attn_p = jnp.transpose(out_p[..., :dh], (0, 2, 1, 3)).reshape(b, -1, d)
    attn_c = jnp.transpose(out_c[..., :dh], (0, 2, 1, 3)).reshape(b, 1, d)
    xp = xp + L.dense(lp["proj"], attn_p, act_quant=aq)
    xc = xc + L.dense(lp["proj"], attn_c, act_quant=aq)

    xp = xp + L.gelu_dense(
        lp["fc2"],
        L.ln_dense(lp["fc1"], xp, lp["norm2"], cfg.layer_norm_eps, act_quant=aq),
        act_quant=aq,
    )
    xc = xc + L.gelu_dense(
        lp["fc2"],
        L.ln_dense(lp["fc1"], xc, lp["norm2"], cfg.layer_norm_eps, act_quant=aq),
        act_quant=aq,
    )
    return xc, xp


def eva_vit_apply(
    params: Dict[str, Any], cfg: EvaViTConfig, images: jnp.ndarray
) -> jnp.ndarray:
    """images [B, H, W, C] (already normalized) -> tokens [B, 1+N, D]."""
    x = patchify(images.astype(cfg.dtype), cfg)
    x = L.dense(params["patch_embed"], x)  # [B, N, D]
    b = x.shape[0]
    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (b, 1, cfg.embed_dim)
    )

    if cfg.attn_impl == "flash_cls" and cfg.num_patches % 128 == 0:
        # split-stream tower (see _vit_block_split): parts join only once
        pos = params["pos_embed"].astype(x.dtype)
        xc = cls + pos[:, :1]
        xp = x + pos[:, 1:]

        block = _vit_block_split
        if cfg.remat:
            block = jax.checkpoint(_vit_block_split, static_argnums=(3,))

        def step_split(carry, lp):
            return block(carry[0], carry[1], lp, cfg), None

        (xc, xp), _ = lax.scan(step_split, (xc, xp), params["layers"])
        return jnp.concatenate([xc, xp], axis=1)

    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    block = _vit_block
    if cfg.remat:
        block = jax.checkpoint(_vit_block, static_argnums=(2,))

    def step(carry, lp):
        return block(carry, lp, cfg), None

    x, _ = lax.scan(step, x, params["layers"])
    return x
