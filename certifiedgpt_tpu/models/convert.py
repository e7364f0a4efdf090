"""PyTorch-checkpoint -> JAX-pytree converters.

The reference loads four heterogeneous torch checkpoint families
(SURVEY.md §3.4: Vicuna HF shards, eva_vit_g.pth, BLIP-2 Q-Former,
MiniGPT-4 stage-2 ``model_state_dict``). Each converter here maps one
family's ``state_dict`` (torch tensors or numpy arrays) onto the
corresponding functional param pytree, transposing dense kernels from
torch's [out, in] to JAX's [in, out] layout.

Converters take plain dicts so they work on ``torch.load(...,
map_location='cpu')`` results as well as safetensors readers; no torch
import is required unless tensors actually are torch tensors.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _np(tensor) -> np.ndarray:
    if isinstance(tensor, np.ndarray):
        return tensor
    # torch tensor without importing torch at module scope
    if hasattr(tensor, "detach"):
        return tensor.detach().to("cpu").float().numpy()
    return np.asarray(tensor)


def _kernel(tensor, dtype) -> jnp.ndarray:
    """torch Linear.weight [out, in] -> JAX kernel [in, out]."""
    return jnp.asarray(_np(tensor).T, dtype=dtype)


def _vec(tensor, dtype) -> jnp.ndarray:
    return jnp.asarray(_np(tensor), dtype=dtype)


# ----------------------------------------------------------------------
# LLaMA / Vicuna (HF LlamaForCausalLM state_dict)
# ----------------------------------------------------------------------
def convert_llama_state_dict(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """HF ``LlamaForCausalLM.state_dict()`` -> ``init_llama``-shaped pytree.

    Handles both ``model.``-prefixed (ForCausalLM) and bare (LlamaModel)
    key styles; ``lm_head`` falls back to tied embeddings when absent.
    """
    dt = cfg.dtype
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(key):
        return sd[prefix + key]

    n = cfg.num_layers
    layer_params = {
        "input_layernorm": {"scale": []},
        "q_proj": {"kernel": []},
        "k_proj": {"kernel": []},
        "v_proj": {"kernel": []},
        "o_proj": {"kernel": []},
        "post_attention_layernorm": {"scale": []},
        "gate_proj": {"kernel": []},
        "up_proj": {"kernel": []},
        "down_proj": {"kernel": []},
    }
    for i in range(n):
        base = f"layers.{i}."
        layer_params["input_layernorm"]["scale"].append(
            _vec(g(base + "input_layernorm.weight"), dt)
        )
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            layer_params[name]["kernel"].append(
                _kernel(g(base + f"self_attn.{name}.weight"), dt)
            )
        layer_params["post_attention_layernorm"]["scale"].append(
            _vec(g(base + "post_attention_layernorm.weight"), dt)
        )
        for name in ("gate_proj", "up_proj", "down_proj"):
            layer_params[name]["kernel"].append(
                _kernel(g(base + f"mlp.{name}.weight"), dt)
            )

    stacked = {
        mod: {leaf: jnp.stack(vals, axis=0) for leaf, vals in leaves.items()}
        for mod, leaves in layer_params.items()
    }

    if "lm_head.weight" in sd:
        head = _kernel(sd["lm_head.weight"], dt)
    else:  # tied embeddings
        head = jnp.asarray(_np(g("embed_tokens.weight")).T, dtype=dt)

    return {
        "embed_tokens": {"embedding": _vec(g("embed_tokens.weight"), dt)},
        "layers": stacked,
        "norm": {"scale": _vec(g("norm.weight"), dt)},
        "lm_head": {"kernel": head},
    }


# ----------------------------------------------------------------------
# Q-Former (BLIP-2 checkpoint or HF Blip2QFormerModel state_dict)
# ----------------------------------------------------------------------
def convert_qformer_state_dict(
    sd: Dict[str, Any], cfg, prefix: str = ""
) -> Dict[str, Any]:
    """BLIP-2 Q-Former torch weights -> ``init_qformer``-shaped pytree.

    Accepts both key dialects:
    - the vendored-BERT naming the reference's BLIP-2 checkpoint uses
      (``Qformer.bert.encoder.layer.{i}.attention.self.query...``, plus a
      top-level ``query_tokens``), and
    - HF ``Blip2QFormerModel`` naming
      (``encoder.layer.{i}.attention.attention.query...``, embeddings LN
      at ``layernorm.*``).

    ``prefix`` strips a leading scope (e.g. ``"Qformer.bert."``).
    """
    dt = cfg.dtype
    # query_tokens sits at the checkpoint root, outside any prefix scope
    query_raw = sd.get("query_tokens")
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)} if prefix else dict(sd)
    if query_raw is not None:
        sd["query_tokens"] = query_raw

    hf_style = any("attention.attention.query" in k for k in sd)
    self_scope = "attention.attention" if hf_style else "attention.self"
    cross_scope = "crossattention.attention" if hf_style else "crossattention.self"

    def lin(key):
        return {"kernel": _kernel(sd[key + ".weight"], dt), "bias": _vec(sd[key + ".bias"], dt)}

    def ln(key):
        return {"scale": _vec(sd[key + ".weight"], dt), "bias": _vec(sd[key + ".bias"], dt)}

    if "layernorm.weight" in sd:  # HF Blip2QFormerModel
        emb_ln = ln("layernorm")
    else:
        emb_ln = ln("embeddings.LayerNorm")

    if "query_tokens" in sd:
        query = jnp.asarray(_np(sd["query_tokens"]), dt)
    else:
        # HF stores query tokens on the wrapping Blip2 model; caller must
        # inject them separately in that case.
        query = None

    layers = {}
    for i in range(cfg.num_layers):
        base = f"encoder.layer.{i}."
        lp = {
            "self_q": lin(base + self_scope + ".query"),
            "self_k": lin(base + self_scope + ".key"),
            "self_v": lin(base + self_scope + ".value"),
            "self_out": lin(base + "attention.output.dense"),
            "self_ln": ln(base + "attention.output.LayerNorm"),
            "int_q": lin(base + "intermediate_query.dense"),
            "out_q": lin(base + "output_query.dense"),
            "ffn_ln_q": ln(base + "output_query.LayerNorm"),
        }
        if cfg.has_cross_attention(i):
            lp.update(
                {
                    "cross_q": lin(base + cross_scope + ".query"),
                    "cross_k": lin(base + cross_scope + ".key"),
                    "cross_v": lin(base + cross_scope + ".value"),
                    "cross_out": lin(base + "crossattention.output.dense"),
                    "cross_ln": ln(base + "crossattention.output.LayerNorm"),
                }
            )
        # TEXT feed-forward branch (ref Qformer.py:378-485 intermediate/
        # output) — present unless the checkpoint was pruned the way
        # MiniGPT-4 prunes it (ref minigpt4.py:104-109)
        if base + "intermediate.dense.weight" in sd:
            lp["int_txt"] = lin(base + "intermediate.dense")
            lp["out_txt"] = lin(base + "output.dense")
            lp["ffn_ln_txt"] = ln(base + "output.LayerNorm")
        layers[f"layer_{i}"] = lp

    params = {"embeddings_ln": emb_ln, "layers": layers}
    if query is not None:
        params["query_tokens"] = query
    # text embeddings + causal-LM head (ref BertLMHeadModel surface)
    if "embeddings.word_embeddings.weight" in sd:
        params["word_embeddings"] = {
            "embedding": _vec(sd["embeddings.word_embeddings.weight"], dt)
        }
        params["position_embeddings"] = {
            "embedding": _vec(sd["embeddings.position_embeddings.weight"], dt)
        }
    if "cls.predictions.transform.dense.weight" in sd:
        params["cls_transform"] = {
            "kernel": _kernel(sd["cls.predictions.transform.dense.weight"], dt),
            "bias": _vec(sd["cls.predictions.transform.dense.bias"], dt),
        }
        params["cls_ln"] = {
            "scale": _vec(sd["cls.predictions.transform.LayerNorm.weight"], dt),
            "bias": _vec(sd["cls.predictions.transform.LayerNorm.bias"], dt),
        }
        params["cls_bias"] = _vec(sd["cls.predictions.bias"], dt)
    return params


# ----------------------------------------------------------------------
# EVA ViT (reference eva_vit_g.pth, BEiT-style naming)
# ----------------------------------------------------------------------
def interpolate_pos_embed(
    pos_embed: np.ndarray, target_num_patches: int
) -> np.ndarray:
    """Bicubic-resample the patch-grid position table to a new resolution.

    Reproduces the reference's pos-embed interpolation for 448px inputs
    (ref ``eva_vit.py:383-404``): the cls entry is kept, the patch grid is
    reshaped to 2-D, resized bicubically, and re-flattened. The resize
    goes through torch's ``F.interpolate`` — the kernel the reference
    uses (Keys cubic a=-0.75, align_corners=False); ``jax.image.resize``
    's "bicubic" is the a=-0.5 variant and differs at every position,
    which would put a systematic offset under every converted real
    checkpoint. Falls back to the jax kernel only when torch is absent
    (conversion is offline torch-checkpoint tooling, so it never is in
    practice).
    """
    pos = _np(pos_embed)
    if pos.ndim == 3:
        pos = pos[0]
    num_extra = pos.shape[0] - int(round((pos.shape[0] - 1) ** 0.5)) ** 2
    grid_old = int(round((pos.shape[0] - num_extra) ** 0.5))
    grid_new = int(round(target_num_patches**0.5))
    if grid_old == grid_new:
        return pos[None]
    extra, patch = pos[:num_extra], pos[num_extra:]
    dim = pos.shape[-1]
    patch = np.asarray(patch, np.float32).reshape(grid_old, grid_old, dim)
    try:
        import torch
        import torch.nn.functional as F

        t = torch.from_numpy(patch).permute(2, 0, 1)[None]  # [1, D, G, G]
        r = F.interpolate(
            t, size=(grid_new, grid_new), mode="bicubic",
            align_corners=False,
        )
        resized = r[0].permute(1, 2, 0).numpy()
    except ImportError:  # pragma: no cover - torch is baked into the image
        import jax
        import jax.image

        resized = np.asarray(
            jax.image.resize(
                jnp.asarray(patch), (grid_new, grid_new, dim),
                method="bicubic",
            )
        )
    resized = resized.reshape(grid_new * grid_new, dim)
    return np.concatenate([extra, resized], axis=0)[None]


def convert_eva_vit_state_dict(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Reference ``eva_vit_g.pth`` state_dict -> ``init_eva_vit`` pytree.

    Torch layout: ``patch_embed.proj.weight`` [D, C, P, P] (Conv2d),
    ``blocks.{i}.attn.qkv.weight`` [3D, D] biasless with separate
    ``q_bias``/``v_bias``. Position embeddings are interpolated to the
    configured image size when the checkpoint grid differs.
    """
    dt = cfg.dtype
    d = cfg.embed_dim

    conv = _np(sd["patch_embed.proj.weight"])  # [D, C, P, P]
    patch_kernel = jnp.asarray(conv.reshape(d, -1).T, dt)  # [C*P*P, D]

    pos = interpolate_pos_embed(sd["pos_embed"], cfg.num_patches)

    def lin(key):
        return {"kernel": _kernel(sd[key + ".weight"], dt), "bias": _vec(sd[key + ".bias"], dt)}

    def ln(key):
        return {"scale": _vec(sd[key + ".weight"], dt), "bias": _vec(sd[key + ".bias"], dt)}

    per_layer = []
    for i in range(cfg.depth):
        base = f"blocks.{i}."
        per_layer.append(
            {
                "norm1": ln(base + "norm1"),
                "qkv": {"kernel": _kernel(sd[base + "attn.qkv.weight"], dt)},
                "q_bias": _vec(sd[base + "attn.q_bias"], dt),
                "v_bias": _vec(sd[base + "attn.v_bias"], dt),
                "proj": lin(base + "attn.proj"),
                "norm2": ln(base + "norm2"),
                "fc1": lin(base + "mlp.fc1"),
                "fc2": lin(base + "mlp.fc2"),
            }
        )
    stacked = {}
    for mod in per_layer[0]:
        if isinstance(per_layer[0][mod], dict):
            stacked[mod] = {
                leaf: jnp.stack([p[mod][leaf] for p in per_layer], axis=0)
                for leaf in per_layer[0][mod]
            }
        else:
            stacked[mod] = jnp.stack([p[mod] for p in per_layer], axis=0)

    return {
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": _vec(sd["patch_embed.proj.bias"], dt),
        },
        "cls_token": _vec(sd["cls_token"], dt),
        "pos_embed": jnp.asarray(pos, dt),
        "layers": stacked,
    }
