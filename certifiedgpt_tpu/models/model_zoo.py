"""Registry-facing model wrapper.

The reference builds its model via
``registry.get_model_class("minigpt4").from_config(cfg.model)``
(ref ``minigpt4.py:151-199``). This wrapper keeps that public surface on
top of the functional core: it resolves YAML model-block keys to the
dataclass configs, loads/converts the four torch checkpoint families when
paths are configured (Vicuna HF dir, eva_vit_g.pth, BLIP-2 Q-Former,
MiniGPT-4 stage-2), and falls back to seeded random init otherwise (tiny
configs for tests / dry runs).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from certifiedgpt_tpu.common.logging import get_logger
from certifiedgpt_tpu.common.registry import registry
from certifiedgpt_tpu.data.text import ByteTokenizer, HFTokenizer
from certifiedgpt_tpu.models.convert import (
    convert_eva_vit_state_dict,
    convert_llama_state_dict,
    convert_qformer_state_dict,
)
from certifiedgpt_tpu.models.eva_vit import EvaViTConfig
from certifiedgpt_tpu.models.llama import LlamaConfig
from certifiedgpt_tpu.models.minigpt4 import (
    MiniGPT4Config,
    init_minigpt4,
)
from certifiedgpt_tpu.models.qformer import QFormerConfig


def _torch_load(path: str):
    """Tensor-safe first, full-pickle fallback.

    ``weights_only=True`` covers plain tensor checkpoints without
    enabling arbitrary-code pickle deserialization; LAVIS-style
    checkpoints that pickle config objects alongside the tensors fail
    that mode, so those fall back to ``weights_only=False`` — which is
    only safe because checkpoint paths come from the user's own
    configs/env vars and are trusted local research files (the trust
    assumption is documented in docs/DESIGN.md §4; the reference does a
    plain ``torch.load``, ref ``base_model.py:60``).
    """
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)


def _resolve(path) -> Optional[str]:
    """URL-or-path -> existing local path, else None
    (ref ``base_model.py:41-68`` URL/file checkpoint loading)."""
    if not path:
        return None
    from certifiedgpt_tpu.common.utils import is_url, resolve_checkpoint

    path = str(path)
    if is_url(path):
        try:
            return resolve_checkpoint(path)
        except Exception as exc:
            get_logger().warning("checkpoint download failed (%s): %s", path, exc)
            return None
    return path if os.path.exists(path) else None


def load_prompt_pool(prompt_path, prompt_template="{}"):
    """Load the alignment prompt pool (ref ``minigpt4.py:80-88``): keep
    only lines containing ``<ImageHere>`` and wrap each in the template.
    Returns [] when no path is configured or the file is missing."""
    if not prompt_path:
        return []
    path = str(prompt_path)
    if not os.path.exists(path):
        get_logger().warning("prompt_path %s not found; no prompt pool", path)
        return []
    with open(path, "r") as handle:
        raw = [line.strip() for line in handle if "<ImageHere>" in line]
    template = str(prompt_template or "{}")
    return [template.format(p) for p in raw]


def load_model(name: str, model_cfg=None):
    """Model-zoo loader (ref ``graphs/models/minigpt4/models/__init__.py:26-199``
    surface): resolve a registered model by name and build it from config."""
    model_cls = registry.get_model_class(name)
    if model_cls is None:
        raise KeyError(
            f"Unknown model '{name}'. Available: {registry.list_models()}"
        )
    from certifiedgpt_tpu.common.config import ConfigNode

    return model_cls.from_config(model_cfg or ConfigNode({"model_size": "tiny"}))


def load_preprocess(preprocess_cfg=None):
    """Build (vis_processors, text_processors) dicts keyed by split."""
    import certifiedgpt_tpu.data.processors  # noqa: F401 — registration

    cfg = preprocess_cfg or {}
    vis, text = {}, {}
    for split, default in (("train", "blip2_image_train"), ("eval", "blip2_image_val")):
        block = (cfg.get("vis_processor") or {}).get(split, {"name": default})
        vis[split] = registry.get_processor_class(block["name"]).from_config(block)
    for split in ("train", "eval"):
        block = (cfg.get("text_processor") or {}).get(split, {"name": "blip_caption"})
        text[split] = registry.get_processor_class(block["name"]).from_config(block)
    return vis, text


def load_model_and_preprocess(name: str, model_cfg=None, preprocess_cfg=None):
    model = load_model(name, model_cfg)
    vis, text = load_preprocess(preprocess_cfg)
    return model, vis, text


class ModelZoo:
    """Pretty listing of registered models (ref ModelZoo)."""

    def __repr__(self) -> str:
        rows = ["=" * 40, f"{'Architectures':<30}", "=" * 40]
        rows += [f"{name:<30}" for name in registry.list_models()]
        return "\n".join(rows)

    def __iter__(self):
        return iter(registry.list_models())

    def __len__(self):
        return len(registry.list_models())


model_zoo = ModelZoo()


@registry.register_model("minigpt4")
class MiniGPT4Model:
    """Holds (cfg, params, tokenizer); compute lives in
    ``certifiedgpt_tpu.models.minigpt4`` pure functions."""

    def __init__(
        self,
        cfg: MiniGPT4Config,
        params: Dict[str, Any],
        tokenizer,
        prompt_list=(),
    ):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        # alignment prompt pool (ref minigpt4.py:41,80-88); datasets that
        # lack per-sample instructions draw from it (agents inject it)
        self.prompt_list = list(prompt_list)

    # ------------------------------------------------------------------
    @classmethod
    def from_config(cls, model_cfg) -> "MiniGPT4Model":
        logger = get_logger()
        size = model_cfg.get("model_size", "full")
        seed = int(model_cfg.get("init_seed", 0))

        if size == "tiny":
            cfg = MiniGPT4Config.tiny()
        else:
            image_size = int(model_cfg.get("image_size", 448))
            num_query = int(model_cfg.get("num_query_token", 32))
            cfg = MiniGPT4Config(
                vit=EvaViTConfig(
                    img_size=image_size,
                    # "flash" = jax's TPU flash kernel with full-sequence
                    # blocks (2.2x over XLA at 448px; XLA fallback off-TPU)
                    attn_impl=str(model_cfg.get("vit_attn_impl", "xla")),
                ),
                qformer=QFormerConfig(num_query_tokens=num_query),
                llama=LlamaConfig(),
                max_txt_len=int(model_cfg.get("max_txt_len", 160)),
            )

        # Serving-mode knobs: model.act_quant = W8A8 (dynamic per-row
        # int8 activations against int8 kernels on compute-bound calls —
        # requires quantize_llama / quantize_vit so the kernels are
        # int8); model.kv_quant = int8 KV cache (halves the decode-time
        # cache stream and footprint, models/llama.py::init_kv_cache)
        aq = bool(model_cfg.get("act_quant", False))
        kvq = bool(model_cfg.get("kv_quant", False))
        # Training-memory knobs: model.remat reruns decoder blocks on
        # backward; model.remat_policy ("full"/"dots"/"dots_all") and
        # model.remat_every (checkpoint every k-th block only) trade the
        # recompute against activation HBM — measured policy sweep in
        # docs/DESIGN.md (models/llama.py::_REMAT_POLICIES)
        remat = bool(model_cfg.get("remat", False))
        # model.max_position_embeddings: rotary table length (the HF
        # llama config key); positions past it fail loudly in the loss
        # path instead of NaN-ing (models/minigpt4.minigpt4_loss)
        mpe = model_cfg.get("max_position_embeddings")
        if aq or kvq or remat or mpe:
            import dataclasses

            cfg = dataclasses.replace(
                cfg,
                vit=dataclasses.replace(cfg.vit, act_quant=aq),
                llama=dataclasses.replace(
                    cfg.llama,
                    act_quant=aq,
                    kv_quant=kvq,
                    remat=remat,
                    remat_policy=str(
                        model_cfg.get("remat_policy", "full")
                    ),
                    remat_every=int(model_cfg.get("remat_every", 1)),
                    max_position_embeddings=(
                        int(mpe) if mpe
                        else cfg.llama.max_position_embeddings
                    ),
                ),
            )

        # resolve the big-tower checkpoints BEFORE init so the towers
        # being loaded are never randomly initialized first (a full-size
        # random LLaMA+ViT is ~16 GB of bf16 that would briefly coexist
        # with the converted weights and waste minutes of trunc_normal)
        llama_path = model_cfg.get("llama_model")
        load_llama = bool(llama_path and os.path.exists(str(llama_path)))
        vit_path = _resolve(
            model_cfg.get("eva_vit_g_pth") or model_cfg.get("vit_ckpt")
        )
        skip = tuple(
            name
            for name, loading in (("llama", load_llama), ("vit", bool(vit_path)))
            if loading
        )
        params = init_minigpt4(jax.random.PRNGKey(seed), cfg, skip=skip)

        if load_llama:
            logger.info("Loading LLaMA weights from %s", llama_path)
            params["llama"] = cls._load_llama(str(llama_path), cfg.llama)
            tokenizer = HFTokenizer(str(llama_path))
        else:
            if llama_path:
                logger.warning(
                    "llama_model path %s not found; using random init", llama_path
                )
            tokenizer = ByteTokenizer()

        if vit_path:
            logger.info("Loading EVA ViT weights from %s", vit_path)
            params["vit"] = convert_eva_vit_state_dict(
                _torch_load(str(vit_path)), cfg.vit
            )

        qformer_path = _resolve(
            model_cfg.get("q_former_model") or model_cfg.get("qformer_ckpt")
        )
        if qformer_path:
            logger.info("Loading Q-Former weights from %s", qformer_path)
            sd = _torch_load(str(qformer_path))
            sd = sd.get("model", sd)
            # convert_qformer_state_dict extracts the checkpoint-root
            # query_tokens itself (convert.py); keep the random init only
            # when the checkpoint genuinely lacks them
            converted = convert_qformer_state_dict(
                sd, cfg.qformer, prefix="Qformer.bert."
            )
            converted.setdefault("query_tokens", params["qformer"]["query_tokens"])
            params["qformer"] = converted

        # stage-2 MiniGPT-4 checkpoint: llama_proj (+ possibly ln_vision)
        ckpt = _resolve(model_cfg.get("ckpt") or model_cfg.get("minigpt4_ckpt"))
        if ckpt:
            logger.info("Loading MiniGPT-4 stage-2 checkpoint from %s", ckpt)
            sd = _torch_load(str(ckpt))
            sd = sd.get("model_state_dict", sd.get("model", sd))
            cls._load_projection(params, sd)

        if model_cfg.get("quantize_llama", False):
            # weight-only int8 decoder: ~2x HBM saving so the full 8B
            # pipeline fits a single 16GB chip (ops/quantization.py)
            from certifiedgpt_tpu.ops.quantization import quantize_llama

            logger.info("Quantizing decoder weights to int8")
            params["llama"] = quantize_llama(params["llama"])

        if model_cfg.get("quantize_vit", False):
            # int8 qkv/proj/fc1/fc2 vision kernels; combined with
            # act_quant the ViT matmuls run on the MXU int8 path
            # (docs/DESIGN.md)
            from certifiedgpt_tpu.ops.quantization import quantize_eva_vit

            logger.info("Quantizing ViT qkv/proj/fc1/fc2 kernels to int8")
            params["vit"] = quantize_eva_vit(params["vit"])

        prompt_list = load_prompt_pool(
            model_cfg.get("prompt_path"), model_cfg.get("prompt_template", "{}")
        )
        if prompt_list:
            logger.info("Loaded %d alignment prompts", len(prompt_list))

        return cls(cfg, params, tokenizer, prompt_list=prompt_list)

    # ------------------------------------------------------------------
    @staticmethod
    def _load_llama(path: str, cfg: LlamaConfig) -> Dict[str, Any]:
        """Load an HF LLaMA dir.

        Prefers streaming tensors straight out of safetensors shards —
        peak host memory is one tensor, not the whole 13 GB model the
        reference pays per process (SURVEY.md §3.4). Falls back to
        ``from_pretrained`` for torch-pickle-only checkpoints.
        """
        import glob

        st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if st_files:
            from safetensors import safe_open

            # framework="pt": torch tensors view bf16 shards without copy;
            # the converter upcasts per-tensor.
            sd: Dict[str, Any] = {}
            for file in st_files:
                handle = safe_open(file, framework="pt")
                for key in handle.keys():
                    sd[key] = handle.get_tensor(key)
            return convert_llama_state_dict(sd, cfg)

        from transformers import AutoModelForCausalLM

        model = AutoModelForCausalLM.from_pretrained(path)
        return convert_llama_state_dict(model.state_dict(), cfg)

    def encode_img(self, images):
        from certifiedgpt_tpu.models.minigpt4 import encode_img

        return encode_img(self.params, self.cfg, images)

    @staticmethod
    def _load_projection(params: Dict[str, Any], sd: Dict[str, Any]) -> None:
        # convert.py's _np/_kernel/_vec own tensor conversion (they also
        # accept numpy values and non-CPU tensors — hand-rolled
        # .detach().numpy() here would not)
        from certifiedgpt_tpu.models.convert import _kernel, _vec

        for key, value in sd.items():
            if key.endswith("llama_proj.weight"):
                params["llama_proj"]["kernel"] = _kernel(value, jnp.float32)
            elif key.endswith("llama_proj.bias"):
                params["llama_proj"]["bias"] = _vec(value, jnp.float32)
            elif key.endswith("ln_vision.weight"):
                params["ln_vision"]["scale"] = _vec(
                    value, params["ln_vision"]["scale"].dtype
                )
            elif key.endswith("ln_vision.bias"):
                params["ln_vision"]["bias"] = _vec(
                    value, params["ln_vision"]["bias"].dtype
                )
