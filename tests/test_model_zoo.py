import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certifiedgpt_tpu.common.config import ConfigNode
from certifiedgpt_tpu import registration  # noqa: F401
from certifiedgpt_tpu.common.utils import is_url, resolve_checkpoint
from certifiedgpt_tpu.models.model_zoo import (
    MiniGPT4Model,
    load_model,
    load_model_and_preprocess,
    model_zoo,
)


def test_model_zoo_listing():
    assert "minigpt4" in list(model_zoo)
    assert len(model_zoo) >= 1
    assert "minigpt4" in repr(model_zoo)


def test_load_model_and_preprocess_tiny():
    model, vis, text = load_model_and_preprocess(
        "minigpt4", ConfigNode({"model_size": "tiny"})
    )
    assert model.cfg.llama.hidden_size == 64
    out = vis["eval"](np.zeros((32, 32, 3), np.uint8))
    assert out.shape == (448, 448, 3)
    assert text["train"]("A Cat!") == "a cat"


def test_is_url():
    assert is_url("https://example.com/ckpt.pth")
    assert not is_url("/local/path.pth")
    assert resolve_checkpoint("/local/path.pth") == "/local/path.pth"


def test_streaming_safetensors_llama_load(tmp_path):
    """Weights loaded shard-by-shard from safetensors match from_pretrained."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=32, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg)
    hf.save_pretrained(tmp_path, safe_serialization=True)
    assert any(f.endswith(".safetensors") for f in os.listdir(tmp_path))

    from certifiedgpt_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32, num_layers=2,
        num_heads=2, num_kv_heads=2, max_position_embeddings=32,
        dtype=jnp.float32,
    )
    params = MiniGPT4Model._load_llama(str(tmp_path), cfg)
    ref = hf.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["embed_tokens"]["embedding"]),
        ref["model.embed_tokens.weight"].numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["layers"]["q_proj"]["kernel"][1]),
        ref["model.layers.1.self_attn.q_proj.weight"].numpy().T,
        atol=1e-6,
    )
