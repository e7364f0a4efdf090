"""Token-level parity of ``generate`` knobs vs HF ``transformers``.

The reference decodes through HF ``llama_model.generate(inputs_embeds=...)``
(ref ``minigpt_base.py:414-427``). With ``inputs_embeds`` (no input_ids),
HF's repetition penalty sees ONLY the generated tokens — so seeding the
count table at zero after prefill (models/minigpt4.py generate) is the
reference-faithful behavior, not a divergence. These tests pin that and
the greedy / repetition-penalty / min-length knobs against HF generate on
identical prompt embeddings.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certifiedgpt_tpu.data.text import BatchSpec, ByteTokenizer, build_gen_batch
from certifiedgpt_tpu.models.convert import convert_llama_state_dict
from certifiedgpt_tpu.models.minigpt4 import (
    MiniGPT4Config,
    assemble_embeds,
    encode_img,
    generate,
    init_minigpt4,
)

torch = pytest.importorskip("torch")

MAX_NEW = 6


@pytest.fixture(scope="module")
def setup():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    cfg = MiniGPT4Config.tiny()
    lc = cfg.llama
    hf_cfg = HFConfig(
        vocab_size=lc.vocab_size,
        hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_layers,
        num_attention_heads=lc.num_heads,
        num_key_value_heads=lc.num_kv_heads,
        max_position_embeddings=lc.max_position_embeddings,
        rms_norm_eps=lc.rms_norm_eps,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    params["llama"] = convert_llama_state_dict(hf.state_dict(), lc)

    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=32, num_img_tokens=cfg.num_img_tokens)
    text = build_gen_batch(
        tok,
        ["<Img><ImageHere></Img> what?", "<Img><ImageHere></Img> hi"],
        spec,
    )
    rng = np.random.RandomState(1)
    images = rng.randn(2, cfg.vit.img_size, cfg.vit.img_size, 3).astype(np.float32)

    batch = {k: jnp.asarray(v) for k, v in text.items()}
    batch["image"] = jnp.asarray(images)

    # identical prompt embeddings for both sides
    img_embeds = encode_img(params, cfg, batch["image"])
    embeds = assemble_embeds(
        params, cfg, batch["input_ids"], img_embeds, batch["img_pos"]
    )
    embeds_t = torch.tensor(np.asarray(embeds, np.float32))
    mask_t = torch.tensor(text["attention_mask"].astype(np.int64))
    return cfg, params, batch, hf, embeds_t, mask_t, tok


def _hf_generate(hf, embeds_t, mask_t, tok, **knobs):
    with torch.no_grad():
        out = hf.generate(
            inputs_embeds=embeds_t,
            attention_mask=mask_t,
            max_new_tokens=MAX_NEW,
            do_sample=False,
            eos_token_id=tok.eos_token_id,
            pad_token_id=tok.pad_token_id,
            **knobs,
        )
    return np.asarray(out)  # with inputs_embeds, rows are new tokens only


def _trim(row, eos):
    row = list(row)
    return row[: row.index(eos) + 1] if eos in row else row


def _assert_rows_equal(ours, ref, eos):
    for i in range(ours.shape[0]):
        assert _trim(ours[i], eos) == _trim(ref[i], eos), (
            i, ours[i].tolist(), ref[i].tolist()
        )


def test_greedy_matches_hf(setup):
    cfg, params, batch, hf, embeds_t, mask_t, tok = setup
    ours = np.asarray(
        generate(params, cfg, batch, MAX_NEW, tok.eos_token_id, tok.pad_token_id)
    )
    ref = _hf_generate(hf, embeds_t, mask_t, tok)
    _assert_rows_equal(ours, ref, tok.eos_token_id)


def test_repetition_penalty_matches_hf(setup):
    """Pin the count-from-zero (inputs_embeds) repetition semantics."""
    cfg, params, batch, hf, embeds_t, mask_t, tok = setup
    ours = np.asarray(
        generate(
            params, cfg, batch, MAX_NEW, tok.eos_token_id, tok.pad_token_id,
            repetition_penalty=1.5,
        )
    )
    ref = _hf_generate(hf, embeds_t, mask_t, tok, repetition_penalty=1.5)
    _assert_rows_equal(ours, ref, tok.eos_token_id)
    # the knob must actually change something vs greedy on this model
    base = _hf_generate(hf, embeds_t, mask_t, tok)
    assert not np.array_equal(ref, base)


def test_min_length_blocks_early_eos_like_hf(setup):
    """min_length == HF min_new_tokens: treat the greedy first token as
    EOS and check both sides suppress it for the same number of steps."""
    cfg, params, batch, hf, embeds_t, mask_t, tok = setup
    greedy = np.asarray(
        generate(params, cfg, batch, MAX_NEW, tok.eos_token_id, tok.pad_token_id)
    )
    fake_eos = int(greedy[0, 0])
    ours = np.asarray(
        generate(
            params, cfg, batch, MAX_NEW, fake_eos, tok.pad_token_id,
            min_length=3,
        )
    )
    with torch.no_grad():
        ref = np.asarray(
            hf.generate(
                inputs_embeds=embeds_t,
                attention_mask=mask_t,
                max_new_tokens=MAX_NEW,
                min_new_tokens=3,
                do_sample=False,
                eos_token_id=fake_eos,
                pad_token_id=tok.pad_token_id,
            )
        )
    _assert_rows_equal(ours, ref, fake_eos)
