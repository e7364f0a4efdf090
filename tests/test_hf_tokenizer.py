"""Fixed-shape text batching with a REAL HuggingFace fast tokenizer.

Round 1 validated the batch builders with the byte tokenizer only; this
builds a genuine BPE ``PreTrainedTokenizerFast`` (trained in-test), loads
it through ``HFTokenizer`` (the path real Vicuna checkpoints take,
ref ``base_model.py:181-191``) and checks the segment-tokenization
layout invariants around ``<ImageHere>`` (ref ``minigpt_base.py:75-89``
tokenizes prompt segments separately, exactly like ``_split_instruction``).
"""

import numpy as np
import pytest

from certifiedgpt_tpu.data.text import (
    IGNORE_INDEX,
    BatchSpec,
    HFTokenizer,
    build_gen_batch,
    build_train_batch,
)

pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [
        "what is the animal in the picture?",
        "describe this image in detail please",
        "a cat sits on the mat",
        "the dog runs fast",
        "yes no maybe two three blue red <Img> </Img> [vqa]",
    ] * 4
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<unk>", "<s>", "</s>", "$$"]
    )
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
    )
    path = tmp_path_factory.mktemp("tok") / "hf"
    fast.save_pretrained(str(path))
    return HFTokenizer(str(path))


def test_hf_tokenizer_llama_conventions(hf_tok):
    # pad_token fallback "$$" (ref base_model.py:191)
    assert hf_tok.pad_token_id is not None
    assert hf_tok.bos_token_id != hf_tok.eos_token_id
    ids = hf_tok.encode("a cat sits on the mat")
    assert ids and hf_tok.bos_token_id not in ids  # no specials by default
    assert "cat" in hf_tok.decode(ids)


def test_gen_batch_layout_with_hf_tokenizer(hf_tok):
    spec = BatchSpec(seq_len=48, num_img_tokens=8)
    instr = "<Img><ImageHere></Img> [vqa] what is the animal in the picture?"
    batch = build_gen_batch(hf_tok, [instr], spec)
    ids = batch["input_ids"][0]
    mask = batch["attention_mask"][0]
    pos = int(batch["img_pos"][0])
    pad_start = int(np.argmax(mask))  # left padding
    assert ids[pad_start] == hf_tok.bos_token_id
    # the 8 image slots hold pad ids inside the valid region
    assert np.all(ids[pos : pos + 8] == hf_tok.pad_token_id)
    assert np.all(mask[pos : pos + 8] == 1)
    # segments re-decode to the original text around the placeholder
    before = hf_tok.decode(
        [int(t) for t in ids[pad_start + 1 : pos]], skip_special_tokens=True
    )
    after = hf_tok.decode(
        [int(t) for t in ids[pos + 8 :]], skip_special_tokens=True
    )
    assert before.strip() == "<Img>"
    assert after.strip() == "</Img> [vqa] what is the animal in the picture?"


def test_train_batch_labels_with_hf_tokenizer(hf_tok):
    spec = BatchSpec(seq_len=48, num_img_tokens=8, max_answer_len=12)
    batch = build_train_batch(
        hf_tok,
        ["<Img><ImageHere></Img> what is this?"],
        ["a cat sits"],
        spec,
    )
    labels = batch["labels"][0]
    valid = [int(t) for t in labels if t != IGNORE_INDEX]
    assert valid[-1] == hf_tok.eos_token_id
    assert hf_tok.decode(valid[:-1], skip_special_tokens=True).strip() == "a cat sits"
