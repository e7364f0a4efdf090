"""Train-side sequence packing (``run.pack_sequences``).

Real VQA samples fill far less than the padded training row (the bench
prompt fills 80/96 at eval), so the decoder burns most of its tokens on
pad. ``data/text.pack_train_batch`` packs K samples per row behind a
block-diagonal causal mask with per-segment rotary positions; these
tests pin that the packed loss (and the trainable gradients) are the
UNPACKED loss on the same samples — packing must be a pure
throughput/memory transform, never a semantics change (ref CE semantics:
label-smoothed, answer-tokens-only —
ref graphs/models/minigpt4/models/modeling_llama.py:105-123).
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from certifiedgpt_tpu.data.text import (
    BatchSpec,
    ByteTokenizer,
    IGNORE_INDEX,
    build_train_batch,
    pack_train_batch,
)
from certifiedgpt_tpu.models.minigpt4 import (
    MiniGPT4Config,
    init_minigpt4,
    minigpt4_loss,
)

# short samples (~26 byte-tokens each) so even pack=4 fits the tiny
# decoder's max_position_embeddings=128 without truncation; 12 samples
# so every shipped pack factor (2, 3, 4) divides the batch
INSTRUCTIONS = [f"<Img><ImageHere></Img>Q{i}?" for i in range(12)]
ANSWERS = ["cat", "dog", "two", "sky", "red", "one",
           "bus", "hat", "six", "cup", "yes", "no"]


@pytest.fixture(scope="module")
def tiny_fp32():
    """Tiny model in fp32 so packed-vs-unpacked parity is tight (bf16
    would add reordering noise on top of the semantics under test)."""
    cfg = MiniGPT4Config.tiny()
    cfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, dtype=jnp.float32)
    )
    params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batches(cfg, pack=2, seq_len=None):
    # every sample is ~26 tokens with the byte tokenizer; give each
    # packed segment comfortable room so parity is tested WITHOUT
    # truncation (truncation behavior has its own builder tests), while
    # staying under the tiny decoder's max_position_embeddings=128
    if seq_len is None:
        seq_len = 30 * pack
    tok = ByteTokenizer()
    spec = BatchSpec(
        seq_len=seq_len, num_img_tokens=cfg.num_img_tokens, max_answer_len=16
    )
    unpacked = build_train_batch(tok, INSTRUCTIONS, ANSWERS, spec)
    packed = pack_train_batch(tok, INSTRUCTIONS, ANSWERS, spec, pack)
    rng = np.random.RandomState(0)
    images = rng.randn(
        len(INSTRUCTIONS), cfg.vit.img_size, cfg.vit.img_size, 3
    ).astype(np.float32)
    return (
        {**unpacked, "image": images},
        {**packed, "image": images},
    )


def test_pack_builder_layout():
    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=96, num_img_tokens=4, max_answer_len=16)
    unpacked = build_train_batch(tok, INSTRUCTIONS, ANSWERS, spec)
    packed = pack_train_batch(tok, INSTRUCTIONS, ANSWERS, spec, 2)

    rows = len(INSTRUCTIONS) // 2
    assert packed["input_ids"].shape == (rows, 96)
    assert packed["img_pos"].shape == (rows, 2)
    for r in range(rows):
        cur = 0
        for j in range(2):
            i = r * 2 + j
            n = int(unpacked["attention_mask"][i].sum())
            seg = slice(cur, cur + n)
            # tokens, labels and the image span are the unpacked sample's
            np.testing.assert_array_equal(
                packed["input_ids"][r, seg], unpacked["input_ids"][i, :n]
            )
            np.testing.assert_array_equal(
                packed["labels"][r, seg], unpacked["labels"][i, :n]
            )
            assert (packed["segment_ids"][r, seg] == j + 1).all()
            # rotary positions restart per segment
            np.testing.assert_array_equal(
                packed["positions"][r, seg], np.arange(n)
            )
            assert (
                packed["img_pos"][r, j] == cur + unpacked["img_pos"][i]
            )
            cur += n
        # the tail is pad: segment 0, masked, unsupervised
        assert (packed["segment_ids"][r, cur:] == 0).all()
        assert (packed["attention_mask"][r, cur:] == 0).all()
        assert (packed["labels"][r, cur:] == IGNORE_INDEX).all()

    # identical supervised token multiset
    sup_u = unpacked["labels"][unpacked["labels"] != IGNORE_INDEX]
    sup_p = packed["labels"][packed["labels"] != IGNORE_INDEX]
    np.testing.assert_array_equal(np.sort(sup_u), np.sort(sup_p))


def test_pack_long_sample_cannot_starve_its_row_mates():
    """Every segment gets the same seq_len//pack budget: an oversized
    first sample truncates ITSELF (post-image text, loud warning) and
    its row-mates are assembled untouched — whether a config fits is
    never a function of the data."""
    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=96, num_img_tokens=4, max_answer_len=16)
    long_q = "<Img><ImageHere></Img>" + "why? " * 40  # >> 48-slot budget
    packed = pack_train_batch(
        tok, [long_q, INSTRUCTIONS[1]], [ANSWERS[0], ANSWERS[1]], spec, 2
    )
    # segment 1 is capped at 48 slots; segment 2 is the full short sample
    seg1 = packed["segment_ids"][0] == 1
    seg2 = packed["segment_ids"][0] == 2
    assert seg1.sum() == 48
    ref = build_train_batch(tok, INSTRUCTIONS[1:2], ANSWERS[1:2], spec)
    n = int(ref["attention_mask"][0].sum())
    assert seg2.sum() == n
    np.testing.assert_array_equal(
        packed["input_ids"][0][seg2], ref["input_ids"][0, :n]
    )
    # the long sample's supervised answer survives its own truncation
    sup1 = packed["labels"][0][seg1]
    assert (sup1 != IGNORE_INDEX).sum() > 0


def test_packed_rotary_overflow_fails_loud(tiny_fp32):
    """seq_len//pack past the rotary table must raise at trace time —
    per-segment positions restart at 0 but are bounded only by the
    seq_len//pack segment budget, and jnp.take's fill mode would
    otherwise silently NaN the loss (the unpacked branch has the same
    guard on seq_len itself)."""
    cfg, params = tiny_fp32
    max_pos = cfg.llama.max_position_embeddings
    _, packed = _batches(cfg, pack=2, seq_len=2 * (max_pos + 16))
    with pytest.raises(ValueError, match="max_position_embeddings"):
        minigpt4_loss(params, cfg, packed)


def test_pack_builder_rejects_bad_shapes():
    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=96, num_img_tokens=4, max_answer_len=16)
    with pytest.raises(ValueError, match="divisible"):
        pack_train_batch(tok, INSTRUCTIONS[:3], ANSWERS[:3], spec, 2)
    with pytest.raises(ValueError, match="pack_sequences"):
        pack_train_batch(tok, INSTRUCTIONS, ANSWERS, spec, 0)
    # a row too small for even one bos+image+answer per segment is loud
    tight = BatchSpec(seq_len=10, num_img_tokens=8, max_answer_len=16)
    with pytest.raises(ValueError, match="cannot hold"):
        pack_train_batch(tok, INSTRUCTIONS[:2], ANSWERS[:2], tight, 2)


@pytest.mark.parametrize("pack", [2, 3, 4])
def test_packed_loss_matches_unpacked(tiny_fp32, pack):
    """The packed forward must reproduce the unpacked loss on the same
    samples: same supervised tokens, per-segment positions, block-
    diagonal attention — a pure layout transform."""
    cfg, params = tiny_fp32
    unpacked, packed = _batches(cfg, pack=pack)
    loss_u = minigpt4_loss(params, cfg, unpacked)
    loss_p = minigpt4_loss(params, cfg, packed)
    np.testing.assert_allclose(float(loss_u), float(loss_p), rtol=2e-5)


def test_packed_grads_match_unpacked(tiny_fp32):
    """Trainable (llama_proj) gradients are identical packed vs unpacked
    — training on packed rows IS training on the samples."""
    from certifiedgpt_tpu.models.minigpt4 import merge_params, split_params

    cfg, params = tiny_fp32
    unpacked, packed = _batches(cfg, pack=2)
    trainable, frozen = split_params(params)

    def loss_of(batch):
        def fn(tr):
            return minigpt4_loss(merge_params(tr, frozen), cfg, batch)

        return jax.grad(fn)(trainable)

    g_u = loss_of(unpacked)
    g_p = loss_of(packed)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_u),
        jax.tree_util.tree_leaves_with_path(g_p),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}",
        )


def test_unpacked_loss_rejects_seq_len_past_rotary_table(tiny_fp32):
    """seq_len > max_position_embeddings must raise loudly: jnp.take's
    fill mode would otherwise return NaN rotary entries for every
    position past the table and the loss would silently train on NaN
    (found by this suite's first packed-parity run)."""
    cfg, params = tiny_fp32
    unpacked, _ = _batches(
        cfg, pack=2, seq_len=cfg.llama.max_position_embeddings + 16
    )
    with pytest.raises(ValueError, match="max_position_embeddings"):
        minigpt4_loss(params, cfg, unpacked)


def test_segment_ids_rejected_in_cached_mode(tiny_fp32):
    from certifiedgpt_tpu.models.llama import (
        embed_tokens,
        init_kv_cache,
        llama_apply,
    )

    cfg, params = tiny_fp32
    lcfg = cfg.llama
    b, s = 1, 8
    ids = jnp.zeros((b, s), jnp.int32)
    x = embed_tokens(params["llama"], ids)
    cache = init_kv_cache(lcfg, b, 16)
    with pytest.raises(ValueError, match="unpacked"):
        llama_apply(
            params["llama"], lcfg, x,
            jnp.ones((b, 16), jnp.int32),
            jnp.broadcast_to(jnp.arange(s), (b, s)),
            kv_cache=cache, cache_offset=jnp.int32(0),
            segment_ids=jnp.ones((b, s), jnp.int32),
        )


# ----------------------------------------------------------------------
# agent plumbing
# ----------------------------------------------------------------------
@pytest.fixture()
def pack_run(tmp_path):
    from PIL import Image

    from certifiedgpt_tpu import registration  # noqa: F401
    from certifiedgpt_tpu.common.config import Config

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(16):
        image_id = 2000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            img_dir / f"COCO_train2014_{image_id:012d}.jpg"
        )
        Image.fromarray(arr).save(
            img_dir / f"COCO_val2014_{image_id:012d}.jpg"
        )
        qid = i + 1
        questions.append(
            {"question_id": qid, "image_id": image_id,
             "question": f"what is {i}?"}
        )
        annotations.append(
            {"question_id": qid, "image_id": image_id,
             "answers": [{"answer": "cat", "answer_confidence": "yes"}]}
        )
    (tmp_path / "q.json").write_text(json.dumps({"questions": questions}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": annotations}))

    def make(model_overrides=None, **run_overrides):
        run = {
            "agent": "image_text_finetune",
            "max_epoch": 1,
            "batch_size": 8,
            "seq_len": 64,
            "noise_level": 0.5,
            "iters_per_epoch": 2,
            "has_val_split": False,
            "output_dir": str(tmp_path / "out"),
            "seed": 7,
        }
        run.update(run_overrides)
        return Config(
            {
                "model": {
                    "arch": "minigpt4", "model_size": "tiny",
                    **(model_overrides or {}),
                },
                "datasets": {
                    "vqav2": {
                        "vis_processor": {
                            "train": {
                                "name": "blip2_image_train", "image_size": 28
                            },
                            "val": {
                                "name": "blip2_image_val", "image_size": 28
                            },
                        },
                        "text_processor": {
                            "train": {"name": "blip_caption"}
                        },
                        "build_info": {
                            "images": {"storage": str(img_dir)},
                            "questions": {
                                "train": [str(tmp_path / "q.json")],
                                "val": [str(tmp_path / "q.json")],
                            },
                            "annotations": {
                                "train": [str(tmp_path / "a.json")],
                                "val": [str(tmp_path / "a.json")],
                            },
                        },
                    }
                },
                "run": run,
            }
        )

    return make, tmp_path


def test_finetune_agent_pack_sequences_loss_parity(pack_run, tmp_path):
    """run.pack_sequences through the agent: same seed, same data — the
    packed run's per-epoch losses must match the unpacked run's (the
    same samples are supervised; only the row layout changes)."""
    from certifiedgpt_tpu.agents.base import setup_agent

    make, tmp = pack_run
    # the templated VQA sample is ~108 byte-tokens: unpacked fits a
    # 112-token row; the packed run holds 2 samples per 224-token row —
    # legal despite the tiny decoder's 128-position rotary table because
    # packed positions restart per segment. Neither run truncates, so
    # the same tokens are supervised.
    a1 = setup_agent(
        make(
            batch_size=16, seq_len=112,
            output_dir=str(tmp / "out_unpacked"),
        )
    )
    r1 = a1.run()
    a2 = setup_agent(
        make(
            # packed rows (batch/pack) must still divide the 8-device
            # data axis: 16/2 = 8 rows
            batch_size=16, pack_sequences=2, seq_len=224,
            output_dir=str(tmp / "out_packed"),
        )
    )
    r2 = a2.run()
    h1 = json.loads((tmp / "out_unpacked" / "loss_history.json").read_text())
    h2 = json.loads((tmp / "out_packed" / "loss_history.json").read_text())
    assert len(h1["train"]) == len(h2["train"]) == 1
    # bf16 forward, different row layout: close, not bit-equal
    np.testing.assert_allclose(h1["train"], h2["train"], rtol=3e-2)
    # 16 samples at batch 16 = one step per epoch in both runs
    assert r1["steps"] == r2["steps"] == 1


def test_finetune_agent_pack_sequences_validation_unpacked(pack_run, tmp_path):
    """With a val split the packed agent must still produce a finite
    val_loss (validation batches stay unpacked for the per-sample
    early-stop signal)."""
    from certifiedgpt_tpu.agents.base import setup_agent

    make, tmp = pack_run
    agent = setup_agent(
        make(
            # validation rows stay unpacked at the same seq_len, so the
            # rotary table must cover the full 224-token row
            model_overrides={"max_position_embeddings": 256},
            batch_size=16,
            pack_sequences=2,
            seq_len=224,
            has_val_split=True,
            output_dir=str(tmp / "out_val"),
        )
    )
    agent.run()
    hist = json.loads((tmp / "out_val" / "loss_history.json").read_text())
    assert hist["val"] and np.isfinite(hist["val"][0])


def test_finetune_agent_rejects_indivisible_pack(pack_run):
    from certifiedgpt_tpu.agents.base import setup_agent

    make, _ = pack_run
    with pytest.raises(ValueError, match="divisible"):
        setup_agent(make(pack_sequences=3))
