import json
import os

import numpy as np
import pytest
from PIL import Image

from certifiedgpt_tpu.common.config import Config
from certifiedgpt_tpu.common.registry import registry
import certifiedgpt_tpu.data.builders  # noqa: F401 — registers builders
import certifiedgpt_tpu.data.processors  # noqa: F401 — registers processors
from certifiedgpt_tpu.data.datasets import VQAv2Dataset, VQAv2EvalDataset
from certifiedgpt_tpu.data.loader import Loader
from certifiedgpt_tpu.data.processors import (
    Blip2ImageTrainProcessor,
    BlipCaptionProcessor,
)


@pytest.fixture()
def vqa_dir(tmp_path):
    """Synthetic VQAv2 directory: images + questions/annotations JSONs."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(6):
        image_id = 1000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"COCO_train2014_{image_id:012d}.jpg")
        qid = 10 * i + 1
        questions.append(
            {"question_id": qid, "image_id": image_id, "question": f"what is {i}?"}
        )
        annotations.append(
            {
                "question_id": qid,
                "image_id": image_id,
                "answers": [
                    {"answer": "cat", "answer_confidence": "yes"},
                    {"answer": "dog", "answer_confidence": "maybe"},
                    {"answer": "fish", "answer_confidence": "no"},
                ],
                "multiple_choice_answer": "cat",
                "question_type": "what is",
                "answer_type": "other",
            }
        )
    (tmp_path / "questions.json").write_text(json.dumps({"questions": questions}))
    (tmp_path / "annotations.json").write_text(
        json.dumps({"annotations": annotations})
    )
    return tmp_path


def _make_dataset(vqa_dir, cls=VQAv2Dataset, image_size=28):
    return cls(
        vis_processor=Blip2ImageTrainProcessor(image_size=image_size),
        text_processor=BlipCaptionProcessor(),
        questions_paths=[str(vqa_dir / "questions.json")],
        vis_paths=str(vqa_dir / "images"),
        annotation_paths=[str(vqa_dir / "annotations.json")],
        split="train",
    )


def test_vqav2_dataset_items(vqa_dir):
    ds = _make_dataset(vqa_dir)
    assert len(ds) == 6
    item = ds[0]
    assert item["image"].shape == (28, 28, 3)
    assert "<ImageHere>" in item["instruction_input"]
    assert "[vqa]" in item["instruction_input"]
    assert item["answer"] in ("cat", "dog")  # fish has zero weight
    # weighted sampling favors 'cat' 2:1
    answers = [ds.sample_answer(ds.annotations[0]) for _ in range(300)]
    assert answers.count("fish") == 0
    assert answers.count("cat") > answers.count("dog")


def test_eval_dataset_keeps_ground_truth(vqa_dir):
    ds = _make_dataset(vqa_dir, cls=VQAv2EvalDataset)
    item = ds[1]
    assert item["gt_answers"] == ["cat", "dog", "fish"]
    assert "short answer" in item["instruction_input"]


def test_loader_batching_and_shuffle(vqa_dir):
    ds = _make_dataset(vqa_dir)
    loader = Loader(ds, batch_size=2, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 28, 28, 3)
    assert isinstance(batches[0]["instruction_input"], list)
    # different epoch -> different order
    order1 = [b["question_id"].tolist() for b in batches]
    loader.set_epoch(1)
    order2 = [b["question_id"].tolist() for b in loader]
    assert order1 != order2


def test_builder_from_config(vqa_dir, monkeypatch):
    monkeypatch.setenv("VQA_ROOT", str(vqa_dir))
    cfg = Config(
        {
            "datasets": {
                "vqav2": {
                    "vis_processor": {
                        "train": {"name": "blip2_image_train", "image_size": 28}
                    },
                    "text_processor": {"train": {"name": "blip_caption"}},
                    "build_info": {
                        "images": {"storage": "${env:VQA_ROOT}/images"},
                        "questions": {"train": ["${env:VQA_ROOT}/questions.json"]},
                        "annotations": {"train": ["${env:VQA_ROOT}/annotations.json"]},
                    },
                }
            }
        }
    )
    builder_cls = registry.get_builder_class("vqav2")
    datasets = builder_cls().build_datasets()
    assert "train" in datasets
    assert len(datasets["train"]) == 6
    item = datasets["train"][0]
    assert item["image"].shape == (28, 28, 3)


def test_caption_processor_cleanup():
    proc = BlipCaptionProcessor(max_words=4)
    out = proc('A  "Fancy" Caption: with; lots!! of. words here')
    assert out == "a fancy caption with"


@pytest.fixture()
def cc_sbu_dir(tmp_path):
    """Synthetic CC-SBU align layout: {image_id}.jpg + filter_cap.json."""
    img_dir = tmp_path / "cc_image"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    anns = []
    for i in range(12):
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.jpg")
        anns.append({"image_id": str(i), "caption": f"a photo number {i}"})
    (tmp_path / "filter_cap.json").write_text(
        json.dumps({"annotations": anns})
    )
    return tmp_path


def test_cc_sbu_prompt_pool(cc_sbu_dir):
    """Per-sample prompts draw from the alignment pool
    (ref minigpt4.py:80-88, prompts/alignment.txt)."""
    from certifiedgpt_tpu.data.datasets import CCSbuAlignDataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = CCSbuAlignDataset(
        vis_processor=Blip2ImageTrainProcessor(image_size=28),
        text_processor=BlipCaptionProcessor(),
        vis_paths=str(cc_sbu_dir / "cc_image"),
        annotation_paths=[str(cc_sbu_dir / "filter_cap.json")],
        prompt_path=os.path.join(repo, "prompts", "alignment.txt"),
        prompt_template="{}",
    )
    assert len(ds.prompts) >= 4
    batch = ds.collater([ds[i] for i in range(len(ds))])
    prompts = set(batch["instruction_input"])
    assert len(prompts) >= 2, "prompt pool must vary per sample"
    assert all("<ImageHere>" in p for p in prompts)
    # deterministic in (seed, epoch, index); fresh draws across epochs
    assert ds[3]["instruction_input"] == ds[3]["instruction_input"]
    ds.set_epoch(1)
    epoch1 = [ds[i]["instruction_input"] for i in range(len(ds))]
    assert len(set(epoch1)) >= 2


def test_cc_sbu_model_prompt_injection(cc_sbu_dir):
    """A model-provided pool (model.prompt_path) overrides the default
    single prompt via set_prompts."""
    from certifiedgpt_tpu.data.datasets import CCSbuAlignDataset

    ds = CCSbuAlignDataset(
        vis_processor=Blip2ImageTrainProcessor(image_size=28),
        vis_paths=str(cc_sbu_dir / "cc_image"),
        annotation_paths=[str(cc_sbu_dir / "filter_cap.json")],
    )
    assert ds.prompts == [CCSbuAlignDataset.PROMPT]
    pool = ["<Img><ImageHere></Img> alpha {}".format(i) for i in range(3)]
    ds.set_prompts(pool)
    got = {ds[i]["instruction_input"] for i in range(len(ds))}
    assert got <= set(pool) and len(got) >= 2


def test_multiprocess_loader_partial_batch_wraps():
    """A partial final batch under multi-process slicing pads by wrapping
    (DistributedSampler convention) — never empty, never dropped."""

    class DS:
        def __len__(self):
            return 9

        def __getitem__(self, i):
            return {"x": np.full((2,), float(i), np.float32)}

        def collater(self, rows):
            return {"x": np.stack([r["x"] for r in rows])}

    seen = {}
    for pid in (0, 1):
        loader = Loader(
            DS(), batch_size=4, shuffle=False, drop_last=False,
            prefetch=0, num_workers=1, process_index=pid, process_count=2,
        )
        seen[pid] = [b["x"][:, 0].tolist() for b in loader]
    # full batches split 2/2; the 1-row tail pads by wrapping to 2 rows
    assert [len(b) for b in seen[0]] == [2, 2, 1]
    assert [len(b) for b in seen[1]] == [2, 2, 1]
    assert seen[0][0] == [0.0, 1.0] and seen[1][0] == [2.0, 3.0]
    # tail: global rows [8] wrap to [8, 8]; each process gets one
    assert seen[0][2] == [8.0] and seen[1][2] == [8.0]


def test_gen_batch_minimal_seq_len_truncates_before_text():
    """seq_len == 1 + num_img_tokens: max_before is 0 and 'before' text
    must actually be dropped (``lst[-0:]`` is the whole list — the
    negative-slice form silently skipped truncation and then crashed on
    a negative pad)."""
    from certifiedgpt_tpu.data.text import BatchSpec, build_gen_batch
    from certifiedgpt_tpu.data.text import ByteTokenizer

    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=5, num_img_tokens=4, max_answer_len=4)
    batch = build_gen_batch(tok, ["text before <ImageHere>"], spec)
    assert batch["input_ids"].shape == (1, 5)
    # bos + 4 image pads fill the row exactly; the before-text is gone
    assert batch["attention_mask"].sum() == 5


def test_local_slice_reports_real_rows():
    """A partial global tail wraps duplicate rows onto the last process
    (DistributedSampler convention); _local_slice must report how many
    local rows are REAL so validation weighting can exclude the
    duplicates instead of double-counting samples."""
    from certifiedgpt_tpu.data.loader import Loader

    class _DS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {"x": i}

        def collater(self, items):
            return {"x": [it["x"] for it in items]}

    idx = np.arange(5)
    l0 = Loader(_DS(), batch_size=6, shuffle=False, drop_last=False,
                process_index=0, process_count=2, num_workers=1)
    l1 = Loader(_DS(), batch_size=6, shuffle=False, drop_last=False,
                process_index=1, process_count=2, num_workers=1)
    s0, r0 = l0._local_slice(idx)
    s1, r1 = l1._local_slice(idx)
    assert list(s0) == [0, 1, 2] and r0 == 3
    assert list(s1) == [3, 4, 0] and r1 == 2  # the wrapped 0 is not real
    (b0,) = list(l0)
    (b1,) = list(l1)
    assert b0["__local_real_rows__"] == 3
    assert b1["__local_real_rows__"] == 2


def test_gen_batch_truncation_keeps_assistant_cue():
    """Oversized generation prompts truncate the FRONT of the post-image
    text: the trailing tokens carry the conversation template's
    assistant cue (e.g. ' [/INST]'), and chopping them makes the model
    continue the question instead of answering."""
    from certifiedgpt_tpu.data.text import BatchSpec, ByteTokenizer, build_gen_batch

    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=24, num_img_tokens=4, max_answer_len=4)
    long_question = "x" * 64  # overflows seq_len by far
    prompt = f"<ImageHere> {long_question} [/INST]"
    batch = build_gen_batch(tok, [prompt], spec)
    ids = batch["input_ids"][0]
    valid = ids[batch["attention_mask"][0] == 1]
    tail = tok.decode([int(t) for t in valid[-8:] if t >= 4])
    assert tail.endswith("[/INST]"), tail


def test_multiturn_without_placeholder_still_reserves_image_span():
    """assemble_embeds scatters the image span unconditionally, so a
    first turn without <ImageHere> must still get pad slots at img_pos
    (otherwise 32 image embeddings silently overwrite supervised text)."""
    from certifiedgpt_tpu.data.text import (
        IGNORE_INDEX,
        BatchSpec,
        ByteTokenizer,
        build_multiturn_train_batch,
    )

    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=64, num_img_tokens=4, max_answer_len=8)
    batch = build_multiturn_train_batch(
        tok, [[("no image marker here", "cat")]], spec
    )
    p = int(batch["img_pos"][0])
    assert np.all(
        batch["input_ids"][0, p : p + 4] == tok.pad_token_id
    )
    # the span is never supervised
    assert np.all(batch["labels"][0, p : p + 4] == IGNORE_INDEX)
    # and the answer survives outside the span
    labs = batch["labels"][0]
    sup = labs[labs != IGNORE_INDEX]
    assert tok.decode([int(t) for t in sup if t >= 4]) == "cat"


def test_multiturn_oversized_first_turn_keeps_span_and_answer_in_bounds():
    """A first user turn near seq_len must not push the image span (or
    let the span overwrite answer slots) past the fixed shape."""
    from certifiedgpt_tpu.data.text import (
        IGNORE_INDEX,
        BatchSpec,
        ByteTokenizer,
        build_multiturn_train_batch,
    )

    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=24, num_img_tokens=4, max_answer_len=8)
    long_turn = "x" * 100 + "<ImageHere> q"
    batch = build_multiturn_train_batch(tok, [[(long_turn, "y")]], spec)
    p = int(batch["img_pos"][0])
    # span + at least one answer token fit the fixed shape
    assert p + 4 + 2 <= 24
    assert np.all(batch["input_ids"][0, p : p + 4] == tok.pad_token_id)
    assert np.all(batch["labels"][0, p : p + 4] == IGNORE_INDEX)


def test_sample_answer_all_zero_confidence_falls_back_uniform():
    """Answers whose confidences are all 'no' create zero-weight entries;
    normalization must not produce NaN probabilities (rng.choice would
    raise and kill the epoch) — the uniform fallback applies."""
    from certifiedgpt_tpu.data.datasets import VQAv2Dataset

    ds = VQAv2Dataset.__new__(VQAv2Dataset)  # no file IO needed
    ann = {
        "question_id": 1,
        "answers": [
            {"answer": "cat", "answer_confidence": "no"},
            {"answer": "dog", "answer_confidence": "no"},
        ],
    }
    out = ds.sample_answer(ann, np.random.default_rng(0))
    assert out in ("cat", "dog")
