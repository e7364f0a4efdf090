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
