import collections
import json
import os

import numpy as np
import pytest
from PIL import Image

from certifiedgpt_tpu.utils.dataset_stats import compute_mean_std
from certifiedgpt_tpu.utils.subset import generate_subsets, stratified_subsets


def test_stratified_subsets_disjoint_and_proportional():
    rng = np.random.default_rng(0)
    annotations = [
        {"question_id": i, "question_type": t}
        for i, t in enumerate(
            ["what"] * 600 + ["is the"] * 300 + ["how many"] * 100
        )
    ]
    subsets = stratified_subsets(annotations, subset_size=100, num_subsets=3)
    assert all(len(s) == 100 for s in subsets)
    ids = [a["question_id"] for s in subsets for a in s]
    assert len(ids) == len(set(ids))  # disjoint
    for s in subsets:
        counts = collections.Counter(a["question_type"] for a in s)
        assert abs(counts["what"] - 60) <= 2
        assert abs(counts["is the"] - 30) <= 2
        assert abs(counts["how many"] - 10) <= 2


def test_generate_subsets_end_to_end(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    annotations, questions = [], []
    for i in range(40):
        image_id = 5000 + i
        Image.fromarray(
            rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(img_dir / f"COCO_val2014_{image_id:012d}.jpg")
        annotations.append(
            {
                "question_id": i,
                "image_id": image_id,
                "question_type": "what" if i % 2 == 0 else "is the",
                "answers": [],
            }
        )
        questions.append(
            {"question_id": i, "image_id": image_id, "question": f"q{i}"}
        )
    ann_path = tmp_path / "ann.json"
    q_path = tmp_path / "q.json"
    ann_path.write_text(json.dumps({"annotations": annotations, "info": "x"}))
    q_path.write_text(json.dumps({"questions": questions}))

    out_dir = tmp_path / "subsets"
    written = generate_subsets(
        str(ann_path), str(q_path), str(img_dir), str(out_dir),
        split="val", subset_size=10, num_subsets=2,
    )
    assert len(written) == 2
    sub = json.loads(open(written[0]).read())
    assert len(sub["annotations"]) == 10
    assert sub["info"] == "x"  # header fields preserved
    # images copied
    imgs = os.listdir(out_dir / "images_val_1")
    assert len(imgs) == 10
    # questions subset aligns with annotations
    qsub = json.loads((out_dir / "sample_val2014_questions_1.json").read_text())
    q_ids = {q["question_id"] for q in qsub["questions"]}
    a_ids = {a["question_id"] for a in sub["annotations"]}
    assert q_ids == a_ids


def test_compute_mean_std(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(3):
        arr = np.full((16, 16, 3), [64, 128, 192], np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    mean, std = compute_mean_std(str(tmp_path), image_size=16)
    np.testing.assert_allclose(mean, [64 / 255, 128 / 255, 192 / 255], atol=1e-2)
    np.testing.assert_allclose(std, [0, 0, 0], atol=1e-2)


def test_stratified_subsets_exact_size_with_skewed_types():
    """Allocation must come from the REMAINING pools: full-set-fraction
    rounding bumps the same scarce type every round until its pool runs
    dry and later subsets silently come up short."""
    from certifiedgpt_tpu.utils.subset import stratified_subsets

    annotations = [
        {"question_type": "A", "question_id": i} for i in range(3)
    ] + [
        {"question_type": "B", "question_id": 100 + i} for i in range(97)
    ]
    subsets = stratified_subsets(
        annotations, subset_size=50, num_subsets=2, seed=0
    )
    assert [len(s) for s in subsets] == [50, 50]
    ids = [a["question_id"] for s in subsets for a in s]
    assert len(set(ids)) == 100  # disjoint and exhaustive
