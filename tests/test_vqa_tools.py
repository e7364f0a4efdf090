import importlib.util
import os
import sys

import pytest

from certifiedgpt_tpu.vqa_tools.vqa import VQA
from certifiedgpt_tpu.vqa_tools.vqa_eval import (
    VQAEval,
    normalize_answer,
    process_digit_article,
    process_punctuation,
)

REF_EVAL = "/root/reference/common/vqa_tools/vqa_eval.py"


def _load_reference_eval():
    """Load the official scorer from the reference tree as a parity oracle."""
    if not os.path.exists(REF_EVAL):
        pytest.skip("reference scorer not available")
    spec = importlib.util.spec_from_file_location("ref_vqa_eval", REF_EVAL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.VQAEval(None, None)


NORMALIZATION_CASES = [
    "A Cat.",
    "two",
    "none",
    "the red one",
    "it's 10,000 dollars",
    "yes!",
    "don't know",
    "5.5",
    "blue-green",
    "a, b; c",
    "youd think so",
    "What? No.",
    "10.",
]


def test_normalization_matches_official_scorer():
    ref = _load_reference_eval()
    for case in NORMALIZATION_CASES:
        text = case.replace("\n", " ").replace("\t", " ").strip()
        expect = ref.processDigitArticle(ref.processPunctuation(text))
        got = process_digit_article(process_punctuation(text))
        assert got == expect, f"mismatch for {case!r}: {got!r} != {expect!r}"


def test_accuracy_consensus():
    gts = ["cat"] * 10
    assert VQAEval.answer_accuracy("cat", gts) == 1.0
    assert VQAEval.answer_accuracy("dog", gts) == 0.0
    # 3 humans agree with pred -> each leave-one-out sees >= 2 others
    gts = ["cat"] * 3 + ["dog"] * 7
    acc = VQAEval.answer_accuracy("cat", gts)
    # official: for the 3 'cat' rows matches=2 -> 2/3; for 7 'dog' rows matches=3 -> 1.0
    assert abs(acc - (3 * (2 / 3) + 7 * 1.0) / 10) < 1e-9


def _toy_protocol_data():
    annotations = {
        "annotations": [
            {
                "question_id": 1,
                "image_id": 7,
                "question_type": "what color",
                "answer_type": "other",
                "answers": [
                    {"answer": "blue", "answer_id": i + 1} for i in range(6)
                ]
                + [{"answer": "light blue", "answer_id": 7 + i} for i in range(4)],
                "multiple_choice_answer": "blue",
            },
            {
                "question_id": 2,
                "image_id": 7,
                "question_type": "is the",
                "answer_type": "yes/no",
                "answers": [{"answer": "yes", "answer_id": i + 1} for i in range(10)],
                "multiple_choice_answer": "yes",
            },
        ]
    }
    questions = {
        "questions": [
            {"question_id": 1, "image_id": 7, "question": "What color?"},
            {"question_id": 2, "image_id": 7, "question": "Is the thing?"},
        ]
    }
    return annotations, questions


def test_vqa_api_and_eval_end_to_end():
    annotations, questions = _toy_protocol_data()
    vqa = VQA(annotations, questions)
    assert sorted(vqa.get_ques_ids()) == [1, 2]
    assert vqa.get_ques_ids(ans_types=["yes/no"]) == [2]

    preds = [
        {"question_id": 1, "answer": "Blue"},
        {"question_id": 2, "answer": "no"},
    ]
    res = vqa.load_res(preds)
    scorer = VQAEval(vqa, res, n=2)
    acc = scorer.evaluate()
    assert acc["overall"] == 50.0
    assert acc["perAnswerType"]["yes/no"] == 0.0
    assert acc["perAnswerType"]["other"] == 100.0
    assert scorer.eval_qa[1] == 100.0


def test_load_res_validates_coverage():
    annotations, questions = _toy_protocol_data()
    vqa = VQA(annotations, questions)
    with pytest.raises(ValueError):
        vqa.load_res([{"question_id": 1, "answer": "blue"}])  # missing qid 2


def test_normalize_answer_pipeline():
    assert normalize_answer("A Cat.") == "cat"
    assert normalize_answer("two") == "2"
    assert normalize_answer("NONE") == "0"
