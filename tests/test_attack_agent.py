import json

import numpy as np
import pytest
from PIL import Image

from certifiedgpt_tpu.common.config import Config
from certifiedgpt_tpu import registration  # noqa: F401
from certifiedgpt_tpu.agents.base import setup_agent


@pytest.fixture()
def attack_setup(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(3):
        image_id = 4000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"COCO_val2014_{image_id:012d}.jpg")
        qid = i + 1
        questions.append(
            {"question_id": qid, "image_id": image_id, "question": f"what is {i}?"}
        )
        annotations.append(
            {
                "question_id": qid,
                "image_id": image_id,
                "answers": [
                    {"answer": ["cat", "dog", "fish"][i], "answer_confidence": "yes"}
                ],
            }
        )
    (tmp_path / "q.json").write_text(json.dumps({"questions": questions}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": annotations}))

    return Config(
        {
            "model": {"arch": "minigpt4", "model_size": "tiny"},
            "datasets": {
                "evalvqav2": {
                    "vis_processor": {
                        "val": {"name": "blip2_image_val", "image_size": 28}
                    },
                    "build_info": {
                        "images": {"storage": str(img_dir)},
                        "questions": {"val": [str(tmp_path / "q.json")]},
                        "annotations": {"val": [str(tmp_path / "a.json")]},
                    },
                }
            },
            "run": {
                "agent": "image_text_attack",
                "attack_backbones": ["vit_tiny", "rn_tiny", "blip2_vit_tiny"],
                "attack_steps": 3,
                "attack_epsilon": 0.03,
                "rgf_queries": 0,
                "max_images": 2,
                "max_new_tokens": 3,
                "seq_len": 48,
                "noise_level": 0.0,
                "output_dir": str(tmp_path / "out_attack"),
                "seed": 5,
            },
        }
    ), tmp_path


def test_attack_agent_end_to_end(attack_setup):
    config, tmp_path = attack_setup
    agent = setup_agent(config)
    summary = agent.run()
    assert summary["total"] == 6  # 2 images x 3 backbones
    assert set(summary["success_rate_per_backbone"]) == {
        "vit_tiny", "rn_tiny", "blip2_vit_tiny",
    }
    assert "ancova" in summary
    out = tmp_path / "out_attack"
    assert (out / "attack_results.jsonl").exists()
    assert (out / "attack_ancova.csv").exists()
    rows = [
        json.loads(line)
        for line in (out / "attack_results.jsonl").read_text().splitlines()
    ]
    # perturbation respects the l-inf budget
    for row in rows:
        assert row["linf"] <= 0.03 + 1e-5


def test_caption_key_streams_are_disjoint():
    """Regression: the old arithmetic packing (``tag*1000+step``) made
    RGF query keys collide with other images' caption keys once
    queries*iters crossed 1000, correlating supposedly independent
    victim smoothing draws. fold_in chaining must keep every caller's
    stream distinct — including across the clean/adv/RGF namespaces and
    across sigma grid rows."""
    from certifiedgpt_tpu.attack.agent import caption_key

    seen = {}
    streams = []
    for idx in range(3):
        streams.append((0, idx))  # clean caption
        for b in range(3):
            streams.append((1, idx, b))  # adv score caption
            for s_idx in range(2):
                for q in range(1, 1002, 500):  # crosses the old pack base
                    streams.append((2, idx, s_idx, b, q))
    for sigma in (0.0, 0.5):
        for stream in streams:
            key = tuple(np.asarray(caption_key(7, stream, sigma)).tolist())
            assert key not in seen, (
                f"key collision: {stream}/{sigma} vs {seen[key]}"
            )
            seen[key] = (stream, sigma)


def test_attack_agent_sigma_grid(attack_setup):
    """run.sigma_grid: one transfer attack per (image, backbone), scored
    at every victim smoothing level — the reference's table shape
    (ref README.md:108-120) with a sigma-varying ANCOVA."""
    config, tmp_path = attack_setup
    config.config._data["run"]["sigma_grid"] = [0.0, 0.5]
    config.config._data["run"]["attack_backbones"] = ["vit_tiny"]
    config.config._data["run"]["max_images"] = 2
    config.config._data["run"]["output_dir"] = str(tmp_path / "out_grid")
    agent = setup_agent(config)
    summary = agent.run()
    assert summary["total"] == 4  # 2 images x 1 backbone x 2 sigmas
    assert summary["sigma_grid"] == [0.0, 0.5]
    grid = summary["success_rate_grid"]["vit_tiny"]
    assert set(grid) == {"0.0", "0.5"}
    rows = [
        json.loads(line)
        for line in (tmp_path / "out_grid" / "attack_results.jsonl")
        .read_text().splitlines()
    ]
    assert sorted({r["sigma"] for r in rows}) == [0.0, 0.5]
    # the transfer-stage adversarial image is sigma-independent (PGD only
    # sees the surrogate): identical linf per (image, backbone) cell
    by_img = {}
    for r in rows:
        by_img.setdefault(r["index"], set()).add(round(r["linf"], 7))
    assert all(len(v) == 1 for v in by_img.values())
