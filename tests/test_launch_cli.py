"""End-to-end launcher CLI smoke tests (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BOOTSTRAP = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "import sys; sys.argv = ['launch.py'] + sys.argv[1:]; "
    "import runpy; runpy.run_path('launch.py', run_name='__main__')"
)


def _run_cli(mode, config_path):
    return subprocess.run(
        [sys.executable, "-c", BOOTSTRAP, mode, "--config-path", str(config_path)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.fixture()
def cli_setup(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(8):
        image_id = 9000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"COCO_train2014_{image_id:012d}.jpg")
        Image.fromarray(arr).save(img_dir / f"COCO_val2014_{image_id:012d}.jpg")
        qid = i + 1
        questions.append(
            {"question_id": qid, "image_id": image_id, "question": f"what is {i}?"}
        )
        annotations.append(
            {
                "question_id": qid,
                "image_id": image_id,
                "question_type": "what is",
                "answer_type": "other",
                "answers": [
                    {"answer": "cat", "answer_confidence": "yes", "answer_id": 1}
                ],
            }
        )
    (tmp_path / "q.json").write_text(json.dumps({"questions": questions}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": annotations}))
    return tmp_path, img_dir


def test_launch_train_cli(cli_setup):
    tmp_path, img_dir = cli_setup
    cfg = {
        "model": {"arch": "minigpt4", "model_size": "tiny"},
        "datasets": {
            "vqav2": {
                "vis_processor": {
                    "train": {"name": "blip2_image_train", "image_size": 28}
                },
                "text_processor": {"train": {"name": "blip_caption"}},
                "build_info": {
                    "images": {"storage": str(img_dir)},
                    "questions": {"train": [str(tmp_path / "q.json")]},
                    "annotations": {"train": [str(tmp_path / "a.json")]},
                },
            }
        },
        "run": {
            "max_epoch": 1,
            "batch_size": 8,
            "seq_len": 48,
            "iters_per_epoch": 1,
            "has_val_split": False,
            "output_dir": str(tmp_path / "out_train"),
        },
    }
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = _run_cli("train", cfg_path)
    assert result.returncode == 0, result.stderr[-2000:]
    out = tmp_path / "out_train"
    assert (out / "certified.log").exists()
    assert (out / "loss_history.json").exists()


def test_launch_certify_cli(cli_setup):
    tmp_path, img_dir = cli_setup
    cfg = {
        # the full serving stack through the CLI: int8 kernels, W8A8
        # activations, int8 KV cache (the bench.py configuration)
        "model": {
            "arch": "minigpt4",
            "model_size": "tiny",
            "quantize_llama": True,
            "quantize_vit": True,
            "act_quant": True,
            "kv_quant": True,
        },
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
            # no agent key: the CLI mode must route to image_text_certify
            "certify_n0": 4,
            "certify_n": 8,
            "certify_alpha": 0.05,
            "mc_batch": 8,
            "max_images": 1,
            "max_new_tokens": 3,
            "seq_len": 48,
            "noise_level": 0.25,
            "output_dir": str(tmp_path / "out_certify"),
        },
    }
    # val images use the val2014 naming
    cfg_path = tmp_path / "certify.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = _run_cli("certify", cfg_path)
    assert result.returncode == 0, result.stderr[-2000:]
    summary = json.loads(
        (tmp_path / "out_certify" / "certify_summary.json").read_text()
    )
    assert summary["total"] == 1


def test_launch_predict_cli(cli_setup):
    tmp_path, img_dir = cli_setup
    cfg = {
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
            # no agent key: smoothing_predict must route to image_text_predict
            "predict_n": 8,
            "certify_alpha": 0.05,
            "mc_batch": 8,
            "max_images": 1,
            "max_new_tokens": 3,
            "seq_len": 48,
            "noise_level": 0.25,
            "output_dir": str(tmp_path / "out_predict"),
        },
    }
    cfg_path = tmp_path / "predict.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = _run_cli("smoothing_predict", cfg_path)
    assert result.returncode == 0, result.stderr[-2000:]
    summary = json.loads(
        (tmp_path / "out_predict" / "predict_summary.json").read_text()
    )
    assert summary["total"] == 1
