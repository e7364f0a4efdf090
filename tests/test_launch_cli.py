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


def test_launch_train_cli_w8a8(cli_setup):
    """The W8A8 train/serve-matched mode (shipped
    vqav2_finetuning_noise_0.5_w8a8.yaml): training against int8 frozen
    towers with dynamic activation quant must run end-to-end through the
    CLI — the straight-through vjp makes the projection's gradients
    flow through the quantized decoder."""
    tmp_path, img_dir = cli_setup
    cfg = {
        "model": {
            "arch": "minigpt4", "model_size": "tiny",
            "quantize_vit": True, "quantize_llama": True,
            "act_quant": True,
        },
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
            "output_dir": str(tmp_path / "out_train_w8a8"),
        },
    }
    cfg_path = tmp_path / "train_w8a8.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = _run_cli("train", cfg_path)
    assert result.returncode == 0, result.stderr[-2000:]
    out = tmp_path / "out_train_w8a8"
    assert (out / "checkpoint_best.npz").exists()
    assert (out / "loss_history.json").exists()


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


def test_launch_eval_cli(cli_setup):
    """`launch.py eval` end-to-end through the CLI (ref launch.py maps
    eval -> image_text_eval; the reference's main inference path,
    ref minigpt4_eval_agent.py:86-124), with the output-side
    dispatch_window pipelining the shipped eval configs use."""
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
            # no agent key: the CLI mode must route to image_text_eval
            "batch_size": 4,
            "max_new_tokens": 3,
            "seq_len": 48,
            "dispatch_window": 2,
            "output_dir": str(tmp_path / "out_eval"),
        },
    }
    cfg_path = tmp_path / "eval.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = _run_cli("eval", cfg_path)
    assert result.returncode == 0, result.stderr[-2000:]
    results = json.loads(
        (tmp_path / "out_eval" / "eval_results.json").read_text()
    )
    preds = results["predictions"]
    assert len(preds) == 8
    assert {p["question_id"] for p in preds} == set(range(1, 9))


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


def test_launch_attack_cli(cli_setup):
    """`launch.py attack` is a first-class mode (ref README.md:108-120
    describes the attack eval with no code or mode): tiny backbones,
    2-sigma grid, summary + ANCOVA CSV artifacts."""
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
            # no agent key: the CLI mode must route to image_text_attack
            "attack_backbones": ["vit_tiny", "rn_tiny"],
            "attack_steps": 2,
            "attack_epsilon": 0.03,
            "sigma_grid": [0.0, 0.5],
            "rgf_queries": 0,
            "max_images": 1,
            "max_new_tokens": 3,
            "seq_len": 48,
            "output_dir": str(tmp_path / "out_attack_cli"),
        },
    }
    cfg_path = tmp_path / "attack.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = _run_cli("attack", cfg_path)
    assert result.returncode == 0, result.stderr[-2000:]
    out = tmp_path / "out_attack_cli"
    summary = json.loads((out / "attack_summary.json").read_text())
    # 1 image x 2 backbones x 2 sigmas
    assert summary["total"] == 4
    assert summary["sigma_grid"] == [0.0, 0.5]
    assert set(summary["success_rate_grid"]) == {"vit_tiny", "rn_tiny"}
    assert set(summary["success_rate_grid"]["vit_tiny"]) == {"0.0", "0.5"}
    assert (out / "attack_ancova.csv").exists()
    assert (out / "attack_results.jsonl").exists()


def test_launch_certify_sweep_cli(cli_setup):
    """The shipped sigma-sweep capability through the CLI: run.sigma_grid
    produces per-sigma summaries plus certify_sweep.json (the runnable
    equivalent of configs/certify_configs/vqav2_certify_sweep.yaml)."""
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
            "sigma_grid": [0.25, 0.5],
            "certify_n0": 4,
            "certify_n": 8,
            "certify_alpha": 0.05,
            "mc_batch": 4,
            "max_images": 1,
            "max_new_tokens": 3,
            "seq_len": 48,
            "output_dir": str(tmp_path / "out_sweep"),
        },
    }
    cfg_path = tmp_path / "sweep.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = _run_cli("certify", cfg_path)
    assert result.returncode == 0, result.stderr[-2000:]
    out = tmp_path / "out_sweep"
    sweep = json.loads((out / "certify_sweep.json").read_text())
    assert set(sweep) == {"0.25", "0.5"}
    assert (out / "sigma_0.25" / "certify_summary.json").exists()
    assert (out / "sigma_0.5" / "certify_summary.json").exists()


def test_shipped_configs_parse_and_exist():
    """Every path in configs/all_config_paths.py exists and parses; the
    reference's full replication sequence (ref Experiments.md:5-32 +
    README.md:108-120) has a 1:1 shipped-YAML equivalent."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "all_config_paths", os.path.join(REPO, "configs", "all_config_paths.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name, path in mod.ALL_CONFIGS.items():
        assert os.path.exists(path), f"missing shipped config: {name} -> {path}"
        with open(path) as handle:
            parsed = yaml.safe_load(handle)
        assert "run" in parsed and "model" in parsed, name
    # the replication grid: 4 train noises, 4 eval noises, 3 certify
    # noises + sweep, the attack table
    for key in [
        "vqav2_noise_0", "vqav2_noise_0.25", "vqav2_noise_0.5",
        "vqav2_noise_1.0",
    ]:
        assert key in mod.TRAIN_CONFIGS
    for key in [
        "vqav2_eval_noise_0", "vqav2_eval_noise_0.25",
        "vqav2_eval_noise_0.5", "vqav2_eval_noise_1.0",
    ]:
        assert key in mod.EVAL_CONFIGS
    for key in [
        "vqav2_certify_noise_0.25", "vqav2_certify_noise_0.5",
        "vqav2_certify_noise_1.0", "vqav2_certify_sweep",
        "vqav2_certify_continuous",
    ]:
        assert key in mod.CERTIFY_CONFIGS
    assert "vqav2_attack" in mod.ATTACK_CONFIGS
    # dedicated smoothing_predict example (not a reused certify YAML):
    # predict has no certificate, so it carries predict_n and no
    # certify_n0/certify_n/radius_grid
    predict = yaml.safe_load(
        open(mod.PREDICT_CONFIGS["vqav2_predict_noise_0.5"])
    )
    assert predict["run"]["agent"] == "image_text_predict"
    assert predict["run"]["predict_n"] > 0
    assert "certify_n" not in predict["run"]
    sweep = yaml.safe_load(open(mod.CERTIFY_CONFIGS["vqav2_certify_sweep"]))
    assert sweep["run"]["sigma_grid"] == [0.25, 0.5, 1.0]
    attack = yaml.safe_load(open(mod.ATTACK_CONFIGS["vqav2_attack"]))
    assert attack["run"]["attack_backbones"] == [
        "rn50", "rn101", "vit_b16", "vit_b32", "vit_l14"
    ]
    assert attack["run"]["sigma_grid"] == [0.0, 0.25, 0.5, 1.0]
