"""Plumbing tests for the checkpoint-parity runbook
(``scripts/verify_checkpoints.py``): every stage oracle runs end to end
on TINY synthetic checkpoints in the real on-disk formats, so the day
the four real torch checkpoints are mounted only the numbers are new.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "verify_checkpoints", os.path.join(REPO, "scripts", "verify_checkpoints.py")
)
vc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vc)


def test_stage_vit_on_synthetic_checkpoint(tmp_path):
    from certifiedgpt_tpu.models.eva_vit import EvaViTConfig

    cfg = EvaViTConfig.tiny()
    torch.manual_seed(0)
    oracle = vc._torch_eva_oracle(cfg)
    for p in oracle.parameters():
        p.data.normal_(0, 0.02)
    path = tmp_path / "eva_vit_tiny.pth"
    torch.save(oracle.state_dict(), path)

    row = vc.verify_stage_vit(str(path), num_heads=cfg.num_heads, atol=5e-4)
    assert row["ok"], row
    assert row["depth"] == cfg.depth
    assert row["native_img_size"] == cfg.img_size


def test_stage_qformer_on_synthetic_lavis_checkpoint(tmp_path):
    """Build an HF Q-Former, write it in the LAVIS ``Qformer.bert.*``
    dialect (the real blip2_pretrained_*.pth layout), and check the
    round trip: LAVIS -> our converter vs LAVIS -> HF oracle."""
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    hidden, layers, heads = 32, 4, 4
    torch.manual_seed(1)
    hf = Blip2QFormerModel(
        Blip2QFormerConfig(
            vocab_size=32, hidden_size=hidden, num_hidden_layers=layers,
            num_attention_heads=heads, intermediate_size=64,
            cross_attention_frequency=2, encoder_hidden_size=48,
        )
    ).eval()

    # inverse of the script's _lavis_to_hf_qformer rename
    sd = {}
    for key, val in hf.state_dict().items():
        if key.startswith("layernorm."):
            key = key.replace("layernorm.", "embeddings.LayerNorm.")
        key = key.replace("attention.attention.", "attention.self.")
        sd["Qformer.bert." + key] = val
    sd["query_tokens"] = torch.randn(1, 8, hidden) * 0.02
    path = tmp_path / "blip2_tiny.pth"
    torch.save({"model": sd}, path)

    row = vc.verify_stage_qformer(str(path), num_heads=heads, atol=5e-4)
    assert row["ok"], row
    assert row["num_layers"] == layers
    assert row["cross_attention_freq"] == 2


def test_stage_llama_on_synthetic_hf_dir(tmp_path):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(2)
    hf = LlamaForCausalLM(
        HFLlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=128,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
        )
    ).eval()
    path = tmp_path / "vicuna_tiny"
    hf.save_pretrained(str(path))

    # truncation: check only the first 2 of 3 layers
    row = vc.verify_stage_llama(str(path), num_layers=2, atol=1e-3)
    assert row["ok"], row
    assert row["layers_checked"] == 2
    assert row["greedy_token_agreement"] == 1.0


def test_stage_projection_on_synthetic_stage2(tmp_path):
    torch.manual_seed(3)
    sd = {
        "llama_proj.weight": torch.randn(16, 8),
        "llama_proj.bias": torch.randn(16),
        "ln_vision.weight": torch.randn(8),
        "ln_vision.bias": torch.randn(8),
    }
    path = tmp_path / "minigpt4_stage2.pth"
    torch.save({"model_state_dict": sd}, path)
    row = vc.verify_stage_projection(str(path))
    assert row["ok"], row
    assert row["proj_shape"] == [8, 16]
    # every mapped tensor is verified, not just the kernel transpose
    assert set(row["mapping_checks"]) == {
        "llama_proj.weight", "llama_proj.bias",
        "ln_vision.weight", "ln_vision.bias",
    }
    assert all(row["mapping_checks"].values())


def test_trim_vqa_jsons(tmp_path):
    from certifiedgpt_tpu.common.config import Config

    questions = [
        {"question_id": i, "image_id": 100 + i, "question": f"q{i}?"}
        for i in range(8)
    ]
    annotations = [
        {"question_id": i, "image_id": 100 + i,
         "answers": [{"answer": "cat"}]}
        for i in range(8)
    ]
    (tmp_path / "q.json").write_text(json.dumps({"questions": questions}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": annotations}))
    config = Config(
        {
            "model": {"arch": "minigpt4", "model_size": "tiny"},
            "datasets": {
                "evalvqav2": {
                    "build_info": {
                        "questions": {"val": [str(tmp_path / "q.json")]},
                        "annotations": {"val": [str(tmp_path / "a.json")]},
                    }
                }
            },
            "run": {},
        }
    )
    vc._trim_vqa_jsons(config, 3, str(tmp_path / "trim"))
    build = config.config._data["datasets"]["evalvqav2"]["build_info"]
    q = json.load(open(build["questions"]["val"][0]))
    a = json.load(open(build["annotations"]["val"][0]))
    assert len(q["questions"]) == 3
    assert {x["question_id"] for x in a["annotations"]} == {0, 1, 2}


def test_runbook_main_report(tmp_path):
    """main() with a mix of present and missing checkpoints: report lists
    the run stages, the skipped clauses, and writes the JSON artifact."""
    torch.manual_seed(4)
    sd = {
        "llama_proj.weight": torch.randn(16, 8),
        "llama_proj.bias": torch.randn(16),
    }
    stage2 = tmp_path / "stage2.pth"
    torch.save(sd, stage2)
    report_path = tmp_path / "report.json"
    report = vc.main(
        [
            "--stage2", str(stage2),
            "--eva-vit", str(tmp_path / "missing.pth"),
            "--qformer", "",
            "--vicuna", "",
            "--report", str(report_path),
        ]
    )
    assert report["conversion_parity_ok"] is True  # the one run stage passed
    assert {s["stage"] for s in report["stages"]} == {"projection"}
    assert len(report["skipped"]) == 3
    on_disk = json.loads(report_path.read_text())
    assert on_disk["conversion_parity_ok"] is True
