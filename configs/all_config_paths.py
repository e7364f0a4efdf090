"""Registry of shipped experiment configs (ref ``configs/all_config_paths.py``)."""

import os

_ROOT = os.path.dirname(os.path.abspath(__file__))


def _p(*parts: str) -> str:
    return os.path.join(_ROOT, *parts)


TRAIN_CONFIGS = {
    "vqav2_noise_0": _p("train_configs", "vqav2_finetuning_noise_0.yaml"),
    "vqav2_noise_0.25": _p("train_configs", "vqav2_finetuning_noise_0.25.yaml"),
    "vqav2_noise_0.5": _p("train_configs", "vqav2_finetuning_noise_0.5.yaml"),
    "vqav2_noise_0.5_w8a8": _p(
        "train_configs", "vqav2_finetuning_noise_0.5_w8a8.yaml"
    ),
    "vqav2_noise_1.0": _p("train_configs", "vqav2_finetuning_noise_1.0.yaml"),
    "cc_sbu": _p("train_configs", "cc_sbu_finetuning.yaml"),
}

EVAL_CONFIGS = {
    "vqav2_eval_noise_0": _p("eval_configs", "vqav2_eval_noise_0.yaml"),
    "vqav2_eval_noise_0.25": _p("eval_configs", "vqav2_eval_noise_0.25.yaml"),
    "vqav2_eval_noise_0.5": _p("eval_configs", "vqav2_eval_noise_0.5.yaml"),
    "vqav2_eval_noise_1.0": _p("eval_configs", "vqav2_eval_noise_1.0.yaml"),
}

CERTIFY_CONFIGS = {
    "vqav2_certify_noise_0.25": _p(
        "certify_configs", "vqav2_certify_noise_0.25.yaml"
    ),
    "vqav2_certify_noise_0.5": _p(
        "certify_configs", "vqav2_certify_noise_0.5.yaml"
    ),
    "vqav2_certify_noise_1.0": _p(
        "certify_configs", "vqav2_certify_noise_1.0.yaml"
    ),
    "vqav2_certify_sweep": _p(
        "certify_configs", "vqav2_certify_sweep.yaml"
    ),
    "vqav2_certify_continuous": _p(
        "certify_configs", "vqav2_certify_continuous.yaml"
    ),
}

PREDICT_CONFIGS = {
    "vqav2_predict_noise_0.5": _p(
        "certify_configs", "vqav2_predict_noise_0.5.yaml"
    ),
}

ATTACK_CONFIGS = {
    "vqav2_attack": _p("attack_configs", "vqav2_attack.yaml"),
}

DATASET_CONFIGS = {
    "vqav2": _p("datasets", "vqav2", "defaults_vqa.yaml"),
}

ALL_CONFIGS = {
    **TRAIN_CONFIGS, **EVAL_CONFIGS, **CERTIFY_CONFIGS, **PREDICT_CONFIGS,
    **ATTACK_CONFIGS,
}
