#!/usr/bin/env python
"""Checkpoint-parity runbook: one command to discharge the quality-parity
clause of BASELINE.json the day the four real torch checkpoints are
mounted.

The conversion chain (``models/convert.py``) is pinned on RANDOM weights
by the test suite (``tests/test_whole_model_parity.py``); this script
runs the same per-stage oracles against the REAL checkpoint files and
then (optionally) the quality runs whose numbers compare against
``BASELINE.md:9-26`` (ref ``README.md:86-104``):

  stage "vit"        eva_vit_g.pth          -> torch EVA oracle vs eva_vit_apply
  stage "qformer"    blip2_pretrained*.pth  -> HF Blip2QFormerModel vs qformer_apply
  stage "llama"      Vicuna HF dir          -> HF LlamaForCausalLM (truncated to
                                               --decoder-layers) vs llama_apply
  stage "projection" stage-2 minigpt4 ckpt  -> direct layout check of
                                               llama_proj / ln_vision mapping
  stage "eval"       sigma=0 eval on a trimmed question subset
  stage "certify"    N-image certify at the config's sigma

Usage (paths default to the production env vars)::

    python scripts/verify_checkpoints.py \
        --eva-vit $EVA_VIT_G --qformer $QFORMER_CKPT \
        --vicuna $VICUNA_7B --stage2 $MINIGPT4_STAGE2 \
        --run-eval --run-certify --report verify_report.json

Stages whose checkpoint path is missing are SKIPPED with a loud note —
the report says exactly which parity clauses remain undischarged.
Plumbing is tested on tiny synthetic checkpoints in
``tests/test_verify_checkpoints.py`` so only the final numbers need the
real weights.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# BASELINE.md:9-26 reference rows the quality runs compare against
BASELINE_EVAL = {
    "0.0": {"overall": 32.39, "yes/no": 48.17, "number": 23.44, "other": 21.70},
    "0.25": {"overall": 27.84},
    "0.5": {"overall": 29.04},
    "1.0": {"overall": 29.86},
}
BASELINE_CERTIFIED = {
    # radius -> (certified acc %, best sigma, std acc %)
    "0.5": (35.0, 1.0, 38.0),
    "1.0": (33.0, 1.0, 38.0),
    "2.0": (25.0, 0.25, 41.0),
    "3.0": (25.0, 0.25, 41.0),
}


def _load_sd(path: str):
    # tensor-safe load first, trusted-local full-pickle fallback for
    # stage-2/LAVIS checkpoints that pickle config objects next to the
    # tensors (shared helper; trust assumption in docs/DESIGN.md §4)
    from certifiedgpt_tpu.models.model_zoo import _torch_load

    sd = _torch_load(str(path))
    for key in ("model_state_dict", "model", "module", "state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd


# ----------------------------------------------------------------------
# Stage: EVA ViT (ref eva_vit.py:156-185 block semantics; oracle mirrors
# tests/test_whole_model_parity.py::_torch_eva)
# ----------------------------------------------------------------------
def _torch_eva_oracle(vcfg):
    import torch

    nn = torch.nn

    class Attention(nn.Module):
        def __init__(self):
            super().__init__()
            d, h = vcfg.embed_dim, vcfg.num_heads
            self.num_heads = h
            self.scale = (d // h) ** -0.5
            self.qkv = nn.Linear(d, 3 * d, bias=False)
            self.q_bias = nn.Parameter(torch.zeros(d))
            self.v_bias = nn.Parameter(torch.zeros(d))
            self.proj = nn.Linear(d, d)

        def forward(self, x):
            b, n, c = x.shape
            bias = torch.cat(
                [self.q_bias, torch.zeros_like(self.v_bias), self.v_bias]
            )
            qkv = torch.nn.functional.linear(x, self.qkv.weight, bias)
            qkv = qkv.reshape(b, n, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = ((q * self.scale) @ k.transpose(-2, -1)).softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj(out)

    class Mlp(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(vcfg.embed_dim, vcfg.mlp_hidden)
            self.fc2 = nn.Linear(vcfg.mlp_hidden, vcfg.embed_dim)

        def forward(self, x):
            return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(vcfg.embed_dim, eps=vcfg.layer_norm_eps)
            self.attn = Attention()
            self.norm2 = nn.LayerNorm(vcfg.embed_dim, eps=vcfg.layer_norm_eps)
            self.mlp = Mlp()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(
                vcfg.in_channels, vcfg.embed_dim,
                vcfg.patch_size, stride=vcfg.patch_size,
            )

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class Eva(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            self.cls_token = nn.Parameter(torch.zeros(1, 1, vcfg.embed_dim))
            self.pos_embed = nn.Parameter(torch.zeros(1, vcfg.seq_len, vcfg.embed_dim))
            self.blocks = nn.ModuleList([Block() for _ in range(vcfg.depth)])

        def forward(self, x):
            x = self.patch_embed(x)
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return x

    return Eva()


def verify_stage_vit(path: str, num_heads: int = 16, atol: float = 5e-3):
    """Converted eva_vit_g.pth parity at the checkpoint's NATIVE grid
    (no pos-embed interpolation in the loop — that transform has its own
    unit oracle)."""
    import torch
    import jax
    import jax.numpy as jnp

    from certifiedgpt_tpu.models.convert import convert_eva_vit_state_dict
    from certifiedgpt_tpu.models.eva_vit import EvaViTConfig, eva_vit_apply

    sd = _load_sd(path)
    sd = {k: v.float() for k, v in sd.items() if hasattr(v, "float")}
    conv_w = sd["patch_embed.proj.weight"]
    embed_dim, in_ch, patch, _ = conv_w.shape
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    grid = int(round((sd["pos_embed"].shape[1] - 1) ** 0.5))
    mlp_hidden = sd["blocks.0.mlp.fc1.weight"].shape[0]
    cfg = EvaViTConfig(
        img_size=grid * patch, patch_size=patch, in_channels=in_ch,
        embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        mlp_hidden=mlp_hidden, dtype=jnp.float32,
    )

    oracle = _torch_eva_oracle(cfg).eval()
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    if missing:
        raise RuntimeError(f"ViT oracle missing keys: {missing[:8]}")

    params = convert_eva_vit_state_dict(sd, cfg)
    rng = np.random.RandomState(0)
    images = rng.randn(1, cfg.img_size, cfg.img_size, in_ch).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(images).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(eva_vit_apply(params, cfg, jnp.asarray(images)))
    maxdiff = float(np.max(np.abs(ours - ref)))
    return {
        "stage": "vit", "ok": maxdiff < atol, "max_abs_diff": maxdiff,
        "atol": atol, "depth": depth, "embed_dim": embed_dim,
        "native_img_size": cfg.img_size,
        "unexpected_keys": len(unexpected),
    }


# ----------------------------------------------------------------------
# Stage: Q-Former (LAVIS "Qformer.bert." dialect vs HF Blip2QFormerModel)
# ----------------------------------------------------------------------
def _lavis_to_hf_qformer(sd):
    """LAVIS/vendored-BERT keys -> HF ``Blip2QFormerModel`` keys
    (ref ``Qformer.py:111-276`` self-attention scoping). Text-surface
    keys (word/position embeddings, cls head, text FFN branch) have no
    HF Blip2QFormerModel counterpart and are dropped."""
    out = {}
    for key, val in sd.items():
        if key.startswith("embeddings.LayerNorm."):
            out[key.replace("embeddings.LayerNorm.", "layernorm.")] = val
            continue
        if not key.startswith("encoder.layer."):
            continue  # text embeddings / cls head — query path only
        parts = key.split(".")
        mod = ".".join(parts[3:])
        if mod.startswith("attention.self."):
            mod = mod.replace("attention.self.", "attention.attention.")
        elif mod.startswith("crossattention.self."):
            mod = mod.replace(
                "crossattention.self.", "crossattention.attention."
            )
        elif mod.startswith(("intermediate.", "output.")):
            continue  # text FFN branch (pruned in MiniGPT-4 checkpoints)
        out[".".join(parts[:3]) + "." + mod] = val
    return out


def verify_stage_qformer(path: str, num_heads: int = 12, atol: float = 5e-3):
    import torch
    import jax.numpy as jnp
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    from certifiedgpt_tpu.models.convert import convert_qformer_state_dict
    from certifiedgpt_tpu.models.qformer import QFormerConfig, qformer_apply

    raw = _load_sd(path)
    prefix = "Qformer.bert." if any(
        k.startswith("Qformer.bert.") for k in raw
    ) else ""
    sd = {
        k[len(prefix):]: v.float()
        for k, v in raw.items()
        if k.startswith(prefix) and hasattr(v, "float")
    }
    query_tokens = raw.get("query_tokens")
    if query_tokens is None:
        raise RuntimeError(f"{path} has no query_tokens — not a Q-Former ckpt")
    query_tokens = query_tokens.float()

    hidden = sd["encoder.layer.0.attention.self.query.weight"].shape[0]
    num_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.layer.")
    )
    cross_layers = sorted(
        {
            int(k.split(".")[2])
            for k in sd
            if "crossattention" in k and k.startswith("encoder.layer.")
        }
    )
    cross_freq = (
        cross_layers[1] - cross_layers[0] if len(cross_layers) > 1 else 2
    )
    intermediate = sd["encoder.layer.0.intermediate_query.dense.weight"].shape[0]
    encoder_width = sd[
        f"encoder.layer.{cross_layers[0]}.crossattention.self.key.weight"
    ].shape[1]

    cfg = QFormerConfig(
        hidden_size=hidden, num_layers=num_layers, num_heads=num_heads,
        intermediate_size=intermediate, encoder_width=encoder_width,
        cross_attention_freq=cross_freq,
        num_query_tokens=query_tokens.shape[1],
        dtype=jnp.float32,
    )
    params = convert_qformer_state_dict(sd, cfg)
    params["query_tokens"] = jnp.asarray(query_tokens.numpy())

    hf = Blip2QFormerModel(
        Blip2QFormerConfig(
            vocab_size=30522, hidden_size=hidden,
            num_hidden_layers=num_layers, num_attention_heads=num_heads,
            intermediate_size=intermediate,
            cross_attention_frequency=cross_freq,
            encoder_hidden_size=encoder_width,
        )
    ).eval()
    missing, unexpected = hf.load_state_dict(_lavis_to_hf_qformer(sd), strict=False)
    if missing:
        raise RuntimeError(f"Q-Former oracle missing keys: {missing[:8]}")

    rng = np.random.RandomState(1)
    img = rng.randn(2, 16, encoder_width).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            query_embeds=query_tokens.expand(2, -1, -1),
            encoder_hidden_states=torch.tensor(img),
        ).last_hidden_state.numpy()
    ours = np.asarray(qformer_apply(params, cfg, jnp.asarray(img)))
    maxdiff = float(np.max(np.abs(ours - ref)))
    return {
        "stage": "qformer", "ok": maxdiff < atol, "max_abs_diff": maxdiff,
        "atol": atol, "num_layers": num_layers, "hidden_size": hidden,
        "cross_attention_freq": cross_freq,
        "unexpected_keys": len(unexpected),
    }


# ----------------------------------------------------------------------
# Stage: LLaMA / Vicuna (HF dir, truncated to --decoder-layers)
# ----------------------------------------------------------------------
def _load_hf_llama_sd(path: str, num_layers: int):
    """Stream only the first ``num_layers`` decoder layers (+ embeddings,
    final norm, lm_head) out of an HF dir's shards — full-model parity
    on 7B fp32 would need ~28 GB host RAM; the truncated stack pins the
    same conversion layout at a fraction of it."""
    import torch

    wanted_prefixes = tuple(
        [f"model.layers.{i}." for i in range(num_layers)]
        + ["model.embed_tokens.", "model.norm.", "lm_head."]
    )

    sd = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for file in st_files:
            with safe_open(file, framework="pt") as handle:
                for key in handle.keys():
                    if key.startswith(wanted_prefixes):
                        sd[key] = handle.get_tensor(key).float()
        return sd
    for file in sorted(glob.glob(os.path.join(path, "pytorch_model*.bin"))):
        from certifiedgpt_tpu.models.model_zoo import _torch_load

        shard = _torch_load(file)
        sd.update(
            {k: v.float() for k, v in shard.items()
             if k.startswith(wanted_prefixes)}
        )
    if not sd:
        raise RuntimeError(f"no weight shards found under {path}")
    return sd


def verify_stage_llama(path: str, num_layers: int = 4, atol: float = 2e-2):
    import torch
    import jax.numpy as jnp
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    from certifiedgpt_tpu.models.convert import convert_llama_state_dict
    from certifiedgpt_tpu.models.llama import (
        LlamaConfig,
        embed_tokens,
        llama_apply,
    )

    with open(os.path.join(path, "config.json")) as handle:
        hf_cfg_raw = json.load(handle)
    num_layers = min(num_layers, hf_cfg_raw["num_hidden_layers"])
    sd = _load_hf_llama_sd(path, num_layers)

    hf = LlamaForCausalLM(
        HFLlamaConfig(
            vocab_size=hf_cfg_raw["vocab_size"],
            hidden_size=hf_cfg_raw["hidden_size"],
            intermediate_size=hf_cfg_raw["intermediate_size"],
            num_hidden_layers=num_layers,
            num_attention_heads=hf_cfg_raw["num_attention_heads"],
            num_key_value_heads=hf_cfg_raw.get(
                "num_key_value_heads", hf_cfg_raw["num_attention_heads"]
            ),
            max_position_embeddings=hf_cfg_raw["max_position_embeddings"],
            rms_norm_eps=hf_cfg_raw["rms_norm_eps"],
            rope_theta=hf_cfg_raw.get("rope_theta", 10000.0),
            tie_word_embeddings=False,
        )
    ).eval()
    missing, _ = hf.load_state_dict(sd, strict=False)
    real_missing = [m for m in missing if "rotary" not in m and "inv_freq" not in m]
    if real_missing:
        raise RuntimeError(f"LLaMA oracle missing keys: {real_missing[:8]}")

    cfg = LlamaConfig(
        vocab_size=hf_cfg_raw["vocab_size"],
        hidden_size=hf_cfg_raw["hidden_size"],
        intermediate_size=hf_cfg_raw["intermediate_size"],
        num_layers=num_layers,
        num_heads=hf_cfg_raw["num_attention_heads"],
        num_kv_heads=hf_cfg_raw.get(
            "num_key_value_heads", hf_cfg_raw["num_attention_heads"]
        ),
        max_position_embeddings=hf_cfg_raw["max_position_embeddings"],
        rms_norm_eps=hf_cfg_raw["rms_norm_eps"],
        rope_theta=hf_cfg_raw.get("rope_theta", 10000.0),
        dtype=jnp.float32,
    )
    params = convert_llama_state_dict(sd, cfg)

    rng = np.random.RandomState(2)
    ids = rng.randint(0, cfg.vocab_size, (1, 16))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    mask = jnp.ones((1, 16), jnp.int32)
    pos = jnp.arange(16)[None, :]
    ours, _, _ = llama_apply(
        params, cfg, embed_tokens(params, jnp.asarray(ids)), mask, pos
    )
    ours = np.asarray(ours)
    maxdiff = float(np.max(np.abs(ours - ref)))
    # greedy-token agreement is the metric that matters downstream
    tok_match = float(np.mean(np.argmax(ours, -1) == np.argmax(ref, -1)))
    return {
        "stage": "llama", "ok": maxdiff < atol and tok_match == 1.0,
        "max_abs_diff": maxdiff, "atol": atol,
        "greedy_token_agreement": tok_match,
        "layers_checked": num_layers,
    }


# ----------------------------------------------------------------------
# Stage: stage-2 projection layout
# ----------------------------------------------------------------------
def verify_stage_projection(path: str):
    import jax
    import jax.numpy as jnp

    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model

    sd = _load_sd(path)
    proj_keys = [k for k in sd if k.endswith("llama_proj.weight")]
    if not proj_keys:
        raise RuntimeError(f"{path} has no llama_proj.weight — not a stage-2 ckpt")
    w = sd[proj_keys[0]].float()
    out_dim, in_dim = w.shape
    params = {
        "llama_proj": {
            "kernel": jnp.zeros((in_dim, out_dim)),
            "bias": jnp.zeros((out_dim,)),
        },
        "ln_vision": {
            "scale": jnp.ones((in_dim,)),
            "bias": jnp.zeros((in_dim,)),
        },
    }
    MiniGPT4Model._load_projection(params, sd)

    def _match(suffix, leaf, transpose=False):
        """Every checkpoint tensor with this suffix must land verbatim in
        its mapped leaf — a wrong/dropped mapping must fail the stage,
        not just the kernel transpose."""
        keys = [k for k in sd if k.endswith(suffix)]
        if not keys:
            return None  # absent from this checkpoint (e.g. no ln_vision)
        ref = sd[keys[0]].float().numpy()
        got = np.asarray(leaf, np.float32)
        return bool(np.allclose(got, ref.T if transpose else ref))

    checks = {
        "llama_proj.weight": _match(
            "llama_proj.weight", params["llama_proj"]["kernel"], transpose=True
        ),
        "llama_proj.bias": _match(
            "llama_proj.bias", params["llama_proj"]["bias"]
        ),
        "ln_vision.weight": _match(
            "ln_vision.weight", params["ln_vision"]["scale"]
        ),
        "ln_vision.bias": _match("ln_vision.bias", params["ln_vision"]["bias"]),
    }
    ok = all(v is not False for v in checks.values())
    return {
        "stage": "projection", "ok": bool(ok),
        "mapping_checks": {k: v for k, v in checks.items() if v is not None},
        "proj_shape": [int(in_dim), int(out_dim)],
        "keys_found": sorted(k for k, v in checks.items() if v is not None),
    }


# ----------------------------------------------------------------------
# Quality runs (eval subset / certify subset) + BASELINE comparison
# ----------------------------------------------------------------------
def _trim_vqa_jsons(config, max_questions: int, workdir: str):
    """Copy the configured question/annotation JSONs trimmed to the first
    ``max_questions`` question_ids, and point the config at the copies
    (the eval agent scores whole files; the runbook wants a bounded run)."""
    os.makedirs(workdir, exist_ok=True)
    datasets = config.config._data["datasets"]
    for name, block in datasets.items():
        build = block.get("build_info", {})
        questions = build.get("questions", {})
        annotations = build.get("annotations", {})
        for split, paths in list(questions.items()):
            with open(paths[0]) as handle:
                q = json.load(handle)
            q["questions"] = q["questions"][:max_questions]
            keep = {item["question_id"] for item in q["questions"]}
            q_path = os.path.join(workdir, f"{name}_{split}_q.json")
            with open(q_path, "w") as handle:
                json.dump(q, handle)
            questions[split] = [q_path]
            if split in annotations:
                with open(annotations[split][0]) as handle:
                    a = json.load(handle)
                a["annotations"] = [
                    ann for ann in a["annotations"]
                    if ann["question_id"] in keep
                ]
                a_path = os.path.join(workdir, f"{name}_{split}_a.json")
                with open(a_path, "w") as handle:
                    json.dump(a, handle)
                annotations[split] = [a_path]


def run_eval_subset(config_path: str, max_questions: int, output_dir: str):
    from certifiedgpt_tpu import registration  # noqa: F401
    from certifiedgpt_tpu.agents.base import setup_agent
    from certifiedgpt_tpu.common.config import Config

    config = Config(config_path)
    _trim_vqa_jsons(
        config, max_questions, os.path.join(output_dir, "eval_subset")
    )
    config.config._data["run"]["output_dir"] = os.path.join(output_dir, "eval")
    agent = setup_agent(config)
    try:
        results = agent.run()
    finally:
        agent.finalize()
    sigma = str(float(config.run.get("noise_level", 0.0)))
    row = {
        "stage": "eval", "sigma": sigma,
        "overall_accuracy": results["overall_accuracy"],
        "per_answer_type": results["per_answer_type"],
        "num_questions": results["num_questions"],
        "baseline": BASELINE_EVAL.get(sigma),
    }
    base = BASELINE_EVAL.get(sigma)
    if base:
        row["delta_vs_baseline"] = results["overall_accuracy"] - base["overall"]
    return row


def run_certify_subset(config_path: str, max_images: int, output_dir: str):
    from certifiedgpt_tpu import registration  # noqa: F401
    from certifiedgpt_tpu.agents.base import setup_agent
    from certifiedgpt_tpu.common.config import Config

    config = Config(config_path)
    config.config._data["run"]["max_images"] = max_images
    config.config._data["run"]["output_dir"] = os.path.join(
        output_dir, "certify"
    )
    agent = setup_agent(config)
    try:
        summary = agent.run()
    finally:
        agent.finalize()
    return {
        "stage": "certify",
        "sigma": summary.get("sigma"),
        "n": summary.get("n"),
        "certified_accuracy_at_radius": summary.get(
            "certified_accuracy_at_radius"
        ),
        "abstention_rate": summary.get("abstention_rate"),
        "standard_accuracy": summary.get("standard_accuracy"),
        "mean_seconds_per_image": summary.get("mean_seconds_per_image"),
        "baseline_certified_at_radius": {
            r: {"certified_acc_pct": v[0], "at_sigma": v[1], "std_acc_pct": v[2]}
            for r, v in BASELINE_CERTIFIED.items()
        },
    }


# ----------------------------------------------------------------------
def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--eva-vit", default=os.environ.get("EVA_VIT_G"))
    parser.add_argument("--qformer", default=os.environ.get("QFORMER_CKPT"))
    parser.add_argument("--vicuna", default=os.environ.get("VICUNA_7B"))
    parser.add_argument("--stage2", default=os.environ.get("MINIGPT4_STAGE2"))
    parser.add_argument("--decoder-layers", type=int, default=4)
    parser.add_argument("--vit-heads", type=int, default=16)
    parser.add_argument("--qformer-heads", type=int, default=12)
    parser.add_argument("--run-eval", action="store_true")
    parser.add_argument("--run-certify", action="store_true")
    parser.add_argument(
        "--eval-config",
        default=os.path.join(
            REPO, "configs", "eval_configs", "vqav2_eval_noise_0.yaml"
        ),
    )
    parser.add_argument(
        "--certify-config",
        default=os.path.join(
            REPO, "configs", "certify_configs", "vqav2_certify_noise_0.5.yaml"
        ),
    )
    parser.add_argument("--eval-questions", type=int, default=200)
    parser.add_argument("--certify-images", type=int, default=10)
    parser.add_argument("--output-dir", default="output/verify_checkpoints")
    parser.add_argument("--report", default=None)
    args = parser.parse_args(argv)

    report = {"stages": [], "skipped": []}

    def run_stage(name, path, fn, *fn_args):
        if not path or not os.path.exists(str(path)):
            print(f"[SKIP] {name}: checkpoint not found ({path!r}) — "
                  f"this parity clause remains UNDISCHARGED")
            report["skipped"].append({"stage": name, "path": path})
            return
        print(f"[RUN ] {name}: {path}")
        try:
            row = fn(str(path), *fn_args)
        except Exception as exc:  # loud per-stage, keep going
            row = {"stage": name, "ok": False, "error": repr(exc)}
        report["stages"].append(row)
        print(f"       -> {json.dumps(row)}")

    run_stage("vit", args.eva_vit, verify_stage_vit, args.vit_heads)
    run_stage("qformer", args.qformer, verify_stage_qformer, args.qformer_heads)
    run_stage("llama", args.vicuna, verify_stage_llama, args.decoder_layers)
    run_stage("projection", args.stage2, verify_stage_projection)

    def run_end_to_end(name, fn, *fn_args):
        # same loud-per-stage contract as run_stage: a missing dataset
        # path or agent failure must not abort the runbook after the
        # conversion stages already succeeded — the report still prints
        # and records which clauses remain undischarged
        print(f"[RUN ] {name}")
        try:
            row = fn(*fn_args)
        except Exception as exc:
            # no "ok" key: conversion_parity_ok below aggregates only the
            # conversion stages (their rows carry "ok")
            row = {"stage": name, "error": repr(exc)}
        report["stages"].append(row)
        print(f"       -> {json.dumps(row)}")

    if args.run_eval:
        run_end_to_end(
            f"eval subset ({args.eval_questions} questions)",
            run_eval_subset, args.eval_config, args.eval_questions,
            args.output_dir,
        )
    if args.run_certify:
        run_end_to_end(
            f"certify subset ({args.certify_images} images)",
            run_certify_subset, args.certify_config, args.certify_images,
            args.output_dir,
        )

    conv = [r for r in report["stages"] if "ok" in r]
    report["conversion_parity_ok"] = bool(conv) and all(r["ok"] for r in conv)
    print("\n=== checkpoint verification report ===")
    print(json.dumps(report, indent=2))
    if args.report:
        with open(args.report, "w") as handle:
            json.dump(report, handle, indent=2)
        print(f"report written to {args.report}")
    return report


if __name__ == "__main__":
    main()
