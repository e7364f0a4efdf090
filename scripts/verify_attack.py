#!/usr/bin/env python
"""Attack-number validation runbook: one command to discharge the
attack-ASR clause of BASELINE.md the day real CLIP surrogate + victim
checkpoints are mounted (the sibling of ``verify_checkpoints.py``, which
discharges the eval/certify quality clauses).

The attack pipeline (PGD transfer + RGF query, per-(backbone, sigma)
success grid, ANCOVA) is pinned structurally on random weights by
``tests/test_attack.py``; what no test can pin in this image is the
NUMBERS — the reference's published success-rate table (0.45-0.62, ref
``README.md:112-118``) and the ANCOVA smoothing coefficient
(-0.0090, p<0.001, ref ``README.md:160``) need the five pretrained CLIP
backbones and the finetuned victim. This script runs the shipped attack
config end to end and compares every grid cell against BASELINE.md:

  python scripts/verify_attack.py                      # full run + compare
  python scripts/verify_attack.py --images 20          # quick pass
  python scripts/verify_attack.py --summary out/attack_summary.json
                                                       # compare an existing run
  python scripts/verify_attack.py --synthetic          # tiny random-weight
                                                       # dry run of the whole
                                                       # command path (no
                                                       # checkpoints needed)

Surrogate checkpoint paths come from the config's env-var defaults
(CLIP_VIT_B16/…, see ``configs/attack_configs/vqav2_attack.yaml``);
backbones whose path is missing run RANDOM and their cells are reported
as SKIPPED (structurally exercised, numerically undischarged) instead of
failed. Plumbing is tested in ``tests/test_verify_attack.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# BASELINE.md "Targeted black-box attack success rate" table
# (ref /root/reference/README.md:114-118), keyed by the shipped config's
# backbone names x sigma grid
BASELINE_ASR = {
    "rn50": {"0.0": 0.585, "0.25": 0.583, "0.5": 0.579, "1.0": 0.579},
    "rn101": {"0.0": 0.562, "0.25": 0.554, "0.5": 0.551, "1.0": 0.552},
    "vit_b16": {"0.0": 0.595, "0.25": 0.587, "0.5": 0.583, "1.0": 0.581},
    "vit_b32": {"0.0": 0.620, "0.25": 0.623, "0.5": 0.620, "1.0": 0.620},
    "vit_l14": {"0.0": 0.470, "0.25": 0.454, "0.5": 0.449, "1.0": 0.448},
}
# ANCOVA headline (ref /root/reference/README.md:160): the
# smoothing-interaction coefficient is significantly NEGATIVE
BASELINE_ANCOVA = {"coef": -0.0090, "p_max": 0.001}


def compare_summary(
    summary: dict,
    tol: float = 0.05,
    random_backbones=(),
    baseline: dict = None,
) -> dict:
    """Per-cell comparison of an ``attack_summary.json`` against the
    reference table. A cell passes when |measured - reference| <= tol
    (the published rates are 100-image-scale estimates; tol=0.05 is
    ~2 binomial standard errors at that scale). Cells of backbones that
    ran with RANDOM surrogate weights (no checkpoint mounted) are
    SKIPPED, not failed — the report lists exactly which clauses remain
    undischarged, mirroring ``verify_checkpoints.py``."""
    baseline = BASELINE_ASR if baseline is None else baseline
    grid = summary.get("success_rate_grid") or {}
    if not grid and "success_rate_per_backbone" in summary:
        # single-sigma run: compare against that sigma's column only
        sig = str(float(summary["sigma_grid"][0]))
        grid = {
            name: {sig: rate}
            for name, rate in summary["success_rate_per_backbone"].items()
        }
    # sigma cells are keyed by str() of whatever the config carried —
    # a YAML `sigma_grid: [0, 1]` yields '0'/'1' while the baseline
    # table uses '0.0'/'1.0'. Normalize BOTH sides through str(float())
    # so a formatting mismatch can't silently downgrade cells to
    # 'skipped' while the report still says ok.
    grid = {
        name: {str(float(s)): r for s, r in row.items()}
        for name, row in grid.items()
    }
    cells, skipped = [], []
    for name, ref_row in baseline.items():
        for sig, ref_rate in ref_row.items():
            sig = str(float(sig))
            measured = (grid.get(name) or {}).get(sig)
            cell = {
                "backbone": name,
                "sigma": sig,
                "reference": ref_rate,
                "measured": measured,
            }
            if name in random_backbones or measured is None:
                cell["status"] = "skipped"
                cell["why"] = (
                    "surrogate ran with random weights"
                    if name in random_backbones else "cell not in summary"
                )
                skipped.append(cell)
            else:
                cell["status"] = (
                    "ok" if abs(measured - ref_rate) <= tol else "FAIL"
                )
                cells.append(cell)
    anc = (summary.get("ancova") or {}).get("coefficients", {})
    # the reference's headline is the smoothing x RN101 interaction
    # (ref README.md:160); fall back to the sigma main effect when the
    # run's backbone set lacks rn101
    term = anc.get("sigma:backbone[rn101]") or anc.get("sigma") or {}
    coef = term.get("estimate")
    pval = term.get("p_value")
    ancova_row = {
        "reference": BASELINE_ANCOVA,
        "measured": {"coef": coef, "p": pval},
    }
    if coef is None or pval is None:
        ancova_row["status"] = "skipped"
    else:
        # the discharge criterion is the reference's CLAIM — a
        # significantly negative smoothing effect — not the exact
        # coefficient (it depends on the sampled images)
        ancova_row["status"] = (
            "ok" if (coef < 0 and pval <= 0.05) else "FAIL"
        )
    failed = [c for c in cells if c["status"] == "FAIL"]
    return {
        "tol": tol,
        "cells": cells + skipped,
        "ancova": ancova_row,
        "checked": len(cells),
        "skipped": len(skipped),
        "failed": len(failed) + (1 if ancova_row["status"] == "FAIL" else 0),
        "ok": not failed and ancova_row["status"] != "FAIL" and bool(cells),
    }


def missing_surrogates(run_cfg: dict) -> list:
    """Backbones whose configured checkpoint path does not exist — these
    will run RANDOM (the agent warns loudly; their rates are
    meaningless, so their baseline cells are skipped)."""
    keys = {
        "rn50": "clip_model_rn50",
        "rn101": "clip_model_rn101",
        "vit_b16": "clip_model_vit_b16",
        "vit_b32": "clip_model_vit_b32",
        "vit_l14": "clip_model_vit_l14",
    }
    out = []
    for name in run_cfg.get("attack_backbones", []):
        path = run_cfg.get(keys.get(name, ""), run_cfg.get("clip_model"))
        if not path or not os.path.exists(str(path)):
            out.append(name)
    return out


def _synthetic_config(tmp_dir: str):
    """Tiny random-weight attack config over a synthetic 2-image VQAv2
    subset — exercises the exact command path (config -> agent -> summary
    -> comparison) with no checkpoints, like the CLI smoke tests
    (tests/test_launch_cli.py::test_launch_attack_cli)."""
    import numpy as np
    from PIL import Image

    img_dir = os.path.join(tmp_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(2):
        image_id = 9000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"COCO_val2014_{image_id:012d}.jpg")
        )
        questions.append(
            {"question_id": i + 1, "image_id": image_id,
             "question": f"what is {i}?"}
        )
        annotations.append(
            {
                "question_id": i + 1, "image_id": image_id,
                "question_type": "what is", "answer_type": "other",
                "answers": [
                    {"answer": "cat", "answer_confidence": "yes",
                     "answer_id": 1}
                ],
            }
        )
    qpath = os.path.join(tmp_dir, "q.json")
    apath = os.path.join(tmp_dir, "a.json")
    with open(qpath, "w") as f:
        json.dump({"questions": questions}, f)
    with open(apath, "w") as f:
        json.dump({"annotations": annotations}, f)
    return {
        "model": {"arch": "minigpt4", "model_size": "tiny"},
        "datasets": {
            "evalvqav2": {
                "vis_processor": {
                    "val": {"name": "blip2_image_val", "image_size": 28}
                },
                "build_info": {
                    "images": {"storage": img_dir},
                    "questions": {"val": [qpath]},
                    "annotations": {"val": [apath]},
                },
            }
        },
        "run": {
            "agent": "image_text_attack",
            "attack_backbones": ["vit_tiny", "rn_tiny"],
            "attack_steps": 2,
            "attack_epsilon": 0.03,
            "sigma_grid": [0.0, 0.5],
            "rgf_queries": 0,
            "max_images": 2,
            "max_new_tokens": 3,
            "seq_len": 48,
            "output_dir": os.path.join(tmp_dir, "out_attack"),
        },
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config-path",
        default=os.path.join(
            REPO, "configs", "attack_configs", "vqav2_attack.yaml"
        ),
    )
    parser.add_argument("--images", type=int, default=None)
    parser.add_argument("--rgf-queries", type=int, default=None)
    parser.add_argument("--tol", type=float, default=0.05)
    parser.add_argument(
        "--summary", default=None,
        help="compare an EXISTING attack_summary.json (skip the run)",
    )
    parser.add_argument(
        "--synthetic", action="store_true",
        help="tiny random-weight dry run of the whole command path",
    )
    parser.add_argument("--report", default="verify_attack_report.json")
    args = parser.parse_args(argv)

    if args.summary:
        with open(args.summary) as handle:
            summary = json.load(handle)
        report = compare_summary(summary, tol=args.tol)
    else:
        from certifiedgpt_tpu import registration  # noqa: F401
        from certifiedgpt_tpu.agents.base import setup_agent
        from certifiedgpt_tpu.common.config import Config
        from certifiedgpt_tpu.common.logging import setup_logger

        setup_logger()
        if args.synthetic:
            import tempfile

            tmp_dir = tempfile.mkdtemp(prefix="verify_attack_")
            config = Config(_synthetic_config(tmp_dir))
        else:
            config = Config(args.config_path)
        run = config.run
        if args.images is not None:
            run["max_images"] = args.images
        if args.rgf_queries is not None:
            run["rgf_queries"] = args.rgf_queries
        random_bb = missing_surrogates(run)
        if random_bb and not args.synthetic:
            print(
                f"verify_attack: no surrogate checkpoint for {random_bb} — "
                "these backbones run RANDOM and their cells are skipped",
                file=sys.stderr,
            )
        agent = setup_agent(config)
        summary = agent.run()
        if args.synthetic:
            # no baseline claim at random weights: the dry run passes
            # when the command path produced a complete grid + ANCOVA
            grid = summary.get("success_rate_grid") or {}
            report = {
                "synthetic": True,
                "ok": bool(grid)
                and all(
                    rate is not None
                    for row in grid.values() for rate in row.values()
                )
                and "ancova" in summary,
                "grid": grid,
            }
        else:
            report = compare_summary(
                summary, tol=args.tol, random_backbones=random_bb
            )

    with open(args.report, "w") as handle:
        json.dump(report, handle, indent=2)
    print(json.dumps(report, indent=2))
    if not report["ok"]:
        status = "failed" if report.get("failed") else "undischarged"
        print(f"verify_attack: {status}", file=sys.stderr)
        sys.exit(1)
    print("verify_attack: all checked cells within tolerance")


if __name__ == "__main__":
    main()
