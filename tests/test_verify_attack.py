"""Plumbing tests for the attack-number validation runbook
(``scripts/verify_attack.py``): the BASELINE.md comparison logic is
pinned on synthetic summaries, and the ``--synthetic`` dry run drives
the whole command path (config -> attack agent -> summary -> report) on
tiny random weights — so the day real CLIP + victim checkpoints are
mounted only the numbers are new (the sibling of
``tests/test_verify_checkpoints.py``)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "verify_attack", os.path.join(REPO, "scripts", "verify_attack.py")
)
va = importlib.util.module_from_spec(spec)
spec.loader.exec_module(va)


def _summary(grid, ancova_coef=-0.01, ancova_p=1e-4):
    return {
        "sigma_grid": [0.0, 0.25, 0.5, 1.0],
        "success_rate_grid": grid,
        "ancova": {
            "coefficients": {
                "sigma": {"estimate": -0.002, "p_value": 0.2},
                "sigma:backbone[rn101]": {
                    "estimate": ancova_coef, "p_value": ancova_p,
                },
            }
        },
    }


def test_compare_summary_within_tolerance_passes():
    grid = {
        name: {sig: rate + 0.02 for sig, rate in row.items()}
        for name, row in va.BASELINE_ASR.items()
    }
    report = va.compare_summary(_summary(grid), tol=0.05)
    assert report["ok"], report
    assert report["checked"] == 20
    assert report["skipped"] == 0
    assert report["ancova"]["status"] == "ok"


def test_compare_summary_normalizes_sigma_key_formatting():
    """A config written `sigma_grid: [0, 1]` keys its cells '0'/'1'
    while the baseline table uses '0.0'/'1.0' — the comparison must
    normalize both sides instead of silently skipping those columns."""
    grid = {
        name: {
            ("0" if sig == "0.0" else "1" if sig == "1.0" else sig):
                rate + 0.02
            for sig, rate in row.items()
        }
        for name, row in va.BASELINE_ASR.items()
    }
    report = va.compare_summary(_summary(grid), tol=0.05)
    assert report["ok"], report
    assert report["checked"] == 20
    assert report["skipped"] == 0


def test_compare_summary_flags_out_of_tolerance_cell():
    grid = {
        name: dict(row) for name, row in va.BASELINE_ASR.items()
    }
    grid["vit_l14"]["0.5"] = 0.80  # far from the published 0.449
    report = va.compare_summary(_summary(grid), tol=0.05)
    assert not report["ok"]
    bad = [
        c for c in report["cells"]
        if c["backbone"] == "vit_l14" and c["sigma"] == "0.5"
    ]
    assert bad[0]["status"] == "FAIL"


def test_compare_summary_skips_random_backbones_and_missing_cells():
    grid = {"rn50": dict(va.BASELINE_ASR["rn50"])}
    report = va.compare_summary(
        _summary(grid), tol=0.05, random_backbones=["rn50"]
    )
    # every cell skipped (rn50 ran random, the rest absent): the clause
    # is undischarged, not failed
    assert report["checked"] == 0
    assert report["skipped"] == 20
    assert not report["ok"]
    assert report["failed"] == 0


def test_compare_summary_ancova_wrong_sign_fails():
    grid = {
        name: dict(row) for name, row in va.BASELINE_ASR.items()
    }
    report = va.compare_summary(
        _summary(grid, ancova_coef=0.01, ancova_p=1e-4), tol=0.05
    )
    assert report["ancova"]["status"] == "FAIL"
    assert not report["ok"]


def test_missing_surrogates_reports_unmounted_paths(tmp_path):
    real = tmp_path / "clip.pt"
    real.write_bytes(b"x")
    run = {
        "attack_backbones": ["rn50", "vit_b32"],
        "clip_model_rn50": str(real),
        "clip_model_vit_b32": str(tmp_path / "nope.pt"),
    }
    assert va.missing_surrogates(run) == ["vit_b32"]


def test_synthetic_dry_run_end_to_end(tmp_path, monkeypatch):
    """--synthetic drives config -> agent -> summary -> report on tiny
    random weights; passes iff the grid is complete and ANCOVA present."""
    monkeypatch.chdir(tmp_path)
    va.main(["--synthetic", "--report", str(tmp_path / "rep.json")])
    report = json.loads((tmp_path / "rep.json").read_text())
    assert report["synthetic"] is True
    assert report["ok"], report
    assert set(report["grid"]) == {"vit_tiny", "rn_tiny"}


def test_summary_compare_mode(tmp_path):
    grid = {
        name: dict(row) for name, row in va.BASELINE_ASR.items()
    }
    path = tmp_path / "attack_summary.json"
    path.write_text(json.dumps(_summary(grid)))
    va.main([
        "--summary", str(path), "--report", str(tmp_path / "rep.json"),
    ])
    report = json.loads((tmp_path / "rep.json").read_text())
    assert report["ok"]
    assert report["checked"] == 20
