"""bench.py watchdog: the driver's one-shot invocation must survive
tunnel hangs (child-process supervision) while keeping the one-JSON-line
stdout contract.

The axon-tunneled TPU in this image stalls for multi-minute stretches;
``bench.py`` therefore health-gates the device and runs the measurement
in a timed child process, retrying within a budget (see
``bench._watchdog_main``). These tests drive the real CLI in
subprocesses on the CPU backend (``CERTGPT_BENCH_PLATFORM`` hook — env
``JAX_PLATFORMS`` is pinned by this image's sitecustomize and cannot be
used).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **env_extra):
    env = dict(os.environ, CERTGPT_BENCH_PLATFORM="cpu", **env_extra)
    env.pop("CERTGPT_BENCH_CHILD", None)
    return subprocess.run(
        [sys.executable, "bench.py", *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )


def test_watchdog_success_emits_single_json_line():
    proc = _run(
        ["--small", "--n", "4", "--n0", "2", "--mc-batch", "2",
         "--seq-len", "64", "--max-new-tokens", "4"]
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = proc.stdout.strip().splitlines()
    assert len(lines) == 1, proc.stdout
    record = json.loads(lines[0])
    assert set(record) == {"metric", "value", "unit", "vs_baseline"}
    assert record["unit"] == "s"
    assert record["value"] > 0


def test_watchdog_budget_exhausted_fails_loudly():
    proc = _run(["--small"], CERTGPT_BENCH_BUDGET_S="0")
    assert proc.returncode == 1
    assert proc.stdout.strip() == ""
    assert "budget exhausted" in proc.stderr


def test_watchdog_gives_up_on_deterministic_child_failure():
    # invalid argparse choice: every child exits 2 immediately — the
    # watchdog must stop after its bounded failure count, not burn the
    # whole budget retrying a failure that cannot heal
    proc = _run(["--small", "--attn-impl", "bogus"])
    assert proc.returncode != 0
    assert proc.stdout.strip() == ""
    assert "giving up" in proc.stderr
