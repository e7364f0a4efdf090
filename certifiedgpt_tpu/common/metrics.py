"""Step-metrics logging with compile-count observability.

Parity with the reference's ``TPUMetrics`` (ref ``common/metrics.py:11-69``):
appends split/epoch/step/loss/lr rows to ``{checkpoint_name}.txt`` in the
output dir, including a compilation counter so recompilation storms are
visible (the reference logs torch_xla's ``CompileTime``; here the counter
is the jit cache size of the tracked compiled functions — it grows only
when XLA compiles a new graph).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

from certifiedgpt_tpu.common.logging import get_logger


def jit_cache_size(fn) -> int:
    """Number of compiled variants held by a jitted function."""
    try:
        return int(fn._cache_size())
    except Exception:
        return -1


class TPUMetrics:
    def __init__(self, output_dir: str, checkpoint_name: str = "metrics"):
        self.path = os.path.join(output_dir, f"{checkpoint_name}.txt")
        os.makedirs(output_dir, exist_ok=True)
        self.logger = get_logger()
        self.tracked: Dict[str, object] = {}

    def track(self, name: str, jitted_fn) -> None:
        self.tracked[name] = jitted_fn

    def log_step_metrics(
        self,
        split: str,
        epoch: int,
        step: int,
        loss: float,
        lr: Optional[float] = None,
    ) -> None:
        compiles = {
            name: jit_cache_size(fn) for name, fn in self.tracked.items()
        }
        row = (
            f"{time.strftime('%Y-%m-%d %H:%M:%S')} split={split} epoch={epoch} "
            f"step={step} loss={loss:.6f}"
        )
        if lr is not None:
            row += f" lr={lr:.8f}"
        for name, count in compiles.items():
            row += f" compiles[{name}]={count}"
        self._append(row)

    def log_event(self, message: str) -> None:
        self._append(f"{time.strftime('%Y-%m-%d %H:%M:%S')} event={message}")

    def _append(self, row: str) -> None:
        """Append a line; on failure, try remounting the (gcsfuse) output
        dir once and retry (ref ``common/metrics.py:37-38``). Process 0
        only under multi-host SPMD — every process appending the same
        shared-fs file would interleave duplicate rows (the reference's
        master-ordinal guard on TPUMetrics writes)."""
        import jax

        if jax.process_index() != 0:
            return
        try:
            with open(self.path, "a") as handle:
                handle.write(row + "\n")
        except OSError as exc:
            self.logger.warning("metrics write failed: %s; remounting", exc)
            try:
                from certifiedgpt_tpu.utils.gcs import ensure_mounted

                ensure_mounted(os.path.dirname(self.path))
                with open(self.path, "a") as handle:
                    handle.write(row + "\n")
            except OSError as exc2:
                self.logger.warning("metrics write failed after remount: %s", exc2)
