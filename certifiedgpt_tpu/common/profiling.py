"""Profiler hookup.

The reference carries profiler config keys but never starts the profiler
(SURVEY.md §5.1 — config-only subsystem). Here the same YAML keys are
honored for real with the JAX profiler:

- ``enable_profile``: master switch
- ``profiler_port``: ``jax.profiler.start_server`` for live capture
- ``profile_logdir``: trace output directory
- ``profile_epoch`` / ``profile_step``: window start
- ``duration_ms``: bounded trace length
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import jax

from certifiedgpt_tpu.common.logging import get_logger


class Profiler:
    def __init__(self, run_cfg):
        self.enabled = bool(run_cfg.get("enable_profile", False))
        self.logdir = str(run_cfg.get("profile_logdir", "profile"))
        self.epoch = int(run_cfg.get("profile_epoch", 0))
        self.step = int(run_cfg.get("profile_step", 0))
        self.duration_ms = int(run_cfg.get("duration_ms", 5000))
        self.port = run_cfg.get("profiler_port")
        self._server = None
        self._tracing = False
        self.logger = get_logger()

        if self.enabled and self.port:
            try:
                self._server = jax.profiler.start_server(int(self.port))
                self.logger.info("profiler server on port %s", self.port)
            except Exception as exc:
                self.logger.warning("profiler server failed: %s", exc)

    def maybe_start(self, epoch: int, step: int) -> None:
        if (
            not self.enabled
            or self._tracing
            or epoch != self.epoch
            or step != self.step
        ):
            return
        try:
            jax.profiler.start_trace(self.logdir)
            self._tracing = True
            self.logger.info(
                "profiler trace started (epoch %d step %d -> %s)",
                epoch, step, self.logdir,
            )
            timer = threading.Timer(self.duration_ms / 1000.0, self.stop)
            timer.daemon = True
            timer.start()
        except Exception as exc:
            self.logger.warning("profiler trace failed: %s", exc)

    def stop(self) -> None:
        if self._tracing:
            try:
                jax.profiler.stop_trace()
                self.logger.info("profiler trace stopped")
            except Exception as exc:
                self.logger.warning("profiler stop failed: %s", exc)
            self._tracing = False
