#!/usr/bin/env python
"""Launcher CLI.

Same public surface as the reference launcher (ref ``launch.py:29-34``)::

    python launch.py {train,eval,smoothing_predict,certify} --config-path cfg.yaml

TPU-native differences: there is no per-core process spawn
(ref ``launch.py:110-120`` / ``xla.launch``) — one controller process
drives the whole mesh via SPMD, so ``main`` simply builds the agent and
runs it. The reference's broken mode routing is fixed-forward:
``smoothing_predict`` and ``certify`` get real agents instead of falling
back to eval / an empty file (ref ``launch.py:94-99``).
"""

from __future__ import annotations

import argparse
import random
import sys

import numpy as np

from certifiedgpt_tpu import registration  # noqa: F401 — component registration
from certifiedgpt_tpu.agents.base import setup_agent
from certifiedgpt_tpu.common.config import Config
from certifiedgpt_tpu.common.logging import setup_logger
from certifiedgpt_tpu.common.registry import registry

MODE_DEFAULT_AGENTS = {
    "train": "image_text_finetune",
    "eval": "image_text_eval",
    "smoothing_predict": "image_text_predict",
    "certify": "image_text_certify",
    # the attack-evaluation stage is described in the reference README
    # with no code or mode (ref README.md:62-64,108-120); here it is a
    # first-class mode with its own shipped config
    # (configs/attack_configs/vqav2_attack.yaml)
    "attack": "image_text_attack",
}


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="certifiedgpt_tpu launcher")
    parser.add_argument(
        "mode", choices=sorted(MODE_DEFAULT_AGENTS.keys()),
        help="run mode (ref launch.py:31)",
    )
    parser.add_argument("--config-path", required=True, help="YAML config path")
    return parser.parse_args(argv)


def setup_seeds(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None):
    args = parse_args(argv)
    config = Config(args.config_path)

    run = config.run
    # mode picks the agent unless the config explicitly names one
    if not run.get("agent"):
        # an explicitly empty "run:" block loads as None — normalize
        if config.config._data.get("run") is None:
            config.config._data["run"] = {}
        config.config._data["run"]["agent"] = MODE_DEFAULT_AGENTS[args.mode]

    output_dir = str(run.get("output_dir", "output"))
    logger = setup_logger(output_dir)
    setup_seeds(int(run.get("seed", 42)))
    registry.register("mode", args.mode)

    # multi-host SPMD: the reference spawns per-core processes via
    # xla.launch; the JAX equivalent is one process per host joining a
    # jax.distributed cluster over DCN (SURVEY.md §2.8). Coordinator
    # address etc. come from the TPU environment when unset.
    if run.get("distributed", False):
        import jax

        # NOTE: initialize() must be the FIRST jax call of the process —
        # even jax.process_count() initializes the XLA backend, after
        # which initialize() always raises (verified), so there is no
        # "check first" form of this guard. Nothing above this point
        # touches jax (config/logger/seeds are jax-free).
        try:
            jax.distributed.initialize()
            logger.info(
                "jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count(),
            )
        except Exception as exc:
            logger.warning(
                "jax.distributed.initialize failed (%s); continuing as a "
                "single-process run — multi-host configs MUST fix this "
                "or every host will race as its own rank 0", exc
            )

    logger.info("mode=%s agent=%s", args.mode, config.run.get("agent"))
    agent = setup_agent(config)
    try:
        result = agent.run()
        logger.info("run complete: %s", result)
        return result
    finally:
        agent.finalize()


if __name__ == "__main__":
    main(sys.argv[1:])
