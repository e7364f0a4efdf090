"""Base agent: config/model/mesh ownership, checkpoint + history plumbing.

Parity with the reference ``BaseAgent`` (ref ``agents/base.py:22-335``):
owns the model/optimizer/scheduler/checkpoint lifecycle, loss-history
JSON + matplotlib plot, and master-only logging. TPU-native differences:
a single controller process owns a device mesh (no per-core processes,
no rendezvous barriers — SPMD collectives are compiled in), and
checkpoints are npz pytrees instead of ``.pth``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from certifiedgpt_tpu.common.checkpoint import load_checkpoint, save_checkpoint
from certifiedgpt_tpu.common.logging import get_logger
from certifiedgpt_tpu.common.registry import registry
from certifiedgpt_tpu.optim import build_lr_schedule, make_optimizer
from certifiedgpt_tpu.parallel.mesh import make_mesh


class BaseAgent:
    def __init__(self, config):
        self.config = config
        self.run_cfg = config.run
        self.logger = get_logger()
        self.output_dir = str(self.run_cfg.get("output_dir", "output"))
        os.makedirs(self.output_dir, exist_ok=True)

        n_model = int(self.run_cfg.get("model_parallel", 1))
        # run.dcn_parallel: number of TPU slices to span with a leading
        # 'dcn' mesh axis (batch/MC only — model parallelism stays inside
        # a slice). 0/absent auto-detects from device slice_index, so a
        # real multislice job gets the hybrid mesh without config changes.
        n_dcn = int(self.run_cfg.get("dcn_parallel", 0)) or None
        # run.pipeline_parallel: GPipe decoder pipeline over a leading
        # 'pipe' axis (parallel/pipeline.py; training-forward only)
        n_pipe = int(self.run_cfg.get("pipeline_parallel", 1))
        if n_pipe > 1 and n_model > 1:
            raise ValueError(
                "pipeline_parallel x model_parallel composition is not "
                "wired in the agents yet (the pipeline replicates "
                "lm_head/norm; see parallel/pipeline.py) — pick one"
            )
        self.mesh = make_mesh(n_model=n_model, n_dcn=n_dcn, n_pipe=n_pipe)

        self.model = self.build_model()
        if self.mesh.shape.get("model", 1) > 1:
            self._shard_model_params()
        if self.mesh.shape.get("pipe", 1) > 1:
            self._shard_model_params_pipeline()
        self.loss_history: Dict[str, list] = {"train": [], "val": []}

    def _shard_model_params(self) -> None:
        """run.model_parallel > 1: actually lay the frozen decoder out
        over the ``model`` axis (Megatron specs, parallel/mesh.py) and
        replicate the other towers. Building the mesh without placing
        the params would leave GSPMD to replicate everything — the knob
        would silently not deliver the memory split it exists for."""
        from certifiedgpt_tpu.parallel.mesh import partition_llama, replicated

        params = self.model.params
        if "llama" not in params:
            raise ValueError(
                "run.model_parallel applies to the LLaMA decoder tower; "
                f"model arch '{self.config.arch}' has no 'llama' params "
                "to shard — remove the knob or add a partitioning rule"
            )
        params["llama"] = partition_llama(params["llama"], self.mesh)
        sharding = replicated(self.mesh)
        for key in list(params.keys()):
            if key != "llama":
                params[key] = jax.tree.map(
                    lambda x: jax.device_put(x, sharding), params[key]
                )

    def _shard_model_params_pipeline(self) -> None:
        """run.pipeline_parallel > 1: shard the decoder's stacked layer
        weights over the ``pipe`` stages (each stage holds L/P blocks —
        the HBM point of pp) and replicate everything else."""
        from certifiedgpt_tpu.parallel.mesh import replicated
        from certifiedgpt_tpu.parallel.pipeline import (
            partition_llama_pipeline,
        )

        params = self.model.params
        if "llama" not in params:
            raise ValueError(
                "run.pipeline_parallel applies to the LLaMA decoder "
                f"tower; model arch '{self.config.arch}' has no 'llama' "
                "params to stage"
            )
        n_pipe = int(self.mesh.shape["pipe"])
        if self.model.cfg.llama.num_layers % n_pipe:
            raise ValueError(
                f"model.num_layers={self.model.cfg.llama.num_layers} "
                f"does not divide into pipeline_parallel={n_pipe} stages"
            )
        params["llama"] = partition_llama_pipeline(
            params["llama"], self.mesh
        )
        sharding = replicated(self.mesh)
        for key in list(params.keys()):
            if key != "llama":
                params[key] = jax.tree.map(
                    lambda x: jax.device_put(x, sharding), params[key]
                )

    # ------------------------------------------------------------------
    def build_model(self):
        model_cls = registry.get_model_class(self.config.arch)
        if model_cls is None:
            raise KeyError(f"Unknown model arch '{self.config.arch}'")
        return model_cls.from_config(self.config.model)

    def build_optimizer(self, schedule=None):
        run = self.run_cfg
        schedule = schedule if schedule is not None else build_lr_schedule(run)
        self.lr_schedule = schedule
        # host-stateful schedulers (reduce_lr_on_plateau) mutate the lr via
        # optimizer-state hyperparams between jitted steps
        self.stateful_lr = hasattr(schedule, "step_metric")
        return make_optimizer(
            schedule,
            weight_decay=float(run.get("weight_decay", 0.05)),
            beta1=float(run.get("beta1", 0.9)),
            beta2=float(run.get("beta2", 0.999)),
            accumulate_steps=int(run.get("accumulated_gradients", 1)),
            max_grad_norm=run.get("max_grad_norm"),
            stateful_lr=self.stateful_lr,
        )

    # ------------------------------------------------------------------
    # checkpoints (trainable-only, like ref base.py:424-433)
    # ------------------------------------------------------------------
    def checkpoint_path(self, name: str) -> str:
        return os.path.join(self.output_dir, f"{name}.npz")

    def save_agent_checkpoint(
        self, name: str, trainable, opt_state=None, **metadata
    ) -> str:
        path = self.checkpoint_path(name)
        save_checkpoint(path, trainable, opt_state, metadata)
        self.logger.info("Saved checkpoint %s", path)
        return path

    def load_agent_checkpoint(
        self, name_or_path: str, trainable_template, opt_state_template=None
    ):
        path = (
            name_or_path
            if os.path.exists(name_or_path)
            else self.checkpoint_path(name_or_path)
        )
        # optional /tmp staging of remote (fuse-mounted) checkpoints
        # (ref agents/base.py:47-57 use_cache semantics)
        if self.run_cfg.get("use_cache", False) and os.path.exists(path):
            import hashlib
            import shutil

            # key by the full source path (basenames collide across
            # experiments) and stage atomically (a killed copy must not
            # leave a reusable truncated file)
            tag = hashlib.md5(
                os.path.abspath(path).encode()
            ).hexdigest()[:8]
            staged = os.path.join("/tmp", f"{tag}_{os.path.basename(path)}")
            if not os.path.exists(staged) or (
                os.path.getmtime(staged) < os.path.getmtime(path)
            ):
                tmp = staged + ".partial"
                # stage the meta sidecar FIRST: freshness is keyed on the
                # staged npz, so a kill between the two renames must
                # leave the npz un-staged (retried next run) rather than
                # a staged npz whose metadata is permanently missing
                # (resume would silently restart from epoch 0)
                meta = path + ".meta.json"
                if os.path.exists(meta):
                    shutil.copy(meta, tmp)
                    os.replace(tmp, staged + ".meta.json")
                shutil.copy(path, tmp)
                os.replace(tmp, staged)
                self.logger.info("staged checkpoint to %s", staged)
            path = staged
        return load_checkpoint(path, trainable_template, opt_state_template)

    def load_finetuned(self, trainable_template):
        """Load finetuned trainable weights referenced by the model block
        (ref ``agents/base.py:82-95`` vqa_finetuned semantics)."""
        path = self.config.model.get("vqa_finetuned")
        if not path:
            return None
        trainable, _, meta = self.load_agent_checkpoint(
            str(path), trainable_template
        )
        self.logger.info("Loaded finetuned weights from %s (meta=%s)", path, meta)
        return trainable

    # ------------------------------------------------------------------
    # history (ref base.py:266-326)
    # ------------------------------------------------------------------
    def record_loss(self, split: str, value: float) -> None:
        self.loss_history.setdefault(split, []).append(float(value))

    def save_history(self) -> None:
        if jax.process_index() != 0:
            # shared output dir under multi-host SPMD: one writer
            return
        path = os.path.join(self.output_dir, "loss_history.json")
        with open(path, "w") as handle:
            json.dump(self.loss_history, handle)
        if not any(self.loss_history.values()):
            return  # nothing to plot (eval/certify agents record no loss)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            for split, values in self.loss_history.items():
                if values:
                    ax.plot(values, label=split)
            ax.set_xlabel("epoch")
            ax.set_ylabel("loss")
            ax.legend()
            fig.savefig(os.path.join(self.output_dir, "loss_history.png"))
            plt.close(fig)
        except Exception as exc:  # plotting must never kill a run
            self.logger.warning("loss plot failed: %s", exc)

    # ------------------------------------------------------------------
    def run(self):  # pragma: no cover - interface
        raise NotImplementedError

    def finalize(self) -> None:
        # a profiler trace whose duration window outlives the run would
        # otherwise never be stopped (its stop timer is a daemon thread
        # that dies at interpreter exit) and the profile data is lost
        profiler = getattr(self, "profiler", None)
        if profiler is not None:
            profiler.stop()
        self.save_history()


def setup_agent(config) -> BaseAgent:
    """ref ``agents/__init__.py:14-21``."""
    name = config.run.get("agent")
    agent_cls = registry.get_agent_class(name)
    if agent_cls is None:
        raise KeyError(f"Unknown agent '{name}'")
    return agent_cls(config)
