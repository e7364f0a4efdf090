"""Optimizers and LR schedules (optax).

Reproduces the reference's training recipe:

- ``linear_warmup_cosine_lr`` (ref
  ``graphs/models/minigpt4/common/optims.py:11-73``): linear warmup from
  ``warmup_start_lr`` to ``warmup_max_lr`` over ``warmup_steps``, then
  cosine decay from ``init_lr`` to ``min_lr`` over the total step budget.
  (The reference indexes warmup by step-within-epoch; with the shipped
  configs ``warmup_steps == iters_per_epoch`` so the first epoch is
  identical — this implementation uses the global step, which is the
  method-correct reading.)
- AdamW with the reference's weight-decay split (ref
  ``agents/base.py:166-195``): parameters with ndim < 2 or norm/bias
  leaves get wd=0.
- gradient accumulation via ``optax.MultiSteps`` (ref config
  ``accumulated_gradients``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from certifiedgpt_tpu.common.registry import registry

_NO_DECAY_LEAF_NAMES = ("bias", "scale", "q_bias", "v_bias")
_NO_DECAY_PATH_HINTS = ("ln", "norm", "embeddings_ln")


def weight_decay_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True where weight decay applies (>=2-D kernels outside norms)."""

    def decide(path, leaf) -> bool:
        if leaf.ndim < 2:
            return False
        names = [
            p.key if hasattr(p, "key") else str(p) for p in path
        ]
        leaf_name = names[-1] if names else ""
        if leaf_name in _NO_DECAY_LEAF_NAMES:
            return False
        joined = "/".join(names).lower()
        return not any(h in joined for h in _NO_DECAY_PATH_HINTS)

    return jax.tree_util.tree_map_with_path(decide, params)


@registry.register_lr_scheduler("linear_warmup_cosine_lr")
class LinearWarmupCosineLR:
    """Builds an optax schedule with the reference's knobs."""

    def __init__(
        self,
        max_epoch: int,
        iters_per_epoch: int,
        min_lr: float,
        init_lr: float,
        warmup_steps: int = 0,
        warmup_start_lr: float = -1.0,
        warmup_max_lr: float = 0.0,
        **_unused,
    ):
        self.total_steps = max_epoch * iters_per_epoch
        self.min_lr = float(min_lr)
        self.init_lr = float(init_lr)
        self.warmup_steps = int(warmup_steps)
        self.warmup_start_lr = float(
            warmup_start_lr if warmup_start_lr >= 0 else init_lr
        )
        self.warmup_max_lr = float(warmup_max_lr)

    def __call__(self, step: jnp.ndarray) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        warm = self.warmup_start_lr + (
            self.warmup_max_lr - self.warmup_start_lr
        ) * step / jnp.maximum(self.warmup_steps, 1)
        warm = jnp.minimum(self.warmup_max_lr, warm)
        cos = self.min_lr + (self.init_lr - self.min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * step / jnp.maximum(self.total_steps, 1))
        )
        return jnp.where(step < self.warmup_steps, warm, cos)


@registry.register_lr_scheduler("constant_lr")
class ConstantLR:
    def __init__(self, init_lr: float, **_unused):
        self.init_lr = float(init_lr)

    def __call__(self, step):
        return jnp.full((), self.init_lr, jnp.float32)


@registry.register_lr_scheduler("reduce_lr_on_plateau")
class ReduceLROnPlateau:
    """Stateful plateau scheduler (the reference's ReduceLROnPlateau
    variant, ref ``agents/base.py:197-211``): the agent reports the
    monitored metric each epoch via ``step_metric`` and the current lr is
    read through a mutable host-side scale that multiplies ``init_lr``.

    Implemented as a schedule closure over mutable state: optax re-reads
    the schedule every optimizer step, and the scale only changes between
    jitted steps (at epoch boundaries), so no recompilation occurs.
    """

    def __init__(
        self,
        init_lr: float,
        min_lr: float = 0.0,
        factor: float = 0.1,
        plateau_patience: int = 2,
        threshold: float = 1e-4,
        **_unused,
    ):
        self.init_lr = float(init_lr)
        self.min_lr = float(min_lr)
        self.factor = float(factor)
        self.patience = int(plateau_patience)
        self.threshold = float(threshold)
        self._scale = 1.0
        self._best = float("inf")
        self._bad = 0

    @property
    def current_lr(self) -> float:
        return max(self.init_lr * self._scale, self.min_lr)

    def step_metric(self, value: float) -> float:
        """Report the monitored metric (lower is better); returns the lr."""
        if value < self._best - self.threshold:
            self._best = value
            self._bad = 0
        else:
            self._bad += 1
            if self._bad > self.patience:
                self._scale *= self.factor
                self._bad = 0
        return self.current_lr

    def __call__(self, step):
        # NOTE: only valid at optimizer-*init* time. Inside a jitted train
        # step a Python-closure lr would be baked as a constant, so
        # stateful schedules must flow through optax.inject_hyperparams —
        # make_optimizer(stateful_lr=True) + set_learning_rate handle it.
        del step
        return jnp.float32(self.current_lr)


def make_optimizer(
    schedule,
    weight_decay: float = 0.05,
    beta1: float = 0.9,
    beta2: float = 0.999,
    accumulate_steps: int = 1,
    max_grad_norm: Optional[float] = None,
    stateful_lr: bool = False,
) -> optax.GradientTransformation:
    """AdamW with the reference's decay split; ``stateful_lr`` routes the
    learning rate through ``inject_hyperparams`` so host-side schedulers
    (reduce_lr_on_plateau) can mutate it between jitted steps via
    ``set_learning_rate``."""
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if stateful_lr:
        init_lr = float(schedule(0))
        # static_args is REQUIRED: inject_hyperparams treats every
        # callable kwarg as a schedule-of-step-count, so without it the
        # weight_decay_mask would be called with the scalar step and
        # collapse to a scalar False mask — silently disabling weight
        # decay for every reduce_lr_on_plateau run (verified: kernel
        # decay update becomes -0.0)
        adamw = optax.inject_hyperparams(
            optax.adamw, static_args=("mask",)
        )(
            learning_rate=init_lr,
            b1=beta1,
            b2=beta2,
            weight_decay=weight_decay,
            mask=weight_decay_mask,
        )
    else:
        adamw = optax.adamw(
            learning_rate=schedule,
            b1=beta1,
            b2=beta2,
            weight_decay=weight_decay,
            mask=weight_decay_mask,
        )
    chain.append(adamw)
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Rewrite the injected ``learning_rate`` hyperparam anywhere in a
    (possibly chained / MultiSteps-wrapped) optimizer state."""
    import jax

    def rewrite(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            new_h = dict(state.hyperparams)
            new_h["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return state._replace(hyperparams=new_h)
        if isinstance(state, tuple) and not hasattr(state, "_fields"):
            return tuple(rewrite(s) for s in state)
        if hasattr(state, "_fields"):
            updates = {}
            for field in state._fields:
                value = getattr(state, field)
                new_value = rewrite(value)
                if new_value is not value:
                    updates[field] = new_value
            return state._replace(**updates) if updates else state
        return state

    return rewrite(opt_state)


def build_lr_schedule(run_cfg) -> Any:
    """Instantiate the configured scheduler from the run block
    (ref ``agents/base.py:213-250`` registry lookup semantics)."""
    name = run_cfg.get("lr_sched", "linear_warmup_cosine_lr")
    sched_cls = registry.get_lr_scheduler_class(name)
    if sched_cls is None:
        raise KeyError(f"Unknown lr scheduler '{name}'")
    return sched_cls(
        max_epoch=int(run_cfg.get("max_epoch", 1)),
        iters_per_epoch=int(run_cfg.get("iters_per_epoch", 1)),
        min_lr=float(run_cfg.get("min_lr", 1e-6)),
        init_lr=float(run_cfg.get("init_lr", 1e-5)),
        warmup_steps=int(run_cfg.get("warmup_steps", 0)),
        warmup_start_lr=float(run_cfg.get("warmup_start_lr", -1)),
        warmup_max_lr=float(run_cfg.get("warmup_max_lr", 0.0)),
        factor=float(run_cfg.get("plateau_factor", 0.1)),
        plateau_patience=int(run_cfg.get("plateau_patience", 2)),
        threshold=float(run_cfg.get("plateau_threshold", 1e-4)),
    )
