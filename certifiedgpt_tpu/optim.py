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


def make_optimizer(
    schedule,
    weight_decay: float = 0.05,
    beta1: float = 0.9,
    beta2: float = 0.999,
    accumulate_steps: int = 1,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=beta1,
            b2=beta2,
            weight_decay=weight_decay,
            mask=weight_decay_mask,
        )
    )
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


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
    )
