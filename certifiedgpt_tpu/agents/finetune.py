"""Finetune agent (``image_text_finetune``).

TPU-native rebuild of the reference's finetune loop
(ref ``agents/minigpt4_finetune_agent.py:53-263``):

- ONE jit-compiled, donated train step — forward (noise-injected images ->
  ViT -> Q-Former -> proj -> LLaMA CE loss), backward over the trainable
  leaves only, optax update with the warmup-cosine schedule inside the
  optimizer. No mark_step, no autocast machinery: parameters are bf16,
  loss accumulates fp32.
- SPMD data parallelism: params replicated over the mesh, batch sharded
  on the ``data`` axis; XLA emits the gradient all-reduce (the compiled
  equivalent of ``xm.reduce_gradients``, ref ``:177``).
- Gaussian train-time noise by default. The reference's
  ``maybe_add_noise`` draws **uniform** noise (``torch.rand_like*σ``,
  ref ``:142-147``) while its certification theory needs Gaussian
  (ref ``smoothing.py:96``); ``run.noise_dist: uniform`` reproduces the
  reference behavior for comparisons (SURVEY.md §7 fidelity note).
- Early stopping on val loss with patience, best-checkpoint save,
  resume, loss history, optional wandb — same artifacts as the
  reference.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from certifiedgpt_tpu.agents.base import BaseAgent
from certifiedgpt_tpu.common.registry import registry
from certifiedgpt_tpu.data.loader import Loader, shard_batch
from certifiedgpt_tpu.data.text import BatchSpec, build_train_batch
from certifiedgpt_tpu.models.minigpt4 import (
    merge_params,
    minigpt4_loss,
    split_params,
)


def add_input_noise(
    rng: jnp.ndarray, images: jnp.ndarray, sigma: float, dist: str = "gaussian"
) -> jnp.ndarray:
    """Draw per-pixel noise on device (ref ``maybe_add_noise``)."""
    if sigma <= 0:
        return images
    if dist == "uniform":
        noise = jax.random.uniform(rng, images.shape, images.dtype)
    else:
        noise = jax.random.normal(rng, images.shape, images.dtype)
    return images + sigma * noise


@registry.register_agent("image_text_finetune")
class FinetuneAgent(BaseAgent):
    def __init__(self, config):
        super().__init__(config)
        run = self.run_cfg
        self.max_epoch = int(run.get("max_epoch", 1))
        self.patience = int(run.get("patience", 5))
        self.noise_level = float(run.get("noise_level", 0.0))
        self.noise_dist = str(run.get("noise_dist", "gaussian"))
        self.batch_size = int(run.get("batch_size", 4))
        self.seq_len = int(run.get("seq_len", 256))
        # run.pack_sequences: K — pack K samples per training row
        # (block-diagonal attention, per-segment positions; identical
        # supervised tokens — data/text.pack_train_batch). Train-only:
        # validation stays unpacked because its early-stop signal needs
        # per-SAMPLE losses (reduction='none' is per row).
        self.pack = int(run.get("pack_sequences", 1))
        if self.pack < 1:
            raise ValueError(
                f"run.pack_sequences must be >= 1, got {self.pack}"
            )
        if self.batch_size % self.pack:
            raise ValueError(
                f"run.batch_size={self.batch_size} is not divisible by "
                f"run.pack_sequences={self.pack}"
            )
        # every packed segment gets a fixed seq_len//pack budget
        # (data/text.pack_train_batch), so fitting bos + the image span
        # + an answer is a CONFIG property — fail here, at setup, not
        # data-dependently mid-epoch.
        seg_budget = self.seq_len // self.pack
        min_budget = 1 + self.model.cfg.num_img_tokens + 2
        if self.pack > 1 and seg_budget < min_budget:
            raise ValueError(
                f"run.seq_len={self.seq_len} / run.pack_sequences="
                f"{self.pack} leaves a {seg_budget}-token segment budget"
                f" but bos + {self.model.cfg.num_img_tokens} image tokens"
                f" + an answer needs {min_budget} (raise run.seq_len or"
                f" lower run.pack_sequences)"
            )
        max_pos = int(self.model.cfg.llama.max_position_embeddings)
        if self.pack > 1 and seg_budget > max_pos:
            raise ValueError(
                f"run.seq_len={self.seq_len} / run.pack_sequences="
                f"{self.pack} = a {seg_budget}-token segment budget, "
                f"past the decoder's max_position_embeddings={max_pos} "
                f"rotary table — per-segment positions would silently "
                f"NaN (raise model.max_position_embeddings or pack more)"
            )
        # the packed text arrays have batch/pack rows and shard over the
        # mesh 'data' axis like everything else (data/loader.shard_batch)
        # — catch a non-divisible row count here instead of letting
        # step 1 die on a misleading 'batch_size must be a multiple of
        # the device count' (batch_size itself already is)
        n_data = int(self.mesh.shape["data"])
        rows = self.batch_size // self.pack
        if self.pack > 1 and rows % n_data:
            raise ValueError(
                f"run.batch_size={self.batch_size} / run.pack_sequences="
                f"{self.pack} = {rows} packed rows, which does not "
                f"divide the mesh data axis ({n_data}); pick batch_size "
                f"so batch_size/pack_sequences is a multiple of it"
            )
        # run.pipeline_parallel: route the decoder forward through the
        # GPipe pipeline (parallel/pipeline.py). run.pipeline_microbatches
        # (default 2 x stages — bubble (P-1)/(M+P-1)) must divide the
        # decoder row count, and each microbatch the data axis.
        self.n_pipe = int(self.mesh.shape.get("pipe", 1))
        self.n_micro = (
            int(run.get("pipeline_microbatches", 2 * self.n_pipe))
            if self.n_pipe > 1 else 1
        )
        if self.n_pipe > 1:
            if rows % self.n_micro:
                raise ValueError(
                    f"{rows} decoder rows (batch_size/pack_sequences) do "
                    f"not divide into run.pipeline_microbatches="
                    f"{self.n_micro}"
                )
            if (rows // self.n_micro) % n_data:
                raise ValueError(
                    f"a {rows // self.n_micro}-row microbatch does not "
                    f"divide the mesh data axis ({n_data}); lower "
                    f"run.pipeline_microbatches or the data degree"
                )
        self.seed = int(run.get("seed", 42))
        self.trainable_keys = tuple(
            run.get("trainable_keys", ["llama_proj"])
        )
        self.optimizer = self.build_optimizer()
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self.wandb_run = self._setup_wandb()

        from certifiedgpt_tpu.common.metrics import TPUMetrics
        from certifiedgpt_tpu.common.profiling import Profiler

        self.profiler = Profiler(run)
        self.metrics = TPUMetrics(
            self.output_dir, str(run.get("checkpoint_name", "metrics"))
        )
        self.metrics.track("train_step", self._train_step)

    # ------------------------------------------------------------------
    def _setup_wandb(self):
        if not self.run_cfg.get("wandb", False):
            return None
        if jax.process_index() != 0:
            # multi-host SPMD: one wandb run, owned by process 0 (the
            # reference's master-ordinal guard, ref
            # minigpt4_finetune_agent.py:454-478)
            return None
        try:
            import wandb

            run = wandb.init(
                project=str(self.run_cfg.get("wandb_name", "certifiedgpt_tpu")),
                config=self.config.to_dict(),
            )
            # step-metric definitions (ref minigpt4_finetune_agent.py:454-478);
            # param_norm is the functional analogue of wandb.watch(model) —
            # there is no torch module to hook, so the trainable pytree's
            # global norm is logged per epoch instead.
            try:
                run.define_metric("epoch")
                for metric in (
                    "train_loss", "val_loss", "learning_rate", "param_norm"
                ):
                    run.define_metric(metric, step_metric="epoch")
            except Exception:  # older wandb without define_metric
                pass
            return run
        except Exception as exc:
            self.logger.warning("wandb unavailable: %s", exc)
            return None

    # ------------------------------------------------------------------
    def _loss_fn(self, n_micro=None):
        """The (packed-or-unpacked) loss callable this run trains with:
        the sequential decoder, or the GPipe pipeline when the mesh has
        pipe stages (identical supervision — parity-tested in
        tests/test_pipeline_parallel.py). ``n_micro`` overrides the
        microbatch count (validation uses 1: its padded tail batches
        have data-dependent sizes that need not divide the train
        setting — a single microbatch always divides)."""
        cfg = self.model.cfg
        if self.n_pipe > 1:
            from certifiedgpt_tpu.parallel.pipeline import (
                pipeline_minigpt4_loss,
            )

            mesh = self.mesh
            n_micro = self.n_micro if n_micro is None else n_micro

            def loss(params, batch, reduction="mean"):
                return pipeline_minigpt4_loss(
                    params, cfg, batch, mesh, n_micro, reduction=reduction
                )

            return loss

        def loss(params, batch, reduction="mean"):
            return minigpt4_loss(params, cfg, batch, reduction=reduction)

        return loss

    def _build_train_step(self):
        optimizer = self.optimizer
        noise_level, noise_dist = self.noise_level, self.noise_dist
        loss_of = self._loss_fn()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(trainable, opt_state, frozen, batch, rng):
            batch = dict(batch)
            batch["image"] = add_input_noise(
                rng, batch["image"], noise_level, noise_dist
            )

            def loss_fn(tr):
                return loss_of(merge_params(tr, frozen), batch)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss

        return train_step

    def _build_eval_step(self):
        noise_level, noise_dist = self.noise_level, self.noise_dist
        loss_of = self._loss_fn(n_micro=1)

        @jax.jit
        def eval_step(trainable, frozen, batch, valid, rng):
            batch = dict(batch)
            batch["image"] = add_input_noise(
                rng, batch["image"], noise_level, noise_dist
            )
            # the val tail batch is PADDED to a mesh-divisible size
            # (_run_validation) and the padded rows must not enter the
            # early-stop signal: per-sample losses masked by ``valid``,
            # returned as two REPLICATED scalars (a per-sample array
            # would not be host-convertible under multi-process SPMD)
            losses = loss_of(
                merge_params(trainable, frozen), batch, reduction="none"
            )
            v = valid.astype(losses.dtype)
            return jnp.sum(losses * v), jnp.sum(v)

        return eval_step

    # ------------------------------------------------------------------
    def create_loaders(self) -> Dict[str, Loader]:
        loaders: Dict[str, Loader] = {}
        for name in self.config.datasets.keys():
            builder_cls = registry.get_builder_class(name)
            if builder_cls is None:
                raise KeyError(f"Unknown builder '{name}'")
            for split, dataset in builder_cls().build_datasets().items():
                if split in loaders:
                    # first configured dataset wins, like the eval/certify
                    # agents — silently overwriting would train on only
                    # the LAST dataset of a multi-dataset config
                    self.logger.warning(
                        "dataset '%s' also provides split '%s'; keeping "
                        "the first configured dataset (one dataset per "
                        "finetune run, ref trains one dataset per config)",
                        name, split,
                    )
                    continue
                # hand the model's alignment prompt pool to datasets that
                # draw per-sample prompts (ref minigpt4.py:80-88)
                prompt_list = getattr(self.model, "prompt_list", None)
                if prompt_list and hasattr(dataset, "set_prompts"):
                    dataset.set_prompts(prompt_list)
                loaders[split] = Loader(
                    dataset,
                    batch_size=self.batch_size,
                    shuffle=(split == "train"),
                    # train drops the remainder for one stable compiled
                    # shape (ref drop_last=True); val keeps it — dropping
                    # would bias the early-stop signal, and a val split
                    # smaller than batch_size would otherwise yield ZERO
                    # batches and a silent val_loss of 0.0 (the tail
                    # batch costs one extra eval-step compile, once)
                    drop_last=(split == "train"),
                    seed=self.seed,
                    num_workers=int(self.run_cfg.get("num_workers", 4)),
                )
        return loaders

    def device_batch(
        self, host_batch: Dict[str, Any], pack: int = 0
    ) -> Dict[str, jnp.ndarray]:
        if pack == 0:
            pack = self.pack
        spec = BatchSpec(
            seq_len=self.seq_len,
            num_img_tokens=self.model.cfg.num_img_tokens,
            max_answer_len=self.model.cfg.max_txt_len,
        )
        if "turns" in host_batch:
            # multi-turn conversation datasets (ref tokenize_conversation
            # layout, minigpt_base.py:208-252)
            if pack > 1:
                raise ValueError(
                    "run.pack_sequences does not support multi-turn "
                    "conversation datasets (each row already carries "
                    "one long conversation)"
                )
            from certifiedgpt_tpu.data.text import build_multiturn_train_batch

            text = build_multiturn_train_batch(
                self.model.tokenizer, host_batch["turns"], spec
            )
        elif pack > 1:
            from certifiedgpt_tpu.data.text import pack_train_batch

            text = pack_train_batch(
                self.model.tokenizer,
                host_batch["instruction_input"],
                host_batch["answer"],
                spec,
                pack,
            )
        else:
            text = build_train_batch(
                self.model.tokenizer,
                host_batch["instruction_input"],
                host_batch["answer"],
                spec,
            )
        arrays = {
            "image": host_batch["image"].astype(np.float32),
            **text,
        }
        return shard_batch(arrays, self.mesh)

    # ------------------------------------------------------------------
    def debug_graph_computation(self) -> Dict[str, Any]:
        """Single-batch smoke run: one forward/backward/update + checkpoint
        save (the reference's de-facto smoke test, ref
        ``minigpt4_finetune_agent.py:236-263`` / SURVEY.md §4)."""
        loaders = self.create_loaders()
        batch = next(iter(loaders["train"]))
        trainable, frozen = split_params(self.model.params, self.trainable_keys)
        opt_state = self.optimizer.init(trainable)
        dev_batch = self.device_batch(batch)
        trainable, opt_state, loss = self._train_step(
            trainable, opt_state, frozen, dev_batch, jax.random.PRNGKey(self.seed)
        )
        loss_f = float(loss)
        self.logger.info("debug_graph_computation: loss=%.4f", loss_f)
        self.save_agent_checkpoint("debug_ckpt", trainable, opt_state, epoch=0)
        self.metrics.log_event(f"debug_graph_computation loss={loss_f:.4f}")
        return {"loss": loss_f, "steps": 1}

    @staticmethod
    def _pad_host_batch(batch, pad_to: int):
        """Pad every field of a host batch to ``pad_to`` rows by
        repeating the last row; returns (padded_batch, real_rows)."""
        n = len(next(iter(batch.values())))
        if n >= pad_to:
            return batch, n
        reps = pad_to - n
        out = {}
        for key, val in batch.items():
            if isinstance(val, np.ndarray):
                out[key] = np.concatenate([val, np.repeat(val[-1:], reps, 0)])
            else:
                out[key] = list(val) + [val[-1]] * reps
        return out, n

    def _run_validation(self, trainable, frozen, val_loader, rng) -> float:
        # sample-weighted mean so the (kept) partial tail batch counts
        # its actual rows, not a full batch's worth. Every batch is
        # PADDED to one fixed mesh-divisible size (shard_batch rejects a
        # global batch the 'data' axis cannot split, and a second shape
        # would cost a second eval-step compile); a sharded validity
        # mask drops the padded rows exactly.
        import math

        from certifiedgpt_tpu.parallel.mesh import batch_divisor

        pc = jax.process_count()
        step = math.lcm(batch_divisor(self.mesh), pc)
        pad_to = -(-self.batch_size // step) * step  # global rows
        local_pad_to = pad_to // pc
        v_sum, v_rows, v_batches = 0.0, 0, 0
        for batch in val_loader:
            batch = dict(batch)
            # the Loader marks how many local rows are REAL (a partial
            # global tail wraps duplicate rows onto the last process —
            # the DistributedSampler convention); duplicates must not be
            # double-counted in the early-stop signal
            real_rows = batch.pop("__local_real_rows__", None)
            batch, rows = self._pad_host_batch(batch, local_pad_to)
            if real_rows is not None:
                rows = min(rows, int(real_rows))
            valid = shard_batch(
                {
                    "valid": np.concatenate(
                        [
                            np.ones((rows,), np.int32),
                            np.zeros((local_pad_to - rows,), np.int32),
                        ]
                    )
                },
                self.mesh,
            )["valid"]
            # validation stays UNPACKED: the per-sample `valid` mask and
            # reduction='none' are per row, and a packed row holds K
            # samples
            dev_batch = self.device_batch(batch, pack=1)
            step_rng = jax.random.fold_in(rng, 10_000_000 + v_batches)
            loss_sum, count = self._eval_step(
                trainable, frozen, dev_batch, valid, step_rng
            )
            v_sum += float(loss_sum)
            v_rows += int(count)
            v_batches += 1
        if v_rows == 0:
            # an empty val split would otherwise report 0.0 and poison
            # best-checkpoint selection / early stopping — fail loudly
            raise RuntimeError(
                "validation split produced no batches; check the val "
                "dataset configuration or set run.has_val_split: false"
            )
        return v_sum / v_rows

    def run(self) -> Dict[str, Any]:
        run = self.run_cfg
        if run.get("debug_graph_computation", False):
            return self.debug_graph_computation()
        loaders = self.create_loaders()
        train_loader = loaders.get("train")
        val_loader = loaders.get("val") if run.get("has_val_split", True) else None
        evaluate_only = bool(run.get("evaluate", False))
        if train_loader is None and not evaluate_only:
            raise RuntimeError("No train split configured")

        trainable, frozen = split_params(
            self.model.params, self.trainable_keys
        )
        opt_state = self.optimizer.init(trainable)
        rng = jax.random.PRNGKey(self.seed)
        start_epoch = 0
        start_step = 0

        resume = run.get("resume_ckpt_path")
        if resume:
            try:
                trainable, restored_opt, meta = self.load_agent_checkpoint(
                    str(resume), trainable, opt_state
                )
                if restored_opt is not None:
                    opt_state = restored_opt
                start_epoch = int(meta.get("epoch", -1)) + 1
                # restore the step counter too: the logged lr
                # (self.lr_schedule(global_step)) must agree with the
                # restored optimizer's schedule position, and the
                # per-step rng keys (fold_in(rng, global_step)) must not
                # replay the noise draws already consumed pre-resume
                start_step = int(meta.get("global_step", 0))
                self.logger.info("Resumed from %s at epoch %d", resume, start_epoch)
            except FileNotFoundError:
                self.logger.info("No resume checkpoint at %s; fresh start", resume)

        if evaluate_only:
            # run.evaluate: validation-loss pass only, no training — the
            # reference surfaces this knob in every train config
            # (ref vqav2_finetuning_noise_0.5.yaml:84, Config.evaluate_only)
            if val_loader is None:
                raise RuntimeError("run.evaluate needs a val split")
            val_loss = self._run_validation(trainable, frozen, val_loader, rng)
            self.record_loss("val", val_loss)
            self.logger.info("evaluate-only: val_loss %.4f", val_loss)
            self.save_history()
            return {"val_loss": val_loss, "epochs": 0, "evaluate_only": True}

        ckpt_name = str(run.get("checkpoint_name", "checkpoint"))
        best_val = float("inf")
        bad_epochs = 0
        global_step = start_step

        max_iters = run.get("iters_per_epoch")
        epoch = start_epoch - 1  # stays if the loop body never runs (resume at end)
        for epoch in range(start_epoch, self.max_epoch):
            train_loader.set_epoch(epoch)
            epoch_loss, n_steps = 0.0, 0
            t0 = time.time()
            for batch in train_loader:
                dev_batch = self.device_batch(batch)
                step_rng = jax.random.fold_in(rng, global_step)
                self.profiler.maybe_start(epoch, n_steps)
                trainable, opt_state, loss = self._train_step(
                    trainable, opt_state, frozen, dev_batch, step_rng
                )
                loss_f = float(loss)
                self.metrics.log_step_metrics(
                    "train", epoch, n_steps, loss_f,
                    lr=float(self.lr_schedule(global_step)),
                )
                epoch_loss += loss_f
                n_steps += 1
                global_step += 1
                if max_iters and n_steps >= int(max_iters):
                    break
            train_loss = epoch_loss / max(n_steps, 1)
            self.record_loss("train", train_loss)
            dt = time.time() - t0
            self.logger.info(
                "epoch %d train_loss %.4f (%d steps, %.1fs, %.2f steps/s)",
                epoch, train_loss, n_steps, dt, n_steps / max(dt, 1e-9),
            )

            val_loss = None
            if val_loader is not None:
                val_loss = self._run_validation(trainable, frozen, val_loader, rng)
                self.record_loss("val", val_loss)
                self.logger.info("epoch %d val_loss %.4f", epoch, val_loss)

            if self.stateful_lr:
                from certifiedgpt_tpu.optim import set_learning_rate

                monitored_now = val_loss if val_loss is not None else train_loss
                new_lr = self.lr_schedule.step_metric(monitored_now)
                opt_state = set_learning_rate(opt_state, new_lr)
                self.logger.info("plateau scheduler lr -> %.2e", new_lr)

            if self.wandb_run is not None:
                param_norm = float(optax.global_norm(trainable))
                lr_now = (
                    new_lr if self.stateful_lr
                    else float(self.lr_schedule(global_step))
                )
                self.wandb_run.log(
                    {
                        "epoch": epoch,
                        "train_loss": train_loss,
                        "learning_rate": lr_now,
                        "param_norm": param_norm,
                        **({"val_loss": val_loss} if val_loss is not None else {}),
                    }
                )

            # resume checkpoint every epoch (with optimizer state)
            self.save_agent_checkpoint(
                ckpt_name, trainable, opt_state, epoch=epoch,
                global_step=global_step,
            )

            monitored = val_loss if val_loss is not None else train_loss
            if monitored < best_val:
                best_val = monitored
                bad_epochs = 0
                self.save_agent_checkpoint(
                    f"{ckpt_name}_best", trainable, epoch=epoch, val_loss=monitored
                )
            else:
                bad_epochs += 1
                if bad_epochs >= self.patience:
                    self.logger.info(
                        "Early stopping at epoch %d (patience %d)",
                        epoch, self.patience,
                    )
                    break

        # push trained weights back into the live model
        self.model.params = merge_params(trainable, frozen)
        self.save_history()
        # "steps" = steps run in THIS invocation (a resume that has
        # nothing left reports 0, even though global_step restored >0)
        return {
            "best_val": best_val,
            "epochs": epoch + 1,
            "steps": global_step - start_step,
        }
