#!/usr/bin/env python
"""Full-scale TRAIN-step benchmark (single chip).

Measures the reference-scale finetune step — EVA ViT-g/448 (cls-split
split-stream attention by default; ``impl=flash``/``impl=xla`` to A/B)
+ Q-Former-12 + int8 Vicuna-7B-architecture decoder (remat),
trainable llama_proj only, Gaussian input noise, optax AdamW — at the
reference's per-core batch size semantics. Grads flow through the frozen
decoder's activations into the projection, so the step costs ~ViT fwd +
decoder fwd + decoder activation-backward; ViT/Q-Former backward is dead
code XLA prunes (ref trains the same way: only llama_proj requires grad,
``minigpt4.py:76-78``).

Prints one JSON line: {"metric", "value" (ms/step), "unit",
"samples_per_sec", "mfu"} — supplementary to bench.py (not the driver
headline).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _train_step_tflops(cfg, batch, rows, s_len):
    """Analytic step TFLOPs: ViT fwd on every image + decoder fwd and
    activation-backward (dx only, bwd ~= fwd — only llama_proj trains)
    on the ``rows`` packed rows, plus the full-sequence lm_head. The
    ONE place this formula lives; the sweep modes and the headline all
    report through it."""
    v = cfg.vit
    vit_f = v.depth * (
        8 * v.seq_len * v.embed_dim**2
        + 4 * v.seq_len**2 * v.embed_dim
        + 4 * v.seq_len * v.embed_dim * v.mlp_hidden
    )
    lc = cfg.llama
    per_tok = (
        4 * lc.hidden_size**2
        + 4 * lc.hidden_size * lc.num_kv_heads * lc.head_dim
        + 6 * lc.hidden_size * lc.intermediate_size
    )
    dec_f = lc.num_layers * (s_len * per_tok + 4 * s_len**2 * lc.hidden_size)
    dec_f += 2 * s_len * lc.hidden_size * lc.vocab_size  # full-seq lm_head
    return (batch * vit_f + rows * 2 * dec_f) / 1e12


def _compile_and_time(jobs, trials=4):
    """Shared sweep machinery: ``jobs`` maps a variant name to
    ``(step_fn, args)`` where ``step_fn(*args)`` returns ``(..., loss)``.
    Each variant is lowered+compiled (``memory_analysis`` temp bytes =
    XLA's compile-time buffer plan, the apples-to-apples activation
    axis) and executed once untimed — catching runtime OOM the plan
    admits but the live device can't serve — then every survivor is
    timed in interleaved round-robin ``trials``: one-shot TPU timings
    drift ~5% across processes, so all arms MUST share this one.
    Returns ``(times, temp_gb)``; failures land in ``temp_gb`` as
    ``'failed: <ExcName>'`` strings."""
    import jax

    compiled, temp_gb = {}, {}
    for name, (fn, args) in jobs.items():
        t0 = time.time()
        try:
            exe = jax.jit(fn).lower(*args).compile()
            ma = exe.memory_analysis()
            temp_gb[name] = round(
                getattr(ma, "temp_size_in_bytes", 0) / 2**30, 2
            )
            float(exe(*args)[2])
            compiled[name] = (exe, args)
            print(
                f"{name}: compiled in {time.time()-t0:.0f}s, "
                f"temp={temp_gb[name]} GB",
                file=sys.stderr, flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — record OOM/compile fail
            temp_gb[name] = f"failed: {type(exc).__name__}"
            print(f"{name}: FAILED {exc}", file=sys.stderr, flush=True)
    times = {name: [] for name in compiled}
    for _ in range(trials):
        for name, (exe, args) in compiled.items():
            t0 = time.time()
            float(exe(*args)[2])
            times[name].append(time.time() - t0)
    return times, temp_gb


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    aq = "aq" in sys.argv[2:]
    impl = next(
        (a for a in sys.argv[2:] if a.startswith("impl=")), "impl=flash_cls"
    ).split("=", 1)[1]
    # selective remat (VERDICT r4 item 2): policy=<full|dots|dots_all>
    # every=<k> pick what the per-block jax.checkpoint may save
    # (models/llama.py::_REMAT_POLICIES); "sweep" measures every
    # (policy, every) variant interleaved in ONE process — cross-process
    # TPU timings drift ~5%, so a sweep of separate runs is meaningless
    policy = next(
        (a for a in sys.argv[2:] if a.startswith("policy=")), "policy=full"
    ).split("=", 1)[1]
    every = int(next(
        (a for a in sys.argv[2:] if a.startswith("every=")), "every=1"
    ).split("=", 1)[1])
    # pack=K (VERDICT r4 item 5): pack K samples per row — the decoder
    # touches ~1/K of the padded tokens for the same supervised answers
    pack = int(next(
        (a for a in sys.argv[2:] if a.startswith("pack=")), "pack=1"
    ).split("=", 1)[1])
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_full_int8_params, chip_peak_tflops
    from certifiedgpt_tpu.data.text import (
        BatchSpec,
        ByteTokenizer,
        build_train_batch,
        pack_train_batch,
    )
    from certifiedgpt_tpu.models.eva_vit import EvaViTConfig
    from certifiedgpt_tpu.models.llama import LlamaConfig
    from certifiedgpt_tpu.models.minigpt4 import (
        MiniGPT4Config,
        merge_params,
        minigpt4_loss,
        split_params,
    )
    from certifiedgpt_tpu.optim import make_optimizer

    seq = 160  # ref max_txt_len budget
    # "aq": W8A8 in training too — sound here because NO gradient flows
    # through the ViT at all (it sits before the trainable projection),
    # and the decoder's act_quant matmuls carry the straight-through vjp
    # (tests/test_quantization.py::test_w8a8_dense_gradient_is_straight_through)
    if "small" in sys.argv[2:]:
        # bench-scale smoke of the exact same code paths (sweep/pack
        # mechanics) — NOT a headline number
        import dataclasses

        cfg = MiniGPT4Config.small()
        cfg = dataclasses.replace(
            cfg,
            vit=dataclasses.replace(cfg.vit, attn_impl=impl, act_quant=aq),
            llama=dataclasses.replace(
                cfg.llama, remat=True, act_quant=aq,
                remat_policy=policy, remat_every=every,
            ),
        )
    else:
        cfg = MiniGPT4Config(
            vit=EvaViTConfig(attn_impl=impl, act_quant=aq),
            llama=LlamaConfig(
                remat=True, act_quant=aq, remat_policy=policy,
                remat_every=every,
            ),
        )
    params = build_full_int8_params(cfg)
    print("params built", file=sys.stderr, flush=True)

    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=seq, num_img_tokens=32, max_answer_len=24)
    prompts = [
        f"<Img><ImageHere></Img> [vqa] what is object {i}?"
        for i in range(batch)
    ]
    answers = ["cat" if i % 2 == 0 else "dog" for i in range(batch)]
    if pack > 1:
        # ~72-token samples (the realistic instruction+short-answer
        # fill): pack=2 fills 144/160 of each row vs 72/160 unpacked
        text = pack_train_batch(tok, prompts, answers, spec, pack)
    else:
        text = build_train_batch(tok, prompts, answers, spec)
    rng = np.random.RandomState(0)
    img = cfg.vit.img_size
    images = rng.randn(batch, img, img, 3).astype(np.float32)
    dev = {k: jnp.asarray(v) for k, v in text.items()}

    trainable, frozen = split_params(params)
    optimizer = make_optimizer(lambda step: 1e-5)
    opt_state = optimizer.init(trainable)

    # noise in its own program (in-graph RNG + big graphs crash this
    # image's backend — see smoothing/classifier.py)
    @jax.jit
    def noise_fn(image, key):
        return image + 0.5 * jax.random.normal(key, image.shape, image.dtype)

    @jax.jit
    def train_step(trainable, opt_state, frozen, batch_dev):
        def loss_fn(tr):
            return minigpt4_loss(merge_params(tr, frozen), cfg, batch_dev)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    image_dev = jnp.asarray(images)
    key = jax.random.PRNGKey(0)

    def step(i):
        b = dict(dev)
        b["image"] = noise_fn(image_dev, jax.random.fold_in(key, i))
        return train_step(trainable, opt_state, frozen, b)

    if "bsweep" in sys.argv[2:]:
        # batch x pack x seq sweep (r5): pack=2 halved the decoder rows
        # and freed ~HBM headroom next to the 9.2 GB of params — does a
        # LARGER per-step batch now raise samples/s (better ViT batch
        # efficiency: 17.0 ms/img at B=8 vs the serving tower's
        # 14.75 ms/img at B=100)? Every variant compiles AND times in
        # this ONE process (interleaved trials — cross-process TPU
        # timings drift ~5%). A bigger per-step microbatch is purely a
        # throughput knob: grad accumulation reaches the same global
        # batch with fewer accumulation steps.
        variants = [
            (8, 1, 160),   # r4 unpacked baseline
            (8, 2, 160),   # shipped pack=2
            (12, 2, 160),
            (16, 2, 160),
            (24, 2, 160),  # expected to probe the HBM ceiling
            (12, 3, 224),  # 3x72=216 <= 224: higher fill, +40% attn/sample
        ]
        arms = next(
            (a for a in sys.argv[2:] if a.startswith("arms=")), None
        )
        if arms:  # e.g. arms=8:2:160,12:3:224 overrides the default list
            variants = [
                tuple(int(x) for x in arm.split(":"))
                for arm in arms.split("=", 1)[1].split(",")
            ]
        jobs, shapes = {}, {}
        for bsz, pk, s_len in variants:
            name = f"b={bsz}/pack={pk}/S={s_len}"
            vspec = BatchSpec(
                seq_len=s_len, num_img_tokens=32, max_answer_len=24
            )
            vprompts = [
                f"<Img><ImageHere></Img> [vqa] what is object {i}?"
                for i in range(bsz)
            ]
            vanswers = ["cat" if i % 2 == 0 else "dog" for i in range(bsz)]
            t = (
                pack_train_batch(tok, vprompts, vanswers, vspec, pk)
                if pk > 1
                else build_train_batch(tok, vprompts, vanswers, vspec)
            )
            bv = {kk: jnp.asarray(vv) for kk, vv in t.items()}
            vimg = jnp.asarray(
                rng.randn(bsz, img, img, 3).astype(np.float32)
            )
            bv["image"] = noise_fn(vimg, jax.random.fold_in(key, bsz))
            jax.block_until_ready(bv["image"])
            jobs[name] = (train_step, (trainable, opt_state, frozen, bv))
            shapes[name] = (bsz, bsz // pk, s_len)

        times, temp_gb = _compile_and_time(jobs)
        peak = chip_peak_tflops(jax.devices()[0])
        report_variants = {}
        for name, ts in times.items():
            bsz, rows, s_len = shapes[name]
            step_tflop = _train_step_tflops(cfg, bsz, rows, s_len)
            report_variants[name] = {
                "ms": round(1000 * min(ts), 1),
                "temp_gb": temp_gb[name],
                "samples_per_sec": round(bsz / min(ts), 2),
                "mfu": round(step_tflop / min(ts) / peak, 3),
            }
        print(json.dumps({
            "metric": "train_step_batch_pack_sweep",
            "variants": report_variants,
            "failed": {
                n: v for n, v in temp_gb.items() if isinstance(v, str)
            },
        }), flush=True)
        return

    if "sweep" in sys.argv[2:]:
        # selective-remat sweep (VERDICT r4 item 2): every variant
        # compiled AND timed in this one process, interleaved trials.
        # memory_analysis reports XLA's compile-time buffer plan — the
        # apples-to-apples activation-memory axis (device memory_stats'
        # peak is a process-lifetime high-water mark, useless after the
        # first variant runs).
        import dataclasses

        variants = [
            ("full", 1, 1),      # r1-r4 behavior: save nothing
            ("dots", 1, 1),      # keep plain matmul outputs
            ("dots_all", 1, 1),  # + attention score/context dots
            ("full", 2, 1),      # checkpoint every 2nd block only
            ("dots", 2, 1),
            ("full", 4, 1),
            # sequence packing (VERDICT r4 item 5) at the default remat:
            # same 8 samples in batch/2 rows — measured against the
            # unpacked variants in THIS process
            ("full", 1, 2),
            ("dots", 1, 2),
        ]
        noisy = noise_fn(image_dev, jax.random.fold_in(key, 0))
        jax.block_until_ready(noisy)
        batches = {}
        for pk in sorted({v[2] for v in variants}):
            t = (
                pack_train_batch(tok, prompts, answers, spec, pk)
                if pk > 1 else build_train_batch(tok, prompts, answers, spec)
            )
            b = {kk: jnp.asarray(vv) for kk, vv in t.items()}
            b["image"] = noisy
            batches[pk] = b
        jobs = {}
        for pol, k, pk in variants:
            name = f"{pol}/k={k}" + (f"/pack={pk}" if pk > 1 else "")
            b0 = batches[pk]
            vcfg = dataclasses.replace(
                cfg,
                llama=dataclasses.replace(
                    cfg.llama, remat_policy=pol, remat_every=k
                ),
            )

            def step_v(trainable, opt_state, frozen, batch_dev, _cfg=vcfg):
                def loss_fn(tr):
                    return minigpt4_loss(
                        merge_params(tr, frozen), _cfg, batch_dev
                    )

                loss, grads = jax.value_and_grad(loss_fn)(trainable)
                updates, new_opt = optimizer.update(
                    grads, opt_state, trainable
                )
                return optax.apply_updates(trainable, updates), new_opt, loss

            jobs[name] = (step_v, (trainable, opt_state, frozen, b0))

        times, temp_gb = _compile_and_time(jobs)
        report = {
            "metric": "train_step_remat_sweep",
            "batch": batch,
            "pack": pack,
            "variants": {
                name: {
                    "ms": round(1000 * min(ts), 1),
                    "temp_gb": temp_gb[name],
                    "samples_per_sec": round(batch / min(ts), 2),
                }
                for name, ts in times.items()
            },
            "failed": {
                n: v for n, v in temp_gb.items() if isinstance(v, str)
            },
        }
        print(json.dumps(report), flush=True)
        return

    t0 = time.time()
    _, _, loss = step(0)
    print(
        f"compile+first step: {time.time()-t0:.1f}s loss={float(loss):.3f}",
        file=sys.stderr, flush=True,
    )

    if "stages" in sys.argv[2:]:
        # per-stage decomposition (VERDICT r3 item 6): time nested
        # prefixes of the step as separate compiled programs — each
        # returns a full-tensor reduction so XLA cannot prune work —
        # and report the deltas. The separately-compiled prefixes lose
        # cross-stage fusion/overlap, so their sum can exceed the fused
        # whole step; the gap is reported as fusion_overlap_ms.
        from certifiedgpt_tpu.models.eva_vit import eva_vit_apply
        from certifiedgpt_tpu.models.minigpt4 import encode_img

        @jax.jit
        def probe_vit(frozen, images):
            return jnp.sum(
                eva_vit_apply(frozen["vit"], cfg.vit, images).astype(jnp.float32)
            )

        @jax.jit
        def probe_encode(trainable, frozen, images):
            merged = merge_params(trainable, frozen)
            return jnp.sum(
                encode_img(merged, cfg, images).astype(jnp.float32)
            )

        @jax.jit
        def probe_loss(trainable, frozen, batch_dev):
            return minigpt4_loss(merge_params(trainable, frozen), cfg, batch_dev)

        @jax.jit
        def probe_grads(trainable, frozen, batch_dev):
            def loss_fn(tr):
                return minigpt4_loss(merge_params(tr, frozen), cfg, batch_dev)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            return loss + jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(g.astype(jnp.float32)), grads, 0.0
            )

        b0 = dict(dev)
        b0["image"] = noise_fn(image_dev, jax.random.fold_in(key, 999))
        probes = {
            "vit_fwd": lambda: float(probe_vit(frozen, b0["image"])),
            "encode_fwd": lambda: float(probe_encode(trainable, frozen, b0["image"])),
            "loss_fwd": lambda: float(probe_loss(trainable, frozen, b0)),
            "grads": lambda: float(probe_grads(trainable, frozen, b0)),
            "full_step": lambda: float(step(999)[2]),
        }
        for fn in probes.values():
            fn()  # compile, untimed
        times = {name: [] for name in probes}
        for _ in range(4):  # interleaved trials (timings drift)
            for name, fn in probes.items():
                t0 = time.time()
                fn()
                times[name].append(time.time() - t0)
        ms = {name: 1000 * min(ts) for name, ts in times.items()}
        stages = {
            "vit_fwd_ms": ms["vit_fwd"],
            "qformer_proj_fwd_ms": ms["encode_fwd"] - ms["vit_fwd"],
            "decoder_fwd_ce_ms": ms["loss_fwd"] - ms["encode_fwd"],
            "backward_ms": ms["grads"] - ms["loss_fwd"],
            "optimizer_ms": ms["full_step"] - ms["grads"],
            "full_step_ms": ms["full_step"],
        }
        print(json.dumps({k: round(v, 1) for k, v in ms.items()}),
              file=sys.stderr, flush=True)
        print(json.dumps({k: round(v, 1) for k, v in stages.items()}),
              flush=True)
    reps = 5
    t0 = time.time()
    # reps re-run the SAME fixed-shape step from the initial state —
    # this times the compiled step, not a training trajectory
    for i in range(1, reps + 1):
        _, _, loss = step(i)
    float(loss)
    dt = (time.time() - t0) / reps

    # packed rows: the ViT still encodes every image, but the decoder
    # touches only batch/pack padded rows (the whole point of pack=K)
    step_tflop = _train_step_tflops(cfg, batch, batch // pack, seq)
    peak = chip_peak_tflops(jax.devices()[0])
    print(
        json.dumps(
            {
                "metric": "train_step_fullscale_ms",
                "value": round(dt * 1e3, 1),
                "unit": "ms",
                "batch": batch,
                "samples_per_sec": round(batch / dt, 2),
                "mfu": round(step_tflop / dt / peak, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
