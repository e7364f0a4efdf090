#!/usr/bin/env python
"""Headline benchmark: FULL-SCALE smoothed-certification throughput.

Measures the BASELINE.json north-star configuration — certify ONE VQAv2
image at n=1000 noise draws, sigma=0.5 — through the complete
reference-scale pipeline on one chip: EVA ViT-g/14 at 448px (39 layers,
~1.0B), 12-layer Q-Former, Vicuna-7B-architecture decoder, on-device
Gaussian noise -> encode -> greedy KV-cache decode -> host answer->label
mapping -> Clopper-Pearson certification. By default the towers serve in
the W8A8 mode (int8 decoder + int8 ViT qkv/proj/fc1/fc2 kernels, dynamic
per-row int8 activations on compute-bound calls — ops/quantization.py);
``--no-act-quant`` reverts to bf16 activations over the weight-only int8
decoder. Weights are seeded-random at the checkpoint shapes (real
checkpoints are not shipped in this image); the compute cost is
identical to a real run.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ...}
``vs_baseline`` is the <10 s v4-8 target (BASELINE.md) converted to this
chip's bf16 peak (v4-8 = 4x275 TFLOPs), divided by the measured seconds —
>1.0 beats the target at compute parity. A detail record (per-draw
TFLOPs, MFU, draws/s) goes to stderr and BENCH.md.

Takes ~4-7 min total on the tunneled v5e (device init + one large XLA
compile + the measured run). ``--small`` runs the old bench-scale proxy
model instead (~40 s total) for quick regression checks.

Ref context: the reference never published throughput numbers
(SURVEY.md §6); the target is driver-supplied (BASELINE.json).
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

# bf16 peak TFLOPs per chip, by jax device_kind substring.
_CHIP_PEAK_TFLOPS = {
    "v6e": 918.0,
    "v6": 918.0,
    "v5p": 459.0,
    "v5e": 197.0,
    "v5 lite": 197.0,  # axon reports device_kind "TPU v5 lite"
    "v5litepod": 197.0,
    "v4": 275.0,
    "v3": 123.0,
}
_DEFAULT_PEAK = 197.0  # assume v5e when the kind is unrecognized (axon)


def chip_peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _CHIP_PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return _DEFAULT_PEAK


def flops_split_per_draw(cfg, seq_len: int, new_tokens: int):
    """Analytic matmul FLOPs for ONE noise draw through the full pipeline
    (ViT encode + Q-Former + projection + decoder prefill + greedy decode),
    split by the MXU path that executes them: ``(int8_flops, bf16_flops)``.
    2 FLOPs per MAC; attention counted as the two S x S batched matmuls.

    The int8 bucket holds exactly the matmuls the W8A8 serving mode runs
    on the double-rate int8 MXU path (ops/quantization.py): the ViT
    qkv/proj/fc1/fc2 kernels when ``cfg.vit.act_quant`` and the decoder's
    multi-token (prefill) q/k/v/o/gate/up/down matmuls when
    ``cfg.llama.act_quant``. Everything else — ViT attention + patchify,
    the whole Q-Former, the projection, decoder attention, the bf16
    lm_head, and the memory-bound single-token decode matmuls (weight-only
    int8: dequantized to bf16 MACs) — stays in the bf16 bucket. The split
    feeds ``hw_util_vs_mixed_peak`` (utilization against the peak of the
    precision mix actually executed) next to the model-FLOP ``mfu``
    (everything divided by the bf16 peak)."""
    v = cfg.vit
    S, d, i = v.seq_len, v.embed_dim, v.mlp_hidden
    vit_dense = v.depth * (8 * S * d * d + 4 * S * d * i)  # qkv/proj/fc1/fc2
    vit_attn = v.depth * 4 * S * S * d
    vit_patch = 2 * S * (v.patch_size**2 * v.in_channels) * d  # patchify

    q = cfg.qformer
    Q, h, qi, K, ew = (
        q.num_query_tokens,
        q.hidden_size,
        q.intermediate_size,
        S,
        q.encoder_width,
    )
    qf = q.num_layers * (8 * Q * h * h + 4 * Q * Q * h + 4 * Q * h * qi)
    n_cross = sum(1 for l in range(q.num_layers) if q.has_cross_attention(l))
    qf += n_cross * (4 * Q * h * h + 4 * K * ew * h + 4 * Q * K * h)

    lc = cfg.llama
    D, I = lc.hidden_size, lc.intermediate_size
    kvd = lc.num_kv_heads * lc.head_dim
    proj = 2 * Q * h * D
    per_tok_mm = (
        2 * D * (lc.num_heads * lc.head_dim)  # q
        + 4 * D * kvd  # k, v
        + 2 * (lc.num_heads * lc.head_dim) * D  # o
        + 6 * D * I  # gate, up, down
    )
    prefill_mm = lc.num_layers * seq_len * per_tok_mm
    prefill_attn = lc.num_layers * 4 * seq_len * seq_len * D
    lm_head = 2 * D * lc.vocab_size  # last position only
    decode = new_tokens * (
        lc.num_layers * (per_tok_mm + 4 * (seq_len + new_tokens) * D)
        + 2 * D * lc.vocab_size
    )

    int8 = 0.0
    if getattr(v, "act_quant", False):
        int8 += vit_dense
        vit_dense = 0.0
    if getattr(lc, "act_quant", False):
        int8 += prefill_mm
        prefill_mm = 0.0
    bf16 = (
        vit_dense + vit_attn + vit_patch + qf + proj
        + prefill_mm + prefill_attn + lm_head + decode
    )
    return float(int8), float(bf16)


def flops_per_draw(cfg, seq_len: int, new_tokens: int) -> float:
    """Total model FLOPs for one draw (see ``flops_split_per_draw``)."""
    int8, bf16 = flops_split_per_draw(cfg, seq_len, new_tokens)
    return int8 + bf16


def build_full_int8_params(cfg):
    """Init the full model directly at serving layout: int8-quantized
    decoder kernels, ViT quantized per ``cfg.vit.act_quant`` (int8
    qkv/proj/fc1/fc2 when set -> ~8.5 GB total, bf16 -> ~9.2 GB) —
    module-by-module so peak HBM stays ~one fp32 layer-stack above the
    final footprint."""
    import jax
    import jax.numpy as jnp

    from certifiedgpt_tpu.models import layers as L
    from certifiedgpt_tpu.models.eva_vit import init_eva_vit
    from certifiedgpt_tpu.models.qformer import init_qformer

    lc = cfg.llama

    from certifiedgpt_tpu.ops.quantization import (
        quantize_eva_vit,
        quantize_stacked_kernel,
    )

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def init_q_module(key, in_dim, out_dim):
        w = 0.02 * jax.random.normal(
            key, (lc.num_layers, in_dim, out_dim), jnp.float32
        )
        return quantize_stacked_kernel(w)

    key = jax.random.PRNGKey(0)
    d, dh = lc.hidden_size, lc.head_dim
    kvd, inter = lc.num_kv_heads * dh, lc.intermediate_size
    mods = {
        "q_proj": (d, lc.num_heads * dh), "k_proj": (d, kvd),
        "v_proj": (d, kvd), "o_proj": (lc.num_heads * dh, d),
        "gate_proj": (d, inter), "up_proj": (d, inter), "down_proj": (inter, d),
    }
    layers = {
        name: init_q_module(jax.random.fold_in(key, i), di, do)
        for i, (name, (di, do)) in enumerate(mods.items())
    }
    layers["input_layernorm"] = {"scale": jnp.ones((lc.num_layers, d), jnp.bfloat16)}
    layers["post_attention_layernorm"] = {
        "scale": jnp.ones((lc.num_layers, d), jnp.bfloat16)
    }
    llama = {
        "embed_tokens": {
            "embedding": 0.02 * jax.random.normal(
                jax.random.fold_in(key, 100), (lc.vocab_size, d), jnp.bfloat16
            )
        },
        "layers": layers,
        "norm": {"scale": jnp.ones((d,), jnp.bfloat16)},
        "lm_head": {
            "kernel": 0.02 * jax.random.normal(
                jax.random.fold_in(key, 101), (d, lc.vocab_size), jnp.bfloat16
            )
        },
    }
    vit = jax.jit(functools.partial(init_eva_vit, cfg=cfg.vit))(
        jax.random.fold_in(key, 200)
    )
    if cfg.vit.act_quant:
        vit = jax.jit(quantize_eva_vit)(vit)
    return {
        "vit": vit,
        "ln_vision": L.init_layer_norm(cfg.vit.embed_dim, jnp.bfloat16),
        "qformer": jax.jit(functools.partial(init_qformer, cfg=cfg.qformer))(
            jax.random.fold_in(key, 201)
        ),
        "llama_proj": L.init_dense(
            jax.random.fold_in(key, 202),
            cfg.qformer.hidden_size, d, dtype=jnp.float32,
        ),
        "llama": llama,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--small", action="store_true",
        help="bench-scale proxy model (fast regression check)",
    )
    parser.add_argument("--mc-batch", type=int, default=None)
    parser.add_argument("--sigma", type=float, default=0.5)
    parser.add_argument("--n", type=int, default=1000)
    parser.add_argument("--n0", type=int, default=100)
    parser.add_argument("--max-new-tokens", type=int, default=10)
    parser.add_argument("--seq-len", type=int, default=96)
    parser.add_argument(
        "--no-act-quant", action="store_true",
        help="disable W8A8 activation quant (full-scale mode only): "
        "bf16 activations against int8 decoder weights, bf16 ViT",
    )
    parser.add_argument(
        "--attn-impl", default="flash_cls",
        choices=["xla", "flash", "flash_cls", "flash_custom"],
        help="ViT attention kernel (full-scale mode only); flash_cls is "
        "the r3 cls-split exact-1024 kernel",
    )
    parser.add_argument(
        "--early-exit", action="store_true",
        help="decode under lax.while_loop, exiting the moment every row "
        "has emitted EOS (the shipped serving configs' run.early_exit). "
        "Pair with --eos-bias: random weights never emit EOS, so without "
        "the bias the loop runs the full budget and costs ~9%%",
    )
    parser.add_argument(
        "--eos-bias", type=float, default=None,
        help="add this lm_head bias to the EOS logit so the synthetic "
        "weights emit EOS after ~1-4 tokens like a real VQA checkpoint "
        "(the early-exit serving measurement, full-scale mode only); "
        "the detail record reports the realized mean answer length",
    )
    parser.add_argument(
        "--no-kv-quant", action="store_true",
        help="disable the int8 KV cache (full-scale mode only): bf16 "
        "cache; note the bf16 cache does not fit mc_batch > ~50 on a "
        "16 GB chip",
    )
    args = parser.parse_args(argv)

    import os

    import jax

    if os.environ.get("CERTGPT_BENCH_PLATFORM"):
        # test hook: this image's sitecustomize pins jax to the TPU
        # plugin, so the CPU-backend watchdog tests must override via
        # jax.config (env vars are ignored — see tests/conftest.py)
        jax.config.update("jax_platforms", os.environ["CERTGPT_BENCH_PLATFORM"])

    from certifiedgpt_tpu.data.text import ByteTokenizer
    from certifiedgpt_tpu.models.minigpt4 import MiniGPT4Config, init_minigpt4
    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model
    from certifiedgpt_tpu.smoothing.classifier import AnswerVocabulary, make_sample_fn
    from certifiedgpt_tpu.smoothing.smoothing import Smooth

    if args.small:
        cfg = MiniGPT4Config.small()
        params = init_minigpt4(jax.random.PRNGKey(0), cfg)
        mc_batch = args.mc_batch or 100
        metric = "certify_1_image_n1000_sigma0.5_smallmodel_seconds"
        target_chip_seconds = 10.0
    else:
        # full reference scale; the vision tower uses the builtin flash
        # kernel (full-sequence blocks — see ops/flash_attention) and,
        # by default, the W8A8 serving mode: int8 qkv/proj/fc1/fc2 ViT
        # kernels + int8 decoder kernels with dynamic per-row activation
        # quant on compute-bound (multi-token) calls — the MXU's
        # double-rate int8 path (ops/quantization.py; docs/DESIGN.md).
        from certifiedgpt_tpu.models.eva_vit import EvaViTConfig
        from certifiedgpt_tpu.models.llama import LlamaConfig

        aq = not args.no_act_quant
        kvq = not args.no_kv_quant
        cfg = MiniGPT4Config(
            vit=EvaViTConfig(attn_impl=args.attn_impl, act_quant=aq),
            llama=LlamaConfig(act_quant=aq, kv_quant=kvq),
        )
        params = build_full_int8_params(cfg)
        # mc_batch=100 (fits one v5e thanks to the int8 KV cache):
        # with the r3 cls-split split-stream ViT the old HBM-pressure
        # penalty flipped — 28.2 s vs 30.5 s at mc=50 (and 11 zero-waste
        # chunks for n0=100/n=1000 instead of 22).
        mc_batch = args.mc_batch or 100
        metric = "certify_1_image_n1000_sigma0.5_fullscale_int8_seconds"
        peak = chip_peak_tflops(jax.devices()[0])
        # the <10 s v4-8 target expressed in this chip's compute
        target_chip_seconds = 10.0 * (4 * 275.0) / peak

    tokenizer = ByteTokenizer()
    if args.eos_bias is not None:
        import jax.numpy as jnp

        # nudge the synthetic lm_head toward EOS so the decode emits it
        # after ~1-4 tokens like a real VQA checkpoint (measured-length
        # check in the detail record); the bias leaf is the documented
        # lm_head extension point (models/llama.py::lm_head_logits)
        vocab_size = params["llama"]["lm_head"]["kernel"].shape[-1]
        params["llama"]["lm_head"]["bias"] = (
            jnp.zeros((vocab_size,), jnp.float32)
            .at[tokenizer.eos_token_id].set(args.eos_bias)
        )
    model = MiniGPT4Model(cfg, params, tokenizer)
    vocab = AnswerVocabulary(["cat", "dog", "bird", "2", "yes", "no"])
    # the prompt byte-tokenizes to 80 of seq_len=96 positions (1 bos +
    # 32 image tokens + 47 text bytes) — the same ~80% fill a real LLaMA
    # tokenizer reaches with the reference's full vqa instruction, and
    # nothing truncates (r4; the longer r2-r3 question overflowed
    # seq_len under the byte tokenizer and measured with a front-
    # truncation warning)
    instruction = (
        "<Img><ImageHere></Img> [vqa] Based on the image, "
        "what animal is this?"
    )
    gen = None
    if not args.small:
        from certifiedgpt_tpu.smoothing.classifier import (
            make_noisy_generate_fn,
        )

        gen = make_noisy_generate_fn(
            model, args.sigma, mc_batch, args.max_new_tokens,
            seq_len=args.seq_len, early_exit=args.early_exit,
        )
    sample_fn = make_sample_fn(
        model, instruction, vocab, args.sigma,
        mc_batch=mc_batch, max_new_tokens=args.max_new_tokens,
        seq_len=args.seq_len, early_exit=args.early_exit, gen=gen,
    )
    smooth = Smooth(sample_fn, vocab.num_classes, args.sigma)

    rng = np.random.RandomState(0)
    image = rng.randn(cfg.vit.img_size, cfg.vit.img_size, 3).astype(np.float32)

    # warmup: compile the noisy-generate graph
    sample_fn(image, mc_batch, seed=123)

    t0 = time.time()
    label, radius = smooth.certify(
        image, n0=args.n0, n=args.n, alpha=0.001, seed=7
    )
    seconds = time.time() - t0

    mean_answer_tokens = None
    if gen is not None:
        # realized answer length (post-measurement probe chunk): with
        # --eos-bias this verifies the synthetic weights really emit EOS
        # after ~1-4 tokens like a real VQA checkpoint
        import jax.numpy as jnp

        from certifiedgpt_tpu.data.text import BatchSpec, build_gen_batch

        spec = BatchSpec(seq_len=args.seq_len, num_img_tokens=cfg.num_img_tokens)
        prompt = build_gen_batch(model.tokenizer, [instruction], spec)
        p_ids, p_am, p_pos = gen.tile_prompt(
            jnp.asarray(prompt["input_ids"]),
            jnp.asarray(prompt["attention_mask"]),
            jnp.asarray(prompt["img_pos"]),
        )
        toks = np.asarray(
            gen(model.params, jnp.asarray(image), p_ids, p_am, p_pos,
                jax.random.PRNGKey(5), sigma_override=args.sigma)
        )
        eos = model.tokenizer.eos_token_id
        has_eos = (toks == eos).any(axis=1)
        first_eos = np.argmax(toks == eos, axis=1)
        lens = np.where(has_eos, first_eos, toks.shape[1])
        mean_answer_tokens = float(np.mean(lens))
        max_answer_tokens = int(np.max(lens))

    # utilization detail (stderr; stdout stays one JSON line)
    chunks = -(-args.n0 // mc_batch) + -(-args.n // mc_batch)
    draws = chunks * mc_batch
    # with early exit the while_loop runs each chunk to its LONGEST
    # row's EOS (+1 step to observe it), not max_new_tokens — account
    # the FLOPs actually executed so the early-exit row's MFU is honest
    new_tokens_done = args.max_new_tokens
    if args.early_exit and mean_answer_tokens is not None:
        new_tokens_done = min(args.max_new_tokens, max_answer_tokens + 1)
    int8_fl, bf16_fl = flops_split_per_draw(cfg, args.seq_len, new_tokens_done)
    tflop_draw = (int8_fl + bf16_fl) / 1e12
    peak = chip_peak_tflops(jax.devices()[0])
    # hardware utilization against the MIXED peak: int8 matmuls ride the
    # MXU's double-rate path, so the ideal time for the executed mix is
    # int8/(2*peak) + bf16/peak — `mfu` (all FLOPs / bf16 peak) flatters
    # a W8A8 stack by up to the int8 fraction; both are reported
    # (VERDICT r4 item 4)
    hw_util = (
        draws * (int8_fl / 2 + bf16_fl) / 1e12 / seconds / peak
    )
    detail = {
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "mc_batch": mc_batch,
        "draws_dispatched": draws,
        "tflops_per_draw": round(tflop_draw, 3),
        "model_tflops_per_sec": round(draws * tflop_draw / seconds, 1),
        "mfu": round(draws * tflop_draw / seconds / peak, 3),
        "hw_util_vs_mixed_peak": round(hw_util, 3),
        "int8_flop_fraction": round(int8_fl / (int8_fl + bf16_fl), 3),
        "draws_per_sec": round(draws / seconds, 1),
        "label": int(label),
        "radius": round(float(radius), 4),
    }
    if mean_answer_tokens is not None:
        detail["mean_answer_tokens"] = round(mean_answer_tokens, 2)
    if args.early_exit:
        detail["early_exit"] = True
        detail["eos_bias"] = args.eos_bias
    print(json.dumps(detail), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(seconds, 2),
                "unit": "s",
                "vs_baseline": round(target_chip_seconds / seconds, 3),
            }
        )
    )


def _probe_device(timeout_s: float) -> bool:
    """True iff a trivial device op completes within ``timeout_s``.

    Run in a SUBPROCESS so a hung axon tunnel (observed to stall for
    5-30 min stretches) cannot wedge the watchdog itself.
    """
    import os
    import subprocess

    platform = os.environ.get("CERTGPT_BENCH_PLATFORM")
    bootstrap = (
        f"import jax; jax.config.update('jax_platforms', {platform!r}); "
        if platform
        else "import jax; "
    )
    try:
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                bootstrap
                + "import jax.numpy as jnp;"
                "print(float(jnp.sum(jnp.ones((4, 4)))))",
            ],
            capture_output=True,
            timeout=timeout_s,
        )
        return proc.returncode == 0
    except Exception:
        return False


def _watchdog_main():
    """Driver entry: supervise the measurement in a child process.

    The driver invokes ``python bench.py`` exactly once per round; the
    tunneled TPU in this image intermittently hangs long enough to eat
    that one shot. The parent therefore (1) health-gates the tunnel with
    a tiny subprocess op, (2) runs the real benchmark as a child with a
    hard timeout, and (3) retries within a total budget, emitting the
    child's single stdout JSON line on success. Nothing is ever killed
    by pattern — only the child PID via ``subprocess`` timeout handling.

    ``--direct`` (or the child's own env marker) bypasses supervision.
    """
    import os
    import subprocess

    if os.environ.get("CERTGPT_BENCH_CHILD") or "--direct" in sys.argv:
        main([a for a in sys.argv[1:] if a != "--direct"])
        return

    budget_s = float(os.environ.get("CERTGPT_BENCH_BUDGET_S", 2400))
    attempt_timeout_s = float(os.environ.get("CERTGPT_BENCH_ATTEMPT_S", 1500))
    deadline = time.time() + budget_s
    env = dict(os.environ, CERTGPT_BENCH_CHILD="1")
    attempt = 0
    child_failures = 0
    while True:
        remaining = deadline - time.time()
        if remaining <= 60:
            print(
                f"bench watchdog: budget exhausted after {attempt} attempts",
                file=sys.stderr,
            )
            sys.exit(1)
        if not _probe_device(min(150.0, remaining)):
            print("bench watchdog: tunnel unhealthy, waiting", file=sys.stderr)
            time.sleep(min(45.0, max(1.0, deadline - time.time())))
            continue
        attempt += 1
        # the probe above can itself take up to 150 s — recompute the
        # leftover budget so the child's timeout can't overshoot the
        # deadline by the probe's duration
        remaining = max(1.0, deadline - time.time())
        try:
            proc = subprocess.run(
                [sys.executable, sys.argv[0], *sys.argv[1:]],
                env=env,
                capture_output=True,
                text=True,
                timeout=min(attempt_timeout_s, remaining),
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench watchdog: attempt {attempt} timed out",
                file=sys.stderr,
            )
            continue
        sys.stderr.write(proc.stderr[-4000:])
        line = next(
            (
                ln
                for ln in reversed(proc.stdout.strip().splitlines())
                if ln.startswith("{") and '"metric"' in ln
            ),
            None,
        )
        if proc.returncode == 0 and line:
            print(line)
            return
        # a non-timeout child failure is likely deterministic (bad args,
        # OOM, code bug) — retrying forever would burn the whole budget;
        # timeouts (tunnel hangs) keep retrying above
        child_failures += 1
        print(
            f"bench watchdog: attempt {attempt} failed rc={proc.returncode}",
            file=sys.stderr,
        )
        if child_failures >= 3:
            print(
                "bench watchdog: repeated child failures, giving up",
                file=sys.stderr,
            )
            sys.exit(proc.returncode or 1)


if __name__ == "__main__":
    _watchdog_main()
