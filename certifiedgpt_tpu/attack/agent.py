"""Attack-evaluation agent (``image_text_attack``).

Drives the full AttackVLM-style pipeline over a VQAv2/CC-SBU subset
(SURVEY.md §2.9 — capability described in the reference README with no
code): for each image, pick a *target* text (another sample's answer or
a configured target list), craft an adversarial image against the CLIP
surrogate ensemble (PGD transfer stage + optional RGF query stage),
caption clean and adversarial images with the victim MiniGPT-4, and
score attack success by CLIP-text similarity movement toward the
target. Reports per-backbone success rates across noise levels plus the
ANCOVA table (ref ``README.md:108-120,160``).

Run-block knobs: ``attack_backbones`` (subset of rn50/rn101/blip2_vit/vit_b16/
vit_b32/vit_l14; tiny variants for tests), ``attack_epsilon``,
``attack_steps``, ``attack_step_size``, ``rgf_queries``, ``rgf_iters``,
``max_images``, ``noise_level`` (victim-side smoothing sigma),
``clip_model`` (HF dir for pretrained surrogate weights + tokenizer).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from certifiedgpt_tpu.agents.base import BaseAgent
from certifiedgpt_tpu.attack.attack import (
    SurrogateEncoder,
    ancova,
    attack_success,
    cosine_similarity,
    make_pgd_attack,
    rgf_refine,
)
from certifiedgpt_tpu.attack.clip import (
    ClipResNetConfig,
    ClipTextConfig,
    ClipViTConfig,
    clip_resnet_image,
    clip_text,
    clip_vit_image,
    init_clip_resnet,
    init_clip_text,
    init_clip_vit,
)
from certifiedgpt_tpu.common.registry import registry
from certifiedgpt_tpu.data.loader import shard_batch
from certifiedgpt_tpu.data.processors import CLIP_MEAN, CLIP_STD
from certifiedgpt_tpu.data.text import BatchSpec, build_gen_batch, clean_answer
from certifiedgpt_tpu.models.minigpt4 import generate_greedy

def caption_key(seed: int, stream: Sequence[int], sigma: float):
    """PRNG key for one victim caption draw.

    ``stream`` is a tuple of ints identifying the caller's draw —
    ``(0, image)`` clean, ``(1, image, backbone)`` adversarial score,
    ``(2, image, sigma_idx, backbone, query)`` RGF query. fold_in
    chaining keeps the streams disjoint by construction: arithmetic
    packing (the old ``tag*1000+step``) collided across callers once the
    RGF budget crossed the pack base, silently correlating the
    supposedly independent smoothing draws. sigma's bit pattern is
    folded last so noise-grid rows draw independently too (same
    rationale as ``agents.certify.certify_seed``).
    """
    rng = jax.random.PRNGKey(seed)
    for part in stream:
        rng = jax.random.fold_in(rng, int(part))
    return jax.random.fold_in(
        rng, int(np.float32(sigma).view(np.uint32)) & 0x7FFFFFFF
    )


_BACKBONES: Dict[str, Callable[[], Tuple[Any, Any, int]]] = {}


def _register_backbone(name):
    def wrap(fn):
        _BACKBONES[name] = fn
        return fn

    return wrap


@_register_backbone("vit_b32")
def _vit_b32():
    return ClipViTConfig.b32(), clip_vit_image, init_clip_vit


@_register_backbone("vit_b16")
def _vit_b16():
    return ClipViTConfig.b16(), clip_vit_image, init_clip_vit


@_register_backbone("vit_l14")
def _vit_l14():
    return ClipViTConfig.l14(), clip_vit_image, init_clip_vit


@_register_backbone("rn50")
def _rn50():
    return ClipResNetConfig.rn50(), clip_resnet_image, init_clip_resnet


@_register_backbone("rn101")
def _rn101():
    return ClipResNetConfig.rn101(), clip_resnet_image, init_clip_resnet


@_register_backbone("blip2_vit")
def _blip2_vit():
    """BLIP-family surrogate (the attack description's 'CLIP/BLIP
    ensemble', SURVEY.md §2.9): BLIP-2's vision tower IS EVA ViT-g —
    reuse the framework's encoder; the feature is the cls token."""
    from certifiedgpt_tpu.models.eva_vit import (
        EvaViTConfig,
        eva_vit_apply,
        init_eva_vit,
    )

    cfg = EvaViTConfig(img_size=224, dtype=jnp.float32)

    def feature(params, vcfg, images):
        return eva_vit_apply(params, vcfg, images)[:, 0]  # cls token

    return cfg, feature, init_eva_vit


@_register_backbone("blip2_vit_tiny")
def _blip2_vit_tiny():
    from certifiedgpt_tpu.models.eva_vit import (
        EvaViTConfig,
        eva_vit_apply,
        init_eva_vit,
    )

    cfg = EvaViTConfig.tiny()

    def feature(params, vcfg, images):
        return eva_vit_apply(params, vcfg, images)[:, 0]

    return cfg, feature, init_eva_vit


@_register_backbone("vit_tiny")
def _vit_tiny():
    return ClipViTConfig.tiny(), clip_vit_image, init_clip_vit


@_register_backbone("rn_tiny")
def _rn_tiny():
    return ClipResNetConfig.tiny(), clip_resnet_image, init_clip_resnet


class _HashTextEncoder:
    """Dependency-free stand-in text scorer: bag-of-words hash embedding.

    Used when no pretrained CLIP text tower/tokenizer is configured
    (random-weight runs, tests). Real runs configure ``clip_model`` and
    get the true CLIP text encoder.
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _bucket(self, word: str) -> int:
        import hashlib

        # hashlib, not hash(): Python's str hash is per-process salted and
        # would make attack scores irreproducible across runs
        digest = hashlib.md5(word.encode("utf-8")).digest()
        return int.from_bytes(digest[:4], "little") % self.dim

    def __call__(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            for word in text.lower().split():
                out[i, self._bucket(word)] += 1.0
        norm = np.linalg.norm(out, axis=-1, keepdims=True)
        return out / np.maximum(norm, 1e-8)


@registry.register_agent("image_text_attack")
class AttackAgent(BaseAgent):
    def __init__(self, config):
        super().__init__(config)
        run = self.run_cfg
        self.backbone_names = list(
            run.get("attack_backbones", ["vit_b32", "vit_b16", "rn50"])
        )
        self.epsilon = float(run.get("attack_epsilon", 8.0 / 255.0))
        self.steps = int(run.get("attack_steps", 100))
        self.step_size = float(run.get("attack_step_size", 1.0 / 255.0))
        self.rgf_queries = int(run.get("rgf_queries", 0))
        self.rgf_iters = int(run.get("rgf_iters", 4))
        self.max_images = run.get("max_images")
        self.noise_level = float(run.get("noise_level", 0.0))
        self.max_new_tokens = int(run.get("max_new_tokens", 10))
        self.seq_len = int(run.get("seq_len", 96))
        self.seed = int(run.get("seed", 42))

        finetuned = self.load_finetuned(
            {"llama_proj": self.model.params["llama_proj"]}
        )
        if finetuned is not None:
            self.model.params["llama_proj"] = finetuned["llama_proj"]

        self.encoders = self._build_encoders()
        self.text_encoder = self._build_text_encoder()
        self._victim_generate = self._build_victim()

    # ------------------------------------------------------------------
    @staticmethod
    def _shapes_match(template, converted) -> bool:
        """Same pytree structure AND leaf shapes — guards against loading
        a same-depth/different-patch CLIP variant whose converter happens
        to succeed (e.g. a ViT-B/32 dir into the vit_b16 config): the
        mismatch would otherwise only explode inside the first jitted
        PGD trace."""
        try:
            t_leaves, t_def = jax.tree.flatten(template)
            c_leaves, c_def = jax.tree.flatten(converted)
        except Exception:
            return False
        return t_def == c_def and all(
            getattr(a, "shape", None) == getattr(b, "shape", None)
            for a, b in zip(t_leaves, c_leaves)
        )

    def _build_encoders(self) -> List[SurrogateEncoder]:
        encoders = []
        for i, name in enumerate(self.backbone_names):
            if name not in _BACKBONES:
                raise KeyError(f"Unknown attack backbone '{name}'")
            cfg, apply_fn, init_fn = _BACKBONES[name]()
            params = init_fn(jax.random.PRNGKey(1000 + i), cfg)
            loaded = False
            # per-backbone dir first (clip_model_vit_b16: one HF dir per
            # variant), then the shared clip_model as a fallback — with a
            # shape check either way
            clip_dir = self.run_cfg.get(
                f"clip_model_{name}", self.run_cfg.get("clip_model")
            )
            if clip_dir and name.startswith("vit") and os.path.exists(str(clip_dir)):
                try:
                    from transformers import CLIPModel

                    from certifiedgpt_tpu.attack.clip import convert_hf_clip

                    hf = CLIPModel.from_pretrained(str(clip_dir))
                    converted = convert_hf_clip(
                        hf.state_dict(), cfg, ClipTextConfig()
                    )["vision"]
                    if self._shapes_match(params, converted):
                        params = converted
                        loaded = True
                        self.logger.info(
                            "Loaded %s weights from %s", name, clip_dir
                        )
                    else:
                        self.logger.warning(
                            "clip dir %s does not match backbone %s "
                            "(wrong CLIP variant?); random init — set "
                            "run.clip_model_%s to the matching HF dir",
                            clip_dir, name, name,
                        )
                except Exception as exc:
                    self.logger.warning(
                        "CLIP load failed for %s (%s); random init", name, exc
                    )
            rn_ckpt = self.run_cfg.get(f"clip_model_{name}")
            if name.startswith("rn") and rn_ckpt and os.path.exists(str(rn_ckpt)):
                # OpenAI ``visual.*`` ResNet checkpoint (RN50/RN101 rows
                # of ref README.md:114-115)
                try:
                    from certifiedgpt_tpu.attack.clip import (
                        convert_openai_clip_resnet,
                    )
                    from certifiedgpt_tpu.models.model_zoo import _torch_load

                    # tensor-safe load with trusted-local pickle fallback
                    sd = _torch_load(str(rn_ckpt))
                    if hasattr(sd, "state_dict"):
                        sd = sd.state_dict()
                    converted = convert_openai_clip_resnet(sd, cfg)
                    if self._shapes_match(params, converted):
                        params = converted
                        loaded = True
                        self.logger.info(
                            "Loaded %s weights from %s", name, rn_ckpt
                        )
                    else:
                        self.logger.warning(
                            "checkpoint %s does not match backbone %s; "
                            "random init", rn_ckpt, name,
                        )
                except Exception as exc:
                    self.logger.warning(
                        "CLIP ResNet load failed for %s (%s); random init",
                        name, exc,
                    )

            if name.startswith("blip2"):
                # BLIP surrogate weights: the reference's eva_vit_g.pth
                # (pos embed interpolates to the surrogate resolution)
                vit_path = self.config.model.get("eva_vit_g_pth")
                if vit_path and os.path.exists(str(vit_path)):
                    try:
                        from certifiedgpt_tpu.models.convert import (
                            convert_eva_vit_state_dict,
                        )
                        from certifiedgpt_tpu.models.model_zoo import (
                            _torch_load,
                        )

                        converted = convert_eva_vit_state_dict(
                            _torch_load(str(vit_path)), cfg
                        )
                        # same shape guard as the vit/rn paths above: a
                        # config-mismatched checkpoint (e.g. the full
                        # 39-layer eva against a tiny surrogate cfg) must
                        # fall back loudly, not surface later as an
                        # opaque shape error inside the jitted PGD trace
                        if self._shapes_match(params, converted):
                            params = converted
                            loaded = True
                            self.logger.info(
                                "Loaded %s weights from %s", name, vit_path
                            )
                        else:
                            self.logger.warning(
                                "eva checkpoint %s does not match "
                                "surrogate %s config; random init",
                                vit_path, name,
                            )
                    except Exception as exc:
                        self.logger.warning(
                            "EVA load failed for %s (%s); random init",
                            name, exc,
                        )

            if not loaded and not name.endswith("_tiny"):
                # full-scale surrogate on random features: the per-backbone
                # success rate and ANCOVA rows would LOOK like the
                # reference's result while measuring noise — shout
                self.logger.warning(
                    "attack backbone %s is running on RANDOM weights; its "
                    "success rate is meaningless (set run.clip_model / "
                    "run.clip_model_%s)", name, name,
                )

            def make_apply(fn, c):
                return lambda p, imgs: fn(p, c, imgs)

            encoders.append(
                SurrogateEncoder(
                    name=name,
                    apply_fn=make_apply(apply_fn, cfg),
                    params=params,
                    image_size=getattr(cfg, "image_size", None)
                    or getattr(cfg, "img_size"),
                )
            )
        return encoders

    def _build_text_encoder(self):
        """Real CLIP text tower + tokenizer when ``clip_model`` points at an
        HF CLIP dir; bag-of-words hash fallback otherwise."""
        clip_dir = self.run_cfg.get("clip_model")
        if clip_dir and os.path.exists(str(clip_dir)):
            try:
                from transformers import CLIPModel, CLIPTokenizerFast

                from certifiedgpt_tpu.attack.clip import convert_hf_clip

                hf = CLIPModel.from_pretrained(str(clip_dir))
                tok = CLIPTokenizerFast.from_pretrained(str(clip_dir))
                tcfg_hf = hf.config.text_config
                tcfg = ClipTextConfig(
                    vocab_size=tcfg_hf.vocab_size,
                    max_len=tcfg_hf.max_position_embeddings,
                    hidden_size=tcfg_hf.hidden_size,
                    num_layers=tcfg_hf.num_hidden_layers,
                    num_heads=tcfg_hf.num_attention_heads,
                    intermediate_size=tcfg_hf.intermediate_size,
                    projection_dim=hf.config.projection_dim,
                )
                vit_dummy = ClipViTConfig.tiny()
                text_params = convert_hf_clip(
                    hf.state_dict(), vit_dummy, tcfg
                )["text"]

                # params as an argument, not a closure (CLAUDE.md rule)
                fn = jax.jit(lambda p, ids: clip_text(p, tcfg, ids))

                def encode(texts):
                    batch = tok(
                        texts, padding="max_length", truncation=True,
                        max_length=tcfg.max_len, return_tensors="np",
                    )
                    embs = np.asarray(
                        fn(text_params, jnp.asarray(batch["input_ids"]))
                    )
                    norm = np.linalg.norm(embs, axis=-1, keepdims=True)
                    return embs / np.maximum(norm, 1e-8)

                self.logger.info("CLIP text encoder loaded from %s", clip_dir)
                return encode
            except Exception as exc:
                self.logger.warning(
                    "CLIP text encoder load failed (%s); hash fallback", exc
                )
        # loud, like the RANDOM-weights image-backbone warning: every
        # success rate / similarity / ANCOVA cell is scored by this
        # encoder, and a bag-of-words hash stand-in silently producing
        # legit-looking numbers is worse than no numbers
        self.logger.warning(
            "No CLIP text encoder available (run.clip_model=%r) — scoring "
            "with the bag-of-words HASH stand-in; attack metrics are NOT "
            "comparable to the reference until a CLIP HF dir is mounted",
            self.run_cfg.get("clip_model"),
        )
        return _HashTextEncoder()

    def _build_victim(self):
        cfg = self.model.cfg
        eos = self.model.tokenizer.eos_token_id
        pad = self.model.tokenizer.pad_token_id
        max_new = self.max_new_tokens

        # sigma is a RUNTIME scalar (like the certify pipeline,
        # smoothing/classifier.py): one compiled victim serves every row
        # of a run.sigma_grid sweep instead of re-paying the full-scale
        # generate compile per noise level. sigma=0 adds 0*noise — the
        # draw is negligible next to the decode.
        @jax.jit
        def gen(params, batch, rng, sigma):
            batch = dict(batch)
            noise = jax.random.normal(
                rng, batch["image"].shape, batch["image"].dtype
            )
            batch["image"] = batch["image"] + sigma * noise
            return generate_greedy(params, cfg, batch, max_new, eos, pad)

        return gen

    # ------------------------------------------------------------------
    def caption(
        self, pixels: np.ndarray, instruction: str, stream: Sequence[int],
        sigma: Optional[float] = None,
    ) -> str:
        """Victim caption of a [0,1]-pixel image (normalized inside with
        the dataset vis processor's mean/std — ``_pixel_stats``);
        ``sigma`` is the victim-side smoothing level (defaults to
        ``run.noise_level``). ``stream`` is a tuple of ints folded into
        the run seed one by one — fold_in chaining keeps every caller's
        draw stream disjoint by construction (arithmetic seed packing
        like ``tag*1000+step`` collided across callers once the RGF
        budget crossed the pack base)."""
        if sigma is None:
            sigma = self.noise_level
        mean, std = self._pixel_stats()
        size = self.model.cfg.vit.img_size
        img = jnp.asarray((pixels - mean) / std, jnp.float32)
        img = jax.image.resize(img, (size, size, 3), "bilinear")
        spec = BatchSpec(
            seq_len=self.seq_len, num_img_tokens=self.model.cfg.num_img_tokens
        )
        prompt = build_gen_batch(self.model.tokenizer, [instruction], spec)
        batch = shard_batch(prompt, None)
        batch["image"] = img[None]
        rng = caption_key(self.seed, stream, sigma)
        tokens = np.asarray(
            self._victim_generate(
                self.model.params, batch, rng, jnp.float32(sigma)
            )
        )[0]
        from certifiedgpt_tpu.data.text import decode_until_eos

        return clean_answer(decode_until_eos(self.model.tokenizer, tokens))

    # ------------------------------------------------------------------
    def _pixel_stats(self):
        """The vis processor's actual normalization constants (config-
        overridable — hardcoding CLIP_MEAN/STD would shift the whole
        pixel space the epsilon ball and clipping operate in whenever a
        dataset config sets its own mean/std)."""
        proc = getattr(getattr(self, "_pixel_dataset", None), "vis_processor", None)
        mean = np.asarray(getattr(proc, "mean", CLIP_MEAN), np.float32)
        std = np.asarray(getattr(proc, "std", CLIP_STD), np.float32)
        return mean, std

    def run(self) -> Dict[str, Any]:
        dataset = self._dataset()
        self._pixel_dataset = dataset
        limit = int(self.max_images) if self.max_images else len(dataset)
        limit = min(limit, len(dataset))
        mean, std = self._pixel_stats()

        def to_pixels(item):
            # de-normalize processor output back to [0,1] pixels
            return np.clip(
                np.asarray(item["image"]) * std + mean, 0.0, 1.0
            ).astype(np.float32)

        # one compiled PGD loop per backbone for the whole run (params are
        # runtime args, so no per-image retrace)
        attacks = {
            enc.name: make_pgd_attack(
                [enc], self.epsilon, self.step_size, self.steps
            )
            for enc in self.encoders
        }
        # one compiled target-embedding fn per backbone too: the eager
        # embed_images path dispatches a full surrogate forward op-by-op
        # per image inside the hot loop
        from certifiedgpt_tpu.attack.attack import embed_images

        self._embed_fns = {
            enc.name: jax.jit(
                lambda p, x, enc=enc: embed_images([enc], {enc.name: p}, x)[
                    enc.name
                ]
            )
            for enc in self.encoders
        }

        # noise grid (ref README.md:108-120 evaluates every backbone at
        # sigma in {0, 0.25, 0.5, 1.0}); without run.sigma_grid the run
        # is the single configured noise_level, as before
        sigma_grid = self.run_cfg.get("sigma_grid")
        sigmas = (
            [float(s) for s in sigma_grid] if sigma_grid
            else [self.noise_level]
        )

        rows: List[Dict[str, Any]] = []
        results_path = os.path.join(self.output_dir, "attack_results.jsonl")
        with open(results_path, "w") as sink:
            for idx in range(limit):
                item = dataset[idx]
                target_item = dataset[(idx + 1) % len(dataset)]
                target_text = self._target_text(target_item)
                pixels = to_pixels(item)
                target_pixels = to_pixels(target_item)
                instruction = item.get(
                    "instruction_input",
                    "<Img><ImageHere></Img> Describe this image.",
                )

                # the PGD transfer stage only sees the surrogate — craft
                # ONCE per backbone and reuse across the sigma grid; the
                # RGF query stage talks to the sigma-smoothed victim, so
                # it refines per sigma inside the loop below
                transfer_adv = {
                    enc.name: self._transfer_attack(
                        attacks[enc.name], pixels, target_pixels, enc
                    )
                    for enc in self.encoders
                }

                for s_idx, sigma in enumerate(sigmas):
                    # the clean caption is backbone-independent
                    clean_cap = self.caption(
                        pixels, instruction, (0, idx), sigma
                    )
                    for b_idx, enc in enumerate(self.encoders):
                        adv = transfer_adv[enc.name]
                        if self.rgf_queries > 0:
                            adv = self._rgf_stage(
                                adv, pixels, target_text, enc,
                                (idx, s_idx, b_idx), instruction, sigma,
                            )
                        row = self._score(
                            idx, item, enc.name, b_idx, pixels, adv,
                            target_text, clean_cap, instruction, sigma,
                        )
                        rows.append(row)
                        sink.write(json.dumps(row) + "\n")
                        sink.flush()
                        self.logger.info(
                            "attack[%d] sigma=%s backbone=%s success=%s "
                            "d_sim=%.4f",
                            idx, sigma, enc.name, row["success"],
                            row["adv_similarity"] - row["clean_similarity"],
                        )

        summary = self._summarize(rows)
        with open(
            os.path.join(self.output_dir, "attack_summary.json"), "w"
        ) as handle:
            json.dump(summary, handle, indent=2)
        self._write_ancova_csv(rows)
        self.logger.info("attack summary: %s", summary)
        return summary

    # ------------------------------------------------------------------
    def _dataset(self):
        for name in self.config.datasets.keys():
            builder_cls = registry.get_builder_class(name)
            datasets = builder_cls().build_datasets()
            for split in ("val", "test", "train"):
                if split in datasets:
                    return datasets[split]
        raise RuntimeError("No dataset configured for attack eval")

    @staticmethod
    def _target_text(item) -> str:
        if "gt_answers" in item and item["gt_answers"]:
            return item["gt_answers"][0]
        return item.get("answer", "a photo")

    def _transfer_attack(
        self, attack, pixels, target_pixels, enc
    ) -> np.ndarray:
        """Transfer stage: PGD toward the *target image's* surrogate
        embedding (the AttackVLM feature-matching objective)."""
        x = jnp.asarray(pixels)[None]
        target_embeds = {
            enc.name: self._embed_fns[enc.name](
                enc.params, jnp.asarray(target_pixels)[None]
            )
        }
        return np.asarray(
            attack({enc.name: enc.params}, x, target_embeds)
        )[0]

    def _rgf_stage(
        self, adv, pixels, target_text, enc, tag, instruction, sigma,
    ) -> np.ndarray:
        """RGF query stage against the sigma-smoothed victim.
        ``instruction`` is the SAME prompt `_score` judges with —
        spending the query budget on captions of a different prompt
        would optimize an objective the success metric never sees.
        ``tag`` is the (image, sigma, backbone) index triple; it
        namespaces both the victim caption stream and the RGF direction
        seed so no two stages of a run share draws."""
        text_enc = self.text_encoder
        target_emb = text_enc([target_text])[0]
        step_counter = [0]
        idx, s_idx, b_idx = tag

        def victim_score(p):
            step_counter[0] += 1
            cap = self.caption(
                p, instruction, (2, idx, s_idx, b_idx, step_counter[0]),
                sigma,
            )
            emb = text_enc([cap])[0]
            return float(np.dot(emb, target_emb))

        return rgf_refine(
            victim_score, adv, pixels,
            epsilon=self.epsilon,
            queries=self.rgf_queries,
            iters=self.rgf_iters,
            seed=(self.seed, idx, s_idx, b_idx),
        )

    def _score(
        self, idx, item, backbone, b_idx, pixels, adv, target_text,
        clean_cap, instruction, sigma=None,
    ):
        if sigma is None:
            sigma = self.noise_level
        adv_cap = self.caption(adv, instruction, (1, idx, b_idx), sigma)
        embs = self.text_encoder([clean_cap, adv_cap, target_text])
        clean_sim = float(np.dot(embs[0], embs[2]))
        adv_sim = float(np.dot(embs[1], embs[2]))
        return {
            "index": idx,
            "question_id": int(item.get("question_id", idx)),
            "backbone": backbone,
            "sigma": float(sigma),
            "target_text": target_text,
            "clean_caption": clean_cap,
            "adv_caption": adv_cap,
            "clean_similarity": clean_sim,
            "adv_similarity": adv_sim,
            "similarity": adv_sim,
            "success": attack_success(clean_sim, adv_sim),
            "linf": float(np.max(np.abs(adv - pixels))),
        }

    def _summarize(self, rows) -> Dict[str, Any]:
        per_backbone = {}
        for name in self.backbone_names:
            sub = [r for r in rows if r["backbone"] == name]
            if sub:
                per_backbone[name] = sum(r["success"] for r in sub) / len(sub)
        sigmas = sorted({r["sigma"] for r in rows})
        summary = {
            "total": len(rows),
            "sigma_grid": sigmas,
            "epsilon": self.epsilon,
            "steps": self.steps,
            "success_rate_per_backbone": per_backbone,
            "overall_success_rate": (
                sum(r["success"] for r in rows) / max(len(rows), 1)
            ),
        }
        if len(sigmas) > 1:
            # the reference's headline table: success rate per
            # (backbone, sigma) cell (ref README.md:108-120)
            summary["success_rate_grid"] = {
                name: {
                    str(s): (
                        sum(r["success"] for r in cell) / len(cell)
                        if (cell := [
                            r for r in rows
                            if r["backbone"] == name and r["sigma"] == s
                        ])
                        else None
                    )
                    for s in sigmas
                }
                for name in self.backbone_names
            }
        if len({r["backbone"] for r in rows}) > 1:
            summary["ancova"] = ancova(rows)
        return summary

    def _write_ancova_csv(self, rows) -> None:
        path = os.path.join(self.output_dir, "attack_ancova.csv")
        with open(path, "w", newline="") as handle:
            writer = csv.DictWriter(
                handle,
                fieldnames=[
                    "index", "question_id", "backbone", "sigma",
                    "clean_similarity", "adv_similarity", "success", "linf",
                ],
                extrasaction="ignore",
            )
            writer.writeheader()
            for row in rows:
                writer.writerow(row)
