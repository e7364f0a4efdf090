"""Targeted black-box attack evaluation (AttackVLM-style).

The reference evaluates its smoothed model against a targeted black-box
attack built on CLIP-ensemble feature matching
(ref ``README.md:62-64,108-120``) but ships NO code for it (SURVEY.md
§2.9); this module implements the capability from the published
description, TPU-first:

1. **Transfer stage** — ``pgd_feature_attack``: project the adversarial
   image onto an l-inf ball around the clean image while minimizing the
   ensemble cosine distance between surrogate image embeddings of the
   adversary and the target. The whole PGD loop is one ``lax.scan``
   inside one jit — gradients through every surrogate encoder compile to
   a single XLA program.
2. **Query stage** — ``rgf_refine``: derivative-free refinement against
   the *victim* (MiniGPT-4 captions scored by CLIP text similarity)
   using random-gradient-free two-point estimates, for the black-box
   part of the threat model.
3. **Scoring** — ``attack_success``: an attack succeeds when the
   victim's caption of the adversarial image is closer (in CLIP text
   space) to the target text than the clean caption was.
   ``ancova`` fits similarity ~ sigma + backbone (+ interaction) by OLS
   and reports coefficient t-tests — the reference's headline analysis
   (ref ``README.md:160``), without the statsmodels dependency.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from certifiedgpt_tpu.data.processors import CLIP_MEAN, CLIP_STD


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8):
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + eps)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + eps)
    return jnp.sum(a * b, axis=-1)


@dataclasses.dataclass
class SurrogateEncoder:
    """One member of the attack ensemble."""

    name: str
    apply_fn: Callable  # (params, images_normalized) -> embeddings
    params: Any
    image_size: int = 224


def _normalize(pixels: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (pixels - mean) / std


def _resize(pixels: jnp.ndarray, size: int) -> jnp.ndarray:
    b, h, w, c = pixels.shape
    if h == size and w == size:
        return pixels
    return jax.image.resize(pixels, (b, size, size, c), method="bilinear")


def make_pgd_attack(
    encoders: Sequence[SurrogateEncoder],
    epsilon: float = 8.0 / 255.0,
    step_size: float = 1.0 / 255.0,
    steps: int = 100,
):
    """Build the jitted targeted PGD loop.

    Returns ``attack(params_by_name, x_clean_pixels [B,H,W,3] in [0,1],
    target_embeds: {name: [B, D]}) -> x_adv_pixels``. The entire
    ``steps``-iteration loop runs as one compiled ``lax.scan``. Encoder
    params are runtime arguments — closing over them would bake the
    surrogate weights into the jaxpr as constants and stall compilation
    (see CLAUDE.md).
    """

    def ensemble_loss(x_pixels, params_by_name, target_embeds):
        total = 0.0
        for enc in encoders:
            imgs = _normalize(_resize(x_pixels, enc.image_size))
            feats = enc.apply_fn(params_by_name[enc.name], imgs)
            total = total + jnp.mean(
                1.0 - cosine_similarity(feats, target_embeds[enc.name])
            )
        return total / len(encoders)

    @jax.jit
    def attack(params_by_name, x_clean, target_embeds):
        lo = jnp.clip(x_clean - epsilon, 0.0, 1.0)
        hi = jnp.clip(x_clean + epsilon, 0.0, 1.0)
        grad_fn = jax.grad(ensemble_loss)

        def step(x_adv, _):
            g = grad_fn(x_adv, params_by_name, target_embeds)
            x_adv = x_adv - step_size * jnp.sign(g)
            return jnp.clip(x_adv, lo, hi), None

        x_adv, _ = jax.lax.scan(step, x_clean, None, length=steps)
        return x_adv

    return attack


def embed_images(
    encoders: Sequence[SurrogateEncoder],
    params_by_name,
    pixels: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
):
    """Surrogate embeddings of pixel images, per encoder name."""
    out = {}
    for enc in encoders:
        imgs = _normalize(_resize(pixels, enc.image_size))
        out[enc.name] = enc.apply_fn(params_by_name[enc.name], imgs)
    return out


def rgf_refine(
    victim_score: Callable[[np.ndarray], float],
    x_adv: np.ndarray,
    x_clean: np.ndarray,
    epsilon: float = 8.0 / 255.0,
    sigma: float = 8.0 / 255.0,
    step_size: float = 1.0 / 255.0,
    queries: int = 8,
    iters: int = 4,
    seed=0,  # anything np.random.default_rng accepts (int or int tuple)
) -> np.ndarray:
    """Query-based refinement with two-point RGF gradient estimates.

    ``victim_score(pixels) -> float`` is the black-box objective (e.g.
    CLIP-text similarity of the victim's caption to the target text);
    higher is better for the attacker. Stays within the l-inf ball
    around ``x_clean``.
    """
    rng = np.random.default_rng(seed)
    lo = np.clip(x_clean - epsilon, 0.0, 1.0)
    hi = np.clip(x_clean + epsilon, 0.0, 1.0)
    x = x_adv.copy()
    for _ in range(iters):
        base = victim_score(x)
        grad_est = np.zeros_like(x)
        for _ in range(queries):
            u = rng.standard_normal(x.shape).astype(np.float32)
            u /= np.linalg.norm(u) + 1e-12
            score = victim_score(np.clip(x + sigma * u, lo, hi))
            grad_est += (score - base) / sigma * u
        grad_est /= queries
        x = np.clip(x + step_size * np.sign(grad_est), lo, hi)
    return x


# ----------------------------------------------------------------------
# scoring & analysis
# ----------------------------------------------------------------------
def attack_success(
    clean_caption_sim: float, adv_caption_sim: float, margin: float = 0.0
) -> bool:
    """Success: the adversarial caption moved toward the target text."""
    return bool(adv_caption_sim > clean_caption_sim + margin)


def ancova(
    rows: Sequence[Dict[str, Any]],
    response: str = "similarity",
    covariate: str = "sigma",
    factor: str = "backbone",
    interaction: bool = True,
) -> Dict[str, Any]:
    """OLS ANCOVA: response ~ covariate + C(factor) [+ covariate:C(factor)].

    Returns coefficient estimates with t-statistics and p-values —
    numpy/scipy only (statsmodels is not a dependency of this image).
    """
    y = np.asarray([float(r[response]) for r in rows])
    x_cov = np.asarray([float(r[covariate]) for r in rows])
    levels = sorted({r[factor] for r in rows})
    n = len(rows)

    cols: List[np.ndarray] = [np.ones(n), x_cov]
    names: List[str] = ["intercept", covariate]
    for lvl in levels[1:]:  # treatment coding, first level = baseline
        d = np.asarray([1.0 if r[factor] == lvl else 0.0 for r in rows])
        cols.append(d)
        names.append(f"{factor}[{lvl}]")
        if interaction:
            cols.append(d * x_cov)
            names.append(f"{covariate}:{factor}[{lvl}]")

    X = np.stack(cols, axis=1)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    dof = max(n - X.shape[1], 1)
    sigma2 = float(resid @ resid) / dof
    cov = sigma2 * np.linalg.pinv(X.T @ X)
    se = np.sqrt(np.maximum(np.diag(cov), 1e-30))
    t_vals = beta / se
    p_vals = 2.0 * sps.t.sf(np.abs(t_vals), dof)

    return {
        "coefficients": {
            name: {
                "estimate": float(b),
                "std_err": float(s),
                "t": float(t),
                "p_value": float(p),
            }
            for name, b, s, t, p in zip(names, beta, se, t_vals, p_vals)
        },
        "dof": dof,
        "r_squared": float(
            1.0 - (resid @ resid) / max(((y - y.mean()) ** 2).sum(), 1e-30)
        ),
    }
