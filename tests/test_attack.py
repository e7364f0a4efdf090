import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
    convert_hf_clip,
    init_clip_resnet,
    init_clip_text,
    init_clip_vit,
)


def test_clip_vit_and_resnet_shapes():
    vcfg = ClipViTConfig.tiny()
    vp = init_clip_vit(jax.random.PRNGKey(0), vcfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = clip_vit_image(vp, vcfg, imgs)
    assert out.shape == (2, vcfg.projection_dim)

    rcfg = ClipResNetConfig.tiny()
    rp = init_clip_resnet(jax.random.PRNGKey(2), rcfg)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    out = clip_resnet_image(rp, rcfg, imgs)
    assert out.shape == (2, rcfg.embed_dim)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_clip_text_shapes_and_eot_pooling():
    tcfg = ClipTextConfig.tiny()
    tp = init_clip_text(jax.random.PRNGKey(0), tcfg)
    ids = jnp.asarray([[5, 9, 99, 0, 0], [7, 99, 0, 0, 0]])  # 99 = EOT (max id)
    out = clip_text(tp, tcfg, ids)
    assert out.shape == (2, tcfg.projection_dim)


def test_clip_vit_parity_with_hf():
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    v = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=16, hidden_act="quick_gelu",
    )
    t = CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=16, vocab_size=100,
        projection_dim=16, hidden_act="quick_gelu",
        bos_token_id=98, eos_token_id=99,  # EOT = max id, the CLIP convention
    )
    torch.manual_seed(0)
    hf = CLIPModel(
        CLIPConfig(
            text_config=t.to_dict(), vision_config=v.to_dict(), projection_dim=16
        )
    ).eval()

    vcfg = ClipViTConfig.tiny()
    tcfg = ClipTextConfig.tiny()
    converted = convert_hf_clip(hf.state_dict(), vcfg, tcfg)

    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        ref_v = hf.get_image_features(
            pixel_values=torch.tensor(imgs).permute(0, 3, 1, 2)
        ).numpy()
    ours_v = np.asarray(clip_vit_image(converted["vision"], vcfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours_v, ref_v, atol=2e-4, rtol=1e-3)

    ids = rng.randint(1, 99, (2, 8))
    ids[:, -1] = 99  # EOT = max id; HF pools at argmax(ids) too
    with torch.no_grad():
        ref_t = hf.get_text_features(input_ids=torch.tensor(ids)).numpy()
    ours_t = np.asarray(clip_text(converted["text"], tcfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours_t, ref_t, atol=2e-4, rtol=1e-3)


def test_pgd_attack_moves_embedding_toward_target():
    cfg = ClipViTConfig.tiny()
    params = init_clip_vit(jax.random.PRNGKey(0), cfg)
    enc = SurrogateEncoder(
        name="vit_tiny",
        apply_fn=lambda p, imgs: clip_vit_image(p, cfg, imgs),
        params=params,
        image_size=cfg.image_size,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 28, 28, 3).astype(np.float32))
    target = jnp.asarray(rng.randn(1, cfg.projection_dim).astype(np.float32))

    attack = make_pgd_attack([enc], epsilon=16 / 255, step_size=2 / 255, steps=20)
    adv = attack({"vit_tiny": enc.params}, x, {"vit_tiny": target})

    def sim(img):
        from certifiedgpt_tpu.attack.attack import _normalize, _resize

        feats = enc.apply_fn(enc.params, _normalize(_resize(img, 28)))
        return float(cosine_similarity(feats, target)[0])

    assert sim(adv) > sim(x)  # moved toward the target
    assert float(jnp.max(jnp.abs(adv - x))) <= 16 / 255 + 1e-6  # budget respected
    assert float(jnp.min(adv)) >= 0.0 and float(jnp.max(adv)) <= 1.0


def test_rgf_refine_improves_score_on_smooth_objective():
    rng = np.random.RandomState(0)
    x0 = rng.rand(4, 4, 3).astype(np.float32) * 0.5 + 0.25
    direction = rng.randn(4, 4, 3).astype(np.float32)
    direction /= np.linalg.norm(direction)

    def score(x):
        return float(np.sum(x * direction))

    adv = rgf_refine(
        score, x0.copy(), x0, epsilon=0.1, sigma=0.05,
        step_size=0.02, queries=16, iters=8, seed=1,
    )
    assert score(adv) > score(x0)
    assert np.max(np.abs(adv - x0)) <= 0.1 + 1e-6


def test_attack_success_and_ancova():
    assert attack_success(0.2, 0.5)
    assert not attack_success(0.5, 0.2)

    rng = np.random.default_rng(0)
    rows = []
    for backbone, slope in [("rn50", -0.01), ("vit", -0.02)]:
        for sigma in [0.0, 0.25, 0.5, 1.0]:
            for _ in range(30):
                rows.append(
                    {
                        "similarity": 0.5
                        + slope * sigma
                        + 0.001 * rng.standard_normal(),
                        "sigma": sigma,
                        "backbone": backbone,
                    }
                )
    table = ancova(rows)
    coefs = table["coefficients"]
    # baseline slope ~ -0.01, interaction adds ~ -0.01 for vit
    assert abs(coefs["sigma"]["estimate"] - (-0.01)) < 2e-3
    assert coefs["sigma"]["p_value"] < 0.001
    inter = coefs["sigma:backbone[vit]"]
    assert abs(inter["estimate"] - (-0.01)) < 2e-3
    assert table["r_squared"] > 0.9
