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


def test_clip_resnet_openai_oracle():
    """Converted OpenAI ``visual.*`` weights reproduce a torch
    ModifiedResNet oracle (blur-pool stem, avgpool bottleneck downsample,
    attention pool) — the RN50/RN101 surrogates of ref README.md:114-115."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F
    from collections import OrderedDict

    from certifiedgpt_tpu.attack.clip import (
        ClipResNetConfig,
        clip_resnet_image,
        convert_openai_clip_resnet,
    )

    class Bottleneck(nn.Module):
        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.stride = stride
            self.downsample = None
            if stride > 1 or inplanes != planes * 4:
                self.downsample = nn.Sequential(
                    OrderedDict(
                        [
                            ("-1", nn.AvgPool2d(stride)),
                            ("0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                            ("1", nn.BatchNorm2d(planes * 4)),
                        ]
                    )
                )

        def forward(self, x):
            identity = x
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.avgpool(out)
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return F.relu(out + identity)

    class AttentionPool2d(nn.Module):
        def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
            super().__init__()
            self.positional_embedding = nn.Parameter(
                torch.randn(spacial_dim**2 + 1, embed_dim) / embed_dim**0.5
            )
            self.k_proj = nn.Linear(embed_dim, embed_dim)
            self.q_proj = nn.Linear(embed_dim, embed_dim)
            self.v_proj = nn.Linear(embed_dim, embed_dim)
            self.c_proj = nn.Linear(embed_dim, output_dim)
            self.num_heads = num_heads

        def forward(self, x):
            x = x.flatten(start_dim=2).permute(2, 0, 1)  # NCHW -> (HW)NC
            x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
            x = x + self.positional_embedding[:, None, :]
            x, _ = F.multi_head_attention_forward(
                query=x[:1], key=x, value=x,
                embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
                q_proj_weight=self.q_proj.weight,
                k_proj_weight=self.k_proj.weight,
                v_proj_weight=self.v_proj.weight,
                in_proj_weight=None,
                in_proj_bias=torch.cat(
                    [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
                ),
                bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
                out_proj_weight=self.c_proj.weight,
                out_proj_bias=self.c_proj.bias,
                use_separate_proj_weight=True,
                training=False, need_weights=False,
            )
            return x.squeeze(0)

    class ModifiedResNet(nn.Module):
        def __init__(self, layers, width, image_size, embed_dim, heads):
            super().__init__()
            self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(width // 2)
            self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width // 2)
            self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(width)
            self.avgpool = nn.AvgPool2d(2)
            self._inplanes = width
            self.layer1 = self._make_layer(width, layers[0], stride=1)
            self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
            self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
            self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
            self.attnpool = AttentionPool2d(
                image_size // 32, width * 32, heads, embed_dim
            )

        def _make_layer(self, planes, blocks, stride):
            mods = [Bottleneck(self._inplanes, planes, stride)]
            self._inplanes = planes * 4
            for _ in range(1, blocks):
                mods.append(Bottleneck(self._inplanes, planes))
            return nn.Sequential(*mods)

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.relu(self.bn2(self.conv2(x)))
            x = F.relu(self.bn3(self.conv3(x)))
            x = self.avgpool(x)
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
            return self.attnpool(x)

    cfg = ClipResNetConfig.tiny()
    torch.manual_seed(0)
    wrapper = nn.Module()
    wrapper.visual = ModifiedResNet(
        cfg.layers, cfg.width, cfg.image_size, cfg.embed_dim, cfg.heads
    )
    wrapper.eval()
    # randomize BN running stats so folding bugs can't hide behind 0/1
    with torch.no_grad():
        for mod in wrapper.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(0.1 * torch.randn_like(mod.running_mean))
                mod.running_var.copy_(0.5 + torch.rand_like(mod.running_var))

    params = convert_openai_clip_resnet(wrapper.state_dict(), cfg)

    rng = np.random.RandomState(0)
    images = rng.randn(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    with torch.no_grad():
        ref = wrapper.visual(torch.tensor(images).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(clip_resnet_image(params, cfg, jnp.asarray(images)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)
