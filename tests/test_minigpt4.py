import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certifiedgpt_tpu.data.text import (
    BatchSpec,
    ByteTokenizer,
    IGNORE_INDEX,
    build_gen_batch,
    build_train_batch,
)
from certifiedgpt_tpu.models.minigpt4 import (
    MiniGPT4Config,
    encode_img,
    generate_greedy,
    init_minigpt4,
    minigpt4_loss,
    split_params,
    merge_params,
)


@pytest.fixture(scope="module")
def model():
    cfg = MiniGPT4Config.tiny()
    params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _images(cfg, b=2, seed=1):
    return jax.random.normal(
        jax.random.PRNGKey(seed), (b, cfg.vit.img_size, cfg.vit.img_size, 3)
    )


def test_encode_img_shape(model):
    cfg, params = model
    out = encode_img(params, cfg, _images(cfg))
    assert out.shape == (2, cfg.num_img_tokens, cfg.llama.hidden_size)


def test_train_batch_layout():
    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=64, num_img_tokens=8, max_answer_len=16)
    batch = build_train_batch(
        tok,
        ["<Img><ImageHere></Img> what is this?", "<Img><ImageHere></Img> color?"],
        ["a cat", "blue"],
        spec,
    )
    assert batch["input_ids"].shape == (2, 64)
    # image span slots hold pad ids inside the valid region
    i0 = batch["img_pos"][0]
    assert np.all(batch["input_ids"][0, i0 : i0 + 8] == tok.pad_token_id)
    assert np.all(batch["attention_mask"][0, i0 : i0 + 8] == 1)
    # labels mask the prompt, keep answer + eos
    valid_labels = batch["labels"][0][batch["labels"][0] != IGNORE_INDEX]
    decoded = tok.decode([int(t) for t in valid_labels if t >= 4])
    assert decoded == "a cat"
    assert valid_labels[-1] == tok.eos_token_id


def test_gen_batch_left_padding():
    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=48, num_img_tokens=8)
    batch = build_gen_batch(
        tok, ["<Img><ImageHere></Img> short", "<Img><ImageHere></Img> a longer question"], spec
    )
    # all prompts end at the last slot
    assert np.all(batch["attention_mask"][:, -1] == 1)
    # pads lead
    assert batch["attention_mask"][0, 0] == 0


def test_loss_and_grads_flow_only_into_projection(model):
    cfg, params = model
    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=48, num_img_tokens=cfg.num_img_tokens, max_answer_len=8)
    batch = build_train_batch(
        tok,
        ["<Img><ImageHere></Img> what?", "<Img><ImageHere></Img> who?"],
        ["cat", "dog"],
        spec,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["image"] = _images(cfg)

    trainable, frozen = split_params(params)

    def loss_fn(tr):
        return minigpt4_loss(merge_params(tr, frozen), cfg, batch)

    loss, grads = jax.value_and_grad(loss_fn)(trainable)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = jnp.sqrt(
        sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
    )
    assert float(gnorm) > 0


def test_generate_greedy_shapes_and_determinism(model):
    cfg, params = model
    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=32, num_img_tokens=cfg.num_img_tokens)
    batch = build_gen_batch(
        tok, ["<Img><ImageHere></Img> hi", "<Img><ImageHere></Img> color?"], spec
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["image"] = _images(cfg)

    out1 = generate_greedy(params, cfg, batch, 6, tok.eos_token_id, tok.pad_token_id)
    out2 = generate_greedy(params, cfg, batch, 6, tok.eos_token_id, tok.pad_token_id)
    assert out1.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_generate_matches_uncached_argmax_rollout(model):
    """Greedy decode through the KV cache equals a naive re-forward rollout."""
    from certifiedgpt_tpu.models.llama import llama_apply, embed_tokens
    from certifiedgpt_tpu.models.minigpt4 import assemble_embeds

    cfg, params = model
    tok = ByteTokenizer()
    spec = BatchSpec(seq_len=24, num_img_tokens=cfg.num_img_tokens)
    batch_np = build_gen_batch(tok, ["<Img><ImageHere></Img> q"], spec)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    batch["image"] = _images(cfg, b=1)

    steps = 4
    fast = np.asarray(
        generate_greedy(params, cfg, batch, steps, eos_token_id=-1)
    )

    # naive: re-run the full (growing) sequence each step without cache
    img = encode_img(params, cfg, batch["image"])
    embeds = assemble_embeds(params, cfg, batch["input_ids"], img, batch["img_pos"])
    mask = batch["attention_mask"]
    slow = []
    for _ in range(steps):
        s = embeds.shape[1]
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
        logits, _, _ = llama_apply(params["llama"], cfg.llama, embeds, mask, positions)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        slow.append(int(nxt[0]))
        embeds = jnp.concatenate(
            [embeds, embed_tokens(params["llama"], nxt[:, None])], axis=1
        )
        mask = jnp.concatenate([mask, jnp.ones((1, 1), jnp.int32)], axis=1)

    assert fast[0].tolist() == slow
