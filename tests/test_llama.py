import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certifiedgpt_tpu.models.llama import (
    IGNORE_INDEX,
    LlamaConfig,
    cross_entropy_loss,
    embed_tokens,
    init_kv_cache,
    init_llama,
    llama_apply,
)
from certifiedgpt_tpu.models.convert import convert_llama_state_dict


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig.tiny()
    params = init_llama(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    b, s = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    logits, hidden, cache = llama_apply(params, cfg, x, mask, pos)
    assert logits.shape == (b, s, cfg.vocab_size)
    assert hidden.shape == (b, s, cfg.hidden_size)
    assert cache is None
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causality(tiny):
    """Changing a later token must not change earlier logits."""
    cfg, params = tiny
    b, s = 1, 8
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, cfg.vocab_size)
    ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % cfg.vocab_size)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    l1, _, _ = llama_apply(params, cfg, embed_tokens(params, ids), mask, pos)
    l2, _, _ = llama_apply(params, cfg, embed_tokens(params, ids2), mask, pos)
    np.testing.assert_allclose(l1[:, :-1], l2[:, :-1], atol=1e-5)
    assert not np.allclose(l1[:, -1], l2[:, -1])


def test_kv_cache_matches_full_forward(tiny):
    """Prefill + per-token decode through the cache must equal one full pass."""
    cfg, params = tiny
    b, s, max_len = 2, 9, 16
    prefill = 5
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, s), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    full_mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    ref_logits, _, _ = llama_apply(params, cfg, x, full_mask, pos)

    cache = init_kv_cache(cfg, b, max_len)
    cache_mask = (jnp.arange(max_len) < s)[None].astype(jnp.int32)
    cache_mask = jnp.broadcast_to(cache_mask, (b, max_len))

    # prefill
    logits_p, _, cache = llama_apply(
        params,
        cfg,
        x[:, :prefill],
        cache_mask,
        pos[:, :prefill],
        kv_cache=cache,
        cache_offset=jnp.int32(0),
    )
    np.testing.assert_allclose(logits_p, ref_logits[:, :prefill], atol=2e-4)

    # decode one token at a time
    for t in range(prefill, s):
        logits_t, _, cache = llama_apply(
            params,
            cfg,
            x[:, t : t + 1],
            cache_mask,
            pos[:, t : t + 1],
            kv_cache=cache,
            cache_offset=jnp.int32(t),
        )
        np.testing.assert_allclose(
            logits_t[:, 0], ref_logits[:, t], atol=2e-4
        )


def test_int8_kv_cache_tracks_full_forward(tiny):
    """kv_quant stores the cache int8+scales; decode logits must track the
    uncached forward within quantization error, and the cache leaves must
    actually be int8 (the serving memory/bandwidth claim)."""
    import dataclasses

    cfg, params = tiny
    qcfg = dataclasses.replace(cfg, kv_quant=True)
    b, s, max_len = 2, 9, 16
    prefill = 5
    ids = jax.random.randint(jax.random.PRNGKey(7), (b, s), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    ref_logits, _, _ = llama_apply(
        params, cfg, x, jnp.ones((b, s), jnp.int32), pos
    )

    cache = init_kv_cache(qcfg, b, max_len)
    assert cache["k"][0].dtype == jnp.int8
    assert cache["k_scale"][0].shape == (b, max_len, cfg.num_kv_heads, 1)
    cache_mask = jnp.broadcast_to(
        (jnp.arange(max_len) < s)[None].astype(jnp.int32), (b, max_len)
    )
    logits_p, _, cache = llama_apply(
        params, qcfg, x[:, :prefill], cache_mask, pos[:, :prefill],
        kv_cache=cache, cache_offset=jnp.int32(0),
    )
    assert cache["k"][0].dtype == jnp.int8  # stays quantized after update
    outs = [logits_p]
    for t in range(prefill, s):
        logits_t, _, cache = llama_apply(
            params, qcfg, x[:, t : t + 1], cache_mask, pos[:, t : t + 1],
            kv_cache=cache, cache_offset=jnp.int32(t),
        )
        outs.append(logits_t)
    got = jnp.concatenate(outs, axis=1)
    # int8 per-row cache quantization perturbs attention by O(1/127);
    # logits of the tiny fp32 model stay within a small absolute band and
    # the greedy argmax only moves where the reference top-2 margin is
    # itself inside that band (near-ties of the random init).
    np.testing.assert_allclose(got, ref_logits, atol=0.05)
    flipped = np.asarray(jnp.argmax(got, -1) != jnp.argmax(ref_logits, -1))
    top2 = np.sort(np.asarray(ref_logits, np.float32), axis=-1)[..., -2:]
    margin = top2[..., 1] - top2[..., 0]
    assert np.all(margin[flipped] < 0.1), margin[flipped]


def test_cross_entropy_label_smoothing_matches_torch(tiny):
    torch = pytest.importorskip("torch")
    cfg, _ = tiny
    b, s, v = 3, 7, cfg.vocab_size
    rng = np.random.RandomState(0)
    logits = rng.randn(b, s, v).astype(np.float32)
    labels = rng.randint(0, v, (b, s))
    labels[:, :3] = IGNORE_INDEX  # mask prompt region

    ours = cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels), label_smoothing=0.1
    )

    tl = torch.tensor(logits)[:, :-1].reshape(-1, v)
    tt = torch.tensor(labels)[:, 1:].reshape(-1)
    ref = torch.nn.functional.cross_entropy(
        tl, tt, ignore_index=IGNORE_INDEX, label_smoothing=0.1
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_parity_with_hf_llama():
    """Converted weights reproduce HF LlamaForCausalLM logits."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_position_embeddings=64,
        dtype=jnp.float32,
    )
    params = convert_llama_state_dict(hf.state_dict(), cfg)

    b, s = 2, 11
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 128, (b, s))

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()

    x = embed_tokens(params, jnp.asarray(ids))
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    ours, _, _ = llama_apply(params, cfg, x, mask, pos)

    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_tensor_parallel_llama_matches_replicated():
    """partition_llama over a 'model' axis reproduces replicated logits."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from certifiedgpt_tpu.parallel.mesh import make_mesh, partition_llama, replicated

    cfg = LlamaConfig.tiny()
    params = init_llama(jax.random.PRNGKey(0), cfg)
    b, s = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    ref, _, _ = llama_apply(params, cfg, x, mask, pos)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = partition_llama(params, mesh)

    f = jax.jit(lambda p, x: llama_apply(p, cfg, x, mask, pos)[0])
    with mesh:
        out = f(sharded, jax.device_put(x, replicated(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_tensor_parallel_llama_quantized_leaves():
    """partition_llama on an int8-quantized decoder: kernel_q shards like
    the fp kernel and the per-(layer, out-channel) scale shards with the
    OUT dim (a rank-3 spec on the rank-2 scale leaf used to crash —
    exactly the memory-constrained int8+TP combination both docstrings
    advertise). TP logits must still match the replicated quantized
    forward."""
    from jax.sharding import PartitionSpec as P

    from certifiedgpt_tpu.ops.quantization import quantize_llama
    from certifiedgpt_tpu.parallel.mesh import (
        make_mesh,
        partition_llama,
        replicated,
    )

    cfg = LlamaConfig.tiny()
    params = quantize_llama(init_llama(jax.random.PRNGKey(0), cfg))
    b, s = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    ref, _, _ = llama_apply(params, cfg, x, mask, pos)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = partition_llama(params, mesh)
    lq = sharded["layers"]["q_proj"]
    assert lq["kernel_q"].sharding.spec == P(None, None, "model")
    assert lq["scale"].sharding.spec == P(None, "model")
    lo = sharded["layers"]["o_proj"]
    assert lo["kernel_q"].sharding.spec == P(None, "model", None)
    assert lo["scale"].sharding.spec == P()

    f = jax.jit(lambda p, x: llama_apply(p, cfg, x, mask, pos)[0])
    with mesh:
        out = f(sharded, jax.device_put(x, replicated(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_lm_head_optional_bias(tiny):
    """lm_head_logits adds the optional bias leaf when present (the
    bench's EOS-biased early-exit measurement hook; HF LLaMA ships a
    bias-free head, so conversion never sets one)."""
    import jax.numpy as jnp

    from certifiedgpt_tpu.models.llama import lm_head_logits

    cfg, params = tiny
    hidden = jax.random.normal(
        jax.random.PRNGKey(3), (2, 4, cfg.hidden_size), jnp.float32
    )
    base = lm_head_logits(params, hidden)
    bias = jnp.zeros((cfg.vocab_size,), jnp.float32).at[2].set(7.5)
    biased_params = dict(params, lm_head=dict(params["lm_head"], bias=bias))
    biased = lm_head_logits(biased_params, hidden)
    np.testing.assert_allclose(np.asarray(biased - base)[..., 2], 7.5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(biased)[..., :2], np.asarray(base)[..., :2], atol=1e-6
    )


@pytest.mark.parametrize(
    "policy,every",
    [("full", 1), ("dots", 1), ("dots_all", 1), ("full", 2), ("dots", 2)],
)
def test_remat_policy_variants_match_no_remat(tiny, policy, every):
    """Every (remat_policy, remat_every) combination is a pure
    memory/recompute trade: forward logits AND parameter grads must be
    bit-compatible with the no-remat baseline (full-scale time x HBM
    sweep in docs/DESIGN.md; VERDICT r4 item 2)."""
    import dataclasses

    cfg, params = tiny
    b, s = 2, 8
    ids = jax.random.randint(jax.random.PRNGKey(9), (b, s), 0, cfg.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(10), (b, s), 0, cfg.vocab_size)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))

    def loss_fn(p, c):
        logits, _, _ = llama_apply(p, c, embed_tokens(p, ids), mask, pos)
        return cross_entropy_loss(logits, labels, label_smoothing=0.1)

    base_loss, base_grads = jax.value_and_grad(loss_fn)(params, cfg)
    rcfg = dataclasses.replace(cfg, remat=True, remat_policy=policy, remat_every=every)
    r_loss, r_grads = jax.value_and_grad(lambda p: loss_fn(p, rcfg))(params)
    np.testing.assert_allclose(float(base_loss), float(r_loss), rtol=1e-6)
    for (kp, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(base_grads),
        jax.tree_util.tree_leaves_with_path(r_grads),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=5e-6,
            err_msg=f"{policy}/{every} grad mismatch at {jax.tree_util.keystr(kp)}",
        )


def test_remat_invalid_policy_and_every_are_loud(tiny):
    import dataclasses

    cfg, params = tiny
    b, s = 1, 4
    ids = jnp.zeros((b, s), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    x = embed_tokens(params, ids)
    bad = dataclasses.replace(cfg, remat=True, remat_policy="nope")
    with pytest.raises(ValueError, match="remat_policy"):
        llama_apply(params, bad, x, mask, pos)
    # tiny() has 2 layers; 3 does not divide
    bad2 = dataclasses.replace(cfg, remat=True, remat_every=3)
    with pytest.raises(ValueError, match="remat_every"):
        llama_apply(params, bad2, x, mask, pos)
