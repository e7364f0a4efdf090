"""Pipeline parallelism (``parallel/pipeline.py``).

The GPipe-scheduled decoder forward must reproduce the sequential
``llama_apply`` (same blocks, same order, fp32 tiny model; tolerance
covers XLA's compile-order float reassociation only),
its gradients must ride the reverse schedule unchanged (the trainable
``llama_proj`` sits upstream of the pipeline), and it must compose with
data parallelism on a ``(pipe, data)`` mesh. The reference has no
pipeline parallelism at all (DDP only — ref
``agents/minigpt4_finetune_agent.py:52-74``); these tests pin the
beyond-reference capability on the virtual 8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from certifiedgpt_tpu.models.llama import (
    LlamaConfig,
    embed_tokens,
    init_llama,
    llama_apply,
)
from certifiedgpt_tpu.models.minigpt4 import (
    MiniGPT4Config,
    init_minigpt4,
    merge_params,
    minigpt4_loss,
    split_params,
)
from certifiedgpt_tpu.parallel.pipeline import (
    partition_llama_pipeline,
    pipeline_llama_apply,
    pipeline_minigpt4_loss,
)
from certifiedgpt_tpu.data.text import (
    BatchSpec,
    ByteTokenizer,
    build_train_batch,
    pack_train_batch,
)


def _pipe_mesh(n_pipe, n_data=1):
    devs = np.asarray(jax.devices()[: n_pipe * n_data]).reshape(
        n_pipe, n_data
    )
    return Mesh(devs, ("pipe", "data"))


@pytest.fixture(scope="module")
def tiny4():
    """4-layer tiny decoder (divides pp=2 and pp=4), fp32 for exactness."""
    cfg = LlamaConfig.tiny(num_layers=4)
    params = init_llama(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.parametrize("n_pipe,n_micro", [(2, 4), (4, 2), (2, 1)])
def test_pipeline_forward_matches_sequential(tiny4, n_pipe, n_micro):
    cfg, params = tiny4
    b, s = 8, 12
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size
    )
    x = embed_tokens(params, ids)
    mask = (ids % 7 != 0).astype(jnp.int32)  # ragged validity
    pos = jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32)

    ref_logits, ref_hidden, _ = llama_apply(params, cfg, x, mask, pos)
    mesh = _pipe_mesh(n_pipe)
    pp = partition_llama_pipeline(params, mesh)
    logits, hidden = pipeline_llama_apply(
        pp, cfg, x, mask, pos, mesh, n_micro
    )
    # tolerance: same math, but a different compiled program —
    # XLA's fp32 reduction order differs across stage counts (~1e-6)
    np.testing.assert_allclose(
        np.asarray(hidden), np.asarray(ref_hidden), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-5
    )


def test_pipeline_composes_with_data_parallel(tiny4):
    """(pipe=2, data=4): batch rows shard over 'data' while activations
    stream over 'pipe' — same numbers as the sequential decoder."""
    cfg, params = tiny4
    b, s = 8, 12
    ids = jax.random.randint(
        jax.random.PRNGKey(2), (b, s), 0, cfg.vocab_size
    )
    x = embed_tokens(params, ids)
    mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32)
    ref_logits, _, _ = llama_apply(params, cfg, x, mask, pos)

    mesh = _pipe_mesh(2, 4)
    pp = partition_llama_pipeline(params, mesh)
    logits, _ = pipeline_llama_apply(pp, cfg, x, mask, pos, mesh, 2)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-5
    )


def test_pipeline_validates_config(tiny4):
    cfg, params = tiny4
    mesh = _pipe_mesh(2)
    x = jnp.zeros((4, 8, cfg.hidden_size))
    mask = jnp.ones((4, 8), jnp.int32)
    pos = jnp.zeros((4, 8), jnp.int32)
    bad = dataclasses.replace(cfg, num_layers=3)
    with pytest.raises(ValueError, match="pipe"):
        pipeline_llama_apply(params, bad, x, mask, pos, mesh, 2)
    with pytest.raises(ValueError, match="n_micro"):
        pipeline_llama_apply(params, cfg, x, mask, pos, mesh, 3)


@pytest.fixture(scope="module")
def tiny_mgpt():
    """Tiny MiniGPT-4 (4 decoder layers, fp32) + a packed train batch."""
    cfg = MiniGPT4Config.tiny()
    cfg = dataclasses.replace(
        cfg,
        llama=dataclasses.replace(
            cfg.llama, num_layers=4, dtype=jnp.float32
        ),
    )
    params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _mgpt_batches(cfg, pack):
    tok = ByteTokenizer()
    spec = BatchSpec(
        seq_len=30 * max(pack, 1),
        num_img_tokens=cfg.num_img_tokens,
        max_answer_len=16,
    )
    insts = [f"<Img><ImageHere></Img>Q{i}?" for i in range(8)]
    answers = ["cat", "dog", "two", "sky", "red", "one", "bus", "hat"]
    if pack > 1:
        text = pack_train_batch(tok, insts, answers, spec, pack)
    else:
        text = build_train_batch(tok, insts, answers, spec)
    rng = np.random.RandomState(0)
    images = rng.randn(
        8, cfg.vit.img_size, cfg.vit.img_size, 3
    ).astype(np.float32)
    return {**text, "image": images}


@pytest.mark.parametrize("pack", [1, 2])
def test_pipeline_loss_and_proj_grads_match(tiny_mgpt, pack):
    """End-to-end training semantics through the pipeline: the loss AND
    the trainable llama_proj gradients (which traverse the full reverse
    GPipe schedule) equal the sequential path's — packed and unpacked."""
    cfg, params = tiny_mgpt
    batch = _mgpt_batches(cfg, pack)
    mesh = _pipe_mesh(2, 2)
    trainable, frozen = split_params(params)

    def seq_loss(tr):
        return minigpt4_loss(merge_params(tr, frozen), cfg, batch)

    def pp_loss(tr):
        return pipeline_minigpt4_loss(
            merge_params(tr, frozen), cfg, batch, mesh, n_micro=2
        )

    l_ref, g_ref = jax.value_and_grad(seq_loss)(trainable)
    l_pp, g_pp = jax.value_and_grad(pp_loss)(trainable)
    np.testing.assert_allclose(float(l_ref), float(l_pp), rtol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_pp),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-7,
            err_msg=str(kp),
        )
