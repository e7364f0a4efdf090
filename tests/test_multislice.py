"""Multislice (DCN) mesh: the batch/MC axis spans a leading ``dcn`` axis.

The reference scales only inside one torch_xla process group (SURVEY.md
§2.8); scaling past a single ICI domain is new capability. The recipe
(docs/DESIGN.md): slices join over data-center network, ONLY the
batch/Monte-Carlo axis spans ``dcn`` (model parallelism stays inside a
slice), and every sharding helper emits ``P(("dcn", "data"), ...)`` so
the same pipelines serve both mesh shapes. Runs on the virtual 8-device
CPU mesh from tests/conftest.py.
"""

import types

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from certifiedgpt_tpu.parallel.mesh import (
    batch_divisor,
    batch_spec,
    data_sharding,
    detect_num_slices,
    make_mesh,
)


def test_make_mesh_dcn_axes():
    mesh = make_mesh(n_model=2, n_dcn=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    assert batch_divisor(mesh) == 4
    assert batch_spec(mesh, 3) == P(("dcn", "data"), None, None)


def test_make_mesh_single_slice_unchanged():
    mesh = make_mesh(n_model=1)
    assert mesh.axis_names == ("data", "model")
    assert batch_divisor(mesh) == len(jax.devices())
    assert batch_spec(mesh, 2) == P("data", None)
    # auto-detect: CPU devices expose no slice_index -> single slice
    assert detect_num_slices(jax.devices()) == 1
    auto = make_mesh(n_model=1, n_dcn=None)
    assert auto.axis_names == ("data", "model")


def test_detect_and_group_by_slice_index():
    fake = [
        types.SimpleNamespace(slice_index=s, id=i)
        for i, s in enumerate([1, 0, 1, 0])
    ]
    assert detect_num_slices(fake) == 2
    # make_mesh must put slice-mates in one dcn row (model/data axes
    # never straddle a DCN link)
    grouped = sorted(fake, key=lambda d: (d.slice_index, d.id))
    assert [d.slice_index for d in grouped] == [0, 0, 1, 1]


def test_make_mesh_rejects_model_axis_across_slices():
    with pytest.raises(ValueError, match="slice"):
        make_mesh(n_data=2, n_model=4, n_dcn=2)  # 8 devices, 4 per slice


def test_shard_batch_spans_dcn():
    from certifiedgpt_tpu.data.loader import shard_batch

    mesh = make_mesh(n_model=1, n_dcn=2)  # dcn=2 x data=4
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == batch_spec(mesh, 2)
    shapes = {s.data.shape for s in out["x"].addressable_shards}
    assert shapes == {(1, 4)}  # 8 rows over 8 devices (2 dcn x 4 data)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_dcn_sharded_certify_matches_replicated():
    """The compiled certify pipeline on a ("dcn","data") mesh produces
    the same labels as the unsharded run — same counter-based keys, so
    the draws are identical and only the layout differs."""
    from certifiedgpt_tpu.data.text import ByteTokenizer
    from certifiedgpt_tpu.models.minigpt4 import MiniGPT4Config, init_minigpt4
    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model
    from certifiedgpt_tpu.smoothing.classifier import (
        AnswerVocabulary,
        make_sample_fn,
    )

    cfg = MiniGPT4Config.tiny()
    params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    model = MiniGPT4Model(cfg, params, ByteTokenizer())
    vocab = AnswerVocabulary(["cat", "dog"])
    image = np.zeros((cfg.vit.img_size, cfg.vit.img_size, 3), np.float32)

    kwargs = dict(
        sigma=0.5, mc_batch=8, max_new_tokens=2, seq_len=32
    )
    prompt = "<Img><ImageHere></Img> q?"
    plain = make_sample_fn(model, prompt, vocab, mesh=None, **kwargs)
    mesh = make_mesh(n_model=1, n_dcn=2)
    sharded = make_sample_fn(model, prompt, vocab, mesh=mesh, **kwargs)

    np.testing.assert_array_equal(
        plain(image, 16, seed=3), sharded(image, 16, seed=3)
    )

    # indivisible mc_batch (vs dcn*data = 8) rejected up front
    with pytest.raises(ValueError, match="dcn"):
        make_sample_fn(
            model, prompt, vocab, mesh=mesh, sigma=0.5, mc_batch=12,
            max_new_tokens=2, seq_len=32,
        )


def test_dcn_noisy_batch_carries_hybrid_sharding():
    """The noisy MC batch must actually CARRY the ("dcn","data") sharding
    (XLA silently replicating would still be correct, just unscalable)."""
    from certifiedgpt_tpu.data.text import ByteTokenizer
    from certifiedgpt_tpu.models.minigpt4 import MiniGPT4Config, init_minigpt4
    from certifiedgpt_tpu.models.model_zoo import MiniGPT4Model
    from certifiedgpt_tpu.smoothing.classifier import (
        AnswerVocabulary,
        make_noisy_generate_fn,
    )
    from certifiedgpt_tpu.data.text import BatchSpec, build_gen_batch

    cfg = MiniGPT4Config.tiny()
    params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    model = MiniGPT4Model(cfg, params, ByteTokenizer())
    mesh = make_mesh(n_model=1, n_dcn=2)
    gen = make_noisy_generate_fn(
        model, sigma=0.5, mc_batch=8, max_new_tokens=2, seq_len=32, mesh=mesh
    )
    image = np.zeros((cfg.vit.img_size, cfg.vit.img_size, 3), np.float32)
    noisy = gen.noise_fn(
        jax.numpy.asarray(image), jax.random.PRNGKey(0), jax.numpy.float32(0.5)
    )
    # trailing Nones are normalized away — compare sharding equivalence
    assert noisy.sharding.is_equivalent_to(
        data_sharding(mesh, noisy.ndim), noisy.ndim
    )


def test_dcn_train_step_matches_single_device():
    """One jitted train step over the hybrid mesh computes the same loss
    as the unsharded step (replicated params + batch over dcn x data)."""
    import optax

    from certifiedgpt_tpu.models.minigpt4 import (
        MiniGPT4Config,
        init_minigpt4,
        merge_params,
        minigpt4_loss,
        split_params,
    )

    import __graft_entry__ as entry_mod

    cfg = MiniGPT4Config.tiny()
    params = init_minigpt4(jax.random.PRNGKey(0), cfg)
    batch_host = {
        k: np.asarray(v)
        for k, v in entry_mod._make_batch(cfg, batch=8, seq=32).items()
    }

    def loss_of(params, batch):
        trainable, frozen = split_params(params)

        @jax.jit
        def step(tr):
            return minigpt4_loss(merge_params(tr, frozen), cfg, batch)

        return float(step(trainable))

    plain = loss_of(params, {k: jax.numpy.asarray(v) for k, v in batch_host.items()})

    mesh = make_mesh(n_model=1, n_dcn=2)
    from certifiedgpt_tpu.parallel.mesh import replicated

    rep = replicated(mesh)
    params2 = jax.tree.map(lambda x: jax.device_put(x, rep), params)
    batch2 = {
        k: jax.device_put(v, data_sharding(mesh, v.ndim))
        for k, v in batch_host.items()
    }
    with mesh:
        dcn = loss_of(params2, batch2)
    assert np.isclose(plain, dcn, rtol=1e-5), (plain, dcn)


def test_certify_agent_runs_on_dcn_mesh(tmp_path):
    """Agent-level multislice: run.dcn_parallel=2 must thread through
    BaseAgent -> make_mesh -> the certify pipeline and produce the same
    artifacts as the single-axis mesh (virtual 8-device CPU = 2 slices
    x 4 chips)."""
    import json

    from PIL import Image

    from certifiedgpt_tpu import registration  # noqa: F401
    from certifiedgpt_tpu.agents.base import setup_agent
    from certifiedgpt_tpu.common.config import Config

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(2):
        image_id = 3000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"COCO_val2014_{image_id:012d}.jpg")
        questions.append(
            {"question_id": i + 1, "image_id": image_id, "question": f"q{i}?"}
        )
        annotations.append(
            {
                "question_id": i + 1,
                "image_id": image_id,
                "question_type": "what is",
                "answer_type": "other",
                "answers": [
                    {"answer": "cat", "answer_confidence": "yes", "answer_id": 1}
                ],
                "multiple_choice_answer": "cat",
            }
        )
    (tmp_path / "q.json").write_text(json.dumps({"questions": questions}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": annotations}))

    cfg = Config(
        {
            "model": {"arch": "minigpt4", "model_size": "tiny"},
            "datasets": {
                "evalvqav2": {
                    "vis_processor": {
                        "val": {"name": "blip2_image_val", "image_size": 28}
                    },
                    "build_info": {
                        "images": {"storage": str(img_dir)},
                        "questions": {"val": [str(tmp_path / "q.json")]},
                        "annotations": {"val": [str(tmp_path / "a.json")]},
                    },
                }
            },
            "run": {
                "agent": "image_text_certify",
                "dcn_parallel": 2,
                "certify_n0": 4,
                "certify_n": 8,
                "certify_alpha": 0.05,
                "mc_batch": 8,
                "max_images": 2,
                "max_new_tokens": 3,
                "seq_len": 48,
                "noise_level": 0.25,
                "output_dir": str(tmp_path / "out_dcn"),
                "seed": 3,
            },
        }
    )
    agent = setup_agent(cfg)
    assert agent.mesh.axis_names == ("dcn", "data", "model")
    assert dict(agent.mesh.shape)["dcn"] == 2
    summary = agent.run()
    assert summary["total"] == 2
    rows = [
        json.loads(line)
        for line in open(tmp_path / "out_dcn" / "certify_results.jsonl")
    ]
    assert len(rows) == 2


def test_finetune_agent_trains_on_dcn_mesh(tmp_path):
    """Agent-level multislice training: run.dcn_parallel=2 threads through
    BaseAgent -> shard_batch (hybrid batch spec) -> the jitted train step,
    and the loss history matches the single-axis-mesh run bit-for-bit
    (same seed, replicated params, same global batch order)."""
    import json

    from PIL import Image

    from certifiedgpt_tpu import registration  # noqa: F401
    from certifiedgpt_tpu.agents.base import setup_agent
    from certifiedgpt_tpu.common.config import Config

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(16):
        image_id = 2000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            img_dir / f"COCO_train2014_{image_id:012d}.jpg"
        )
        questions.append(
            {"question_id": i + 1, "image_id": image_id,
             "question": f"what is {i}?"}
        )
        annotations.append(
            {
                "question_id": i + 1,
                "image_id": image_id,
                "answers": [{"answer": "cat", "answer_confidence": "yes"}],
            }
        )
    (tmp_path / "q.json").write_text(json.dumps({"questions": questions}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": annotations}))

    def run_once(name, **run_extra):
        cfg = Config(
            {
                "model": {"arch": "minigpt4", "model_size": "tiny"},
                "datasets": {
                    "vqav2": {
                        "vis_processor": {
                            "train": {
                                "name": "blip2_image_train", "image_size": 28
                            }
                        },
                        "text_processor": {"train": {"name": "blip_caption"}},
                        "build_info": {
                            "images": {"storage": str(img_dir)},
                            "questions": {
                                "train": [str(tmp_path / "q.json")]
                            },
                            "annotations": {
                                "train": [str(tmp_path / "a.json")]
                            },
                        },
                    }
                },
                "run": {
                    "agent": "image_text_finetune",
                    "max_epoch": 1,
                    "batch_size": 8,
                    "seq_len": 48,
                    "iters_per_epoch": 2,
                    "has_val_split": False,
                    "checkpoint_name": f"ckpt_{name}",
                    "output_dir": str(tmp_path / f"out_{name}"),
                    "seed": 7,
                    **run_extra,
                },
            }
        )
        agent = setup_agent(cfg)
        agent.run()
        return agent.loss_history["train"]

    base = run_once("base")
    dcn = run_once("dcn", dcn_parallel=2)
    # loss_history holds one mean per epoch
    assert len(base) == len(dcn) == 1
    np.testing.assert_allclose(base, dcn, rtol=1e-6)
