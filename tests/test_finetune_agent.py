import json

import numpy as np
import pytest
from PIL import Image

from certifiedgpt_tpu.common.config import Config
from certifiedgpt_tpu import registration  # noqa: F401
from certifiedgpt_tpu.agents.base import setup_agent
from certifiedgpt_tpu.optim import LinearWarmupCosineLR, weight_decay_mask


@pytest.fixture()
def tiny_run(tmp_path):
    """Synthetic VQAv2 + tiny-model finetune config."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(16):
        image_id = 2000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"COCO_train2014_{image_id:012d}.jpg")
        qid = i + 1
        questions.append(
            {"question_id": qid, "image_id": image_id, "question": f"what is {i}?"}
        )
        annotations.append(
            {
                "question_id": qid,
                "image_id": image_id,
                "answers": [{"answer": "cat", "answer_confidence": "yes"}],
            }
        )
    (tmp_path / "q.json").write_text(json.dumps({"questions": questions}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": annotations}))

    cfg = {
        "model": {"arch": "minigpt4", "model_size": "tiny"},
        "datasets": {
            "vqav2": {
                "vis_processor": {
                    "train": {"name": "blip2_image_train", "image_size": 28},
                    "val": {"name": "blip2_image_val", "image_size": 28},
                },
                "text_processor": {"train": {"name": "blip_caption"}},
                "build_info": {
                    "images": {"storage": str(img_dir)},
                    "questions": {"train": [str(tmp_path / "q.json")]},
                    "annotations": {"train": [str(tmp_path / "a.json")]},
                },
            }
        },
        "run": {
            "agent": "image_text_finetune",
            "max_epoch": 2,
            "batch_size": 8,
            "seq_len": 64,
            "noise_level": 0.5,
            "init_lr": 1e-3,
            "min_lr": 1e-4,
            "warmup_steps": 2,
            "warmup_start_lr": 1e-5,
            "warmup_max_lr": 1e-3,
            "iters_per_epoch": 2,
            "lr_sched": "linear_warmup_cosine_lr",
            "has_val_split": False,
            "checkpoint_name": "test_ckpt",
            "output_dir": str(tmp_path / "out"),
            "seed": 7,
        },
    }
    return Config(cfg), tmp_path


def test_finetune_end_to_end(tiny_run):
    config, tmp_path = tiny_run
    agent = setup_agent(config)
    result = agent.run()
    assert result["steps"] == 4  # 2 epochs x iters_per_epoch 2
    # loss history + checkpoints written
    out = tmp_path / "out"
    assert (out / "loss_history.json").exists()
    assert (out / "test_ckpt.npz").exists()
    assert (out / "test_ckpt_best.npz").exists()
    history = json.loads((out / "loss_history.json").read_text())
    assert len(history["train"]) == 2
    assert all(np.isfinite(v) for v in history["train"])


def test_pipeline_parallel_finetune_end_to_end(tiny_run):
    """run.pipeline_parallel=2 must actually stage the decoder layers
    over the 'pipe' mesh axis and train end-to-end (GPipe schedule,
    parallel/pipeline.py) — loss finite, checkpoints written."""
    from jax.sharding import PartitionSpec as P

    config, tmp_path = tiny_run
    data = config.config._data
    data["run"]["pipeline_parallel"] = 2
    data["run"]["pipeline_microbatches"] = 2
    data["run"]["max_epoch"] = 1
    data["run"]["iters_per_epoch"] = 1
    agent = setup_agent(config)
    assert agent.mesh.shape["pipe"] == 2
    spec = agent.model.params["llama"]["layers"]["q_proj"]["kernel"].sharding.spec
    assert spec == P("pipe")
    result = agent.run()
    assert result["steps"] == 1
    assert np.isfinite(result["best_val"])
    assert (tmp_path / "out" / "test_ckpt_best.npz").exists()


def test_pipeline_parallel_guards_fire_at_setup(tiny_run):
    config, _ = tiny_run
    data = config.config._data
    data["run"]["pipeline_parallel"] = 2
    data["run"]["pipeline_microbatches"] = 3  # 8 rows % 3 != 0
    with pytest.raises(ValueError, match="microbatches"):
        setup_agent(config)
    data["run"]["pipeline_microbatches"] = 2
    data["run"]["model_parallel"] = 2
    with pytest.raises(ValueError, match="pick one"):
        setup_agent(config)


def test_pack_segment_budget_guard_fires_at_setup(tiny_run):
    """seq_len//pack too small for bos+image+answer is a CONFIG error
    raised at agent construction — never a data-dependent mid-epoch
    crash (every packed segment gets the fixed seq_len//pack budget,
    data/text.pack_train_batch)."""
    config, _ = tiny_run
    data = config.config._data
    data["run"]["pack_sequences"] = 4
    data["run"]["seq_len"] = 24  # 6-token segments << bos+8 img+2
    with pytest.raises(ValueError, match="segment budget"):
        setup_agent(config)


def test_pack_rotary_and_row_divisibility_guards_fire_at_setup(tiny_run):
    """Two more packed-config properties validated at construction:
    seq_len//pack must fit the decoder's rotary table (silent-NaN
    otherwise), and batch/pack rows must divide the mesh data axis
    (shard_batch would die at step 1 with a misleading message)."""
    config, _ = tiny_run
    data = config.config._data
    data["run"]["pack_sequences"] = 2
    data["run"]["seq_len"] = 320  # 160-token segments > tiny's 128 table
    with pytest.raises(ValueError, match="rotary"):
        setup_agent(config)
    data["run"]["seq_len"] = 64
    data["run"]["pack_sequences"] = 4  # 8/4 = 2 rows < 8 cpu devices
    with pytest.raises(ValueError, match="mesh data axis"):
        setup_agent(config)


def test_finetune_resume(tiny_run):
    config, tmp_path = tiny_run
    agent = setup_agent(config)
    agent.run()
    # resume from the saved checkpoint: should start at epoch 2 == max_epoch
    config.config._data["run"]["resume_ckpt_path"] = "test_ckpt"
    agent2 = setup_agent(config)
    result = agent2.run()
    assert result["steps"] == 0  # nothing left to train


def test_warmup_cosine_schedule_matches_reference_math():
    sched = LinearWarmupCosineLR(
        max_epoch=4,
        iters_per_epoch=10,
        min_lr=1e-4,
        init_lr=1e-3,
        warmup_steps=5,
        warmup_start_lr=1e-5,
        warmup_max_lr=1e-3,
    )
    import math

    # warmup region: linear from warmup_start to warmup_max
    for step in range(5):
        expect = min(1e-3, 1e-5 + (1e-3 - 1e-5) * step / 5)
        np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-6)
    # cosine region (reference cosine_lr_schedule formula)
    for step in (5, 20, 39):
        expect = (1e-3 - 1e-4) * 0.5 * (1 + math.cos(math.pi * step / 40)) + 1e-4
        np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-6)


def test_weight_decay_mask_rules():
    import jax.numpy as jnp

    params = {
        "llama_proj": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "ln_vision": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
    }
    mask = weight_decay_mask(params)
    assert mask["llama_proj"]["kernel"] is True
    assert mask["llama_proj"]["bias"] is False
    assert mask["ln_vision"]["scale"] is False


def test_debug_graph_computation_mode(tiny_run):
    config, tmp_path = tiny_run
    config.config._data["run"]["debug_graph_computation"] = True
    agent = setup_agent(config)
    result = agent.run()
    assert result["steps"] == 1
    assert np.isfinite(result["loss"])
    assert (tmp_path / "out" / "debug_ckpt.npz").exists()


def test_reduce_lr_on_plateau_scheduler():
    from certifiedgpt_tpu.optim import (
        ReduceLROnPlateau,
        make_optimizer,
        set_learning_rate,
    )
    import jax.numpy as jnp
    import optax

    sched = ReduceLROnPlateau(init_lr=1e-3, factor=0.1, plateau_patience=1)
    assert sched.step_metric(1.0) == pytest.approx(1e-3)
    assert sched.step_metric(1.0) == pytest.approx(1e-3)  # bad epoch 1
    assert sched.step_metric(1.0) == pytest.approx(1e-4)  # patience hit
    assert sched.step_metric(0.5) == pytest.approx(1e-4)  # improvement holds

    params = {"w": jnp.ones((4, 4))}
    tx = make_optimizer(sched, stateful_lr=True, accumulate_steps=2)
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    state2 = set_learning_rate(state, 5e-5)
    updates, state3 = tx.update(grads, state2, params)
    # the update path must still work after lr rewrite
    optax.apply_updates(params, updates)


def test_use_cache_staging(tiny_run, tmp_path):
    """use_cache stages checkpoints to /tmp keyed by source path."""
    config, run_path = tiny_run
    config.config._data["run"]["use_cache"] = True  # before agent build
    agent = setup_agent(config)
    agent.run()
    trainable = {"llama_proj": agent.model.params["llama_proj"]}
    loaded, _, meta = agent.load_agent_checkpoint("test_ckpt", trainable)
    assert "epoch" in meta
    import glob
    staged = glob.glob("/tmp/*_test_ckpt.npz")
    assert staged, "expected a staged copy under /tmp"


def test_evaluate_only_mode(tiny_run):
    """run.evaluate skips training and reports a val loss only
    (ref vqav2_finetuning_noise_0.5.yaml:84, Config.evaluate_only)."""
    config, tmp_path = tiny_run
    data = config.config._data
    bi = data["datasets"]["vqav2"]["build_info"]
    # val-split filenames use the val2014 prefix
    img_dir = tmp_path / "images"
    for path in img_dir.glob("COCO_train2014_*.jpg"):
        target = img_dir / path.name.replace("train2014", "val2014")
        target.write_bytes(path.read_bytes())
    bi["questions"]["val"] = bi["questions"]["train"]
    bi["annotations"]["val"] = bi["annotations"]["train"]
    data["run"]["has_val_split"] = True
    data["run"]["evaluate"] = True
    agent = setup_agent(config)
    result = agent.run()
    assert result["evaluate_only"] is True and result["epochs"] == 0
    assert np.isfinite(result["val_loss"])
    out = tmp_path / "out"
    assert not (out / "test_ckpt.npz").exists()  # no training, no ckpt
    history = json.loads((out / "loss_history.json").read_text())
    assert len(history["val"]) == 1


def test_gradient_accumulation_equals_big_batch():
    """k accumulation micro-steps == one step on the mean gradient
    (ref run.accumulated_gradients via optax.MultiSteps)."""
    import jax
    import jax.numpy as jnp
    import optax

    from certifiedgpt_tpu.optim import make_optimizer

    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    g1 = {"w": jnp.array([1.0, -2.0, 0.5, 3.0]), "b": jnp.array([0.1, -0.4])}
    g2 = {"w": jnp.array([-1.0, 4.0, 2.5, -1.0]), "b": jnp.array([0.3, 0.2])}
    mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    acc = make_optimizer(lambda s: 1e-2, accumulate_steps=2)
    state = acc.init(params)
    p = params
    for g in (g1, g2):
        updates, state = acc.update(g, state, p)
        p = optax.apply_updates(p, updates)

    ref_opt = make_optimizer(lambda s: 1e-2, accumulate_steps=1)
    ref_state = ref_opt.init(params)
    ref_updates, _ = ref_opt.update(mean, ref_state, params)
    ref_p = optax.apply_updates(params, ref_updates)

    for key in params:
        np.testing.assert_allclose(
            np.asarray(p[key]), np.asarray(ref_p[key]), atol=1e-6
        )


def test_small_val_split_still_validates(tiny_run):
    """A val split smaller than batch_size must still produce a val loss
    (drop_last would yield ZERO val batches and a silent 0.0 that
    poisons best-checkpoint selection / early stopping)."""
    config, tmp_path = tiny_run
    data = config.config._data
    bi = data["datasets"]["vqav2"]["build_info"]
    # val = the same tiny files; 16 samples < batch_size 20
    val_dir = tmp_path / "images" / "val2014"
    val_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(1)
    for i in range(16):
        image_id = 2000 + i
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            val_dir / f"COCO_val2014_{image_id:012d}.jpg"
        )
    bi["questions"]["val"] = bi["questions"]["train"]
    bi["annotations"]["val"] = bi["annotations"]["train"]
    data["run"]["has_val_split"] = True
    data["run"]["batch_size"] = 20
    data["run"]["max_epoch"] = 1
    data["run"]["iters_per_epoch"] = 1
    agent = setup_agent(config)
    result = agent.run()
    # the partial val batch was evaluated: a real (nonzero) loss monitored
    assert result["best_val"] > 0.0


def test_model_parallel_shards_decoder_and_trains(tiny_run):
    """run.model_parallel > 1 must actually place the frozen decoder
    over the 'model' mesh axis (Megatron specs) — building the mesh
    without device_put left GSPMD replicating everything, so the knob
    was silently inert. The finetune step must still run end-to-end on
    the dp x tp mesh."""
    from jax.sharding import PartitionSpec as P

    config, tmp_path = tiny_run
    data = config.config._data
    data["run"]["model_parallel"] = 2
    data["run"]["max_epoch"] = 1
    data["run"]["iters_per_epoch"] = 1
    agent = setup_agent(config)
    assert agent.mesh.shape["model"] == 2
    spec = agent.model.params["llama"]["layers"]["q_proj"]["kernel"].sharding.spec
    assert spec == P(None, None, "model")
    # the vision tower stays replicated
    vit_leaf = agent.model.params["vit"]["patch_embed"]["kernel"]
    assert vit_leaf.sharding.spec == P()
    result = agent.run()
    assert result["steps"] == 1


def test_multi_dataset_finetune_keeps_first_and_warns(tiny_run, caplog):
    """Two datasets providing the same split: the first configured one
    wins with a warning (silent overwrite used to train on only the
    LAST dataset of a multi-dataset config)."""
    import json as _json
    import logging

    from PIL import Image as _Image

    config, tmp_path = tiny_run
    data = config.config._data
    # a second train-split dataset: a minimal cc_sbu alignment dir
    cc_dir = tmp_path / "cc_sbu"
    cc_dir.mkdir()
    arr = np.random.RandomState(0).randint(0, 255, (32, 32, 3), dtype=np.uint8)
    _Image.fromarray(arr).save(cc_dir / "1.jpg")
    (cc_dir / "filter_cap.json").write_text(
        _json.dumps({"annotations": [{"image_id": 1, "caption": "a cat"}]})
    )
    data["datasets"]["cc_sbu"] = {
        "vis_processor": {
            "train": {"name": "blip2_image_train", "image_size": 28}
        },
        "build_info": {
            "images": {"storage": str(cc_dir)},
            "annotations": {"train": [str(cc_dir / "filter_cap.json")]},
        },
    }
    data["run"]["max_epoch"] = 1
    data["run"]["iters_per_epoch"] = 1
    agent = setup_agent(config)
    # the project logger sets propagate=False, so attach caplog's
    # handler directly
    logger = logging.getLogger("certifiedgpt_tpu")
    logger.addHandler(caplog.handler)
    try:
        loaders = agent.create_loaders()
    finally:
        logger.removeHandler(caplog.handler)
    # first configured dataset (vqav2) won the 'train' split
    from certifiedgpt_tpu.data.datasets import VQAv2Dataset

    assert isinstance(loaders["train"].dataset, VQAv2Dataset)
    assert any("keeping" in r.getMessage() for r in caplog.records)
