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
