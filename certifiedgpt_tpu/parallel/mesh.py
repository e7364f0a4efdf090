"""Device mesh construction and sharding rules.

The reference's only distribution strategy is data parallelism over TPU
cores via per-core processes and the torch_xla ``xla://`` process group
(SURVEY.md §2.8). The TPU-native equivalent is a single-controller SPMD
mesh: parameters replicated (or sharded) with ``NamedSharding``, batches
split over the ``data`` axis, XLA inserting the ICI collectives.

Axes:
- ``data``  — batch / Monte-Carlo noise-draw axis (the certification
  n-sample axis shards here; SURVEY.md §5.7).
- ``model`` — optional tensor-parallel axis for the frozen 7B decoder
  when a single device cannot hold it (survey §2.8 TP note).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Replicate every parameter across the mesh (pure data parallelism).

    Model-parallel layouts for the frozen decoder are layered on top by
    ``partition_llama`` when a ``model`` axis larger than 1 exists.
    """
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


def llama_param_spec(path_leaf: str) -> P:
    """Tensor-parallel PartitionSpec for a stacked LLaMA layer leaf.

    Megatron-style layout: q/k/v/gate/up shard their output dim, o/down
    shard their input dim, so each block needs exactly one psum on the
    residual — XLA inserts it from these specs.
    Leaves are [L, in, out] (stacked layers).
    """
    if path_leaf in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        return P(None, None, "model")
    if path_leaf in ("o_proj", "down_proj"):
        return P(None, "model", None)
    return P()


def partition_llama(llama_params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard the (frozen) decoder over the ``model`` axis when present."""
    if mesh.shape.get("model", 1) == 1:
        sharding = replicated(mesh)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), llama_params)

    out: Dict[str, Any] = {}
    for top, sub in llama_params.items():
        if top == "layers":
            out[top] = {
                mod: {
                    leaf: jax.device_put(
                        val, NamedSharding(mesh, llama_param_spec(mod))
                    )
                    for leaf, val in leaves.items()
                }
                for mod, leaves in sub.items()
            }
        elif top == "lm_head":
            out[top] = {
                "kernel": jax.device_put(
                    sub["kernel"], NamedSharding(mesh, P(None, "model"))
                )
            }
        elif top == "embed_tokens":
            out[top] = {
                "embedding": jax.device_put(
                    sub["embedding"], NamedSharding(mesh, P("model", None))
                )
            }
        else:
            out[top] = jax.tree.map(
                lambda x: jax.device_put(x, replicated(mesh)), sub
            )
    return out
