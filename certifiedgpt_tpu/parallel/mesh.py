"""Device mesh construction and sharding rules.

The reference's only distribution strategy is data parallelism over TPU
cores via per-core processes and the torch_xla ``xla://`` process group
(SURVEY.md §2.8). The TPU-native equivalent is a single-controller SPMD
mesh: parameters replicated (or sharded) with ``NamedSharding``, batches
split over the ``data`` axis, XLA inserting the ICI collectives.

Axes:
- ``dcn``   — optional multislice axis: slices of a TPU pod connected by
  data-center network instead of ICI. Only the batch/MC axis spans it
  (collectives over DCN are ~10x slower than ICI, so parameter-sharded
  axes must stay inside a slice — the scaling-book hybrid-mesh recipe).
- ``data``  — batch / Monte-Carlo noise-draw axis (the certification
  n-sample axis shards here; SURVEY.md §5.7).
- ``model`` — optional tensor-parallel axis for the frozen 7B decoder
  when a single device cannot hold it (survey §2.8 TP note).

The batch dimension shards over ``("dcn", "data")`` when a dcn axis
exists (``batch_spec``), so one set of shardings serves both mesh
shapes. For certification this is embarrassingly parallel — each draw's
forward touches no other draw, and only the tiny per-chunk count gather
crosses DCN — which is why the MC axis scales across slices at all.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def detect_num_slices(devices: Sequence) -> int:
    """Number of distinct TPU slices among ``devices``.

    Real multislice jobs expose ``device.slice_index``; single-slice and
    CPU devices don't (or share one value), yielding 1.
    """
    indices = {getattr(d, "slice_index", 0) or 0 for d in devices}
    return max(len(indices), 1)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    n_dcn: Optional[int] = 1,
    n_pipe: int = 1,
) -> Mesh:
    """Build the device mesh.

    ``n_dcn=1`` (default) gives the 2-axis ``(data, model)`` mesh.
    ``n_dcn>1`` adds a leading ``dcn`` axis whose rows are whole slices:
    devices are grouped by ``slice_index`` when present (real multislice)
    or split contiguously (virtual CPU meshes), so the ``data``/``model``
    axes never straddle a DCN link. ``n_dcn=None`` auto-detects from
    ``slice_index``.

    ``n_pipe>1`` adds a leading ``pipe`` axis for the GPipe decoder
    pipeline (``parallel/pipeline.py``): contiguous device blocks become
    stages, so the per-tick ``ppermute`` rides neighboring ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_dcn is None:
        n_dcn = detect_num_slices(devices)
    if n_pipe > 1:
        if n_dcn > 1:
            raise ValueError(
                "pipeline_parallel across DCN slices is not supported: "
                "per-tick activation transfers must ride ICI, not the "
                "10x-slower DCN (pick one of dcn_parallel/pipeline_parallel)"
            )
        if len(devices) % n_pipe:
            raise ValueError(
                f"{len(devices)} devices do not divide into "
                f"pipeline_parallel={n_pipe} stages"
            )
        per_stage = len(devices) // n_pipe
        if per_stage % n_model:
            raise ValueError(
                f"{per_stage} devices per pipeline stage do not divide "
                f"into model_parallel={n_model}"
            )
        if n_data is None:
            n_data = per_stage // n_model
        grid = np.asarray(devices[: n_pipe * n_data * n_model]).reshape(
            n_pipe, n_data, n_model
        )
        return Mesh(grid, ("pipe", "data", "model"))
    if n_dcn <= 1:
        if n_data is None:
            if len(devices) % n_model:
                # silently flooring would leave chips idle (8 devices at
                # model=3 -> a 2x3 mesh with 2 dark chips and ~25% of
                # throughput quietly gone)
                raise ValueError(
                    f"{len(devices)} devices do not divide into "
                    f"model_parallel={n_model}; pick a divisor or pass "
                    "n_data explicitly"
                )
            n_data = len(devices) // n_model
        grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
        return Mesh(grid, ("data", "model"))

    # keep slice-mates in one dcn row: sort by (slice_index, id) — a
    # stable no-op for virtual devices, the DCN-correct order for real
    # multislice
    devices = sorted(
        devices, key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id)
    )
    if len(devices) % n_dcn:
        raise ValueError(
            f"{len(devices)} devices cannot split into {n_dcn} slices"
        )
    per_slice = len(devices) // n_dcn
    if n_data is None:
        if per_slice % n_model:
            raise ValueError(
                f"{per_slice} devices per slice do not divide into "
                f"model_parallel={n_model}; pick a divisor or pass "
                "n_data explicitly"
            )
        n_data = per_slice // n_model
    if n_data * n_model > per_slice:
        raise ValueError(
            f"data={n_data} x model={n_model} exceeds the {per_slice} "
            f"devices of one slice (model parallelism must not cross DCN)"
        )
    grid = np.asarray(
        [
            devices[s * per_slice : s * per_slice + n_data * n_model]
            for s in range(n_dcn)
        ]
    ).reshape(n_dcn, n_data, n_model)
    return Mesh(grid, ("dcn", "data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(mesh: Mesh, ndim: int) -> P:
    """PartitionSpec sharding dim 0 over every batch axis of ``mesh``
    (``("dcn", "data")`` on a multislice mesh, ``"data"`` otherwise)."""
    axes = ("dcn", "data") if "dcn" in mesh.axis_names else "data"
    return P(axes, *([None] * (ndim - 1)))


def batch_divisor(mesh: Optional[Mesh]) -> int:
    """Total device count the batch/MC dimension shards over."""
    if mesh is None:
        return 1
    return mesh.shape.get("data", 1) * mesh.shape.get("dcn", 1)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(mesh, ndim))


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Replicate every parameter across the mesh (pure data parallelism).

    Model-parallel layouts for the frozen decoder are layered on top by
    ``partition_llama`` when a ``model`` axis larger than 1 exists.
    """
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


def llama_param_spec(mod: str, leaf: str = "kernel") -> P:
    """Tensor-parallel PartitionSpec for a stacked LLaMA layer leaf.

    Megatron-style layout: q/k/v/gate/up shard their output dim, o/down
    shard their input dim, so each block needs exactly one psum on the
    residual — XLA inserts it from these specs.
    Kernel leaves are [L, in, out] (stacked layers); int8-quantized
    modules additionally carry a per-(layer, out-channel) ``scale``
    [L, out], which shards with the out dim (and stays replicated for
    the in-sharded modules).
    """
    out_sharded = mod in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
    in_sharded = mod in ("o_proj", "down_proj")
    if leaf in ("kernel", "kernel_q"):
        if out_sharded:
            return P(None, None, "model")
        if in_sharded:
            return P(None, "model", None)
        return P()
    if leaf == "scale":
        return P(None, "model") if out_sharded else P()
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
                        val, NamedSharding(mesh, llama_param_spec(mod, leaf))
                    )
                    for leaf, val in leaves.items()
                }
                for mod, leaves in sub.items()
            }
        elif top == "lm_head":
            # per-leaf specs instead of a fixed-key rebuild: a quantized
            # lm_head carries kernel_q [d, V] + per-out-channel scale [V]
            # next to (or instead of) kernel — unknown leaves replicate
            # rather than KeyError or silently drop
            lm_specs = {
                "kernel": P(None, "model"),
                "kernel_q": P(None, "model"),
                "scale": P("model"),
            }
            out[top] = {
                leaf: jax.device_put(
                    val, NamedSharding(mesh, lm_specs.get(leaf, P()))
                )
                for leaf, val in sub.items()
            }
        elif top == "embed_tokens":
            out[top] = {
                leaf: jax.device_put(
                    val,
                    NamedSharding(
                        mesh, P("model", None) if leaf == "embedding" else P()
                    ),
                )
                for leaf, val in sub.items()
            }
        else:
            out[top] = jax.tree.map(
                lambda x: jax.device_put(x, replicated(mesh)), sub
            )
    return out
