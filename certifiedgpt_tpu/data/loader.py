"""Host->device data loading.

Replaces the reference's ``DistributedSampler`` + ``DataLoader`` +
``pl.MpDeviceLoader`` stack (ref ``minigpt4_finetune_agent.py:291-335``)
with the single-controller JAX pattern: one host process iterates the
dataset, collates fixed-shape numpy batches on a background prefetch
thread, and ``shard_batch`` lays each batch out over the ``data`` axis of
the device mesh with a ``NamedSharding`` — the XLA partitioner then keeps
every per-device shard local, reproducing per-core data parallelism
without per-process samplers.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


class Loader:
    """Shuffling, batching, drop_last, background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        num_workers: int = 4,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        # batch_size is the GLOBAL batch; under multi-process SPMD each
        # process loads only its contiguous 1/process_count slice of every
        # batch (the jax-native DistributedSampler: same seeded order on
        # every host, disjoint rows — ref minigpt4_finetune_agent.py:315-320)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        # parallel sample loading (JPEG decode + resize release the GIL in
        # PIL) — the host-side analogue of the reference's DataLoader
        # num_workers (ref minigpt4_finetune_agent.py:291-335)
        self.num_workers = max(int(num_workers), 1)
        self.epoch = 0
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        if self.process_count > 1 and batch_size % self.process_count != 0:
            raise ValueError(
                f"Global batch_size {batch_size} must be divisible by the "
                f"process count ({self.process_count})"
            )

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _index_order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _local_slice(self, idx: np.ndarray):
        """This process's rows of a global batch (contiguous split);
        returns ``(local_idx, real_rows)``.

        A partial final batch (drop_last=False) pads by wrapping to the
        next process_count multiple — the DistributedSampler convention
        (ref ``minigpt4_finetune_agent.py:315-320``) — so every process
        gets the same non-empty local count and no sample is dropped.
        ``real_rows`` counts the UNWRAPPED rows of this slice (wrapped
        duplicates land at the tail of the last process's slice), so
        loss-weighting consumers can exclude the duplicates instead of
        double-counting samples."""
        if self.process_count <= 1:
            return idx, len(idx)
        n_real = len(idx)
        if len(idx) % self.process_count != 0:
            target = -(-len(idx) // self.process_count) * self.process_count
            reps = -(-target // len(idx))
            idx = np.tile(idx, reps)[:target]
        per = len(idx) // self.process_count
        start = self.process_index * per
        real = max(0, min(per, n_real - start))
        return idx[start : start + per], real

    def _batches(self) -> Iterator[Dict[str, Any]]:
        import concurrent.futures

        order = self._index_order()
        n_batches = len(self)

        def load(i):
            return self.dataset[int(i)]

        if self.num_workers <= 1:
            for b in range(n_batches):
                idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                if len(idx) == 0 or (
                    len(idx) < self.batch_size and self.drop_last
                ):
                    continue
                idx, real = self._local_slice(idx)
                batch = self.dataset.collater([load(i) for i in idx])
                batch["__local_real_rows__"] = real
                yield batch
            return

        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
            for b in range(n_batches):
                idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                if len(idx) == 0 or (
                    len(idx) < self.batch_size and self.drop_last
                ):
                    continue
                idx, real = self._local_slice(idx)
                batch = self.dataset.collater(list(pool.map(load, idx)))
                batch["__local_real_rows__"] = real
                yield batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def producer():
            try:
                for batch in self._batches():
                    # bounded put so an abandoned consumer (epoch break,
                    # e.g. iters_per_epoch) releases the thread + pool
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as exc:  # surfaced on the consumer side
                error.append(exc)
            finally:
                # deliver the sentinel unless the consumer already left
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # consumer broke early (or finished): unblock and reap the
            # producer and its worker pool
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=30)
        if error:
            raise error[0]


def shard_batch(
    batch: Dict[str, Any],
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
) -> Dict[str, Any]:
    """Device-put array fields, sharding the batch dim over ``data_axis``.

    Single-process: a plain ``device_put`` with a ``NamedSharding``.
    Multi-process SPMD (``jax.process_count() > 1``): each host passes its
    LOCAL rows (from the Loader's per-process slice) and the global array
    is assembled with ``jax.make_array_from_process_local_data`` — the
    jax-native replacement for the reference's per-core MpDeviceLoader
    feed (ref ``minigpt4_finetune_agent.py:152``).

    Non-array fields (strings, lists) pass through untouched for the
    host-side parts of eval/certify loops.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from certifiedgpt_tpu.parallel.mesh import batch_divisor, batch_spec

    n_data = batch_divisor(mesh) if data_axis == "data" else (
        mesh.shape.get(data_axis, 1) if mesh is not None else 1
    )
    multiprocess = mesh is not None and jax.process_count() > 1
    out: Dict[str, Any] = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.dtype != object:
            if mesh is None:
                out[key] = jax.numpy.asarray(value)
            else:
                # spans ("dcn", "data") on a multislice mesh
                spec = (
                    batch_spec(mesh, value.ndim)
                    if data_axis == "data"
                    else P(data_axis, *([None] * (value.ndim - 1)))
                )
                sharding = NamedSharding(mesh, spec)
                if multiprocess:
                    out[key] = jax.make_array_from_process_local_data(
                        sharding, value
                    )
                else:
                    if value.shape[0] % n_data != 0:
                        raise ValueError(
                            f"Global batch dim {value.shape[0]} of '{key}' must be "
                            f"divisible by the mesh '{data_axis}' axis ({n_data}); "
                            f"pick a batch_size that is a multiple of the device count"
                        )
                    out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out
