"""Data loader: dataset -> transforms -> fixed-shape batches -> prefetch.

Replaces the reference's Tensorpack ZMQ multi-process pipeline
(data/build.py:169-241) with a worker map plus a producer thread feeding a
bounded queue, so host preprocessing overlaps device compute.  Two worker
modes (``data_loader.worker_type``):

  * ``thread`` (default): ThreadPoolExecutor — numpy-heavy transforms
    release the GIL in practice, and samples never cross a pickle boundary.
  * ``process``: forked worker processes — the TPU-equivalent of the
    reference's MultiProcessMapDataZMQ, for transform chains that hold the
    GIL (e.g. the O(n^2) host FPS on large clouds).  Each worker reseeds
    its transform copy so augmentation streams differ across workers.
"""
from __future__ import annotations

import multiprocessing
import os
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Union

import numpy as np

from ..geometry import LabelType
from .batching import BatchBuilder
from .datasets import build_dataset
from .transforms import build_transform

__all__ = ["DataLoader", "make_dataflow", "make_data_loader"]

DEFAULT_NUM_POINTS = 16384


def _model_presorted(cfg) -> bool:
    """model.params.presorted — the host pipeline Morton-sorts each cloud
    exactly when the model is configured to skip its on-device stage-0
    sort (models/pointnet2.py SetAbstractionMSG.presorted)."""
    params = getattr(getattr(cfg, "model", None), "params", None)
    if params is None:
        return False
    if hasattr(params, "to_dict"):
        params = params.to_dict()
    if isinstance(params, dict):
        return bool(params.get("presorted", False))
    return bool(getattr(params, "presorted", False))


def _map_iter(it: Iterator, fn: Callable, workers: int, buffer: int) -> Iterator:
    """Map fn over an iterator with a thread pool, preserving order."""
    if workers <= 0:
        for x in it:
            yield fn(x)
        return
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending = []
        depth = max(buffer, workers * 2)
        for x in it:
            pending.append(pool.submit(fn, x))
            if len(pending) >= depth:
                yield pending.pop(0).result()
        for f in pending:
            yield f.result()


_WORKER_FN: Optional[Callable] = None


def _reseed_transform(fn: Callable, seed: int) -> None:
    """Give every rng-carrying member of a Compose its own fresh stream."""
    members = getattr(fn, "transforms", [fn])
    for i, t in enumerate(members):
        if hasattr(t, "rng"):
            t.rng = np.random.default_rng(seed + 7919 * (i + 1))


def _proc_init(fn: Callable, seed: int) -> None:
    global _WORKER_FN
    _WORKER_FN = fn
    _reseed_transform(fn, seed ^ os.getpid())


def _proc_apply(x):
    return _WORKER_FN(x)


def _map_iter_proc(it: Iterator, fn: Callable, workers: int, buffer: int,
                   seed: int) -> Iterator:
    """Map fn over an iterator with spawned worker processes, preserving
    order with bounded in-flight submissions (Pool.imap's feeder thread
    would otherwise drain the whole epoch into its task queue).  spawn,
    not fork: the parent holds jax's thread pools and forking them is a
    documented deadlock."""
    ctx = multiprocessing.get_context("spawn")
    pool = ctx.Pool(workers, initializer=_proc_init, initargs=(fn, seed))
    try:
        pending: deque = deque()
        depth = max(buffer, workers * 2)
        for x in it:
            pending.append(pool.apply_async(_proc_apply, (x,)))
            if len(pending) >= depth:
                yield pending.popleft().get()
        while pending:
            yield pending.popleft().get()
    finally:
        pool.terminate()
        pool.join()


class _Prefetcher:
    """Producer thread + bounded queue."""

    def __init__(self, make_iter: Callable[[], Iterator], buffer_size: int):
        self._make_iter = make_iter
        self._buffer_size = max(1, buffer_size)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(self._buffer_size)
        stop = object()
        err: List[BaseException] = []

        def worker():
            try:
                for item in self._make_iter():
                    q.put(item)
            except BaseException as e:  # propagate into consumer
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        if err:
            raise err[0]


class DataLoader:
    """Iterable of fixed-shape batch dicts with a length, reset per epoch."""

    def __init__(self, cfg, is_train: bool,
                 source: Optional[Union[str, List]] = None,
                 batch_size: Optional[int] = None,
                 shard_index: int = 0, num_shards: int = 1):
        self._cfg = cfg
        self._is_train = is_train
        self._source = source
        self._batch_size = batch_size or cfg.data_loader.batch_size
        self._num_points = cfg.data_loader.num_points or DEFAULT_NUM_POINTS
        # multi-host: each process consumes a disjoint sample slice
        self._shard_index = shard_index
        self._num_shards = num_shards
        self._epoch = 0
        self._len: Optional[int] = None

    def _dataset(self, seed: int):
        source = self._source
        if source is None:
            source = (
                self._cfg.data.training if self._is_train
                else self._cfg.data.validation
            )
        return build_dataset(
            self._cfg.data.dataset_type, source,
            shuffle=self._is_train, seed=seed,
        )

    def __len__(self) -> int:
        if self._len is None:
            n = len(self._dataset(seed=0))
            if self._num_shards > 1:
                # lockstep across hosts: every process must run the same
                # number of collective steps, so all shards use the
                # SMALLEST shard's full-batch count (shard sizes differ by
                # at most one sample)
                self._len = (n // self._num_shards) // self._batch_size
            elif self._is_train:
                self._len = n // self._batch_size  # drop remainder: stable shapes
            else:
                bs = self._batch_size
                self._len = (n + bs - 1) // bs
        return self._len

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        self._epoch += 1
        seed = self._cfg.seed * 100003 + self._epoch
        ds = self._dataset(seed=seed)
        transform = build_transform(
            self._cfg, is_training=self._is_train,
            rng=np.random.default_rng(seed + 1),
        )
        batcher = BatchBuilder(
            self._batch_size,
            LabelType.create(self._cfg.model.label_type),
            self._num_points,
            remainder=not self._is_train,
            seed=seed + 2,
            morton=_model_presorted(self._cfg),
        )
        workers = self._cfg.data_loader.num_workers if self._is_train else 0
        buffer = self._cfg.data_loader.buffer_size
        worker_type = getattr(self._cfg.data_loader, "worker_type", "thread")

        def sharded():
            if self._num_shards <= 1:
                yield from ds
                return
            for i, sample in enumerate(ds):
                if i % self._num_shards == self._shard_index:
                    yield sample

        def make_iter():
            if workers > 0 and worker_type == "process":
                mapped = _map_iter_proc(
                    sharded(), transform, workers, buffer, seed + 3
                )
            else:
                mapped = _map_iter(sharded(), transform, workers, buffer)
            return batcher(mapped)

        batches = (_Prefetcher(make_iter, buffer) if buffer > 0
                   else make_iter())
        if self._num_shards > 1:
            # cap at the cross-shard common length (see __len__); within
            # that cap every batch is full-size, keeping global array
            # assembly shape-consistent across hosts
            limit = len(self)
            for i, b in enumerate(batches):
                if i >= limit:
                    break
                yield b
        else:
            yield from batches


def make_dataflow(cfg, is_train: bool, source=None, batch_size=None):
    """Reference-named alias: the full dataflow is the DataLoader itself."""
    return DataLoader(cfg, is_train, source=source, batch_size=batch_size)


def make_data_loader(cfg, is_train: bool, **kwargs) -> Optional[DataLoader]:
    """Create a loader; returns None when the split has no data configured."""
    source = kwargs.pop("source", None)
    if source is None:
        configured = cfg.data.training if is_train else cfg.data.validation
        if configured is None:
            return None
    return DataLoader(cfg, is_train, source=source, **kwargs)
