"""Static-shape batch loader with background prefetch.

TPU-first replacement for the reference's single-process torch DataLoader
(misc/run.py:89-96): items are collated into fixed-shape NumPy batches (the
final partial batch is padded and flagged via ``valid_mask`` so jit compiles
exactly one batch signature), and an optional background thread keeps a
prefetch queue full so the device never waits on HDF5 reads.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from .dataset import VideoDataset

ARRAY_KEYS = (
    "tokens", "labels", "tokens_1", "labels_1", "taggings",
    "length_target", "category",
)


def collate(items: List[Dict[str, Any]], batch_size: int) -> Dict[str, Any]:
    """Stack items into one fixed-shape batch, padding to ``batch_size``."""
    n = len(items)
    assert 0 < n <= batch_size
    batch: Dict[str, Any] = {}
    keys = items[0].keys()
    for k in keys:
        v0 = items[0][k]
        if isinstance(v0, np.ndarray) or k in ARRAY_KEYS:
            arr = np.stack([np.asarray(it[k]) for it in items])
            if n < batch_size:
                pad = np.zeros((batch_size - n,) + arr.shape[1:], arr.dtype)
                arr = np.concatenate([arr, pad], axis=0)
            batch[k] = arr
        else:  # metadata (video ids, caption ids)
            batch[k] = [it[k] for it in items] + [None] * (batch_size - n)
    batch["valid_mask"] = (np.arange(batch_size) < n).astype(np.float32)
    batch["num_valid"] = n
    return batch


class BatchLoader:
    """Iterate a VideoDataset in fixed-shape batches.

    train mode shuffles the item order each epoch with the dataset's seeded
    RNG (the reference relies on torch DataLoader shuffle, misc/run.py:95).

    Multi-host: with ``num_shards``/``shard_id`` set, every host iterates a
    disjoint strided slice of the SAME epoch permutation (the dataset RNG is
    seeded identically on all hosts), padded by wrapping so every shard has
    exactly the same number of batches — the SPMD train step stays in
    lockstep across processes (torch DistributedSampler semantics; the
    reference has no distributed loader at all, SURVEY.md §5).
    """

    def __init__(self, dataset: VideoDataset, batch_size: int,
                 shuffle: bool = False, prefetch: int = 0,
                 num_shards: int = 1, shard_id: int = 0):
        assert 0 <= shard_id < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_id = shard_id

    def __len__(self) -> int:
        n = len(self.dataset)
        per_shard = (n + self.num_shards - 1) // self.num_shards
        return (per_shard + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            # multi-host: the permutation must be identical on every host,
            # but per-item draws advance dataset.random host-differently —
            # use the lockstep structure stream instead (dataset.py)
            rng = (self.dataset.structure_random
                   if self.num_shards > 1 else self.dataset.random)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.num_shards > 1:
            per_shard = (n + self.num_shards - 1) // self.num_shards
            total = per_shard * self.num_shards
            if total > n:
                # wrap-pad so all shards are equal length; np.resize tiles
                # the permutation as many times as needed (total - n can
                # exceed n when there are fewer items than shards — a
                # single-slice concat would leave shards unequal and hang
                # the SPMD cluster at the first collective of the odd step)
                order = np.resize(order, total)
            order = order[self.shard_id::self.num_shards]
        return order

    def _iter_batches(self) -> Iterator[Dict[str, Any]]:
        order = self._order()
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            items = [self.dataset[int(i)] for i in idx]
            yield collate(items, self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.prefetch <= 0:
            yield from self._iter_batches()
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: List[BaseException] = []

        stop = threading.Event()

        def _put(item) -> bool:
            # blocking put that aborts when the consumer abandoned the
            # epoch (break / exception in the train step) — a plain
            # q.put() would pin this thread in a full queue forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in self._iter_batches():
                    if not _put(b):
                        return
            except BaseException as e:  # surfaced in the consumer
                error.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is sentinel:
                    break
                yield b
        finally:
            stop.set()
            try:  # unblock a producer waiting on a full queue, then reap it
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)
        if error:
            raise error[0]


def device_prefetch(iterator, depth: int = 2, put_fn=None):
    """Wrap a batch iterator with async host->device staging.

    Keeps ``depth`` batches already transferred (jax.device_put) while the
    current step runs, overlapping PCIe/ICI transfer with compute — the
    TPU-native replacement for torch pin_memory/non_blocking copies.
    Non-array entries (video ids) pass through untouched. ``put_fn``
    overrides the per-batch placement (multi-host training passes
    ``parallel.shard_batch`` to assemble global arrays on the mesh).
    """
    import collections

    import jax
    import numpy as np

    def stage(batch):
        if put_fn is not None:
            return put_fn(batch)
        return {k: (jax.device_put(v) if isinstance(v, np.ndarray) else v)
                for k, v in batch.items()}

    queue = collections.deque()

    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(stage(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(stage(next(it)))
        except StopIteration:
            pass
        yield out


def get_loader(cfg, mode: str, info_corpus=None, feature_sources=None,
               in_memory_feats=None, batch_size: Optional[int] = None,
               specific: int = -1, prefetch: Optional[int] = None,
               host_shard: bool = False) -> BatchLoader:
    """Reference misc/run.py:89-96 ``get_loader``.

    ``host_shard=True``: shard the epoch over ``jax.process_count()`` hosts
    (multi-host training; batch_size here is the PER-HOST batch size).
    """
    ds = VideoDataset(cfg, mode, info_corpus=info_corpus,
                      feature_sources=feature_sources,
                      in_memory_feats=in_memory_feats, specific=specific)
    num_shards, shard_id = 1, 0
    if host_shard:
        import jax
        num_shards, shard_id = jax.process_count(), jax.process_index()
        ds.host_lockstep = True  # structure RNG for infoset resampling
    return BatchLoader(
        ds,
        batch_size=batch_size or cfg.batch_size,
        shuffle=(mode == "train"),
        prefetch=cfg.prefetch_depth if prefetch is None else prefetch,
        num_shards=num_shards, shard_id=shard_id,
    )
