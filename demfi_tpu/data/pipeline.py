"""Host-side input pipeline: threaded decode/augment with double buffering.

The reference feeds a single GPU from 8 DataLoader worker processes
(utils.py:242-247). The TPU equivalent: python worker threads (cv2 releases
the GIL during imdecode) fill a bounded queue of ready numpy batches; the
step loop overlaps host decode with device compute. Batches are laid out
NHWC, optionally pre-sharded across a mesh.
"""
from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, Tuple

import numpy as np

from demfi_tpu.data.datasets import AdobeTrainDataset, EvalDataset


class TrainLoader:
    """Shuffled, batched, prefetching loader over AdobeTrainDataset.

    One "epoch" = one random sample per scene (reference semantics:
    Adobe_Train.__len__ = nScenes, utils.py:296-297, re-shuffled every
    epoch via a fresh DataLoader, main.py:236).
    """

    def __init__(self, dataset: AdobeTrainDataset, batch_size: int,
                 num_threads: int = 8, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 4, process_id: int = 0,
                 process_count: int = 1):
        """``batch_size`` is the GLOBAL batch. With process_count > 1
        (multi-host), every process computes the same seeded shuffle and
        loads only its batch_size/process_count slice of each global
        batch — per-sample augmentation seeds are drawn for the full
        global order first, so an N-process run consumes bit-identical
        samples to the single-process run."""
        self.ds = dataset
        self.batch_size = batch_size
        self.num_threads = max(1, num_threads)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_id = process_id
        self.process_count = process_count
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(f"global batch {batch_size} not divisible "
                                 f"by {process_count} processes")
            if not drop_last:
                raise ValueError("multi-process loading requires drop_last")

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch_idx: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (frames [B,9,ps,ps,3], t [B,1]) float32 — B is the
        per-process batch (global/process_count)."""
        rng = random.Random(self.seed * 1_000_003 + epoch_idx)
        order = list(range(len(self.ds)))
        rng.shuffle(order)
        n_batches = len(self)
        order = order[: n_batches * self.batch_size] if self.drop_last else order
        seed_list = [rng.getrandbits(48) for _ in range(len(order))]

        local_bs = self.batch_size
        if self.process_count > 1:
            local_bs = self.batch_size // self.process_count
            sel = [k * self.batch_size + self.process_id * local_bs + j
                   for k in range(n_batches) for j in range(local_bs)]
            order = [order[i] for i in sel]
            seed_list = [seed_list[i] for i in sel]

        sample_q: "queue.Queue" = queue.Queue(
            maxsize=self.prefetch * local_bs)
        seeds = dict(enumerate(seed_list))
        pos = {"next": 0}
        lock = threading.Lock()

        def worker():
            while True:
                with lock:
                    i = pos["next"]
                    if i >= len(order):
                        return
                    pos["next"] = i + 1
                s = self.ds.sample(order[i], random.Random(seeds[i]))
                sample_q.put((i, s))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()

        buf = {}
        want = 0
        emitted = 0
        total = len(order)
        while emitted < total:
            i, s = sample_q.get()
            buf[i] = s
            while want < total and want in buf:
                want += 1
            # emit finished batches in order
            while (emitted + local_bs <= want) or (
                    not self.drop_last and want == total and emitted < total):
                bs = min(local_bs, total - emitted)
                samples = [buf.pop(emitted + j) for j in range(bs)]
                emitted += bs
                frames = np.stack([x.frames for x in samples])
                ts = np.stack([x.t_value for x in samples])
                yield frames, ts


def device_prefetch(iterator, mesh=None, depth: int = 2, specs=None):
    """Overlap host->device transfer with compute: keeps ``depth`` batches
    in flight on device. ``specs``: per-leaf PartitionSpecs (defaults to
    P('data') on dim 0) — pass train_batch_specs(mesh) for the train
    loop so committed shardings match the step's in_shardings."""
    import collections

    from demfi_tpu.parallel import shard_batch

    buf = collections.deque()
    for batch in iterator:
        buf.append(shard_batch(mesh, batch, specs))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def iter_eval(dataset: EvalDataset, prefetch: int = 2,
              num_threads: int = 2) -> Iterator[dict]:
    """Ordered prefetching iterator over an EvalDataset."""
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    n = len(dataset)

    def producer():
        for i in range(n):
            q.put(dataset.load(i))
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            return
        yield item
