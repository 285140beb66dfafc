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
                 prefetch: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.num_threads = max(1, num_threads)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch_idx: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (frames [B,9,ps,ps,3], t [B,1]) float32."""
        rng = random.Random(self.seed * 1_000_003 + epoch_idx)
        order = list(range(len(self.ds)))
        rng.shuffle(order)
        n_batches = len(self)
        order = order[: n_batches * self.batch_size] if self.drop_last else order

        sample_q: "queue.Queue" = queue.Queue(
            maxsize=self.prefetch * self.batch_size)
        seeds = {i: rng.getrandbits(48) for i in range(len(order))}
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
            while (emitted + self.batch_size <= want) or (
                    not self.drop_last and want == total and emitted < total):
                bs = min(self.batch_size, total - emitted)
                samples = [buf.pop(emitted + j) for j in range(bs)]
                emitted += bs
                frames = np.stack([x.frames for x in samples])
                ts = np.stack([x.t_value for x in samples])
                yield frames, ts


def device_prefetch(iterator, mesh=None, depth: int = 2):
    """Overlap host->device transfer with compute: keeps ``depth`` batches
    in flight on device (sharded over the mesh's 'data' axis if given)."""
    import collections

    from demfi_tpu.parallel import shard_batch

    buf = collections.deque()
    for batch in iterator:
        buf.append(shard_batch(mesh, batch))
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
