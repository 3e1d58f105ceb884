"""Batch collation + threaded host pipeline + device prefetch.

Reference counterparts:
- ``collate``: compatible_collate_fn (datasets/dataset.py:1467-1606) — stacks
  samples and RECOMPUTES the real modality mask by checking image tensors are
  actually non-zero AND the sampler-declared mask (|x|.sum() > 1e-6 clause at
  datasets/dataset.py:1526-1554).
- ``HostPipeline``: replaces torch DataLoader workers (train.py:1388-1396)
  with a thread pool (PIL decode releases the GIL) feeding a bounded queue.
- ``prefetch_to_device``: replaces pinned-memory + non_blocking H2D copies
  (train.py:68-83) with double-buffered ``jax.device_put``.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from prcv2025reid_tpu.data.dataset import MultiModalDataset
from prcv2025reid_tpu.data.sampler import PKBatchSampler


def collate(samples: Sequence[Dict], tokenizer) -> Dict[str, np.ndarray]:
    """Stack samples into the dense batch the model consumes."""
    images = np.stack([s["images"] for s in samples])  # [B, Mv, H, W, 3]
    declared = np.stack([s["image_mask"] for s in samples])  # [B, Mv]
    # real-mask recomputation: declared AND tensor-non-zero
    nonzero = (np.abs(images).sum(axis=(2, 3, 4)) > 1e-6).astype(np.float32)
    image_mask = declared * nonzero

    captions = [s["caption"] or "" for s in samples]
    tokens = tokenizer(captions).astype(np.int32)
    text_mask = np.asarray([s["text_mask"] for s in samples], np.float32)

    return {
        "images": images,
        "image_mask": image_mask.astype(np.float32),
        "text_tokens": tokens,
        "text_mask": text_mask,
        "labels": np.asarray([s["label"] for s in samples], np.int32),
        "pids": np.asarray([s["pid"] for s in samples], np.int32),
        "indices": np.asarray([s["index"] for s in samples], np.int32),
    }


class HostPipeline:
    """Sampler -> per-sample load/augment -> collate, with worker threads."""

    def __init__(
        self,
        dataset: MultiModalDataset,
        sampler: PKBatchSampler,
        tokenizer,
        num_workers: int = 2,
        prefetch: int = 2,
        seed: int = 0,
        modality_dropout: Optional[float] = None,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.tokenizer = tokenizer
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.epoch = 0
        self.modality_dropout = modality_dropout

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _make_batch(self, indices: List[int], batch_seed: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(batch_seed)
        samples = [
            self.dataset.get_sample(i, rng, modality_dropout=self.modality_dropout)
            for i in indices
        ]
        return collate(samples, self.tokenizer)

    def __len__(self) -> int:
        return len(self.sampler)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        index_batches = list(self.sampler)
        seeds = [
            self.seed + self.epoch * 1_000_003 + i for i in range(len(index_batches))
        ]
        if self.num_workers == 0:
            for idxs, s in zip(index_batches, seeds):
                yield self._make_batch(idxs, s)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.num_workers)
        task_q: "queue.Queue" = queue.Queue()
        for pos, (idxs, s) in enumerate(zip(index_batches, seeds)):
            task_q.put((pos, idxs, s))
        n_tasks = len(index_batches)

        def worker():
            while True:
                try:
                    pos, idxs, s = task_q.get_nowait()
                except queue.Empty:
                    return
                out_q.put((pos, self._make_batch(idxs, s)))

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        # re-order to deterministic sequence
        buffer: Dict[int, Dict] = {}
        next_pos = 0
        received = 0
        while received < n_tasks:
            pos, batch = out_q.get()
            buffer[pos] = batch
            received += 1
            while next_pos in buffer:
                yield buffer.pop(next_pos)
                next_pos += 1
        while next_pos in buffer:
            yield buffer.pop(next_pos)
            next_pos += 1


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host->device transfer.

    With ``sharding`` set (a jax.sharding.Sharding), batches land directly in
    their data-parallel layout — the multi-host/multi-chip feed path.
    """
    import jax

    it = iter(iterator)
    buf: List = []

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
