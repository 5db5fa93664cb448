"""Batch assembly + device feeding.

Replaces Qwen2VLCollator + the HF DataLoader plumbing (reference:
timeviper/data/data.py:598-671, train_utils.py:604-628) with a TPU-shaped
design: every batch is padded to a *length bucket* so XLA compiles a handful
of programs, and the host->device copy is double-buffered so decode/encode
overlaps with compute (SURVEY.md §2.2 N8).

`collate` turns dataset items (numpy dicts from data/datasets.py) into
(batch arrays, FusionPlan). All rows of a batch must share a fusion layout —
guaranteed when pack_size and the frame budget are fixed, which is how the
reference trains (PackedDataset w/ fixed pack_size, data.py:535-590).
"""

from __future__ import annotations

import itertools
import queue
import threading
from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from timeviper_tpu.data.datasets import IGNORE_INDEX
from timeviper_tpu.data.fusion import (
    FusionPlan,
    HeteroPlan,
    fuse_labels,
    pad_row_plan,
    plan_fusion,
)


def pad_to(x: np.ndarray, length: int, value) -> np.ndarray:
    if x.shape[0] >= length:
        return x[:length]
    pad = [(0, length - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, constant_values=value)


@dataclass
class CollatedBatch:
    batch: Dict[str, np.ndarray]
    plan: FusionPlan


def collate(
    items: Sequence[Dict[str, Any]],
    image_token_id: int,
    tokens_per_frame: int,
    pad_token_id: int = 0,
) -> CollatedBatch:
    """Stack items into a batch.

    Rows sharing one fusion layout (the packed training regime: fixed
    pack_size / frame budget) take the fast static-plan path. Rows with
    DIFFERENT layouts (variable-length packed rows, mixed frame counts —
    the reference's ragged splicing, generic_vlm.py:517-564) fall back to
    :func:`collate_hetero`: everything padded to bucket maxima with the
    per-row plan shipped as batch arrays.
    """
    plans = [
        plan_fusion(it["input_ids"], image_token_id, tokens_per_frame,
                    it.get("txt_seq_lens"))
        for it in items
    ]
    p0 = plans[0]
    homogeneous = all(
        p.text_len == p0.text_len
        and np.array_equal(p.gather_idx, p0.gather_idx)
        for p in plans[1:]
    )
    if not homogeneous:
        return collate_hetero(items, plans, image_token_id, pad_token_id)

    ids, labels, pixels = [], [], []
    for it in items:
        row_ids = np.where(
            it["input_ids"] == image_token_id, pad_token_id, it["input_ids"]
        ).astype(np.int32)
        ids.append(row_ids)
        labels.append(fuse_labels(p0, it["labels"]))
        if it.get("pixels") is not None:
            pixels.append(it["pixels"])
    batch = {
        "input_ids": np.stack(ids),
        "labels": np.stack(labels).astype(np.int32),
    }
    if pixels:
        batch["pixels"] = np.stack(pixels)
    return CollatedBatch(batch=batch, plan=p0)


def collate_hetero(
    items: Sequence[Dict[str, Any]],
    plans: Sequence[FusionPlan],
    image_token_id: int,
    pad_token_id: int = 0,
) -> CollatedBatch:
    """Bucket-pad rows with different fusion layouts into one batch.

    Per-row `gather_idx` / `seq_idx` travel as data; pads live in a fresh
    trailing segment (SSD resets, attention segment-masks) with IGNORE
    labels, so they contribute nothing to loss or real-token state.
    """
    text_len = max(p.text_len for p in plans)
    fused_len = max(p.fused_len for p in plans)
    num_visual = max(p.num_visual for p in plans)
    frame_counts = [
        (it["pixels"].shape[0] if it.get("pixels") is not None else 0)
        for it in items
    ]
    num_frames = max(frame_counts)
    frame_shape = next(
        (tuple(it["pixels"].shape[1:]) for it, fc in zip(items, frame_counts)
         if fc), None,
    )

    ids, labels, gathers, seqs, pixels = [], [], [], [], []
    for it, plan, fc in zip(items, plans, frame_counts):
        row_ids = np.where(
            np.asarray(it["input_ids"]) == image_token_id, pad_token_id,
            it["input_ids"],
        ).astype(np.int32)
        ids.append(pad_to(row_ids, text_len, pad_token_id))
        labels.append(
            pad_to(fuse_labels(plan, it["labels"]), fused_len, IGNORE_INDEX))
        g, s = pad_row_plan(plan, text_len, fused_len, num_visual)
        gathers.append(g)
        seqs.append(s)
        if num_frames:
            px = it.get("pixels")
            if px is None or fc == 0:
                px = np.zeros((num_frames,) + frame_shape, np.float32)
            elif fc < num_frames:
                px = np.concatenate([
                    px, np.zeros((num_frames - fc,) + frame_shape, px.dtype)])
            pixels.append(px)
    batch = {
        "input_ids": np.stack(ids),
        "labels": np.stack(labels).astype(np.int32),
        "gather_idx": np.stack(gathers),
        "seq_idx": np.stack(seqs),
    }
    if num_frames:
        batch["pixels"] = np.stack(pixels)
    plan = HeteroPlan(
        fused_len=fused_len, text_len=text_len, num_visual=num_visual,
        num_frames=num_frames,
    )
    return CollatedBatch(batch=batch, plan=plan)


def prefetch_to_device(iterator, sharding, size: int = 2):
    """Double-buffer CollatedBatches onto the device(s): the next batch's
    host->device copy overlaps the current step's compute (SURVEY.md §2.2
    N8 'double-buffered jax.device_put'). Yields (device_batch, plan)."""
    import collections

    import jax
    import jax.numpy as jnp

    queue = collections.deque()

    def put(cb):
        dev = {
            k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in cb.batch.items()
        }
        return dev, cb.plan

    for cb in iterator:
        queue.append(put(cb))  # device_put is async; copy starts now
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class DataLoader:
    """Minimal multithreaded loader: prefetches `prefetch` collated batches
    on background threads (video decode is the bottleneck; threads suffice
    because decode releases the GIL in ffmpeg/PIL)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        image_token_id: int,
        tokens_per_frame: int,
        pad_token_id: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 2,
        prefetch: int = 2,
        drop_last: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_token_id = image_token_id
        self.tokens_per_frame = tokens_per_frame
        self.pad_token_id = pad_token_id
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.drop_last = drop_last
        # multi-host: each process reads a disjoint shard (the reference's
        # DistributedProxySampler analog, train_utils.py:245)
        if process_index is None or process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = max(process_count, 1)

    def _per_process_count(self) -> int:
        """Items each process yields per epoch — identical on every process
        (torch DistributedSampler semantics; the reference wraps its sampler
        in DistributedProxySampler, train_utils.py:245). drop_last truncates
        the shared permutation to a multiple of process_count*batch_size;
        otherwise it is padded by wrapping so shards are equal-sized."""
        n = len(self.dataset)
        pc = self.process_count
        if self.drop_last:
            return (n // (pc * self.batch_size)) * self.batch_size
        return -(-n // pc)  # ceil: padding wraps the permutation

    def __len__(self) -> int:
        per = self._per_process_count()
        return (per // self.batch_size if self.drop_last
                else -(-per // self.batch_size))

    def _index_batches(self, epoch: int) -> List[List[int]]:
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            # same seed on every process -> identical permutation, then each
            # process takes its stride-slice (disjoint shards)
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idxs)
        per = self._per_process_count()
        total = per * self.process_count
        if total > len(idxs):
            # pad by wrapping (DistributedSampler padding) so every process
            # sees exactly `per` items and yields the same batch count — an
            # SPMD train loop hangs at the first collective otherwise
            idxs = np.concatenate([idxs, idxs[: total - len(idxs)]])
        else:
            idxs = idxs[:total]
        if self.process_count > 1:
            idxs = idxs[self.process_index::self.process_count]
        batches = [
            idxs[i : i + self.batch_size].tolist()
            for i in range(0, len(idxs), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if not batches:
            import warnings

            warnings.warn(
                f"DataLoader yields 0 batches: {len(self.dataset)} items / "
                f"{self.process_count} processes < batch_size="
                f"{self.batch_size} with drop_last={self.drop_last}"
            )
        return batches

    def epoch(self, epoch: int = 0) -> Iterator[CollatedBatch]:
        batches = self._index_batches(epoch)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker(worker_id: int):
            for bi in range(worker_id, len(batches), self.num_workers):
                if stop.is_set():
                    return
                items = [self.dataset[i] for i in batches[bi]]
                cb = collate(
                    items, self.image_token_id, self.tokens_per_frame,
                    self.pad_token_id,
                )
                q.put((bi, cb))
            q.put((None, None))

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        done = 0
        try:
            # emit in arrival order (batches are iid; order is irrelevant)
            while done < self.num_workers:
                bi, cb = q.get()
                if bi is None:
                    done += 1
                    continue
                yield cb
        finally:
            stop.set()
