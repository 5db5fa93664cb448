"""DataLoader: batching, shuffling, multi-host sharding.

The multi-host shard logic mirrors the reference's DistributedProxySampler
(reference: timeviper/util/train_utils.py distributed sampler wiring): every
process sees the same seeded permutation, then takes a disjoint stride-slice.
"""

import numpy as np

from timeviper_tpu.data.loader import DataLoader


class _IndexDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i


def _flat_indices(dl, epoch=0):
    return [i for b in dl._index_batches(epoch) for i in b]


def test_multihost_shards_equal_and_complete():
    # DistributedSampler semantics: the shared permutation is padded (by
    # wrapping) to a multiple of process_count, so every process yields the
    # SAME number of items/batches (an SPMD loop hangs otherwise). Coverage
    # stays complete; up to `pad` items are duplicated across shards.
    n, pc = 37, 4
    shards, counts = [], []
    for pi in range(pc):
        dl = DataLoader(
            _IndexDataset(n), batch_size=2, image_token_id=-1,
            tokens_per_frame=1, process_index=pi, process_count=pc,
            shuffle=True, seed=11, drop_last=False,
        )
        flat = _flat_indices(dl)
        shards.append(flat)
        counts.append(len(dl._index_batches(0)))
        assert len(dl._index_batches(0)) == len(dl)
    assert len(set(counts)) == 1, counts  # equal batch counts
    assert len(set(len(s) for s in shards)) == 1  # equal shard sizes
    assert set().union(*map(set, shards)) == set(range(n))
    pad = -(-n // pc) * pc - n
    total = sum(len(s) for s in shards)
    assert total == n + pad


def test_multihost_equal_batches_ragged_drop_last():
    # 7 items, 2 procs, batch 2, drop_last: both processes must yield the
    # same batch count (the advisor's hang scenario: 7/2procs/batch4 gave
    # 1 vs 0 batches before the fix)
    for n, pc, bs in [(7, 2, 2), (7, 2, 4), (9, 4, 2), (5, 2, 2)]:
        counts = []
        for pi in range(pc):
            dl = DataLoader(
                _IndexDataset(n), batch_size=bs, image_token_id=-1,
                tokens_per_frame=1, process_index=pi, process_count=pc,
                shuffle=True, seed=0, drop_last=True,
            )
            batches = dl._index_batches(0)
            assert all(len(b) == bs for b in batches)
            assert len(batches) == len(dl)
            counts.append(len(batches))
        assert len(set(counts)) == 1, (n, pc, bs, counts)


def test_multihost_same_permutation_per_epoch():
    # two processes must agree on the underlying permutation so shards
    # stay disjoint; different epochs reshuffle
    def perm(pi, epoch):
        dl = DataLoader(
            _IndexDataset(16), batch_size=4, image_token_id=-1,
            tokens_per_frame=1, process_index=pi, process_count=2,
            shuffle=True, seed=3,
        )
        return _flat_indices(dl, epoch)

    assert set(perm(0, 0)) | set(perm(1, 0)) == set(range(16))
    assert perm(0, 0) != perm(0, 1)  # epoch reshuffles


def test_single_host_default_covers_all():
    dl = DataLoader(
        _IndexDataset(10), batch_size=3, image_token_id=-1,
        tokens_per_frame=1, process_index=0, process_count=1,
        shuffle=False, drop_last=True,
    )
    batches = dl._index_batches(0)
    assert batches == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    assert len(dl) == 3
