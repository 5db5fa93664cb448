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


def test_multihost_shards_disjoint_and_complete():
    shards = []
    for pi in range(4):
        dl = DataLoader(
            _IndexDataset(37), batch_size=2, image_token_id=-1,
            tokens_per_frame=1, process_index=pi, process_count=4,
            shuffle=True, seed=11, drop_last=False,
        )
        shards.append(set(_flat_indices(dl)))
    for a in range(4):
        for b in range(a + 1, 4):
            assert shards[a].isdisjoint(shards[b])
    assert set().union(*shards) == set(range(37))


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
