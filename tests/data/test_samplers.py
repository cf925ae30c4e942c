"""Sampler sharding-correctness tests (the role of reference
tests/data/test_sampler.py): the union of per-rank index streams must cover
the dataset exactly, deterministically per seed."""

import itertools

import numpy as np

from detectron2_tpu.data.samplers import (
    InferenceSampler,
    RandomSubsetTrainingSampler,
    RepeatFactorTrainingSampler,
    TrainingSampler,
)


def test_training_sampler_covers_everything_per_epoch():
    s = TrainingSampler(10, shuffle=True, seed=3)
    stream = list(itertools.islice(iter(s), 30))
    # each 10-index window is a permutation of range(10)
    for e in range(3):
        assert sorted(stream[e * 10 : (e + 1) * 10]) == list(range(10))


def test_training_sampler_deterministic_per_seed():
    a = list(itertools.islice(iter(TrainingSampler(20, seed=7)), 40))
    b = list(itertools.islice(iter(TrainingSampler(20, seed=7)), 40))
    c = list(itertools.islice(iter(TrainingSampler(20, seed=8)), 40))
    assert a == b and a != c


def test_training_sampler_no_shuffle():
    s = TrainingSampler(5, shuffle=False)
    assert list(itertools.islice(iter(s), 10)) == [0, 1, 2, 3, 4] * 2


def test_inference_sampler_exact_partition():
    for total, world in [(10, 3), (7, 7), (5, 8), (100, 4)]:
        shards = [
            InferenceSampler._get_local_indices(total, world, r) for r in range(world)
        ]
        flat = [i for s in shards for i in s]
        assert flat == list(range(total)), (total, world)
        # balanced within 1
        lens = [len(s) for s in shards]
        assert max(lens) - min(lens) <= 1


def test_random_subset_sampler():
    s = RandomSubsetTrainingSampler(100, subset_ratio=0.1, seed_shuffle=0, seed_subset=1)
    stream = list(itertools.islice(iter(s), 50))
    assert len(set(stream)) <= 10  # only 10 distinct indices in the subset


def test_repeat_factors_from_category_frequency():
    # category 1 in every image, category 2 in 1/4 of them
    dicts = [
        {"annotations": [{"category_id": 1}] + ([{"category_id": 2}] if i % 4 == 0 else [])}
        for i in range(8)
    ]
    rf = RepeatFactorTrainingSampler.repeat_factors_from_category_frequency(
        dicts, repeat_thresh=0.5
    )
    assert rf.shape == (8,)
    # images with the rare category repeat sqrt(0.5/0.25) = sqrt(2) times
    np.testing.assert_allclose(rf[0], np.sqrt(2.0), rtol=1e-6)
    np.testing.assert_allclose(rf[1], 1.0, rtol=1e-6)


def test_repeat_factor_sampler_stream():
    rf = np.array([1.0, 2.0, 1.0, 1.0])
    s = RepeatFactorTrainingSampler(rf, shuffle=False, seed=0)
    stream = list(itertools.islice(iter(s), 10))
    assert all(0 <= i < 4 for i in stream)
    # index 1 (repeat factor 2) appears about twice as often over many epochs
    long = list(itertools.islice(iter(RepeatFactorTrainingSampler(rf, shuffle=True, seed=0)), 500))
    counts = np.bincount(long, minlength=4)
    assert counts[1] > 1.5 * counts[0]


def test_grouped_batch_sampler():
    """GroupedBatchSampler (reference grouped_batch_sampler.py): every batch
    is homogeneous in group id and preserves base-sampler order per group."""
    from detectron2_tpu.data.samplers import GroupedBatchSampler

    group_ids = [0, 1, 0, 1, 0, 1, 0, 1, 0, 0]
    base = list(range(10))
    batches = list(GroupedBatchSampler(iter(base), group_ids, 3))
    for b in batches:
        gs = {group_ids[i] for i in b}
        assert len(gs) == 1, b
        assert len(b) == 3
    # order within groups preserved
    g0 = [i for b in batches for i in b if group_ids[i] == 0]
    assert g0 == sorted(g0)
