"""Epoch shuffle / split / shard: determinism and stability."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from parsel_ray.functions.epochshuffle import epoch_shuffle_assign


def _keys(n=400):
    return rd.from_arrow(
        pa.table({"k": pa.array(np.arange(n), pa.int64())})
    ).repartition(8)


class TestEpochShuffle:
    def test_rank_is_permutation_and_seeded(self, ray_session):
        a = epoch_shuffle_assign(_keys(), "k", seed=1, world_size=4) \
            .to_pandas().sort_values("k")
        b = epoch_shuffle_assign(_keys(), "k", seed=1, world_size=4) \
            .to_pandas().sort_values("k")
        c = epoch_shuffle_assign(_keys(), "k", seed=2, world_size=4) \
            .to_pandas().sort_values("k")
        assert sorted(a["epoch_rank"]) == list(range(1, 401))
        # same seed -> identical order; new seed -> a different epoch order
        assert (a["epoch_rank"].to_numpy() == b["epoch_rank"].to_numpy()).all()
        assert (a["epoch_rank"].to_numpy() != c["epoch_rank"].to_numpy()).any()
        # the shuffle actually moves things (not identity order)
        assert (a["epoch_rank"].to_numpy() != np.arange(1, 401)).any()

    def test_split_stable_across_seeds_and_bounded(self, ray_session):
        a = epoch_shuffle_assign(_keys(), "k", seed=1, world_size=4) \
            .to_pandas().sort_values("k")
        c = epoch_shuffle_assign(_keys(), "k", seed=9, world_size=4) \
            .to_pandas().sort_values("k")
        assert (a["split"].to_numpy() == c["split"].to_numpy()).all()
        frac = (a["split"] == "train").mean()
        assert 0.7 < frac < 0.9  # ~80% with hash noise

    def test_shards_balanced(self, ray_session):
        a = epoch_shuffle_assign(_keys(), "k", seed=3, world_size=8) \
            .to_pandas()
        counts = a.groupby("shard").size()
        assert len(counts) == 8
        assert counts.max() - counts.min() <= 1
