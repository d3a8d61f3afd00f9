"""Deterministic epoch shuffle + split/shard assignment.

A training loader over a 100 TB corpus needs three reproducible,
restart-stable assignments per sample — none of which may depend on
block layout or task scheduling:

* an EPOCH SHUFFLE order (reshuffled each epoch by seed),
* a TRAIN/VAL/TEST split (stable across epochs — keyed on the sample,
  not the epoch),
* a TRAINER SHARD (rank % world_size in shuffle order, so every
  trainer sees an equal slice of every epoch).

All three derive from an integer LCG hash of (key, seed) — chosen over
a stronger mixer (splitmix64) because every intermediate stays under
2^63, so a SQL oracle reproduces the assignment bit-for-bit with plain
BIGINT arithmetic; a production swap to splitmix64 only changes
``_lcg2`` and its oracle.  The global order comes from
:func:`parsel_ray.functions.sort.global_row_number` (range-partitioned
rank; only P partition counts visit the driver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sort import global_row_number

_A = 1103515245
_C = 12345
_M = 2147483648  # 2^31


def _lcg2(key: np.ndarray, seed: int) -> np.ndarray:
    """Two LCG rounds over (key + seed); int64 in, int64 in [0, 2^31)."""
    h = (key.astype(np.int64) + np.int64(seed)) % _M
    h = (h * _A + _C) % _M
    h = (h * _A + _C) % _M
    return h


def epoch_shuffle_assign(
    ds,
    key_col: str,
    seed: int,
    world_size: int,
    train_pct: int = 80,
    val_pct: int = 10,
    num_partitions: int = 16,
):
    """Attach ``epoch_rank`` (1-based global shuffle order for this
    seed), ``split`` (train/val/test — seed-independent, keyed on the
    sample so a sample never migrates across epochs) and ``shard``
    (trainer id in shuffle order) to every row."""

    def add_hashes(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__eh", pa.array(_lcg2(k, seed), pa.int64())
        ).append_column(
            "__sh", pa.array(_lcg2(k, 0) % 100, pa.int64())
        )

    hashed = ds.map_batches(add_hashes, batch_format="pyarrow")
    ranked = global_row_number(
        hashed, ["__eh", key_col], [True, True],
        out_col="epoch_rank", num_partitions=num_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        sh = t["__sh"].to_numpy(zero_copy_only=False)
        split = np.where(
            sh < train_pct, "train",
            np.where(sh < train_pct + val_pct, "val", "test"),
        )
        rank = t["epoch_rank"].to_numpy(zero_copy_only=False)
        out = t.drop_columns(["__eh", "__sh"])
        return out.append_column(
            "split", pa.array(split, pa.string())
        ).append_column(
            "shard", pa.array((rank - 1) % world_size, pa.int64())
        )

    return ranked.map_batches(finalize, batch_format="pyarrow")
