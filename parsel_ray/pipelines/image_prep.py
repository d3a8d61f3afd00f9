"""Image-corpus preparation capstone — the image-payload twin of
``llm_prep``: crawl → verify-decode → exact dedup → perceptual near-dup
dedup → thumbnail → partitioned publish.

    crawl (worker-side image shards)      [stateful actor frontier]
      → read back column-complete          [pruned parquet read]
      → decode + phash re-verify           [DecodeImageStats kernel]
      → exact dedup (content md5)          [exact_dedup_rows — full-row
                                            first-wins, no driver set]
      → phash near-dup components          [hamming bands → union-find →
                                            __dead left bucket join]
      → 16×16 thumbnail re-encode          [ResizeImage actor kernel]
      → partitioned publish by fmt         [single-pass sink, receipts]

Every stage is the engine's own operator; the pipeline adds the funnel
contract: counts are monotone non-increasing through the dedup stages,
every decode must re-produce the crawler's phash (row-level verification
— the crawl tier's allclose/phash contract applied corpus-wide), and the
published row count must equal the sink receipts.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions import dedup as D
from ..functions.agg import grouped_apply
from ..functions.relational import hash_bucket_join
from ..sources.partitioned import write_partitioned_parquet
from ..stages.multimodal import DecodeImageStats, ResizeImage


def image_corpus_prep(crawl_cfg, out_dir: str | None = None):
    """Run the full image-prep funnel; returns (funnel table, out_dir).
    ``crawl_cfg`` is a ``CrawlConfig``; images are written worker-side
    by the crawl and never pass through the driver.  The mkdtemp crawl
    workdir holds only intermediate shards; it is removed once the
    funnel has fully consumed them (the published dir is kept)."""
    work = tempfile.mkdtemp(prefix="imgprep_", dir="/tmp")
    out_dir = out_dir or os.path.join(work, "published")
    try:
        return _image_prep_funnel(crawl_cfg, out_dir, work)
    finally:
        _cleanup_workdir(work, keep=out_dir)


def _cleanup_workdir(work: str, keep: str) -> None:
    """Remove the crawl workdir, sparing ``keep`` when it lives inside
    (the default publish location is ``work/published``)."""
    work = os.path.abspath(work)
    keep = os.path.abspath(keep)
    if os.path.commonpath([keep, work]) == work:
        for entry in os.listdir(work):
            p = os.path.join(work, entry)
            if p == keep:
                continue
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.remove(p)
                except OSError:
                    pass
    else:
        shutil.rmtree(work, ignore_errors=True)


def _surrogate_ids(ids) -> np.ndarray:
    """Deterministic 63-bit int surrogate for string image ids (the
    components operator keys on int64 nodes; a collision would merge two
    components — keep-one-per-component semantics survive that, and at
    2^63 the corpus-scale probability is negligible)."""
    return np.array(
        [
            int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(),
                "little",
            ) >> 1
            for s in ids
        ],
        np.int64,
    )


def phash_near_dup_survivors(exact, *, max_hamming: int = 6,
                             num_partitions: int = 8, buckets: int = 16,
                             drop_cols: list[str] | None = None):
    """Perceptual near-dup stage: hamming-banded pairs → components →
    drop every node whose component label is another member (left join
    on ``__dead``).  ``exact`` must carry ``image_id`` + ``phash``;
    returns the materialized survivor Dataset with ``drop_cols``
    removed."""
    _pair_schema = pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()),
         ("hamming", pa.int64())]
    )
    pairs = D.hamming_near_dup_pairs(
        exact.select_columns(["image_id", "phash"]),
        col="phash", id_col="image_id", max_hamming=max_hamming,
        num_partitions=num_partitions, id_type=pa.string(),
    )
    uniq_pairs = grouped_apply(
        pairs, "id_a",
        lambda g: g.drop_duplicates(["id_a", "id_b"]),
        num_partitions=num_partitions,
        out_schema=_pair_schema,
    )
    pairs_int = uniq_pairs.map_batches(
        lambda t: pa.table(
            {
                "id_a": pa.array(_surrogate_ids(t["id_a"].to_pylist())),
                "id_b": pa.array(_surrogate_ids(t["id_b"].to_pylist())),
            }
        ),
        batch_format="pyarrow",
    )
    labels = D.label_propagation_components(pairs_int)

    def dead_rows(t: pa.Table) -> pa.Table:
        ids = t["node"].filter(pc.not_equal(t["node"], t["label"]))
        return pa.table(
            {
                "__surr": ids,
                "__dead": pa.array(np.ones(len(ids), np.int8)),
            }
        )

    # Dup-free corpus guard: every map stage between uniq_pairs and here
    # skips 0-row blocks, so with zero near-dup pairs `dead` arrives
    # schema-less and the left join below would crash probing its schema.
    # Union one typed empty block to pin it (same idiom as edit1_pairs /
    # phash_near_dup) — harmless when pairs exist, and a pair-free corpus
    # now yields every image as a survivor instead of an error.
    _dead_schema = pa.schema([("__surr", pa.int64()), ("__dead", pa.int8())])
    dead = labels.map_batches(dead_rows, batch_format="pyarrow").union(
        rd.from_arrow(_dead_schema.empty_table())
    )
    keyed = exact.map_batches(
        lambda t: t.append_column(
            "__surr", pa.array(_surrogate_ids(t["image_id"].to_pylist()))
        ),
        batch_format="pyarrow",
    )
    to_drop = ["__dead", "__surr"] + list(drop_cols or [])
    return hash_bucket_join(
        keyed, dead, on="__surr", how="left", buckets=buckets
    ).map_batches(
        lambda t: t.filter(pc.is_null(t["__dead"])).drop_columns(to_drop),
        batch_format="pyarrow",
    ).materialize()


def _image_prep_funnel(crawl_cfg, out_dir: str, work: str):
    from ..crawl.frontier import run_crawl

    funnel: list = []

    run_crawl(crawl_cfg, out_dir=work, collect_images=False, verify=False)
    shard_files = sorted(
        _glob.glob(os.path.join(work, "images", "epoch=*", "chunk-*.parquet"))
    )
    if not shard_files:
        raise ValueError("crawl produced no image shards")
    imgs = rd.read_parquet(shard_files)
    n0 = imgs.count()
    funnel.append(("crawled", n0))

    # decode + re-verify: every payload must decode and re-produce the
    # crawler's phash (the per-row verification contract, corpus-wide)
    decoded = imgs.map_batches(
        DecodeImageStats(), batch_format="pyarrow", batch_size=64
    )

    def check_and_fp(t: pa.Table) -> pa.Table:
        from ..images.codecs import LOSSLESS

        ok = t["decode_ok"].to_numpy(zero_copy_only=False)
        assert ok.all(), "corpus contains undecodable images"
        # the crawler's phash is of the PRE-encode pixels: exact equality
        # is the contract only for lossless formats (lossy decode shifts
        # pixels within the PSNR bound — the crawl verifier's rule)
        lossless = pa.array(
            [LOSSLESS[f] for f in t["fmt"].to_pylist()]
        )
        same = pc.equal(t["phash"], t["phash_recomputed"])
        bad = pc.and_(lossless, pc.invert(pc.fill_null(same, False)))
        assert pc.sum(pc.cast(bad, pa.int64())).as_py() in (0, None), (
            "lossless decode did not reproduce the crawler's phash"
        )
        fps = [
            hashlib.md5(b).hexdigest() for b in t["bytes"].to_pylist()
        ]
        return pa.table(
            {
                "image_id": t["image_id"],
                "fmt": t["fmt"],
                "bytes": t["bytes"],
                "w": t["w"],
                "h": t["h"],
                "caption": t["caption"],
                "phash": t["phash"],
                "fingerprint": pa.array(fps, pa.string()),
            }
        )

    verified = decoded.map_batches(check_and_fp, batch_format="pyarrow")

    # exact dedup: full-row first-wins on the content hash
    exact = D.exact_dedup_rows(
        verified, fp_col="fingerprint", id_col="image_id",
        num_partitions=16,
    ).materialize()
    n1 = exact.count()
    funnel.append(("exact_distinct", n1))

    survivors = phash_near_dup_survivors(
        exact, drop_cols=["fingerprint"]
    )
    n2 = survivors.count()
    funnel.append(("near_dup_survivors", n2))

    # thumbnail re-encode (block-mean 16x16, format preserved)
    thumbs = survivors.map_batches(
        ResizeImage(16, 16), batch_format="pyarrow", batch_size=64
    )

    receipts = write_partitioned_parquet(thumbs, out_dir, key_col="fmt")
    n3 = int(pc.sum(receipts["n"]).as_py() or 0)
    funnel.append(("published", n3))

    assert n0 >= n1 >= n2 == n3 > 0, funnel
    return (
        pa.table(
            {
                "stage": pa.array([s for s, _ in funnel], pa.string()),
                "n": pa.array([n for _, n in funnel], pa.int64()),
            }
        ),
        out_dir,
    )


def training_batch_prep(crawl_cfg, batch_size: int = 8):
    """Training-loader capstone: crawl image corpus → aspect-ratio
    buckets → fixed-size per-bucket batch packing → WebDataset tar
    shards, each stage the engine's own operator.

        crawl (worker-side image shards)   [stateful actor frontier]
          → AR bucket assignment            [vectorized ratio argmin]
          → (bucket, batch, slot) packing   [grouped_row_number cells]
          → batch-contiguous tar shards     [grouped_apply + tarshard]

    Contracts asserted in-pipeline: packing is a permutation (row count
    preserved), every non-tail batch holds exactly ``batch_size``
    members of ONE bucket, batches never span tar shards, and the tar
    sample receipts equal the packed row count.  Returns (funnel table,
    shard dir).
    """
    import pandas as pd

    from ..functions.arbucket import assign_ar_buckets, pack_bucket_batches
    from ..sources.tarshard import write_tar_shards
    from ..crawl.frontier import run_crawl

    work = tempfile.mkdtemp(prefix="batchprep_", dir="/tmp")
    run_crawl(crawl_cfg, out_dir=work, collect_images=False, verify=False)
    shard_files = sorted(
        _glob.glob(os.path.join(work, "images", "epoch=*", "chunk-*.parquet"))
    )
    if not shard_files:
        raise ValueError("crawl produced no image shards")
    imgs = rd.read_parquet(shard_files)
    funnel: list = []
    n0 = imgs.count()
    funnel.append(("crawled", n0))

    packed = pack_bucket_batches(
        assign_ar_buckets(imgs, "w", "h"),
        order_by=["phash", "image_id"],
        ascending=[True, True],
        batch_size=batch_size,
        num_partitions=4,
    ).materialize()
    n1 = packed.count()
    assert n1 == n0, f"packing dropped rows: {n0} -> {n1}"
    funnel.append(("packed", n1))

    # batch-shape audit, fully distributed: per-(bucket, batch) counts
    # stay a Dataset (O(rows/batch_size) rows — too many for the driver
    # at corpus scale); only O(buckets) max-batch ids and ONE violation
    # count ever leave the cluster
    import ray as _ray

    from ..functions.agg import (
        grouped_apply,
        partial_agg_groupby,
        partial_sum_groupby,
    )

    shapes = partial_sum_groupby(
        packed.map_batches(
            lambda t: t.select(["bucket_id", "batch_idx"]),
            batch_format="pyarrow",
        ),
        ["bucket_id", "batch_idx"], {}, count_as="n",
    ).materialize()  # consumed twice (max pass + violation pass)
    tail_idx = {
        r["bucket_id"]: r["max_bidx"]
        for r in partial_agg_groupby(
            shapes, ["bucket_id"], [("batch_idx", "max", "max_bidx")]
        ).take_all()  # O(buckets) rows
    }
    tail_ref = _ray.put(tail_idx)

    def violations(t: pa.Table) -> pa.Table:
        tails = _ray.get(tail_ref)
        bid = t["bucket_id"].to_pylist()
        bidx = t["batch_idx"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        is_tail = np.array([tails[b] == x for b, x in zip(bid, bidx)])
        bad = (n > batch_size) | (~is_tail & (n != batch_size))
        return pa.table({"bad": pa.array([int(bad.sum())], pa.int64())})

    n_bad = sum(
        r["bad"]
        for r in shapes.map_batches(
            violations, batch_format="pyarrow"
        ).take_all()  # O(blocks) scalar rows
    )
    assert n_bad == 0, (
        f"{n_bad} (bucket, batch) cells violate the exact-"
        f"{batch_size} packing contract (non-tail short/overfull batch)"
    )

    # batch-contiguous shard layout: coarse-partition by whole
    # (bucket, batch) groups, order members inside each partition
    def order_rows(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["bucket_id", "batch_idx", "slot"])

    ordered = grouped_apply(
        packed, ["bucket_id", "batch_idx"], order_rows, num_partitions=4
    )

    def tar_key(t: pa.Table) -> pa.Table:
        key = [
            f"{b}/{x:06d}/{s:03d}-{i}"
            for b, x, s, i in zip(
                t["bucket_id"].to_pylist(), t["batch_idx"].to_pylist(),
                t["slot"].to_pylist(), t["image_id"].to_pylist(),
            )
        ]
        return (
            t.select(["bytes", "fmt", "caption", "bucket_w", "bucket_h"])
            .append_column("__key__", pa.array(key, pa.string()))
        )

    shard_dir = os.path.join(work, "tars")
    n2 = write_tar_shards(
        ordered.map_batches(tar_key, batch_format="pyarrow"),
        shard_dir,
        key_col="__key__",
        payload_exts={"bytes": "img"},
        meta_cols=["fmt", "caption", "bucket_w", "bucket_h"],
    )
    assert n2 == n1, f"tar receipts {n2} != packed rows {n1}"
    funnel.append(("tar_samples", n2))
    funnel.append(
        ("tar_shards",
         len(_glob.glob(os.path.join(shard_dir, "*.tar"))))
    )
    # the crawl's intermediate image shards are fully consumed once the
    # tar receipts balance — drop them, keep only the tar shard dir
    _cleanup_workdir(work, keep=shard_dir)
    return pa.table(
        {
            "stage": pa.array([s for s, _ in funnel], pa.string()),
            "rows": pa.array([int(n) for _, n in funnel], pa.int64()),
        }
    ), shard_dir
