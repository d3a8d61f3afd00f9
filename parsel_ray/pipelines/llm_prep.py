"""End-to-end LLM-training-data preparation — the capstone composition
showing the engine's operators interoperate as ONE streaming pipeline
(the thing a user of this repo actually runs at 100 TB):

    crawl (image+caption corpus)          [stateful actor frontier]
      └→ caption/phash near-dup stats     [hamming bands]
    documents
      └→ token stats + quality score      [vectorized map_batches]
      └→ quality/length filter            [Arrow predicate]
      └→ exact dedup (first-wins)         [fingerprint-keyed shuffle]
      └→ MinHash near-dup dedup           [distributed verify+components]
      └→ language ID                      [per-doc kernel]
      └→ partitioned parquet corpus       [single-pass resumable sink]

Every stage is the same operator the standalone gate queries pin; the
composite asserts the funnel is monotone and the sink's receipts match
the survivor count, then returns the per-stage row counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def llm_data_prep(sf_dir: str, quality_min: float = 0.35,
                  min_tokens: int = 5, out_dir: "str | None" = None):
    """Run the full prep pipeline; returns a (stage, n) funnel table."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    import ray.data as rd

    from ..functions import dedup as D
    from ..functions import text as T
    from ..functions.agg import partial_agg_groupby
    from ..functions.relational import hash_bucket_join
    from ..sources import write_partitioned_parquet
    from .queries import _demo_crawl_cfg, _read

    funnel: list[tuple[str, int]] = []

    # 0. multimodal branch: crawl the synthetic web (actor frontier) with
    # WORKER-SIDE image shards (collect_images=False + out_dir — the
    # production path; the driver never holds image payloads), read the
    # corpus back column-pruned, and count phash near-dup image pairs
    # (hamming-banded) with a distributed distinct
    from ..crawl.frontier import run_crawl

    crawl_out = _tempfile.mkdtemp(prefix="llm_crawl_", dir="/tmp")
    try:
        run_crawl(_demo_crawl_cfg(), out_dir=crawl_out,
                  collect_images=False, verify=False)
        shard_files = sorted(_glob.glob(
            _os.path.join(crawl_out, "images", "epoch=*", "chunk-*.parquet")
        ))
        n_images = 0
        if shard_files:
            imgs_ds = rd.read_parquet(
                shard_files, columns=["image_id", "phash"]
            ).materialize()
            n_images = imgs_ds.count()
        funnel.append(("crawled_images", n_images))
        if n_images:
            pair_ds = D.hamming_near_dup_pairs(
                imgs_ds, col="phash", id_col="image_id", max_hamming=6,
                num_partitions=8, id_type=pa.string(),
            )
            n_pairs = partial_agg_groupby(
                pair_ds, ["id_a", "id_b"], [], count_as="c"
            ).count()
            funnel.append(("image_near_dup_pairs", n_pairs))
    finally:
        _shutil.rmtree(crawl_out, ignore_errors=True)

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    funnel.append(("raw_docs", docs.count()))

    # 1. vectorized token stats + quality, filtered in Arrow
    def score_and_filter(t: pa.Table) -> pa.Table:
        t = T.quality_score(T.token_stats(t), "text")
        keep = pc.and_(
            pc.greater_equal(t["quality"], pa.scalar(quality_min)),
            pc.greater_equal(t["n_tokens"], pa.scalar(min_tokens)),
        )
        return t.filter(keep).select(["doc_id", "text"])

    filtered = docs.map_batches(
        score_and_filter, batch_format="pyarrow"
    ).materialize()
    funnel.append(("quality_filtered", filtered.count()))

    # 2. exact dedup: fingerprint-keyed first-wins (the dedup_exact shape)
    fps = filtered.map_batches(
        lambda t: T.fingerprint(t).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
    )
    survivors = partial_agg_groupby(
        fps, ["fingerprint"], [("doc_id", "min", "doc_id")]
    ).map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )
    # survivors is one row per kept doc_id, so an inner join IS the
    # semi-join: exactly the surviving (doc_id, text) rows come back
    exact = hash_bucket_join(
        filtered, survivors, on="doc_id", buckets=16, how="inner"
    ).map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
    ).materialize()
    funnel.append(("exact_distinct", exact.count()))

    # 3. MinHash near-dup dedup — the fully distributed path
    sigs = exact.map_batches(
        D.MinHasher(col="text", num_perm=64, k=5),
        batch_format="pyarrow", batch_size=1024,
    ).select_columns(["doc_id", "sig"]).materialize()
    bands = sigs.map_batches(
        lambda t: D.emit_band_rows(t, "doc_id", bands=16, rows_per_band=4),
        batch_format="pyarrow",
    )
    pairs = D.lsh_candidate_pairs(bands, "doc_id", 0.8, num_partitions=32)
    verified = D.distributed_verify_pairs(pairs, sigs, threshold=0.8)
    labels = D.label_propagation_components(verified)

    # near-dup victims filtered DISTRIBUTED: a left bucket join against a
    # slim (doc_id, __dead) marker table — the victim set is O(duplicates)
    # (30–50% of a web corpus) and never touches the driver (same shape as
    # the dedup_minhash gate query)
    def dead_rows(t: pa.Table) -> pa.Table:
        ids = t["node"].filter(pc.not_equal(t["node"], t["label"]))
        return pa.table(
            {
                "doc_id": ids,
                "__dead": pa.array(np.ones(len(ids), dtype=np.int8), pa.int8()),
            }
        )

    dead = labels.map_batches(dead_rows, batch_format="pyarrow")
    deduped = hash_bucket_join(
        exact, dead, on="doc_id", how="left", buckets=16
    ).map_batches(
        lambda t: t.filter(pc.is_null(t["__dead"])).select(["doc_id", "text"]),
        batch_format="pyarrow",
    ).materialize()
    funnel.append(("near_dup_deduped", deduped.count()))

    # 4. language ID + partitioned corpus write (single pass, resumable)
    tagged = deduped.map_batches(
        T.LangId(col="text", out="lang_guess"), batch_format="pyarrow",
    )
    out = out_dir or _tempfile.mkdtemp(prefix="llm_corpus_", dir="/tmp")
    try:
        counts = write_partitioned_parquet(tagged, out, "lang_guess")
        written = int(sum(counts["n"].to_pylist()))
        funnel.append(("written", written))
        n_parts = len(
            _glob.glob(_os.path.join(out, "lang_guess=*", "_DONE"))
        )
        funnel.append(("partitions", n_parts))
        # funnel invariants: monotone counts; sink receipts match input
        by = dict(funnel)
        doc_ns = [
            by[s]
            for s in ("raw_docs", "quality_filtered", "exact_distinct",
                      "near_dup_deduped")
        ]
        assert doc_ns == sorted(doc_ns, reverse=True), funnel
        assert written == by["near_dup_deduped"], funnel
        assert n_parts >= 1
    finally:
        if out_dir is None:
            _shutil.rmtree(out, ignore_errors=True)
    return pa.table(
        {
            "stage": pa.array([s for s, _ in funnel], pa.string()),
            "n": pa.array([n for _, n in funnel], pa.int64()),
        }
    )
