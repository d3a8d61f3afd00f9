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
    by the crawl and never pass through the driver."""
    from ..crawl.frontier import run_crawl

    work = tempfile.mkdtemp(prefix="imgprep_", dir="/tmp")
    out_dir = out_dir or os.path.join(work, "published")
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

    # perceptual near-dup: hamming-banded pairs → components → drop every
    # node whose component label is another member (left join on __dead).
    # The components operator keys on int64 nodes; image ids are strings,
    # so they pass through a 63-bit content surrogate (deterministic;
    # a collision would merge two components — keep-one-per-component
    # semantics survive that, and at 2^63 the corpus-scale probability
    # is negligible)
    def _surr(ids) -> np.ndarray:
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

    pairs = D.hamming_near_dup_pairs(
        exact.select_columns(["image_id", "phash"]),
        col="phash", id_col="image_id", max_hamming=6, num_partitions=8,
    )
    uniq_pairs = grouped_apply(
        pairs, "id_a",
        lambda g: g.drop_duplicates(["id_a", "id_b"]),
        num_partitions=8,
    )
    pairs_int = uniq_pairs.map_batches(
        lambda t: pa.table(
            {
                "id_a": pa.array(_surr(t["id_a"].to_pylist())),
                "id_b": pa.array(_surr(t["id_b"].to_pylist())),
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

    dead = labels.map_batches(dead_rows, batch_format="pyarrow")
    keyed = exact.map_batches(
        lambda t: t.append_column(
            "__surr", pa.array(_surr(t["image_id"].to_pylist()))
        ),
        batch_format="pyarrow",
    )
    survivors = hash_bucket_join(
        keyed, dead, on="__surr", how="left", buckets=16
    ).map_batches(
        lambda t: t.filter(pc.is_null(t["__dead"])).drop_columns(
            ["__dead", "__surr", "fingerprint"]
        ),
        batch_format="pyarrow",
    ).materialize()
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
