"""Per-stage Ray Data stats for any gate query: the "measure, don't
guess" loop.  Runs one `queries()` entry and prints the Dataset stats
report (per-operator wall time, block sizes, task counts) so a slow
stage is visible by name instead of inferred.

Usage:
    python scripts/stage_stats.py q1_pricing_summary [sf_dir] [num_cpus]
"""

from __future__ import annotations

import sys

import ray


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs = E.queries()
    if name not in qs:
        print(f"unknown query {name!r}; options: {sorted(qs)}")
        return 2
    res = qs[name](sf_dir)
    if hasattr(res, "materialize"):  # Dataset: execute, then report
        res = res.materialize()
        print(res.stats())
        print(f"\nrows: {res.count()}")
    else:  # non-Dataset artifact (already executed eagerly)
        n = res.num_rows if hasattr(res, "num_rows") else len(res)
        print(f"(eager result — no Dataset stats) rows: {n}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
