"""Split every query's bench cost into plan-BUILD time (driver Python +
py4j, ``fn(spark, sf_dir)`` returning a lazy DataFrame) and EXEC time
(``df.count()``), so driver-side construction hotspots are visible across
the whole registry.

    python tools/build_vs_exec.py [--sf DIR] [--top N] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from data_engineering_nd_spark.session import get_spark
    from tools.profile_query import warmup

    spark = get_spark(app_name="build_vs_exec")
    qs = entry_mod.queries()
    warmup(spark, args.sf)

    names = args.queries or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; see entry.queries()")
    rows = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, args.sf)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
        except Exception as e:
            print(f"# {name}: ERROR {e}", file=sys.stderr)
            continue
        rows.append((name, t1 - t0, t2 - t1))
        print(
            f"# {name}: build {t1 - t0:.3f}s exec {t2 - t1:.3f}s",
            file=sys.stderr,
            flush=True,
        )

    rows.sort(key=lambda r: -r[1])
    print(f"{'query':44s} {'build':>8s} {'exec':>8s}")
    for name, b, e in rows[: args.top]:
        print(f"{name:44s} {b:8.3f} {e:8.3f}")
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    print(f"{'TOTAL':44s} {tb:8.1f} {te:8.1f}")


if __name__ == "__main__":
    main()
