"""Shuffle-perturbation determinism (VERDICT r08 task #7): every PLANS.md
headliner must produce an IDENTICAL value hash when executed under
different ``spark.sql.shuffle.partitions`` — the standing-test form of the
engine's "no partition-count-dependent results" determinism rule
(SURVEY.md §7.4: content-derived keys only, decimal accumulation, rounded
display edges).  A query whose output depends on how many shuffle
partitions the cluster happens to run is not re-runnable at 100 TB:
retries, AQE re-plans, and cluster resizes would all silently change the
answer."""

from __future__ import annotations

import pathlib
import sys

from tests.conftest import SF_DIR

_ROOT = pathlib.Path(__file__).resolve().parents[1]


def _headliners() -> list[str]:
    sys.path.insert(0, str(_ROOT / "tools"))
    from plans_report import HEADLINERS

    return list(HEADLINERS)


def _value_hash(pdf) -> str:
    sys.path.insert(0, str(_ROOT / "tools"))
    from verify_oracle import value_hash

    return value_hash(pdf)


def test_headliners_invariant_under_shuffle_partition_count(spark):
    """Run the full PLANS.md headliner list twice in one session — once at
    32 shuffle partitions, once at 7 (coprime, so every hash-partitioned
    shuffle lands rows differently) — and assert bit-identical value
    hashes.  One looped test rather than a parametrization: the second
    pass reuses the session and the failure report names every divergent
    query at once."""
    from concurrent.futures import ThreadPoolExecutor

    import __spark_entry__ as e

    qs = e.queries()
    names = _headliners()
    assert len(names) >= 100  # the PLANS.md list, not a stub
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    hashes: dict[str, dict[str, str]] = {}

    def run_one(name: str) -> tuple[str, str]:
        return name, _value_hash(qs[name](spark, SF_DIR).toPandas())

    try:
        # The two PASSES are sequential (the shuffle-partition conf is
        # session-wide), but queries WITHIN a pass are independent — a
        # small thread pool overlaps their driver round-trips and task
        # tails (guide §2.6). Queries that scope their own confs
        # (streaming state partitions, gated graph loops) may overlap
        # others inside a pass — which is precisely what this test
        # exists to prove harmless: results must be invariant to
        # partition counts and planning knobs, or the assert fires.
        for n_shuffle in ("32", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n_shuffle)
            with ThreadPoolExecutor(max_workers=4) as pool:
                for name, h in pool.map(run_one, names):
                    hashes.setdefault(name, {})[n_shuffle] = h
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    divergent = {
        name: h for name, h in hashes.items() if h["32"] != h["7"]
    }
    assert not divergent, (
        "shuffle-partition-count-dependent results: "
        + ", ".join(sorted(divergent))
    )
