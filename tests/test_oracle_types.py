"""Guard the oracle type contract: no registered DuckDB oracle may emit a
column type outside the driver-safe set.

Three rounds running, an uncast DuckDB aggregate (``SUM``/``list_sum`` over
BIGINT promotes to HUGEINT) burned a correctness-gate window slot: the
driver's canonicalizer hashes HUGEINT differently from Spark's bigint, while
the local ``%.6g`` float formatting masked the drift
(``text_token_count_by_source`` r02/r03; ``ds_split_assignment``,
``ds_chunk_dedup``, ``ds_pack_sequences``, ``multimodal_frame_samples`` r04).
This test makes the defect class un-shippable: it type-checks EVERY
registered oracle's result relation lazily (no execution) against the only
types the gate is known to canonicalize identically in both engines.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: Types the driver's value-hash canonicalizes identically for Spark and
#: DuckDB results.  Anything else (HUGEINT, DECIMAL, UHUGEINT, TIME, LIST,
#: ...) must be cast in the oracle SQL before it reaches the gate.
ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"}


@pytest.fixture(scope="module")
def oracle_relations():
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con, e.oracle_sql()


def test_every_oracle_emits_only_driver_safe_types(oracle_relations):
    con, oracles = oracle_relations
    assert oracles, "registry produced no oracles"
    offenders: list[str] = []
    for name, sql in oracles.items():
        rel = con.sql(sql)  # lazy: types come from the bound plan, no scan
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) not in ALLOWED:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle columns outside the driver-safe type set "
        f"(cast them, e.g. CAST(... AS BIGINT)): {offenders}"
    )


def test_hugeint_is_actually_caught(oracle_relations):
    """The guard must flag the exact defect class it exists for: an uncast
    DuckDB SUM over BIGINT is HUGEINT, and HUGEINT is not driver-safe."""
    con, _ = oracle_relations
    rel = con.sql("SELECT SUM(r_regionkey) AS s FROM region")
    assert str(rel.types[0]) == "HUGEINT"
    assert str(rel.types[0]) not in ALLOWED
