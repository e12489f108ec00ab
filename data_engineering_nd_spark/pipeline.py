"""Batch pipeline runner: extract -> transform -> load -> quality-check.

Replaces the reference's Airflow DAG semantics (SURVEY.md §2.12, §3.3) with
a plain function pipeline: the DAG's Spark-relevant stages were exactly
(1) read raw monthly files + union, (2) build the 13 tables, (3) partitioned
writes, (4) data-quality checks on what landed. S3/bucket orchestration is
out of the query engine's scope (SURVEY §2.12).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from data_engineering_nd_spark import io as engine_io
from data_engineering_nd_spark import transforms
from data_engineering_nd_spark.operators.quality import NullAuditResult, null_audit

# Parquet fact/dim layout mirrors the reference's (etl.py:754, 434-491):
# big tables parquet + hive-partitioned by period, small dims unpartitioned.
TABLE_LAYOUT: dict[str, dict] = {
    "i94_immigrations": {"fmt": "parquet", "partition_keys": ("i94_year", "i94_month")},
    "i94_trips": {"fmt": "parquet", "partition_keys": ("i94_year", "i94_month")},
    "i94_visitors": {"fmt": "parquet", "partition_keys": ("i94_year", "i94_month")},
    "i94_dates": {"fmt": "parquet", "partition_keys": ()},
    "i94_flights": {"fmt": "parquet", "partition_keys": ()},
    "i94_airports": {"fmt": "parquet", "partition_keys": ()},
    "i94_us_states_demographic": {"fmt": "parquet", "partition_keys": ()},
    "i94_us_cities_demographic": {"fmt": "parquet", "partition_keys": ()},
}

# Null-free-PK expectations per table (the reference parameterizes this via
# config JSON, etl_config.cfg:62-64).
DEFAULT_PK_CHECKS: dict[str, list[str]] = {
    "i94_trips": ["trip_id", "custom_client_id"],
    "i94_immigrations": ["custom_client_id"],
    "i94_visitors": ["admissions_number"],
    "i94_flights": ["flight_id"],
}


@dataclass
class PipelineResult:
    tables: dict[str, engine_io.WriteResult] = field(default_factory=dict)
    quality: dict[str, NullAuditResult] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(r.ok for r in self.quality.values())


def run(
    spark: SparkSession,
    raw_paths: list[str],
    out_dir: str,
    raw_fmt: str = "parquet",
    airport_codes_path: str | None = None,
    demographics_path: str | None = None,
    mode: str = "overwrite",
    valid_years=(2016,),
    pk_checks: dict[str, list[str]] | None = None,
) -> PipelineResult:
    """End-to-end run of the i94 pipeline over the given raw inputs."""
    raw = engine_io.read_many(spark, raw_paths, fmt=raw_fmt)
    airport_codes = (
        engine_io.read(spark, airport_codes_path, "csv")
        if airport_codes_path
        else None
    )
    demographics = (
        engine_io.read(spark, demographics_path, "csv", delimiter=";")
        if demographics_path
        else None
    )

    tables = transforms.build_all(
        raw,
        airport_codes=airport_codes,
        demographics=demographics,
        valid_years=valid_years,
    )

    result = PipelineResult()
    # the per-table writes are independent jobs into disjoint directories;
    # submit a few at a time so one table's straggler tail back-fills with
    # the next table's tasks (the orchestration-level §2.6 overlap the
    # reference delegated to Airflow's sequential DAG). pool.map preserves
    # input order, so the result dict stays deterministic.
    from concurrent.futures import ThreadPoolExecutor

    def _write_one(item):
        name, df = item
        layout = TABLE_LAYOUT.get(name, {"fmt": "parquet", "partition_keys": ()})
        return name, engine_io.write(
            df,
            os.path.join(out_dir, name),
            fmt=layout["fmt"],
            mode=mode,
            partition_keys=layout["partition_keys"],
        )

    with ThreadPoolExecutor(max_workers=4) as pool:
        for name, written in pool.map(_write_one, list(tables.items())):
            result.tables[name] = written

    # quality gate on what actually landed (one pass per table, tables
    # audited concurrently — each is an independent read of its own
    # landed files). The read gets the builder's declared schema: schema
    # inference on an empty partitioned write (no data files) throws
    # UNABLE_TO_INFER_SCHEMA.
    audits = [
        (name, cols)
        for name, cols in (pk_checks or DEFAULT_PK_CHECKS).items()
        if name in result.tables
    ]

    def _audit_one(item):
        name, cols = item
        landed: DataFrame = engine_io.read(
            spark, result.tables[name].path, schema=tables[name].schema
        )
        return name, null_audit(landed, cols, table=name)

    with ThreadPoolExecutor(max_workers=4) as pool:
        for name, audit in pool.map(_audit_one, audits):
            result.quality[name] = audit
    return result


def _main(argv: list[str] | None = None) -> int:
    """CLI runner — the reference's `python etl.py --env ...` surface
    (etl.py:591-607) without the env/bucket indirection: inputs and output
    are explicit paths, credentials belong to the session environment."""
    import argparse
    import json
    import sys

    from data_engineering_nd_spark.session import get_spark

    ap = argparse.ArgumentParser(prog="python -m data_engineering_nd_spark.pipeline")
    ap.add_argument("--raw", nargs="+", required=True, help="raw i94 input paths")
    ap.add_argument("--out", required=True, help="warehouse output directory")
    ap.add_argument("--raw-fmt", default="parquet")
    ap.add_argument("--airport-codes", default=None, help="airport-codes csv path")
    ap.add_argument("--demographics", default=None, help="demographics csv path")
    ap.add_argument("--mode", default="overwrite", choices=["overwrite", "append"])
    ap.add_argument("--valid-years", nargs="*", type=int, default=[2016])
    args = ap.parse_args(argv)

    spark = get_spark(app_name="i94-pipeline")
    res = run(
        spark,
        args.raw,
        args.out,
        raw_fmt=args.raw_fmt,
        airport_codes_path=args.airport_codes,
        demographics_path=args.demographics,
        mode=args.mode,
        valid_years=tuple(args.valid_years),
    )
    print(
        json.dumps(
            {
                "ok": res.ok,
                "tables": {n: r.rows for n, r in res.tables.items()},
                "quality": {
                    n: {"ok": q.ok, "null_counts": q.null_counts}
                    for n, q in res.quality.items()
                },
            }
        )
    )
    return 0 if res.ok else 1


if __name__ == "__main__":
    raise SystemExit(_main())
