"""Streaming sinks beyond the built-ins: incremental upsert into a
versioned table.

Structured Streaming's file sink is append-only — replayed micro-batches
after a failure duplicate rows, exactly the hazard the reference's
mode('append') has in batch (etl.py:445-448). ``foreachBatch`` +
``VersionedTable.merge`` closes it:

- each micro-batch MERGEs on the key columns, so a batch replayed from
  the checkpoint re-applies as an upsert — same keys, same final state
  (idempotent effect, i.e. exactly-once OUTCOME on at-least-once
  delivery);
- the merge is file-granular copy-on-write (tables.py), so a steady
  trickle of small batches rewrites only the files its keys land in;
- checkpointLocation carries source progress; the manifest log carries
  sink state — both survive restart.

At scale: compaction (``VersionedTable.compact``) is the maintenance
companion — a long-running stream accrues one commit per micro-batch,
so schedule compact+vacuum off the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_engineering_nd_spark.tables import VersionedTable


def upsert_stream(
    df: DataFrame,
    table: VersionedTable,
    key_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a stream that MERGEs every micro-batch into ``table`` on
    ``key_cols``. Returns the StreamingQuery (caller awaits)."""

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        table.merge(batch.dropDuplicates(key_cols), key_cols)

    writer = (
        df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pump_change_feed(
    src: VersionedTable,
    dst: VersionedTable,
    key_cols: list[str],
    app_id: str,
) -> dict:
    """One micro-batch of an INCREMENTAL change-data-feed stream
    (VERDICT r09 task #6 — the Delta CDF streaming-source shape): forward
    exactly the source commits that landed since the last processed
    version into ``dst``, composing the manifest-diff CDF read
    (:meth:`VersionedTable.change_feed`) with the idempotent-commit
    exactly-once sink (``txn=(app_id, source_version)``).

    Progress tracking is the destination's OWN txn watermark — no side
    state: the recorded high-water txnVersion IS the last source version
    processed, so a crashed/replayed pump re-derives its offset from the
    table it writes (the checkpoint-in-the-sink pattern). The first pump
    lands the v0 snapshot as ``insert`` rows (a CDF stream starts from a
    base snapshot); every later pump reads ONLY the commit range
    ``(last, latest]`` — the manifest diff opens just the files those
    commits removed/added or their vectors reference, never a snapshot
    scan — and appends the feed rows in one idempotent commit. A replay
    of any pump (at-least-once delivery) is absorbed by the watermark:
    row-level changes arrive in ``dst`` exactly once.

    Returns a report dict: ``from_version``/``to_version`` processed,
    ``rows`` landed, and ``skipped`` (nothing new, or an idempotent
    replay absorbed)."""
    latest = src.latest_version()
    if latest is None:
        return {
            "from_version": None, "to_version": None,
            "rows": 0, "skipped": True,
        }
    last = dst.last_txn_version(app_id)
    if last is None:
        from pyspark.sql import functions as F

        base = (
            src.snapshot(0)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0).cast("bigint"))
        )
        prev_files: set = set()
        pv = dst.latest_version()
        if pv is not None:
            prev_files = set(dst._manifest(pv)["files"])
        m = dst.commit(base, mode="append", txn=(app_id, 0))
        if m.get("idempotent_skip"):
            return {
                "from_version": 0, "to_version": 0,
                "rows": 0, "skipped": True,
            }
        rows = sum(
            m["stats"][f]["num_rows"]
            for f in m["files"]
            if f not in prev_files and f in m["stats"]
        )
        return {
            "from_version": 0, "to_version": 0,
            "rows": rows, "skipped": False,
        }
    if latest <= last:
        return {
            "from_version": last, "to_version": last,
            "rows": 0, "skipped": True,
        }
    feed = src.change_feed(key_cols, last, latest)
    prev_files = set()
    pv = dst.latest_version()
    if pv is not None:
        prev_files = set(dst._manifest(pv)["files"])
    m = dst.commit(feed, mode="append", txn=(app_id, latest))
    if m.get("idempotent_skip"):
        return {
            "from_version": last, "to_version": latest,
            "rows": 0, "skipped": True,
        }
    rows = sum(
        m["stats"][f]["num_rows"]
        for f in m["files"]
        if f not in prev_files and f in m["stats"]
    )
    return {
        "from_version": last, "to_version": latest,
        "rows": rows, "skipped": False,
    }
