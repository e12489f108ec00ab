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
