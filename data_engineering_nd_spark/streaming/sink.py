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


def quarantine_batch_sink(
    good: VersionedTable,
    dlq: VersionedTable,
    app_id: str,
    predicate: str,
):
    """foreachBatch sink with a DEAD-LETTER QUEUE: every micro-batch
    splits on a CHECK predicate — passing rows commit to the main
    table, failing (or NULL-evaluating — a CHECK that cannot evaluate
    is not satisfied) rows commit VERBATIM to the quarantine table for
    replay — and BOTH commits are idempotent on (app_id, batch_id), so
    an at-least-once replay of a batch is absorbed on both sides. The
    streaming counterpart of the batch corrupt-record quarantines
    (src_csv/jsonl_malformed_report): at 100 TB you never drop bad rows
    on the floor and never let them poison the serving table — you land
    them where a fixed parser can re-drive them."""
    from pyspark.sql import functions as F

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ok = batch_df.where(F.coalesce(F.expr(predicate), F.lit(False)))
        bad = batch_df.where(
            ~F.coalesce(F.expr(predicate), F.lit(False))
        )
        good.commit(ok, mode="append", txn=(app_id, int(batch_id)))
        dlq.commit(bad, mode="append", txn=(f"{app_id}-dlq", int(batch_id)))

    return _sink


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


def refresh_aggregate_from_feed(
    src: VersionedTable,
    mv: VersionedTable,
    key_cols: list[str],
    group_col: str,
    value_col: str,
    app_id: str,
) -> dict:
    """Incrementally maintain a grouped SUM/COUNT materialized view from
    the source table's CHANGE FEED — the downstream-compute half of the
    CDF story (:func:`pump_change_feed` is the replication half): the
    first refresh full-computes the base snapshot's aggregate; every
    later refresh reads ONLY the commit-range feed and applies signed
    deltas (+1 for insert/update_postimage, −1 for
    delete/update_preimage) onto the current view state, then publishes
    the new state in one idempotent commit keyed by the source version —
    replays absorb, groups whose count reaches zero drop out.

    Cost model at 100 TB: the recompute path scans the whole fact table
    per refresh; this path reads the manifest-diff feed (sized by the
    commits' churn) plus the group-cardinality view state. SUM/COUNT are
    self-inverse under signed deltas, so no re-scan is ever needed (AVG
    derives; MIN/MAX would need the recompute fallback on deletes).

    Returns ``{from_version, to_version, mode, skipped}``."""
    from pyspark.sql import functions as F

    latest = src.latest_version()
    if latest is None:
        return {"from_version": None, "to_version": None,
                "mode": "noop", "skipped": True}
    last = mv.last_txn_version(app_id)
    if last is None:
        state = (
            src.snapshot(0)
            .groupBy(group_col)
            .agg(
                F.sum(F.col(value_col)).cast("bigint").alias("sum_value"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            )
        )
        mv.commit(state, mode="overwrite", txn=(app_id, 0))
        return {"from_version": 0, "to_version": 0,
                "mode": "full", "skipped": False}
    if latest <= last:
        return {"from_version": last, "to_version": last,
                "mode": "incremental", "skipped": True}
    feed = src.change_feed(key_cols, last, latest)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy(group_col).agg(
        F.sum(sign * F.col(value_col)).cast("bigint").alias("sum_value"),
        F.sum(sign).cast("bigint").alias("n_rows"),
    )
    new_state = (
        mv.snapshot()
        .unionByName(delta)
        .groupBy(group_col)
        .agg(
            F.sum("sum_value").cast("bigint").alias("sum_value"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .where(F.col("n_rows") > 0)
    )
    # state must be materialized before the overwrite commit replaces
    # the snapshot it was derived from
    m = mv.commit(
        new_state.localCheckpoint(), mode="overwrite", txn=(app_id, latest)
    )
    skipped = bool(m.get("idempotent_skip"))
    return {"from_version": last, "to_version": latest,
            "mode": "incremental", "skipped": skipped}


def refresh_minmax_from_feed(
    src: VersionedTable,
    mv: VersionedTable,
    key_cols: list[str],
    group_col: str,
    value_col: str,
    app_id: str,
) -> dict:
    """Incrementally maintain a grouped MIN/MAX materialized view from
    the source table's change feed (VERDICT r10 task #5 — the
    non-self-inverse sibling of :func:`refresh_aggregate_from_feed`):
    inserts can only IMPROVE an extremum, so the add side folds in with
    ``least``/``greatest`` — churn-sized, no table read. Deletes can
    only HURT an extremum, so a group needs work exactly when a deleted
    value ties-or-beats its current min or max; those groups — and only
    those — take a SCOPED RECOMPUTE: one pass over the fact table
    semi-joined to the affected group keys (broadcast, churn-sized
    list). Every other group with deletes updates its count
    incrementally and keeps its extrema.

    Same idempotency contract as the SUM view: the state commit is
    keyed by the source version (``txn``), replays absorb, groups whose
    row count reaches zero drop out.

    Returns ``{from_version, to_version, mode, skipped,
    groups_recomputed, groups_incremental}``."""
    from pyspark.sql import functions as F

    latest = src.latest_version()
    if latest is None:
        return {"from_version": None, "to_version": None, "mode": "noop",
                "skipped": True, "groups_recomputed": 0,
                "groups_incremental": 0}
    last = mv.last_txn_version(app_id)
    if last is None:
        state = (
            src.snapshot(0)
            .groupBy(group_col)
            .agg(
                F.min(value_col).cast("bigint").alias("min_value"),
                F.max(value_col).cast("bigint").alias("max_value"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            )
        )
        mv.commit(state, mode="overwrite", txn=(app_id, 0))
        return {"from_version": 0, "to_version": 0, "mode": "full",
                "skipped": False, "groups_recomputed": 0,
                "groups_incremental": 0}
    if latest <= last:
        return {"from_version": last, "to_version": last,
                "mode": "incremental", "skipped": True,
                "groups_recomputed": 0, "groups_incremental": 0}
    feed = src.change_feed(key_cols, last, latest)
    is_add = F.col("_change_type").isin("insert", "update_postimage")
    adds = (
        feed.filter(is_add)
        .groupBy(group_col)
        .agg(
            F.min(value_col).cast("bigint").alias("add_min"),
            F.max(value_col).cast("bigint").alias("add_max"),
            F.count(F.lit(1)).cast("bigint").alias("add_n"),
        )
    )
    dels = (
        feed.filter(~is_add)
        .groupBy(group_col)
        .agg(
            F.min(value_col).cast("bigint").alias("del_min"),
            F.max(value_col).cast("bigint").alias("del_max"),
            F.count(F.lit(1)).cast("bigint").alias("del_n"),
        )
    )
    j = (
        mv.snapshot()
        .join(adds, group_col, "full_outer")
        .join(dels, group_col, "full_outer")
        .localCheckpoint()  # feed + state, read twice below
    )
    # a deleted value that ties-or-beats the stored extremum may have
    # BEEN the extremum (ties matter: another row may share the value,
    # but proving that needs data — recompute, scoped to the group).
    # A group ABSENT from the view (born inside this refresh window)
    # with deletes has no stored extrema to compare against — its
    # deleted rows may well have been its extrema, so it recomputes too
    # (folding add_min/add_max in blindly would resurrect a deleted
    # value as the extremum).
    needs = F.coalesce(
        F.col("del_n").isNotNull()
        & (
            F.col("min_value").isNull()
            | (F.col("del_min") <= F.col("min_value"))
            | (F.col("del_max") >= F.col("max_value"))
        ),
        F.lit(False),
    )
    rec_groups = j.filter(needs).select(group_col).localCheckpoint()
    n_recompute = rec_groups.count()
    # groups the feed actually touched, updated without a table read
    n_incremental = j.filter(
        ~needs
        & (F.col("add_n").isNotNull() | F.col("del_n").isNotNull())
    ).count()
    incr = j.filter(~needs).select(
        F.col(group_col),
        F.least("min_value", "add_min").alias("min_value"),
        F.greatest("max_value", "add_max").alias("max_value"),
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("add_n"), F.lit(0))
            - F.coalesce(F.col("del_n"), F.lit(0))
        ).alias("n_rows"),
    ).where(F.col("n_rows") > 0)
    recomputed = (
        src.snapshot(latest)
        .join(F.broadcast(rec_groups), group_col, "left_semi")
        .groupBy(group_col)
        .agg(
            F.min(value_col).cast("bigint").alias("min_value"),
            F.max(value_col).cast("bigint").alias("max_value"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
    new_state = incr.unionByName(recomputed)
    m = mv.commit(
        new_state.localCheckpoint(), mode="overwrite", txn=(app_id, latest)
    )
    return {"from_version": last, "to_version": latest,
            "mode": "incremental", "skipped": bool(m.get("idempotent_skip")),
            "groups_recomputed": n_recompute,
            "groups_incremental": n_incremental}
