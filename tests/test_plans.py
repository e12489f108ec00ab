"""Plan-regression tests: pin the scale-critical physical choices.

A lost broadcast, a dropped pushdown, or an un-pruned scan is invisible in
value tests at sf0.001 and catastrophic at 100 TB — so plan properties are
asserted like results (SURVEY.md §4 maps each to the reference's gap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.plans import (
    assert_broadcast_join,
    assert_no_python_udf_in,
    assert_operator,
    pushed_filters,
    scan_read_schema,
)

SF_DIR = "/root/testdata/sf0.001"
#: second scale factor for two-SF growth checks (tools/window_sweep.py SF_B)
SF_DIR_B = "/root/testdata/sf0.01"


def test_small_dims_broadcast_in_star_join(spark):
    from data_engineering_nd_spark.analytics import q02_top_nations_by_revenue

    df = q02_top_nations_by_revenue(spark, SF_DIR)
    # nation + region sides must broadcast: the fact side never shuffles
    # for the dimension joins.
    assert_broadcast_join(df, min_count=2)


def test_dictionary_dim_broadcasts(spark):
    from data_engineering_nd_spark.analytics import q13_dictionary_broadcast_join

    assert_broadcast_join(q13_dictionary_broadcast_join(spark, SF_DIR))


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = load(spark, "lineitem", SF_DIR)
    df = li.filter(F.col("l_shipdate") >= "1995-01-01").select("l_orderkey")
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_column_pruning_in_projection(spark):
    li = load(spark, "lineitem", SF_DIR)
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    cols = set(scan_read_schema(df, table_hint="lineitem"))
    # scan must read exactly the two referenced columns, not all 16
    assert cols == {"l_returnflag", "l_quantity"}, cols


def test_global_topk_avoids_full_sort(spark):
    from data_engineering_nd_spark.analytics import q19_top_parts_by_revenue

    # orderBy().limit() must plan as TakeOrderedAndProject: each partition
    # keeps k rows, the driver merges — never a cluster-wide sort.
    assert_operator(q19_top_parts_by_revenue(spark, SF_DIR), "TakeOrderedAndProject")


def test_analytics_hot_paths_have_no_rowwise_python(spark):
    from data_engineering_nd_spark import analytics

    for q in (
        analytics.q01_pricing_summary,
        analytics.q06_top_customers_per_nation,
        analytics.q16_sessionize,
    ):
        assert_no_python_udf_in(q(spark, SF_DIR))


def test_exact_dedup_shuffles_key_not_payload(spark):
    from data_engineering_nd_spark.operators.dedup import dedup_exact_groups_query

    df = dedup_exact_groups_query(spark, SF_DIR)
    # hash-aggregate shape: partial agg before the exchange (map-side
    # combine), never a raw row shuffle of the documents payload.
    assert_operator(df, "HashAggregate")
    assert_no_python_udf_in(df)


def test_partition_pruning_on_hive_layout(spark, tmp_path):
    """Reads of the partitioned warehouse layout (the reference's
    i94_year/i94_month scheme) must prune partitions at the scan."""
    import re

    from data_engineering_nd_spark import io
    from data_engineering_nd_spark.plans.inspect import physical_plan

    li = load(spark, "lineitem", SF_DIR).withColumn(
        "ship_year", F.year(F.to_date("l_shipdate"))
    )
    out = str(tmp_path / "part")
    io.write(li, out, partition_keys=("ship_year",))
    back = spark.read.parquet(out).filter(F.col("ship_year") == 1995)
    plan = physical_plan(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ship_year" in m.group(1), plan


def test_asof_and_range_joins_are_not_nested_loops(spark):
    """The whole point of the asof/range formulations is avoiding the
    quadratic BroadcastNestedLoopJoin a raw theta-join would plan."""
    from data_engineering_nd_spark.operators.joins import q37_asof_join, q38_range_join
    from data_engineering_nd_spark.plans.inspect import physical_plan

    for q in (q37_asof_join, q38_range_join):
        plan = physical_plan(q(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_deep_star_join_broadcasts_all_dims(spark):
    """q44 joins 7 relations; every dimension edge (nation x2, region,
    supplier) must be a broadcast join and nothing may fall back to a
    nested loop. (At test scale AQE may broadcast the fact edges too —
    the invariant is the floor, not the exact count.)"""
    from data_engineering_nd_spark.analytics import q44_supplier_market_share
    from data_engineering_nd_spark.plans.inspect import physical_plan

    df = q44_supplier_market_share(spark, SF_DIR)
    assert_broadcast_join(df, min_count=4)
    assert "NestedLoop" not in physical_plan(df)


def test_cube_expands_from_single_exchange(spark):
    """q41's four grains (CUBE) must come from ONE shuffle — the Expand
    operator multiplies rows map-side; four separate groupBys would scan
    the fact four times."""
    from data_engineering_nd_spark.analytics import (
        q41_cube_returnflag_linestatus,
    )
    from data_engineering_nd_spark.plans.inspect import (
        count_exchanges,
        physical_plan,
    )

    df = q41_cube_returnflag_linestatus(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Expand" in plan
    assert count_exchanges(df) == 1, plan


def test_deterministic_sample_filter_is_jvm_side(spark):
    """q42's hash-sample predicate must stay in codegen (no Python UDF) —
    it is pure CPU over the scan, the shape that survives 100 TB."""
    from data_engineering_nd_spark.analytics import q42_deterministic_sample

    df = q42_deterministic_sample(spark, SF_DIR)
    assert_no_python_udf_in(df)


def test_correlated_subqueries_decorrelate_to_joins(spark):
    """q47's EXISTS and scalar subquery must decorrelate into joins — a
    per-outer-row subquery execution (nested loop) would be O(n) scans."""
    from data_engineering_nd_spark.analytics import q47_correlated_subqueries
    from data_engineering_nd_spark.plans.inspect import physical_plan

    df = q47_correlated_subqueries(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan
    assert "Join LeftSemi" in plan or "LeftSemi" in plan


def test_training_order_topk_has_no_global_sort_before_limit(spark):
    """ds_training_order must take its top-k via TakeOrderedAndProject
    (per-partition heap + driver merge) BEFORE the row_number window; a
    window over the whole corpus would funnel 100 TB through one reducer.
    The only single-partition Exchange allowed is the one over the already-
    limited k rows."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_training_order_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ds_training_order_query(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    # no corpus-wide sort shuffle may appear anywhere: the window runs on
    # the already-limited k rows (in the observed plan, with no Exchange at
    # all — TakeOrderedAndProject feeds the Window directly)
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_contamination_check_broadcasts_benchmark_side(spark):
    """ds_contamination_check's benchmark shingle set must ride a
    BroadcastExchange (twice: semi-join filter + final join) so the corpus
    text is never shuffled for the decontamination probe."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_contamination_check_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ds_contamination_check_query(spark, SF_DIR))
    assert plan.count("BroadcastExchange") >= 2, plan
    assert "BroadcastHashJoin" in plan, plan


def test_minhash_lsh_hot_bucket_cap_bounds_the_self_join(spark):
    """The LSH bucket-size guard must be in the plan (window count over the
    same (band, bucket) key as the join) and a degenerate corpus — many
    identical docs — must produce capped candidate counts, not |bucket|^2."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.range(40).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every document body").alias(
            "text"
        ),
    )
    # cap 10: every doc collides in every band; uncapped would yield
    # 40*39/2 = 780 pairs; the cap drops the hot buckets entirely.
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, max_bucket=10
    )
    assert pairs.count() == 0
    # and with the cap disabled the same corpus does produce the quadratic
    # pair set (sanity that the guard, not a bug, removed them)
    uncapped = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, max_bucket=None
    )
    assert uncapped.count() == 780


def test_bigram_model_joins_are_hash_joins(spark):
    """text_bigram_logprob's model joins (bigram stream ⋈ conditional
    counts ⋈ context counts) must be equi-joins — a theta/nested-loop
    fallback would be quadratic in corpus size."""
    from data_engineering_nd_spark.operators.text_analysis import (
        text_bigram_logprob_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(text_bigram_logprob_query(spark, SF_DIR))
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_epoch_permutation_has_no_single_partition_exchange(spark):
    """The full-corpus permutation must produce a global dense rank with
    ONLY hash exchanges on corpus data: bucket-prefix decomposition + a
    broadcast offset join, never `Exchange SinglePartition` (the plan a
    naive ROW_NUMBER() OVER (ORDER BY ...) would give, funneling 100 TB
    through one reducer)."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_epoch_permutation_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ds_epoch_permutation_query(spark, SF_DIR))
    assert "SinglePartition" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastExchange" in plan, plan  # offsets ride broadcast


def test_token_budget_pack_windows_are_bucket_partitioned(spark):
    """The corpus-sized running-sum window must partition by
    (source, bucket), never source alone — a per-source-only window on
    corpus data is one reducer per source at 100 TB. The tiny offset
    frame rides a broadcast join back."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_token_budget_pack_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ds_token_budget_pack_query(spark, SF_DIR))
    assert "SinglePartition" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    # the big-frame window keys on both source and the score bucket
    assert "partitionBy: [source, _bucket" in plan.replace("#", " #").replace(
        "source#", "source #"
    ) or "_bucket" in plan, plan


def test_triangle_count_has_no_cartesian_and_bounded_wedges(spark):
    """Wedge generation must be equi-joins (hash or sort-merge) on the
    oriented arc frame — no BroadcastNestedLoopJoin / CartesianProduct
    (the all-pairs shape), and no Python in the plan."""
    from data_engineering_nd_spark.operators.graph import (
        graph_triangle_count_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(graph_triangle_count_query(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop joins allowed are the two final 1-row stat
    # cross-joins (three single-row aggregates combined at the end); the
    # formatted plan names each node twice (tree + detail section)
    assert plan.count("BroadcastNestedLoopJoin") <= 4, plan
    # wedge generation + closing must be equi-joins
    assert (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")
        >= 2
    ), plan
    assert "PythonUDF" not in plan, plan


def test_cosine_range_search_broadcasts_queries_no_shuffle(spark):
    """Range search is a broadcast + scan-side filter: the candidate side
    must not shuffle at all (no hash exchange, no window)."""
    from data_engineering_nd_spark.operators.similarity import (
        ann_cosine_range_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ann_cosine_range_query(spark, SF_DIR))
    assert "BroadcastExchange" in plan or "IdentityBroadcastMode" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Window" not in plan, plan


def test_knn_join_is_equi_join_no_cartesian(spark):
    """The k-NN self-join must join on the block key (hash/sort-merge or
    broadcast equi-join) — never an all-pairs nested loop — and the cosine
    must stay JVM-side."""
    from data_engineering_nd_spark.operators.similarity import ann_knn_join_query
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ann_knn_join_query(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "PythonUDF" not in plan, plan


def test_semantic_dedup_is_equi_join_no_cartesian(spark):
    from data_engineering_nd_spark.operators.similarity import (
        ann_semantic_dedup_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ann_semantic_dedup_query(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "PythonUDF" not in plan, plan


def test_label_propagation_round_has_no_window(spark):
    """One LPA round = join + two hash-aggs; the arg-max must be the
    max(struct) form, never a per-node row_number window."""
    from data_engineering_nd_spark.operators.graph import label_propagation
    from data_engineering_nd_spark.plans.inspect import physical_plan

    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    # peek at the plan of a single round by running 1 iteration and
    # checking the FINAL frame's lineage (localCheckpoint cuts earlier
    # rounds, so the visible plan is exactly one round's shape)
    out = label_propagation(edges, iterations=1)
    plan = physical_plan(out)
    assert "Window" not in plan, plan
    assert "PythonUDF" not in plan, plan


def test_bpe_merge_candidates_aggregates_vocab_before_pair_explode(spark):
    """The vocab-first contract: the character-pair Generate (explode) must
    sit ABOVE the word-count HashAggregate in the plan — pairs explode
    over the vocabulary, never over raw corpus tokens."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_bpe_merge_candidates_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ds_bpe_merge_candidates_query(spark, SF_DIR))
    # two Generates: token explode (below the vocab agg) and pair explode
    # (above it). Locate the pair explode and assert an Aggregate below it.
    lines = plan.splitlines()
    pair_gen = [i for i, ln in enumerate(lines) if "Generate" in ln]
    aggs = [i for i, ln in enumerate(lines) if "HashAggregate" in ln]
    assert pair_gen and aggs, plan
    # at least one aggregate must appear between the two generates
    # (tree section prints top-down: pair explode first, token explode last)
    assert any(pair_gen[0] < a < pair_gen[-1] for a in aggs), plan
    assert "PythonUDF" not in plan, plan



def test_epoch_shards_has_no_single_partition_exchange(spark):
    """The token-budget shard assignment must reuse the permutation's
    bucket decomposition: corpus-sized branches see only hash exchanges,
    the offsets ride a broadcast, and no global running-sum window
    funnels the corpus through one reducer."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_epoch_shards_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(ds_epoch_shards_query(spark, SF_DIR))
    assert "SinglePartition" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_image_dhash_fingerprint_is_jvm_only(spark):
    """The dHash fingerprint pass must stay in whole-stage codegen — no
    Python in the plan (the docstring's core claim: with a real codec the
    same bits come from the decode batch, but THIS path is pure JVM)."""
    from data_engineering_nd_spark.operators.multimodal import (
        image_dhash,
        synthetic_media,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(image_dhash(synthetic_media(spark, SF_DIR)))
    assert "PythonUDF" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "MapInPandas" not in plan, plan


def test_scd2_batch_joins_are_broadcast(spark):
    """The SCD2 update batch must broadcast against the current slice —
    a sort-merge/shuffle join on the dimension for a tiny batch would
    re-shuffle the dimension once per merge."""
    from data_engineering_nd_spark.operators.dimensions import (
        q68_scd2_customer_dim_query,
    )
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(q68_scd2_customer_dim_query(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_countmin_probe_broadcasts_against_sketch(spark):
    """CMS build is explode + hash-agg; the 10-key probe set broadcasts —
    nothing corpus-sized crosses a join."""
    from data_engineering_nd_spark.analytics import q69_countmin_heavy_hitters
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(q69_countmin_heavy_hitters(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan  # exact top-10, no global sort


def test_incremental_dedup_index_side_is_scan_not_recompute(spark, tmp_path):
    """The incremental-dedup contract (VERDICT r06 #4): the corpus side of
    the candidate join is a parquet scan of the PERSISTED signature index
    — the plan must contain the index file scan and ZERO signature
    recomputation (no md5 anywhere: batch bands are materialized before
    the join, and the index side must not re-fingerprint the corpus)."""
    from data_engineering_nd_spark.operators.dedup import (
        candidate_pairs_against_index,
        md5_band_buckets,
        md5_shingle_base,
    )
    from data_engineering_nd_spark.tables import VersionedTable

    docs = load(spark, "documents", SF_DIR)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)

    root = str(tmp_path / "sig_index")
    table = VersionedTable(spark, root)
    table.commit(md5_band_buckets(md5_shingle_base(corpus, "doc_id", "text")))
    batch_bands = md5_band_buckets(
        md5_shingle_base(batch, "doc_id", "text")
    ).localCheckpoint()

    cand = candidate_pairs_against_index(table.snapshot(), batch_bands)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    # the persisted index IS scanned as parquet (the Location string
    # truncates long tmp paths, so pin the scan node + schema instead)
    assert "FileScan parquet [id#" in plan, plan
    assert "md5" not in plan, plan  # ...and nobody re-fingerprints
    # the documents table itself must not appear above the index scan
    assert "documents" not in plan, plan


def test_dedup_decisions_cluster_side_broadcasts(spark):
    """multimodal_dedup_decisions: the cluster frame is output-sized
    (near-dup pairs, not the corpus), so it must BROADCAST into the media
    join — the media side never shuffles for the decision tagging."""
    from data_engineering_nd_spark.operators.multimodal import (
        multimodal_dedup_decisions_query,
    )

    df = multimodal_dedup_decisions_query(spark, SF_DIR)
    assert_broadcast_join(df)
    assert_no_python_udf_in(df)


def _headliner_names():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "plans_report",
        os.path.join(os.path.dirname(__file__), "..", "tools", "plans_report.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.HEADLINERS)


def _fingerprint_snapshot():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")
    with open(path) as f:
        return json.load(f)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fingerprint_sweep(spark):
    """Build every headliner's plan fingerprint once on a small driver
    thread pool (guide §2.6) — plan construction is driver-side and
    independent per query, so the sweep overlaps the py4j round-trips;
    each parametrized test below asserts its own cached fingerprint."""
    from concurrent.futures import ThreadPoolExecutor

    from data_engineering_nd_spark.plans.inspect import plan_fingerprint
    from data_engineering_nd_spark.registry import QUERIES, load_all_modules

    load_all_modules()

    def one(name):
        try:
            return name, (plan_fingerprint(QUERIES[name](spark, SF_DIR)), None)
        except Exception as ex:  # surfaced by the per-query test
            return name, (None, ex)

    with ThreadPoolExecutor(max_workers=4) as pool:
        return dict(pool.map(one, _headliner_names()))


@pytest.mark.parametrize("name", _headliner_names())
def test_plan_fingerprint_no_silent_drift(spark, fingerprint_sweep, name):
    """Drift-snapshot guard over every PLANS.md headliner (VERDICT r06
    #7): regenerate the operator multiset and fail on UN-ANNOTATED growth
    in shuffle count, nested loops, row-wise Python, or scan count — the
    silent plan regressions the bench's noise band hides. Deliberate plan
    changes refresh the snapshot via tools/plan_fingerprints.py (with the
    reason in the commit message)."""
    snap = _fingerprint_snapshot()
    if name not in snap:
        pytest.skip(f"new headliner {name}: no committed fingerprint yet — "
                    "run tools/plan_fingerprints.py")
    fp, err = fingerprint_sweep[name]
    if err is not None:
        raise err
    base = snap[name]
    for k in ("exchanges", "nested_loops", "rowwise_python", "scans"):
        assert fp[k] <= base[k], (
            f"{name}: {k} grew {base[k]} -> {fp[k]} (un-annotated plan "
            f"drift). Full fingerprint: {fp} vs committed {base}. If the "
            "change is deliberate, refresh tests/plan_fingerprints.json."
        )
    # a broadcast degrading to sort-merge shows as +smj with -bhj
    if fp["sort_merge_joins"] > base["sort_merge_joins"]:
        assert fp["broadcast_joins"] >= base["broadcast_joins"], (
            f"{name}: broadcast join degraded to sort-merge: {fp} vs {base}"
        )


def test_grouping_sets_expand_from_single_exchange(spark):
    """q77: like CUBE (q41), the three grouping-set grains must multiply
    map-side through one Expand and ONE shuffle — not one scan per grain."""
    from data_engineering_nd_spark.analytics import q77_grouping_sets
    from data_engineering_nd_spark.plans.inspect import (
        count_exchanges,
        physical_plan,
    )

    df = q77_grouping_sets(spark, SF_DIR)
    assert "Expand" in physical_plan(df)
    assert count_exchanges(df) == 1


def test_event_sequences_single_hash_agg_no_window(spark):
    """ds_event_sequences builds the ordered per-user sequence inside ONE
    hash-aggregate (collect + array_sort) — no Window operator, whose
    per-user sort-in-shuffle would be a second exchange."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_event_sequences_query,
    )
    from data_engineering_nd_spark.plans.inspect import (
        count_exchanges,
        physical_plan,
    )

    df = ds_event_sequences_query(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert count_exchanges(df) == 1


def test_incremental_ann_index_side_is_scan_not_recompute(spark, tmp_path):
    """The incremental-ANN contract (VERDICT r07 #3): the corpus side of
    the candidate join is a parquet scan of the PERSISTED (vec_id, cell)
    IVF index — the plan must contain the index file scan and ZERO cell
    recomputation (no md5 centroids, no dot-product aggregate, no Window
    above the index side: batch cells are materialized before the join)."""
    from data_engineering_nd_spark.operators.similarity import (
        ivf_candidates_against_index,
        md5_cell_assignments,
    )
    from data_engineering_nd_spark.tables import VersionedTable

    emb = load(spark, "embeddings", SF_DIR)
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    batch = emb.filter(F.col("vec_id") % 7 == 0)

    root = str(tmp_path / "ivf_index")
    table = VersionedTable(spark, root)
    table.commit(md5_cell_assignments(corpus, 1))
    q_cells = md5_cell_assignments(batch, 2).localCheckpoint()

    cand = ivf_candidates_against_index(table.snapshot(), q_cells)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet [vec_id#" in plan, plan
    assert "md5" not in plan, plan  # ...and nobody re-derives centroids
    assert "aggregate(" not in plan, plan  # no dot products either
    assert "Window" not in plan, plan  # no re-ranking of cell assignments
    assert "embeddings" not in plan, plan


def test_incremental_bm25_corpus_text_never_retokenized(spark, tmp_path):
    """The incremental-index contract for lexical retrieval: after
    bootstrap, the served plan's corpus side is a parquet scan of the
    persisted postings/doclens tables — the only tokenize explode in the
    plan belongs to the BATCH, and the corpus documents' text column is
    never read again."""
    from data_engineering_nd_spark.operators.text_analysis import (
        _bm25_rank,
        build_postings,
    )
    from data_engineering_nd_spark.tables import VersionedTable

    docs = load(spark, "documents", SF_DIR)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    root = str(tmp_path / "lex_index")
    posts_t = VersionedTable(spark, root + "/postings")
    lens_t = VersionedTable(spark, root + "/doclens")
    cp, cl = build_postings(corpus)
    posts_t.commit(cp)
    lens_t.commit(cl)

    bp, bl = build_postings(batch)
    bp, bl = bp.localCheckpoint(), bl.localCheckpoint()
    posts = posts_t.snapshot().unionByName(bp)
    lens = lens_t.snapshot().unionByName(bl)
    qp = posts.filter(F.col("term").isin(["scan", "join"]))
    stats = lens.agg(
        F.sum("len_d").cast("bigint").alias("total_len"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    out = _bm25_rank(
        qp.select("doc_id", "term", "tf"),
        qp.groupBy("term").agg(F.countDistinct("doc_id").alias("df")),
        lens,
        stats,
        "doc_id",
        10,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the index scans are real parquet reads of the persisted relations
    assert "FileScan parquet [doc_id#" in plan, plan
    # with the batch relations materialized (as the operator does), the
    # served plan contains ZERO tokenization and never opens the
    # documents table — the corpus side is purely the index scan
    assert plan.count("explode(split(") == 0, plan
    assert plan.count("documents.parquet") == 0, plan


def test_dynamic_partition_pruning_subquery_in_fact_scan(spark, tmp_path):
    """q98's fixture: the quarter predicate lives ONLY on the standalone
    dim, so the month-partitioned fact scan must carry a dynamicpruning
    subquery in its PartitionFilters — runtime pruning, since no static
    pushdown can cross the join."""
    from data_engineering_nd_spark.analytics import (
        _dpp_frames,
        dpp_quarter_revenue,
    )

    fact, dim = _dpp_frames(spark, SF_DIR, str(tmp_path))
    plan = dpp_quarter_revenue(fact, dim)._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan, plan
    # and the value side still answers correctly
    months = {r.o_month for r in dpp_quarter_revenue(fact, dim).collect()}
    assert months == {"1995-01", "1995-02", "1995-03"}


def test_kmv_bottom_k_is_two_stage_tournament(spark):
    """The KMV bottom-k must never globally sort the input stream: the
    only single-partition exchange runs over the BOUNDED 64·k candidate
    pool after the parallel per-salt stage-1 windows."""
    from data_engineering_nd_spark.analytics import kmv_bottom_k
    from data_engineering_nd_spark.functions.hashing import md5_prefix_long
    from data_engineering_nd_spark.plans.inspect import physical_plan

    orders = load(spark, "orders", SF_DIR)
    h = orders.select(
        md5_prefix_long(F.col("o_custkey").cast("string"), 15).alias("h")
    )
    plan = physical_plan(kmv_bottom_k(h))
    assert "hashpartitioning(salt" in plan, plan   # stage 1 parallel
    # stage 1 pushes the limit into partial/final WindowGroupLimit and
    # stage 2 collapses to a distributed top-k — NO single-partition
    # exchange anywhere
    assert "WindowGroupLimit" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_gini_window_partitions_by_nation_and_broadcasts_names(spark):
    """The rank window must run per nation (no global sort of the
    customer stream); the 25-row nation-name join rides a broadcast."""
    from data_engineering_nd_spark.analytics import q113_gini_by_nation
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(q113_gini_by_nation(spark, SF_DIR))
    assert "SinglePartition" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_drawdown_window_partitions_by_year_over_daily_agg(spark):
    """The prefix-max window must run per year over the day-level
    aggregate — a HashAggregate collapses the fact table BEFORE any
    window, and no single-partition exchange appears."""
    from data_engineering_nd_spark.analytics import q114_max_drawdown_by_year
    from data_engineering_nd_spark.plans.inspect import physical_plan

    plan = physical_plan(q114_max_drawdown_by_year(spark, SF_DIR))
    assert "SinglePartition" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_no_unbounded_global_windows_in_window_headliners(spark):
    """Runtime executed-plan guard (VERDICT r11 task #3): none of the
    window-heavy headliners may execute a no-partition WindowExec whose
    input is not provably bounded by an upstream limit or GLOBAL
    aggregate — the q115 failure mode the sf0.001 fingerprints could
    not see.  A GROUPED aggregate no longer counts as bounding
    (ADVICE r12 — group cardinality can be n-proportional): such
    windows surface as ``[grouped]``-tagged hits, and this test runs
    each headliner at TWO scale factors asserting the measured window
    input does not grow with the data (the tools/window_sweep.py
    criterion, pinned in-suite)."""
    from data_engineering_nd_spark import registry
    from data_engineering_nd_spark.plancheck import unbounded_global_windows
    from data_engineering_nd_spark.registry import QUERIES

    registry.load_all_modules()
    for name in (
        "q115_top_decile_revenue_share",
        "q112_kmv_set_operations",
        "q22_running_total",
        "q97_window_funnel",
        "q108_weighted_median",
        "ds_length_histogram",
        "q86_last_touch_attribution",
    ):
        rows_by_sf = []
        for sf_dir in (SF_DIR, SF_DIR_B):
            df = QUERIES[name](spark, sf_dir)
            df.collect()
            hits = unbounded_global_windows(df)
            hard = [h for h in hits if "[grouped" not in h.input_node]
            assert not hard, (name, sf_dir, hard)
            rows_by_sf.append(max((h.input_rows for h in hits), default=0))
        a, b = rows_by_sf
        assert b <= max(3 * a, a + 64), (name, "window input grows", a, b)
