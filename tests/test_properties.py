"""Property-based tests (hypothesis) for the kernels whose input space is
adversarial: date strings and token sets. The reference shipped a date UDF
that returned NULL for EVERY input and never noticed (SURVEY §2.9) — exactly
the bug class property tests catch."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st


def _parse_flexible(spark, strings, years=(2016,)):
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.functions.dates import flexible_date

    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    rows = df.select(flexible_date("s", years).alias("d")).collect()
    return [r.d for r in rows]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.dates(datetime.date(2016, 1, 1), datetime.date(2016, 12, 31)),
        min_size=1,
        max_size=8,
    )
)
def test_flexible_date_roundtrips_both_formats(spark, dates):
    ymd = [d.strftime("%Y%m%d") for d in dates]
    mdy = [d.strftime("%m%d%Y") for d in dates]
    assert _parse_flexible(spark, ymd) == list(dates)
    assert _parse_flexible(spark, mdy) == list(dates)


@settings(max_examples=20, deadline=None)
@given(st.text(max_size=12).filter(lambda s: not s[:4].isdigit() and not s[-4:].isdigit()))
def test_flexible_date_junk_is_null_never_error(spark, junk):
    # anything without a valid-year prefix/suffix must parse to NULL —
    # including regex metacharacters, unicode, and empty strings
    assert _parse_flexible(spark, [junk]) == [None]


@settings(max_examples=15, deadline=None)
@given(st.integers(-100_000, 100_000))
def test_sas_date_is_epoch_offset(spark, offset):
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.functions.dates import sas_date

    df = spark.createDataFrame([(float(offset),)], ["x"])
    got = df.select(sas_date("x").alias("d")).collect()[0].d
    assert got == datetime.date(1960, 1, 1) + datetime.timedelta(days=offset)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=1, max_size=12),
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=1, max_size=12),
)
def test_jaccard_bounds_and_symmetry(spark, toks_a, toks_b):
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(1, " ".join(toks_a), "blk"), (2, " ".join(toks_b), "blk")],
        ["doc_id", "text", "blk"],
    )
    rows = jaccard_pairs(docs, "doc_id", "text", "blk", threshold=0.0).collect()
    assert len(rows) == 1
    j = rows[0].jaccard
    assert 0.0 <= j <= 1.0
    sa, sb = set(toks_a), set(toks_b)
    expected = len(sa & sb) / len(sa | sb)
    assert abs(j - expected) < 1e-6


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_label_propagation_labels_stay_within_component(spark, edges):
    """On ANY graph, a node's final label must be a node id from its own
    connected component (labels only travel along edges)."""
    from data_engineering_nd_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, ["src", "dst"])
    labels = {r["id"]: r["lab"] for r in label_propagation(df, iterations=4).collect()}

    # union-find ground-truth components
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    for node, lab in labels.items():
        assert find(node) == find(lab), (node, lab, edges)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(st.characters(whitelist_categories=("Ll",)), min_size=1, max_size=4),
                  st.integers(1, 10_000)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_temperature_mixture_invariants(spark, sources):
    """Shares sum to ~1; every repeat factor is positive; a domain never
    gets a larger temp share than a strictly bigger domain."""
    from data_engineering_nd_spark.operators.datasets import temperature_mixture

    per_src = spark.createDataFrame(
        [(name, 1, toks) for name, toks in sources],
        ["source", "n_docs", "total_tokens"],
    )
    rows = temperature_mixture(per_src, budget=10_000).collect()
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
    assert all(r["repeat_factor"] > 0 for r in rows)
    by_tokens = sorted(rows, key=lambda r: r["total_tokens"])
    for small, big in zip(by_tokens, by_tokens[1:]):
        if big["total_tokens"] > small["total_tokens"]:
            assert big["temp_share"] >= small["temp_share"] - 1e-9


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(1, 50), min_size=1, max_size=30))
def test_pack_offsets_are_dense_within_sequence(spark, token_counts):
    """In every packed sequence the ordered offsets start at 0 and each
    equals the previous offset + previous doc's tokens (no gaps/overlap)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_engineering_nd_spark.operators.datasets import pack_sequences

    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(token_counts)], ["doc_id", "n_tokens"]
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=64, n_groups=2)
    w = (
        Window.partitionBy("pack_group", "seq_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = (
        packed.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .orderBy("pack_group", "seq_id", "doc_id")
        .collect()
    )
    seqs = {}
    for r in rows:
        seqs.setdefault((r["pack_group"], r["seq_id"]), []).append(
            (r["off"], r["n_tokens"])
        )
    for parts in seqs.values():
        assert parts[0][0] == 0
        for (o1, n1), (o2, _) in zip(parts, parts[1:]):
            assert o2 == o1 + n1


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_common_neighbor_candidates_properties(spark, edges):
    """On ANY graph: no candidate pair is an existing edge, every candidate
    really shares >=1 neighbor, and the count is exact."""
    from data_engineering_nd_spark.operators.graph import (
        common_neighbor_candidates,
    )

    df = spark.createDataFrame(edges, ["src", "dst"])
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {
        (r["id_a"], r["id_b"]): r["common_neighbors"]
        for r in common_neighbor_candidates(df, max_degree=None).collect()
    }
    for (a, b), cn in got.items():
        assert b not in adj[a], (a, b)  # non-adjacent
        assert cn == len(adj[a] & adj[b]) and cn >= 1
    # exhaustive: every qualifying non-adjacent pair is present
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if b not in adj[a] and adj[a] & adj[b]:
                assert (a, b) in got, (a, b)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 60) - 1),
        min_size=2,
        max_size=24,
        unique=True,
    ),
    st.integers(min_value=0, max_value=4),
)
def test_hamming_blocked_pairs_exact_recall(spark, fps, max_h):
    """Pigeonhole blocking is EXACT: for random 60-bit fingerprints the
    blocked pair set equals the brute-force all-pairs Hamming filter —
    no pair within the threshold is ever lost to blocking."""
    from data_engineering_nd_spark.operators.dedup import hamming_blocked_pairs

    df = spark.createDataFrame(
        [(i, fp) for i, fp in enumerate(fps)], "id long, fp long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_blocked_pairs(df, bits=60, max_hamming=max_h).collect()
    }
    want = {
        (i, j, bin(fps[i] ^ fps[j]).count("1"))
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
        if bin(fps[i] ^ fps[j]).count("1") <= max_h
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=200),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=50, max_value=400),
)
def test_epoch_shards_tile_any_token_distribution(spark, token_counts, budget):
    """For arbitrary token distributions the fused shard assignment
    conserves docs/tokens, tiles positions contiguously, and respects
    the greedy mass bounds."""
    from data_engineering_nd_spark.operators.datasets import epoch_shards

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(token_counts)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        epoch_shards(df, budget=budget).collect(), key=lambda r: r["shard_id"]
    )
    assert sum(r["n_docs"] for r in rows) == len(token_counts)
    assert sum(r["total_tokens"] for r in rows) == sum(token_counts)
    for a, b in zip(rows, rows[1:]):
        assert a["max_pos"] + 1 == b["min_pos"]
    mx = max(token_counts)
    for r in rows[:-1]:
        assert r["total_tokens"] > budget - mx
    for r in rows:
        assert r["total_tokens"] < budget + mx


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.sampled_from(["A", "B", "C", None])),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_scd2_replay_is_idempotent(spark, updates):
    """Applying the SAME batch twice (a retry) changes nothing the second
    time — the no-churn rule makes SCD2 idempotent to redelivery."""
    import datetime as dt

    from data_engineering_nd_spark.operators.dimensions import scd2_apply

    t0, t1 = dt.datetime(2020, 1, 1), dt.datetime(2024, 1, 1)
    base = spark.createDataFrame(
        [(k, "A", t0, None, True) for k in range(5)],
        "k long, seg string, effective_from timestamp_ntz, "
        "effective_to timestamp_ntz, is_current boolean",
    )
    upd = spark.createDataFrame(list(updates), "k long, seg string")
    once = scd2_apply(base, upd, "k", ["seg"], t1)
    twice = scd2_apply(once, upd, "k", ["seg"], t1)
    key = lambda r: tuple(map(str, r))  # noqa: E731 — None-safe ordering
    a = sorted(map(tuple, once.collect()), key=key)
    b = sorted(map(tuple, twice.collect()), key=key)
    assert a == b


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 4),
)
def test_bfs_layers_match_reference_bfs(spark, edge_pairs, max_hops):
    """Distributed level-synchronous BFS == textbook queue BFS for any
    random undirected graph, any hop bound, seeds = ids % 3 == 0."""
    from collections import deque

    from data_engineering_nd_spark.operators.graph import bfs_layers

    undirected = {(a, b) for a, b in edge_pairs if a != b}
    if not undirected:
        return
    nodes = {n for e in undirected for n in e}
    seeds = sorted(n for n in nodes if n % 3 == 0)
    if not seeds:
        return
    adj: dict[int, set[int]] = {n: set() for n in nodes}
    for a, b in undirected:
        adj[a].add(b)
        adj[b].add(a)
    expected = {s: 0 for s in seeds}
    q = deque((s, 0) for s in seeds)
    while q:
        u, d = q.popleft()
        if d == max_hops:
            continue
        for v in adj[u]:
            if v not in expected:
                expected[v] = d + 1
                q.append((v, d + 1))

    edges = spark.createDataFrame(
        sorted(undirected | {(b, a) for a, b in undirected}), ["src", "dst"]
    )
    seeds_df = spark.createDataFrame([(s,) for s in seeds], ["id"])
    got = {
        r["id"]: r["dist"]
        for r in bfs_layers(edges, seeds_df, max_hops=max_hops).collect()
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(st.integers(0, 20), st.integers(0, 3), min_size=1, max_size=15),
    st.dictionaries(st.integers(0, 20), st.integers(0, 3), min_size=1, max_size=15),
)
def test_snapshot_diff_matches_dict_diff(spark, tmp_path_factory, old, new):
    """snapshot_diff over real commits == the dict-level diff for any two
    keyed payload maps."""
    from data_engineering_nd_spark.tables import VersionedTable, snapshot_diff

    root = str(tmp_path_factory.mktemp("vt") / "t")
    t = VersionedTable(spark, root)
    t.commit(spark.createDataFrame(sorted(old.items()), ["k", "v"]))
    t.commit(spark.createDataFrame(sorted(new.items()), ["k", "v"]))

    expected = {}
    for k in old.keys() | new.keys():
        if k not in old:
            expected[k] = "added"
        elif k not in new:
            expected[k] = "removed"
        elif old[k] != new[k]:
            expected[k] = "changed"
        else:
            expected[k] = "unchanged"
    got = {r["k"]: r["change_type"] for r in snapshot_diff(t, 0, 1, ["k"]).collect()}
    assert got == expected


# -- round-9 lakehouse/join kernels ------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 199), st.integers(0, 60)),
        min_size=1,
        max_size=3,
    )
)
def test_dv_stacked_deletes_equal_filter(spark, ranges):
    """Any stack of (possibly overlapping, possibly empty-matching)
    merge-on-read deletes equals the set filter, never rewrites a data
    file, and never double-counts a row across vectors."""
    import tempfile, shutil
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.tables import VersionedTable

    work = tempfile.mkdtemp(prefix="dv_prop_")
    try:
        df = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        df.withColumn("cid", F.expr("k div 50")).repartition(1).write \
            .partitionBy("cid").parquet(work + "/staging")
        t = VersionedTable(spark, work + "/table")
        t.add_files(work + "/staging")
        base_files = t._manifest(0)["files"]

        alive = set(range(200))
        total_deleted = 0
        for lo, width in ranges:
            hi = lo + width
            m = t.delete_where_dv("k", lo, hi)
            assert m["files"] == base_files          # never a rewrite
            newly = {k for k in alive if lo <= k <= hi}
            assert m["rows_deleted"] == len(newly)   # exact, no recount
            alive -= newly
            total_deleted += len(newly)

        got = sorted(r.k for r in t.snapshot().collect())
        assert got == sorted(alive)
        assert t.snapshot(0).count() == 200          # time travel intact
    finally:
        shutil.rmtree(work, ignore_errors=True)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 80), st.integers(0, 25)),
        min_size=2,
        max_size=10,
        unique=True,
    ),
    st.integers(2, 40),
)
def test_interval_overlap_join_equals_brute_force(spark, spans, width):
    """Bucketed anchor join == quadratic overlap filter for arbitrary
    interval sets and ANY bucket width, each pair exactly once."""
    from data_engineering_nd_spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [(i, s, s + w) for i, (s, w) in enumerate(spans)]
    a = spark.createDataFrame(rows, "a_k long, a_s long, a_e long")
    b = spark.createDataFrame(rows, "b_k long, b_s long, b_e long")
    got = sorted(
        (r.a_k, r.b_k)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bucket_width=width
        )
        .filter("a_k < b_k")
        .collect()
    )
    want = sorted(
        (i, j)
        for i, s1, e1 in rows
        for j, s2, e2 in rows
        if i < j and s1 <= e2 and s2 <= e1
    )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 400), min_size=5, max_size=40, unique=True),
)
def test_bloom_index_never_false_negative(spark, probes):
    """For any probe set, every file containing the probed value is kept
    (false positives allowed; misses never)."""
    import tempfile, shutil
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.tables import VersionedTable

    work = tempfile.mkdtemp(prefix="bloom_prop_")
    try:
        df = spark.range(0, 300).select(
            F.col("id").alias("k"), ((F.col("id") * 131) % 401).alias("u")
        )
        df.withColumn("cid", F.expr("k div 75")).repartition(1).write \
            .partitionBy("cid").parquet(work + "/staging")
        t = VersionedTable(spark, work + "/table")
        t.add_files(work + "/staging")
        t.build_bloom_index("u")
        idx = t.load_bloom_index("u")
        # exact membership from the generator
        member_files = {}
        for k in range(300):
            member_files.setdefault((k * 131) % 401, set()).add(k // 75)
        for u in probes:
            kept, _, meta = t.prune_files_bloom("u", u, index=idx)
            n = t.lookup("u", u, index=idx).count()
            want = len([k for k in range(300) if (k * 131) % 401 == u])
            assert n == want                       # lookup == truth
            assert meta["files_kept"] >= len(member_files.get(u, ()))
    finally:
        shutil.rmtree(work, ignore_errors=True)
