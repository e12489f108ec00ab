"""Generator-sync guards (VERDICT r05 task #5): the unrolled-CTE oracles
are SQL strings BUILT from loop parameters that must stay in lockstep with
the Spark query's actual arguments (PageRank iterations, LPA iterations,
k-core rounds/threshold, minhash perms/bands, simhash bits/chunks). Nothing
else pins that the generator and the Python loop agree — a drift would ship
an oracle that silently checks a different computation. Each test counts
the generated SQL's unrolled stages and asserts they match the parameter
the registered query actually passes (read from its source/signature, so
editing either side alone fails here)."""

from __future__ import annotations

import inspect
import re

from data_engineering_nd_spark.registry import ORACLE_SQL, load_all_modules

load_all_modules()


def test_pagerank_oracle_unrolls_query_iterations():
    from data_engineering_nd_spark.operators.graph import (
        graph_pagerank_topk_query,
    )

    src = inspect.getsource(graph_pagerank_topk_query)
    m = re.search(r"iterations=(\d+)", src)
    iters = int(m.group(1))
    sql = ORACLE_SQL["graph_pagerank_topk"]
    assert len(re.findall(r"c\d+ AS MATERIALIZED", sql)) == iters
    assert f"FROM r{iters} " in sql or f"FROM r{iters}\n" in sql


def test_label_propagation_oracle_unrolls_query_iterations():
    from data_engineering_nd_spark.operators.graph import (
        graph_label_propagation_query,
    )

    src = inspect.getsource(graph_label_propagation_query)
    iters = int(re.search(r"iterations=(\d+)", src).group(1))
    sql = ORACLE_SQL["graph_label_propagation"]
    # l0 (seed) + one stage per iteration
    assert len(re.findall(r"l\d+ AS MATERIALIZED", sql)) == iters + 1
    assert f"FROM l{iters}" in sql


def test_kcore_oracle_unrolls_default_rounds_and_threshold():
    from data_engineering_nd_spark.operators.graph import (
        graph_kcore_query,
        kcore,
    )

    rounds = inspect.signature(kcore).parameters["rounds"].default
    src = inspect.getsource(graph_kcore_query)
    k = int(re.search(r"k=(\d+)", src).group(1))
    sql = ORACLE_SQL["graph_kcore"]
    # e0 (seed) + one edge frame per round; one keep-set per round
    assert len(re.findall(r"e\d+ AS MATERIALIZED", sql)) == rounds + 1
    assert len(re.findall(r"k\d+ AS MATERIALIZED", sql)) == rounds
    assert f"FROM e{rounds} GROUP BY" in sql
    assert sql.count(f"HAVING COUNT(*) >= {k}") == rounds + 1


def test_minhash_md5_oracle_matches_hash_family_defaults():
    from data_engineering_nd_spark.operators.dedup import (
        minhash_lsh_pairs_md5,
    )

    sig = inspect.signature(minhash_lsh_pairs_md5).parameters
    num_hashes = sig["num_hashes"].default
    bands = sig["bands"].default
    rows_per_band = num_hashes // bands
    sql = ORACLE_SQL["dedup_minhash_verified"]
    assert f"unnest(range({num_hashes})) AS t(p)" in sql
    assert f"CAST(p // {rows_per_band} AS INT) AS band" in sql
    assert f"GROUP BY id, p // {rows_per_band}" in sql


def test_simhash_md5_oracle_matches_bits_and_chunks():
    from data_engineering_nd_spark.operators.dedup import (
        _SIMHASH_MD5_BITS,
        simhash_pairs_md5,
    )

    max_hamming = inspect.signature(simhash_pairs_md5).parameters[
        "max_hamming"
    ].default
    n_chunks = max_hamming + 1
    sql = ORACLE_SQL["dedup_simhash_verified"]
    # one vote column per fingerprint bit, declared once and selected once
    assert len(set(re.findall(r"AS b(\d+)\b", sql))) == _SIMHASH_MD5_BITS
    assert f"unnest(range({n_chunks})) AS t(c)" in sql
    assert f"<= {max_hamming}" in sql


def test_pipeline_slice_rebase_is_word_bounded():
    """The pipeline-oracle rebase must rewrite FROM/JOIN orders (any
    whitespace), but never a prefixed table like orders_raw, a column
    like o.orders_col, or the already-rebased slice name."""
    from data_engineering_nd_spark.i94_parity import _rebase_onto_slice

    assert _rebase_onto_slice("SELECT * FROM orders") == (
        "SELECT * FROM orders_slice"
    )
    assert _rebase_onto_slice("FROM x JOIN orders o ON 1=1") == (
        "FROM x JOIN orders_slice o ON 1=1"
    )
    assert _rebase_onto_slice("FROM\n  orders o") == "FROM\n  orders_slice o"
    assert _rebase_onto_slice("FROM orders_raw") == "FROM orders_raw"
    assert _rebase_onto_slice("FROM orders_slice") == "FROM orders_slice"
    assert _rebase_onto_slice("SELECT orders FROM t") == "SELECT orders FROM t"


def test_pipeline_oracle_embeds_sliced_builders():
    """Every embedded builder CTE in the registered pipeline oracle reads
    the slice, never the raw orders view."""
    import re

    from data_engineering_nd_spark.registry import ORACLE_SQL, load_all_modules

    load_all_modules()
    sql = ORACLE_SQL["i94_pipeline_run"]
    # skip past the slice CTE itself (which legitimately reads the raw
    # view to define the slice); everything after must read the slice
    body = sql.split("o_orderkey % 3 = 0)", 1)[1]
    assert not re.search(r"\b(FROM|JOIN)\s+orders\b", body)
