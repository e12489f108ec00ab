"""Tests for the closed-form statistics / sketch-set-ops / decay /
attribution analytics queries (q83-q86) on crafted frames with known
answers."""

from __future__ import annotations

import datetime

import pandas as pd


def _write(spark, sf, table, rows: pd.DataFrame, schema=None) -> None:
    df = (
        spark.createDataFrame(rows, schema=schema)
        if schema
        else spark.createDataFrame(rows)
    )
    df.write.mode("overwrite").parquet(str(sf / f"{table}.parquet"))


def test_grouped_linreg_exact_fit(spark, tmp_path):
    """y = 3x + 5 exactly -> slope 3, intercept 5, r2 = 1 per group."""
    from data_engineering_nd_spark.analytics import q83_grouped_linreg

    qty = [float(q) for q in range(1, 21)] * 2
    rows = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 20 + ["R"] * 20,
            "l_quantity": qty,
            "l_extendedprice": [3.0 * q + 5.0 for q in qty],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "lineitem", rows)
    out = {r.l_returnflag: r for r in q83_grouped_linreg(spark, str(sf)).collect()}
    assert set(out) == {"A", "R"}
    for r in out.values():
        assert r.n_rows == 20
        assert abs(r.slope - 3.0) < 1e-6
        assert abs(r.intercept - 5.0) < 1e-6
        assert abs(r.r2 - 1.0) < 1e-6


def test_grouped_linreg_noisy_r2_below_one(spark, tmp_path):
    """A non-collinear group lands r2 strictly inside (0, 1)."""
    from data_engineering_nd_spark.analytics import q83_grouped_linreg

    rows = pd.DataFrame(
        {
            "l_returnflag": ["N"] * 4,
            "l_quantity": [1.0, 2.0, 3.0, 4.0],
            "l_extendedprice": [2.0, 1.0, 4.0, 3.0],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "lineitem", rows)
    (r,) = q83_grouped_linreg(spark, str(sf)).collect()
    assert 0.0 < r.r2 < 1.0
    # closed form on this frame: slope = cov_n/varx_n = (4*28-10*10)/(4*30-100)
    assert abs(r.slope - 0.6) < 1e-6


def test_kmv_small_sets_are_exact(spark, tmp_path):
    """Sets below k: the sketch IS the set, so every estimate equals the
    exact count and the merged-sketch overlap is the true intersection."""
    from data_engineering_nd_spark.analytics import q84_kmv_distinct

    d96 = datetime.datetime(1996, 6, 1)
    d97 = datetime.datetime(1997, 6, 1)
    rows = pd.DataFrame(
        {
            "o_custkey": list(range(1, 101)) + list(range(51, 151)),
            "o_orderdate": [d96] * 100 + [d97] * 100,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "orders", rows)
    (r,) = q84_kmv_distinct(spark, str(sf)).collect()
    assert (r.a_exact, r.b_exact, r.i_exact) == (100, 100, 50)
    assert r.a_est == 100.0 and r.b_est == 100.0
    assert r.union_est == 150.0
    assert r.overlap_k == 50
    assert abs(r.jaccard_est - 50.0 / 150.0) < 1e-6
    assert abs(r.intersect_est - 50.0) < 1e-4


def test_kmv_estimate_within_error_envelope(spark, tmp_path):
    """Above k the estimator (k-1)*2^60/h_(k) lands within the published
    ~1/sqrt(k) relative-error class of the true cardinality."""
    from data_engineering_nd_spark.analytics import q84_kmv_distinct

    d96 = datetime.datetime(1996, 6, 1)
    n = 3000
    rows = pd.DataFrame(
        {
            "o_custkey": list(range(1, n + 1)),
            "o_orderdate": [d96] * n,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "orders", rows)
    (r,) = q84_kmv_distinct(spark, str(sf)).collect()
    assert r.a_exact == n
    assert abs(r.a_est - n) / n < 5.0 / (256 ** 0.5)  # ~31% envelope
    assert r.b_exact == 0 and r.b_est == 0.0


def test_decayed_revenue_dyadic_weights(spark, tmp_path):
    """Known ages -> exact dyadic weights: k=0 keeps full value, k=1
    halves it; ratio follows."""
    from data_engineering_nd_spark.analytics import q85_decayed_revenue

    # anchor 2001-09-01: ages 31d (k=0) and 211d (k=1)
    rows = pd.DataFrame(
        {
            "o_orderpriority": ["1-URGENT", "1-URGENT"],
            "o_totalprice": [100.0, 100.0],
            "o_orderdate": [
                datetime.datetime(2001, 8, 1),
                datetime.datetime(2001, 2, 2),
            ],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "orders", rows)
    (r,) = q85_decayed_revenue(spark, str(sf)).collect()
    assert r.n_orders == 2
    assert r.revenue_total == 200.0
    assert r.revenue_decayed_e6 == 150_000_000  # 100 + 50, e6-scaled
    assert r.revenue_decayed == 150.0
    assert abs(r.retention_ratio - 0.75) < 1e-6


def test_last_touch_attribution_rules(spark, tmp_path):
    """Window, recency, tie-break, and 'direct' fallback all pinned."""
    from data_engineering_nd_spark.analytics import q86_last_touch_attribution

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = pd.DataFrame(
        [
            # u1: view@0, click@30, purchase@45 -> click (most recent)
            (1, ts(0), 1, "view", 0.0),
            (2, ts(30), 1, "click", 0.0),
            (3, ts(45), 1, "purchase", 10.0),
            # u2: click@0, purchase@90 -> outside 1h -> direct
            (4, ts(0), 2, "click", 0.0),
            (5, ts(90), 2, "purchase", 20.0),
            # u3: two touches at the SAME ts -> higher event_id wins (view)
            (6, ts(0), 3, "click", 0.0),
            (7, ts(0), 3, "view", 0.0),
            (8, ts(10), 3, "purchase", 40.0),
            # u4: touch AT the purchase ts does not count (strict <)
            (9, ts(10), 4, "click", 0.0),
            (10, ts(10), 4, "purchase", 80.0),
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "events", rows)
    out = {
        r.channel: r
        for r in q86_last_touch_attribution(spark, str(sf)).collect()
    }
    assert out["click"].n_purchases == 1 and out["click"].attributed_value == 10.0
    assert out["view"].n_purchases == 1 and out["view"].attributed_value == 40.0
    # u2 (window expired) + u4 (strict inequality) both fall to direct
    assert out["direct"].n_purchases == 2
    assert out["direct"].attributed_value == 100.0


def test_skyline_pareto_dominance_rules(spark, tmp_path):
    """Frontier membership pinned: strictly-cheaper-and-bigger dominates,
    same-price ties keep the max-size point(s), duplicates both survive."""
    from data_engineering_nd_spark.analytics import q87_skyline_pareto

    rows = [
        # (partkey, price, size)
        (1, 10.0, 5),   # frontier (cheapest)
        (2, 20.0, 5),   # dominated by 1 (same size, pricier)
        (3, 20.0, 8),   # frontier
        (4, 20.0, 7),   # dominated by 3 (same price, smaller)
        (5, 30.0, 9),   # frontier
        (6, 30.0, 9),   # duplicate of 5: neither dominates -> both kept
        (7, 40.0, 1),   # dominated by everything bigger & cheaper
    ]
    import pandas as pd

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["p_partkey", "p_retailprice", "p_size"])
    ).write.parquet(str(sf / "part.parquet"))
    keys = sorted(r.p_partkey for r in q87_skyline_pareto(spark, str(sf)).collect())
    assert keys == [1, 3, 5, 6]
