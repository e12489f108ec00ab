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


def test_bitmap_retention_words_and_counts(spark, tmp_path):
    """Known users across word boundaries: DAU popcounts, day-over-day
    intersection, and the no-previous-day zero fallback."""
    import datetime

    from data_engineering_nd_spark.analytics import q88_bitmap_retention

    d1 = datetime.datetime(2024, 1, 1, 10)
    d2 = datetime.datetime(2024, 1, 2, 10)
    # day1: users 0, 31, 32, 100; day2: users 31, 32, 200
    rows = [
        (1, d1, 0, "view", 0.0), (2, d1, 31, "view", 0.0),
        (3, d1, 32, "view", 0.0), (4, d1, 100, "view", 0.0),
        (5, d1, 31, "click", 0.0),  # duplicate user, same day
        (6, d2, 31, "view", 0.0), (7, d2, 32, "view", 0.0),
        (8, d2, 200, "view", 0.0),
    ]
    import pandas as pd

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    ).write.parquet(str(sf / "events.parquet"))
    out = {r.day.date().isoformat(): r for r in q88_bitmap_retention(spark, str(sf)).collect()}
    assert out["2024-01-01"].dau == 4
    assert out["2024-01-01"].retained == 0      # no previous day
    assert out["2024-01-02"].dau == 3
    assert out["2024-01-02"].retained == 2      # users 31 and 32
    assert abs(out["2024-01-02"].retention - 2 / 3) < 1e-6


def test_mad_outliers_flags_the_planted_point(spark, tmp_path):
    """Median/MAD ignore the planted outlier; the 3-robust-sigma rule
    flags exactly it."""
    import pandas as pd

    from data_engineering_nd_spark.analytics import q89_mad_outliers

    vals = [100.0, 101.0, 102.0, 103.0, 104.0, 1000.0]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        pd.DataFrame({"l_returnflag": ["A"] * 6, "l_extendedprice": vals})
    ).write.parquet(str(sf / "lineitem.parquet"))
    (r,) = q89_mad_outliers(spark, str(sf)).collect()
    assert r.n_rows == 6
    assert r.median_price == 102.5        # interpolated even-count median
    # adevs: 2.5, 1.5, .5, .5, 1.5, 897.5 -> median 1.5
    assert r.mad == 1.5
    assert r.n_outliers == 1              # only the 1000.0 point
    assert abs(r.outlier_share - 1 / 6) < 1e-6


def test_rolling_distinct_window_membership(spark, tmp_path):
    """Windows end on observed days and pool the trailing 7 days: exact
    counts match set unions; the register merge stays in the envelope."""
    import datetime

    import pandas as pd

    from data_engineering_nd_spark.analytics import q90_rolling_distinct

    def d(day):
        return datetime.datetime(2024, 1, day, 12)

    rows = []
    eid = 0
    for day, users in [(1, [1, 2]), (2, [2, 3]), (10, [7])]:
        for u in users:
            eid += 1
            rows.append((eid, d(day), u, "view", 0.0))
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    ).write.parquet(str(sf / "events.parquet"))
    out = {r.window_day.date().day: r for r in q90_rolling_distinct(spark, str(sf)).collect()}
    assert set(out) == {1, 2, 10}         # only observed days emit windows
    assert out[1].n_exact == 2            # {1,2}
    assert out[2].n_exact == 3            # {1,2,3} pooled
    assert out[10].n_exact == 1           # day 2 is 8 days back -> excluded
    # merge monotonicity: pooling day 1 into day 2's window can only
    # LOWER the register sum (more users -> longer runs -> bigger 2^-M_j
    # terms removed), so the estimate is monotone in the pooled set.
    # (No accuracy envelope here: n << 2.5m is outside the raw-regime
    # contract q74 documents — tiny-n estimates are known-high.)
    assert out[2].register_sum <= min(out[1].register_sum, out[10].register_sum)
    assert all(r.hll_estimate > 0 for r in out.values())


def test_fuzzy_blocking_join_pairs_and_flags(spark, tmp_path):
    """Known vocabulary: only same-block pairs emit, edit distances are
    exact, the <=3 flag splits them, and n_parts weights count dup rows."""
    import pandas as pd

    from data_engineering_nd_spark.analytics import q91_fuzzy_blocking_join

    names = ["blue bolt", "blue bolt", "blue boltz", "blue rod", "red bolt"]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pd.DataFrame({"p_name": names})).write.parquet(
        str(sf / "part.parquet")
    )
    rows = {
        (r.name_a, r.name_b): r
        for r in q91_fuzzy_blocking_join(spark, str(sf)).collect()
    }
    # red bolt is alone in its block; no cross-block pairs ever
    assert set(rows) == {
        ("blue bolt", "blue boltz"),
        ("blue bolt", "blue rod"),
        ("blue boltz", "blue rod"),
    }
    r1 = rows[("blue bolt", "blue boltz")]
    assert (r1.edit_dist, r1.is_match, r1.n_parts_a, r1.n_parts_b) == (1, 1, 2, 1)
    assert rows[("blue bolt", "blue rod")].edit_dist == 3      # bolt -> rod
    assert rows[("blue bolt", "blue rod")].is_match == 1
    assert rows[("blue boltz", "blue rod")].edit_dist == 4
    assert rows[("blue boltz", "blue rod")].is_match == 0


def test_seasonal_anomaly_flags_planted_day(spark, tmp_path):
    """One DOW with a planted spike: median/MAD ignore it, the robust band
    flags exactly that day; a clean DOW reports zero anomalies."""
    import datetime

    import pandas as pd

    from data_engineering_nd_spark.analytics import q92_seasonal_anomaly

    rows = []
    oid = 0
    # Mondays (2024-01-01 is a Monday; Spark dow=2): 100,101,102,103,1000
    for i, price in enumerate([100.0, 101.0, 102.0, 103.0, 1000.0]):
        oid += 1
        rows.append((oid, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=7 * i), price))
    # Tuesdays (dow=3): flat 200s
    for i in range(4):
        oid += 1
        rows.append((oid, datetime.datetime(2024, 1, 2) + datetime.timedelta(days=7 * i), 200.0))
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    ).write.parquet(str(sf / "orders.parquet"))
    out = {r.dow: r for r in q92_seasonal_anomaly(spark, str(sf)).collect()}
    assert set(out) == {2, 3}
    mon = out[2]
    assert mon.n_days == 5
    assert mon.median_revenue == 102.0
    assert mon.mad == 1.0                      # adevs 2,1,0,1,898
    assert mon.n_anomalies == 1                # only the 1000.0 Monday
    tue = out[3]
    assert (tue.n_days, tue.mad, tue.n_anomalies) == (4, 0.0, 0)


def test_ab_ztest_closed_form(spark, tmp_path):
    """Hand-built user-days reproduce the textbook pooled z: counts,
    rates, z value and the significance decision."""
    import datetime
    import math

    import pandas as pd

    from data_engineering_nd_spark.analytics import q93_ab_conversion_ztest

    rows = []
    eid = 0
    # variant A (even users): 4 user-days, 3 convert; B (odd): 4 user-days, 1 converts
    plan = [
        (2, 1, True), (2, 2, True), (4, 1, True), (4, 2, False),
        (1, 1, True), (1, 2, False), (3, 1, False), (3, 2, False),
    ]
    for user, day, buys in plan:
        eid += 1
        ts = datetime.datetime(2024, 1, day, 9)
        rows.append((eid, ts, user, "view", 0.0))
        if buys:
            eid += 1
            rows.append((eid, ts, user, "purchase", 1.0))
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    ).write.parquet(str(sf / "events.parquet"))
    (r,) = q93_ab_conversion_ztest(spark, str(sf)).collect()
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (4, 3, 4, 1)
    assert r.rate_a == 0.75 and r.rate_b == 0.25
    p = 0.5
    z = (0.75 - 0.25) / math.sqrt(p * (1 - p) * (1 / 4 + 1 / 4))
    assert abs(r.z_score - round(z, 6)) < 2e-6
    assert r.significant == 0                  # |z| ~= 1.414 < 1.96


def test_intransit_sweep_line_counts(spark, tmp_path):
    """Hand-checkable intervals: in_transit(d) = shipped<=d minus
    received<=d with ship-inclusive / receipt-exclusive semantics."""
    import datetime

    import pandas as pd

    from data_engineering_nd_spark.analytics import q95_intransit_inventory

    sf = tmp_path / "sf"
    sf.mkdir()
    day = lambda n: datetime.datetime(2024, 1, n)
    # transit days = 1 + (orderkey + linenumber) % 14
    rows = [
        (1, 0, day(1)),   # ships d1, transit 2  -> receipt d3
        (13, 0, day(1)),  # ships d1, transit 14 -> receipt d15
        (1, 1, day(2)),   # ships d2, transit 3  -> receipt d5
    ]
    pdf = pd.DataFrame(
        rows, columns=["l_orderkey", "l_linenumber", "l_shipdate"]
    )
    # micros, not pandas-default nanos: lineitem loads without the
    # nanosAsLong conf (only the events table carries NANOS)
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    pdf.to_parquet(str(sf / "lineitem.parquet"))
    out = {
        r.day.date().isoformat(): r
        for r in q95_intransit_inventory(spark, str(sf)).collect()
    }
    assert out["2024-01-01"].shipped == 2
    assert out["2024-01-01"].in_transit == 2
    assert out["2024-01-02"].in_transit == 3
    assert out["2024-01-03"].received == 1 and out["2024-01-03"].in_transit == 2
    assert out["2024-01-05"].in_transit == 1
    assert out["2024-01-15"].in_transit == 0


def test_activity_streaks_islands(spark, tmp_path):
    """Longest run wins; earliest streak breaks ties; singletons count."""
    import datetime

    import pandas as pd

    from data_engineering_nd_spark.analytics import q96_activity_streaks

    sf = tmp_path / "sf"
    sf.mkdir()
    ts = lambda n, h=9: datetime.datetime(2024, 3, n, h)
    rows = []
    # user 1: days 1-3 (len 3) and days 10-11 (len 2) -> streak 3 @ d1
    for n in (1, 2, 3, 10, 11):
        rows.append((1000 + n, 1, ts(n), "click", 1.0))
    # user 2: two len-2 streaks (d5-6, d8-9) -> tie broken to d5
    for n in (5, 6, 8, 9):
        rows.append((2000 + n, 2, ts(n), "click", 1.0))
    # duplicate events on one day must not inflate the streak
    rows.append((3001, 2, ts(5, 20), "view", 1.0))
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    ).to_parquet(str(sf / "events.parquet"))
    out = {r.user_id: r for r in q96_activity_streaks(spark, str(sf)).collect()}
    assert out[1].streak_days == 3
    assert out[1].streak_start.date().isoformat() == "2024-03-01"
    assert out[2].streak_days == 2
    assert out[2].streak_start.date().isoformat() == "2024-03-05"


def test_rake_scores_degree_over_frequency(spark):
    """'deep learning' outranks a frequent singleton: degree rewards
    words that co-occur in long phrases; exact e6 integer scoring."""
    from data_engineering_nd_spark.operators.text_analysis import (
        rake_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "deep learning of the deep learning and compilers"),
            (2, "compilers and compilers and compilers"),
        ],
        "doc_id long, text string",
    )
    out = {r.phrase: r for r in rake_keywords(docs, "doc_id", "text").collect()}
    # freq(deep)=2 deg(deep)=4 -> 2.0; same for learning -> phrase 4.0
    assert out["deep learning"].score == 4.0
    assert out["deep learning"].n_occurrences == 2
    # compilers: freq 4, deg 4 -> 1.0 despite being the most frequent word
    assert out["compilers"].score == 1.0
    assert out["deep learning"].score > out["compilers"].score


def test_window_funnel_bound_and_order(spark, tmp_path):
    """Conversions outside the 72h window or out of step order must not
    count; in-window ordered conversions must."""
    import datetime

    import pandas as pd

    from data_engineering_nd_spark.analytics import q97_window_funnel

    sf = tmp_path / "sf"
    sf.mkdir()
    t0 = datetime.datetime(2024, 1, 1, 0)
    h = lambda n: t0 + datetime.timedelta(hours=n)
    rows = [
        # user 1: full funnel inside 72h
        (1, 1, h(0), "signup", 1.0), (2, 1, h(10), "view", 1.0),
        (3, 1, h(20), "purchase", 1.0),
        # user 2: view inside, purchase at hour 80 -> level 2 only
        (4, 2, h(0), "signup", 1.0), (5, 2, h(5), "view", 1.0),
        (6, 2, h(80), "purchase", 1.0),
        # user 3: purchase BEFORE view -> level 2 only
        (7, 3, h(0), "signup", 1.0), (8, 3, h(30), "view", 1.0),
        (9, 3, h(10), "purchase", 1.0),
        # user 4: view at hour 100 -> level 1 only
        (10, 4, h(0), "signup", 1.0), (11, 4, h(100), "view", 1.0),
        # user 5: never signs up -> not in funnel at all
        (12, 5, h(1), "view", 1.0), (13, 5, h(2), "purchase", 1.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    pdf.to_parquet(str(sf / "events.parquet"))
    out = {r.level: r for r in q97_window_funnel(spark, str(sf)).collect()}
    assert out[1].n_users == 4
    assert out[2].n_users == 3
    assert out[3].n_users == 1
    assert out[3].avg_hours_from_anchor == 20.0
    # level-2 mean: (10 + 5 + 30) / 3 = 15h
    assert out[2].avg_hours_from_anchor == 15.0


def test_market_basket_lift_arithmetic(spark, tmp_path):
    """Hand-checkable baskets: a pair that always co-occurs gets
    lift = n_baskets / (c_a * c_b) exactly; support floor drops rare
    pairs; duplicate lineitems of a brand count the basket once."""
    import pandas as pd

    from data_engineering_nd_spark.analytics import q100_market_basket_lift

    sf = tmp_path / "sf"
    sf.mkdir()
    li, pk = [], []
    # parts: brand X=1, Y=2, Z=3
    for pid, brand in ((1, "X"), (2, "Y"), (3, "Z")):
        pk.append((pid, f"Brand#{brand}"))
    # 12 baskets with X and Y together (plus a dup X line), 8 with only Z
    ln = 0
    for b in range(12):
        for pid in (1, 1, 2):
            ln += 1
            li.append((100 + b, pid, ln))
    for b in range(8):
        ln += 1
        li.append((500 + b, 3, ln))
    pd.DataFrame(li, columns=["l_orderkey", "l_partkey", "l_linenumber"]).to_parquet(
        str(sf / "lineitem.parquet")
    )
    pd.DataFrame(pk, columns=["p_partkey", "p_brand"]).to_parquet(
        str(sf / "part.parquet")
    )
    out = q100_market_basket_lift(spark, str(sf)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b) == ("Brand#X", "Brand#Y")
    assert r.c_ab == 12
    # support = 12/20, confidence = 12/12, lift = 12*20/(12*12)
    assert r.support == 0.6
    assert r.confidence == 1.0
    assert abs(r.lift - round(20 / 12, 6)) < 1e-9


def test_quantile_sketch_exact_below_capacity(spark, tmp_path):
    """A group smaller than the per-stratum capacity never compacts
    (every stride T_s = 1, merge stride S = 1): the sketch holds every
    row and the estimates are EXACT order statistics at the integer
    target ranks, with rank_error_bound = 0."""
    from data_engineering_nd_spark.analytics import (
        q101_grouped_quantiles_sketch,
    )

    n = 200  # < _QSK_C = 256
    rows = pd.DataFrame(
        {
            "l_returnflag": ["A"] * n,
            "l_linestatus": ["F"] * n,
            "l_extendedprice": [float(i) for i in range(1, n + 1)],
            "l_orderkey": list(range(1, n + 1)),
            "l_linenumber": [1] * n,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "lineitem", rows)
    out = {
        r.q_label: r
        for r in q101_grouped_quantiles_sketch(spark, str(sf)).collect()
    }
    assert set(out) == {"p50", "p90", "p99"}
    for r in out.values():
        assert r.n_group == n
        assert r.rank_error_bound == 0
        assert r.within_bound == 1
        # value AT the integer target rank of the 1..n identity data
        assert r.est_value == float(r.rank_target)
    assert out["p50"].rank_target == 100  # (200+1)//2
    assert out["p90"].rank_target == 180
    assert out["p99"].rank_target == 198


def test_quantile_sketch_bound_holds_above_capacity(spark, tmp_path):
    """A group far above capacity compacts in both stages; the exact
    rank of every estimate stays inside the published deterministic
    bound sum(T_s - 1) + S - 1 (asserted, not just flagged)."""
    from data_engineering_nd_spark.analytics import (
        q101_grouped_quantiles_sketch,
    )

    n = 20000
    rows = pd.DataFrame(
        {
            "l_returnflag": ["R"] * n,
            "l_linestatus": ["O"] * n,
            # non-uniform value distribution: squares
            "l_extendedprice": [float(i * i % 99991) for i in range(n)],
            "l_orderkey": list(range(1, n + 1)),
            "l_linenumber": [1] * n,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "lineitem", rows)
    for r in q101_grouped_quantiles_sketch(spark, str(sf)).collect():
        assert r.n_group == n
        assert r.within_bound == 1
        assert r.rank_lt <= r.rank_target - 1 + r.rank_error_bound
        assert r.rank_le >= r.rank_target - r.rank_error_bound
        # the bound itself is ~2n/c, not degenerate
        assert 0 < r.rank_error_bound < n // 40


def test_rolling_volatility_large_magnitudes_no_overflow(spark, tmp_path):
    """|value| ~ 1e7 makes SUM(v4*v4) and sx*sx exceed BIGINT; the wide
    exact accumulation (DECIMAL(38,0)) must keep the volatility finite,
    non-negative and equal to the numpy population stddev."""
    import numpy as np

    from data_engineering_nd_spark.analytics import q107_rolling_volatility

    n = 30
    vals = [1.0e7 + 1.0e6 * ((i * 37) % 11) for i in range(n)]
    rows = pd.DataFrame(
        {
            "event_type": ["big"] * n,
            "ts": [
                datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)
                for i in range(n)
            ],
            "event_id": list(range(n)),
            "value": vals,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "events", rows)
    out = q107_rolling_volatility(spark, str(sf)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_windows == n - 23
    v4 = np.array([np.floor(v * 10000 + 0.5) for v in vals])
    vols = [np.std(v4[i - 23 : i + 1]) / 10000.0 for i in range(23, n)]
    assert r.max_vol > 0 and np.isfinite(r.max_vol)
    assert abs(r.max_vol - max(vols)) < 1e-4
    assert abs(r.mean_vol - np.mean(
        [np.floor(v * 1e6 + 0.5) / 1e6 for v in vols]
    )) < 1e-4


def test_new_vs_returning_known_timeline(spark, tmp_path):
    from data_engineering_nd_spark.analytics import q110_new_vs_returning

    rows = pd.DataFrame(
        {
            "event_id": range(6),
            "user_id": [1, 1, 2, 1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:00",  # u1 new d1 (once)
                 "2024-01-02 10:00",                       # u2 new d2
                 "2024-01-02 12:00",                       # u1 returning d2
                 "2024-01-03 10:00",                       # u2 returning d3
                 "2024-01-03 11:00"]                       # u3 new d3
            ),
            "event_type": ["view"] * 6,
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "events", rows)
    out = {str(r.day)[:10]: (r.n_new, r.n_returning)
           for r in q110_new_vs_returning(spark, str(sf)).collect()}
    assert out == {"2024-01-01": (1, 0), "2024-01-02": (1, 1),
                   "2024-01-03": (1, 1)}


def test_event_path_trigrams_known_sequence(spark, tmp_path):
    from data_engineering_nd_spark.analytics import q109_event_path_trigrams

    rows = pd.DataFrame(
        {
            "event_id": range(5),
            "user_id": [1] * 5,
            "ts": pd.to_datetime(
                [f"2024-01-01 10:0{i}" for i in range(5)]
            ),
            "event_type": ["a", "b", "a", "b", "a"],
            "value": [1.0] * 5,
            "props": ["{}"] * 5,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "events", rows)
    out = {r.path: (r.n_paths, r.rnk)
           for r in q109_event_path_trigrams(spark, str(sf)).collect()}
    assert out == {"a>b>a": (2, 1), "b>a>b": (1, 2)}


def test_modal_priority_deterministic_tie_break(spark, tmp_path):
    """Tied counts resolve to the SMALLEST priority string; share is
    exact integer-division e6."""
    from data_engineering_nd_spark.analytics import q124_modal_order_priority

    rows = pd.DataFrame(
        {
            "o_orderstatus": ["O"] * 4 + ["F"] * 4,
            "o_orderdate": [datetime.date(1995, 3, 1)] * 8,
            "o_orderpriority": [
                "1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH",
                "3-MEDIUM", "3-MEDIUM", "3-MEDIUM", "2-HIGH",
            ],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "orders", rows)
    out = {
        (r.orderstatus, r.order_year): r
        for r in q124_modal_order_priority(spark, str(sf)).collect()
    }
    tied = out[("O", 1995)]
    assert tied.modal_priority == "1-URGENT"  # tie -> smallest wins
    assert tied.modal_count == 2 and tied.total_rows == 4
    assert tied.modal_share_e6 == 500000
    maj = out[("F", 1995)]
    assert maj.modal_priority == "3-MEDIUM"
    assert maj.modal_share_e6 == 750000


def test_chi2_closed_form_2x2(spark, tmp_path):
    """A hand-computed 2x2 contingency table: chi2 = 20/3, V = 1/3."""
    from data_engineering_nd_spark.analytics import q125_chi2_priority_status

    cells = (
        [("A", "X")] * 10 + [("A", "Y")] * 20
        + [("B", "X")] * 20 + [("B", "Y")] * 10
    )
    rows = pd.DataFrame(
        {
            "o_orderstatus": [f for f, _ in cells],
            "o_orderpriority": [m for _, m in cells],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "orders", rows)
    (r,) = q125_chi2_priority_status(spark, str(sf)).collect()
    assert r.n_rows == 60 and r.dof == 1
    # each cell term = (o*n - r*c)^2/(n*r*c) = 90000/54000 = 5/3;
    # e12 snap floor(5/3*1e12 + 0.5) = 1666666666667, x4 cells
    assert r.chi2_e6 == 6666666
    # V = sqrt((20/3)/60) = 1/3
    assert r.cramers_v_e6 == 333333


def test_quartile_dispersion_null_guard_and_exact_cuts(spark, tmp_path):
    """Negative-midhinge nation yields NULL dispersion; a positive one
    lands the exact crossing quartiles."""
    from data_engineering_nd_spark.analytics import (
        q126_acctbal_dispersion_by_nation,
    )

    rows = pd.DataFrame(
        {
            "c_custkey": range(8),
            "c_nationkey": [0] * 4 + [1] * 4,
            "c_acctbal": [-100.0, -50.0, 10.0, 20.0,
                          10.0, 20.0, 30.0, 40.0],
        }
    )
    nat = pd.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["NEG", "POS"],
         "n_regionkey": [0, 0]}
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "customer", rows)
    _write(spark, sf, "nation", nat)
    out = {
        r.nation: r
        for r in q126_acctbal_dispersion_by_nation(spark, str(sf)).collect()
    }
    neg = out["NEG"]
    assert (neg.q1_cents, neg.q3_cents) == (-10000, 1000)
    assert neg.dispersion_e6 is None  # q3 + q1 <= 0
    pos = out["POS"]
    assert (pos.q1_cents, pos.q3_cents) == (1000, 3000)
    assert pos.iqr_cents == 2000
    assert pos.dispersion_e6 == 500000


def test_trimmed_winsorized_mean_brute_force(spark, tmp_path):
    """Selector-derived trimmed/winsorized means equal the sorted-list
    brute force on a duplicate-heavy crafted column."""
    from data_engineering_nd_spark.analytics import (
        q127_trimmed_winsorized_mean,
    )

    # 37 values, heavy ties at both tails (t = 3)
    cents = ([100] * 5 + [250] * 4 + list(range(300, 2300, 100))
             + [5000] * 5 + [9900] * 3)
    rows = pd.DataFrame({"l_extendedprice": [c / 100 for c in cents]})
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "lineitem", rows)
    (r,) = q127_trimmed_winsorized_mean(spark, str(sf)).collect()
    v = sorted(cents, reverse=True)
    n = len(v)
    t = n // 10
    mid = v[t : n - t]
    assert r.n_rows == n and r.t_trim == t
    assert r.hi_cut_cents == v[t]       # value at descending rank t+1
    assert r.lo_cut_cents == v[n - t - 1]  # value at descending rank n-t
    assert r.mean_e6 == sum(v) * 1_000_000 // n
    assert r.trimmed_mean_e6 == sum(mid) * 1_000_000 // len(mid)
    win = sum(mid) + t * v[t] + t * v[n - t - 1]
    assert r.winsorized_mean_e6 == win * 1_000_000 // n


def test_trimmed_mean_degenerates_to_plain_mean_below_ten_rows(
    spark, tmp_path
):
    """t == 0: trimmed and winsorized collapse to the plain mean and
    the cut columns are NULL."""
    from data_engineering_nd_spark.analytics import (
        q127_trimmed_winsorized_mean,
    )

    rows = pd.DataFrame({"l_extendedprice": [1.0, 2.0, 4.0]})
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "lineitem", rows)
    (r,) = q127_trimmed_winsorized_mean(spark, str(sf)).collect()
    assert (r.n_rows, r.t_trim) == (3, 0)
    assert r.lo_cut_cents is None and r.hi_cut_cents is None
    mean = (100 + 200 + 400) * 1_000_000 // 3
    assert r.mean_e6 == r.trimmed_mean_e6 == r.winsorized_mean_e6 == mean


def test_correlation_matrix_closed_form(spark, tmp_path):
    """Hand-computed correlations: perfect fit, perfect anti-fit,
    r = 0.5, and NULL for a zero-variance column."""
    from data_engineering_nd_spark.analytics import q128_correlation_matrix

    rows = pd.DataFrame(
        {
            # cents/e4 scalings map these to exact small integers
            "l_quantity": [0.01, 0.02, 0.03],        # x = 1, 2, 3
            "l_extendedprice": [0.01, 0.03, 0.02],   # y = 1, 3, 2
            "l_discount": [0.0002, 0.0004, 0.0006],  # z = 2x
            "l_tax": [0.0005, 0.0005, 0.0005],       # constant
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(spark, sf, "lineitem", rows)
    out = {
        (r.var_a, r.var_b): r.r_e6
        for r in q128_correlation_matrix(spark, str(sf)).collect()
    }
    assert len(out) == 6
    # x vs y: r = 3/sqrt(6*6) = 0.5
    assert out[("extendedprice", "quantity")] == 500000
    # z = 2x: perfect fit
    assert out[("discount", "quantity")] == 1000000
    # y vs z: same ranks as y vs x -> 0.5
    assert out[("discount", "extendedprice")] == 500000
    # constant tax: no defined correlation
    assert out[("quantity", "tax")] is None
    assert out[("extendedprice", "tax")] is None
    assert out[("discount", "tax")] is None


def test_correlation_matrix_empty_input(spark, tmp_path):
    """Zero-row lineitem: 6 rows, zero count, NULL correlations — the
    oracle's NULL-arithmetic fall-through shape."""
    from data_engineering_nd_spark.analytics import q128_correlation_matrix

    rows = pd.DataFrame(
        {
            "l_quantity": pd.Series([], dtype="float64"),
            "l_extendedprice": pd.Series([], dtype="float64"),
            "l_discount": pd.Series([], dtype="float64"),
            "l_tax": pd.Series([], dtype="float64"),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    _write(
        spark, sf, "lineitem", rows,
        schema="l_quantity double, l_extendedprice double, "
               "l_discount double, l_tax double",
    )
    got = q128_correlation_matrix(spark, str(sf)).collect()
    assert len(got) == 6
    assert all(r.n_rows == 0 and r.r_e6 is None for r in got)
