"""Property tests for the exact-selector library operator
(operators/selectors.py, VERDICT r12 task #5): shift-histogram rank
selection vs sorted ground truth at adversarial distributions, tail
count/sum exactness, the salted rank lower bound, and the quota cut."""

import pytest

import pyspark.sql.functions as F

from data_engineering_nd_spark.operators.selectors import (
    exact_ranks_grouped,
    exact_ranks,
    exact_ranks_with_tails,
    rank_lower_bound,
    salt_count_for,
    select_quota,
)


def _truth(vals: list[int], k: int) -> tuple[int, int, int]:
    """(k-th largest, count > it, sum > it) from a plain sort."""
    s = sorted(vals, reverse=True)
    t = s[k - 1]
    gt = [v for v in vals if v > t]
    return t, len(gt), sum(gt)


DISTRIBUTIONS = {
    # every value identical: one bucket, resolved in a single pass,
    # tails all zero
    "all_equal": [42] * 100,
    # two-point mass: ranks on both sides of the step and on it
    "two_point": [-7] * 60 + [10**9] * 40,
    # heavy tail: a few enormous values over a dense low cluster
    "heavy_tail": list(range(200)) + [10**12, 10**15, 10**18 - 1],
    # adversarial gaps + duplicates + negatives (the cf3f5bb fixture)
    "gaps_dups": (
        [5] * 40 + [7] * 3 + list(range(100, 200, 7))
        + [10**12, 10**12 - 1, -(10**9)] + [0] * 5
    ),
    # dense consecutive: every bucket boundary exercised at sbits=0
    "dense": list(range(-50, 50)),
}


@pytest.mark.parametrize("dist", sorted(DISTRIBUTIONS))
def test_exact_ranks_match_sorted_truth(spark, dist):
    vals = DISTRIBUTIONS[dist]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    n = len(vals)
    ks = sorted({1, 2, n // 3, n // 2, n - 1, n})
    got = exact_ranks_with_tails(df, {"x": ks})
    for k, tail in zip(ks, got["x"]):
        t, cnt, sm = _truth(vals, k)
        assert tail.value == t, (dist, k)
        assert tail.cnt_gt == cnt, (dist, k)
        assert tail.sum_gt == sm, (dist, k)


def test_exact_ranks_multi_column_shared_passes(spark):
    vals = DISTRIBUTIONS["gaps_dups"]
    df = spark.createDataFrame([(v,) for v in vals], "x long").withColumn(
        "y", F.col("x") * -1
    )
    truth_x = sorted(vals, reverse=True)
    truth_y = sorted([-v for v in vals], reverse=True)
    got = exact_ranks(df, {"x": [5, 44], "y": [2, 10, len(vals)]})
    assert got["x"] == [truth_x[4], truth_x[43]]
    assert got["y"] == [truth_y[1], truth_y[9], truth_y[-1]]


def test_exact_ranks_duplicate_and_unsorted_ranks(spark):
    vals = DISTRIBUTIONS["two_point"]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    s = sorted(vals, reverse=True)
    got = exact_ranks(df, {"x": [40, 1, 40, 41]})
    assert got["x"] == [s[39], s[0], s[39], s[40]]


def test_exact_ranks_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(v,) for v in [None, 10, None, 5, 1]], "x long"
    )
    # ranks are over the 3 non-null values
    assert exact_ranks(df, {"x": [1, 3]})["x"] == [10, 1]
    with pytest.raises(ValueError, match="exceeds the non-null"):
        exact_ranks(df, {"x": [4]})


def test_exact_ranks_empty_input_raises(spark):
    df = spark.createDataFrame([], "x long")
    with pytest.raises(ValueError, match="empty input"):
        exact_ranks(df, {"x": [1]})


def test_exact_ranks_narrow_bits_terminate(spark):
    """A 1-bit-per-pass budget still terminates and stays exact —
    the structural guarantee that replaced the probe-starvation
    hazard (ADVICE r12)."""
    vals = DISTRIBUTIONS["heavy_tail"]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = exact_ranks(df, {"x": [3]}, bits_per_pass=1)
    assert got["x"] == [sorted(vals, reverse=True)[2]]


def test_select_quota_skewed_sizes():
    # 3 salts of 1 row + 1 salt of 97: a fixed ceil(k/4) cut of 3
    # yields only 3+3=6 < 10 rows; the quota cut must grow to 7
    sizes = [1, 1, 1, 97]
    m = select_quota(sizes, 10)
    assert sum(min(s, m) for s in sizes) >= 10
    assert sum(min(s, m - 1) for s in sizes) < 10


def test_salt_count_for_scales_and_clamps():
    assert salt_count_for(0) == 64
    assert salt_count_for(100_000) == 64
    assert salt_count_for(10_000_000) == 256
    assert salt_count_for(10**12) == 4096
    for n in (1, 10**6, 10**9):
        s = salt_count_for(n)
        assert s & (s - 1) == 0  # power of two


def test_rank_lower_bound_is_exact_lower_bound(spark):
    vals = DISTRIBUTIONS["gaps_dups"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "c long, x long"
    )
    s = sorted(vals, reverse=True)
    for k in (1, 5, 40, len(vals)):
        b = rank_lower_bound(df, "x", "c", k, len(vals))
        assert b <= s[k - 1], k
        # the bound admits at least k candidates (superset filter)
        assert sum(1 for v in vals if v >= b) >= k, k


def test_exact_ranks_full_int64_span(spark):
    """xxhash64-like values spanning more than half the int64 domain:
    the absolute-shift bucketing must not overflow (a raw x - lo
    wraps), and results stay exact."""
    vals = [-(2**62) - 7, -(2**61), -12345, 0, 99, 2**61 + 3,
            2**62 + 11, 2**62 + 11, 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    s = sorted(vals, reverse=True)
    got = exact_ranks_with_tails(df, {"x": [1, 3, 5, len(vals)]})
    for k, tail in zip([1, 3, 5, len(vals)], got["x"]):
        t = s[k - 1]
        assert tail.value == t, k
        assert tail.cnt_gt == sum(1 for v in vals if v > t), k
        assert tail.sum_gt == sum(v for v in vals if v > t), k


def test_exact_ranks_bounds_are_hints(spark):
    """Caller bounds need only satisfy count(x > hi) < k <=
    count(x >= lo) — the documented prefilter contract: rows above hi
    fold into the first pass's tail bucket, so a narrowed window
    resolves the same value and tails as a full-range start."""
    vals = [10, 8, 5, 3]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    # k=2 with hi=8 < max=10: count(x > 8) = 1 < 2 — legal hint
    t = exact_ranks_with_tails(df, {"x": [2]}, bounds={"x": (3, 8)})
    assert t["x"][0] == (8, 1, 10)
    # degenerate single-value window with rows above it
    t = exact_ranks_with_tails(df, {"x": [2]}, bounds={"x": (8, 8)})
    assert t["x"][0] == (8, 1, 10)
    # k=4 with a window that excludes the two largest
    t = exact_ranks_with_tails(df, {"x": [4]}, bounds={"x": (3, 5)})
    assert t["x"][0] == (3, 3, 23)
    # a rank NOT satisfiable within the bounds raises
    with pytest.raises(ValueError, match="exceeds the non-null"):
        exact_ranks(df, {"x": [5]}, bounds={"x": (3, 8)})


def test_exact_ranks_grouped_match_sorted_truth(spark):
    """Per-group rank selection vs per-group sorted ground truth,
    including multi-rank groups, uneven group sizes and negatives."""
    import random

    rng = random.Random(11)
    rows = []
    data = {}
    for g in range(6):
        vals = [rng.randint(-10**9, 10**12) for _ in range(30 + g * 17)]
        if g == 2:
            vals = [7] * 40  # all-equal group
        data[g] = vals
        rows.extend((g, v) for v in vals)
    df = spark.createDataFrame(rows, "g int, x long")
    wanted = {g: [1, len(data[g]) // 2, len(data[g])] for g in data}
    got = exact_ranks_grouped(df, "g", "x", wanted)
    for g, ks in wanted.items():
        s = sorted(data[g], reverse=True)
        for k, tail in zip(ks, got[g]):
            t = s[k - 1]
            assert tail.value == t, (g, k)
            assert tail.cnt_gt == sum(1 for v in data[g] if v > t)
            assert tail.sum_gt == sum(v for v in data[g] if v > t)


def test_exact_ranks_grouped_subset_and_nulls(spark):
    """Groups absent from wanted are ignored; NULL values never enter
    a histogram; string group keys work (map-literal lookup)."""
    rows = [("a", 10), ("a", None), ("a", 5), ("b", 99), ("c", 1)]
    df = spark.createDataFrame(rows, "g string, x long")
    got = exact_ranks_grouped(df, "g", "x", {"a": [1, 2], "b": [1]})
    assert [t.value for t in got["a"]] == [10, 5]
    assert got["b"][0] == (99, 0, 0)
    assert "c" not in got
    with pytest.raises(ValueError, match="exceeds group"):
        exact_ranks_grouped(df, "g", "x", {"a": [3]})


def test_exact_ranks_grouped_bounds_are_hints(spark):
    rows = [(1, v) for v in [10, 8, 5, 3]]
    df = spark.createDataFrame(rows, "g int, x long")
    got = exact_ranks_grouped(
        df, "g", "x", {1: [2]}, bounds={1: (3, 8)}
    )
    assert got[1][0] == (8, 1, 10)


def test_exact_ranks_grouped_weighted_median(spark):
    """Weighted selection: rank thresholds are cumulative-WEIGHT mass
    from the top; the weighted median (k = tot // 2 + 1) matches the
    brute-force smallest v with 2 * weight(x > v) <= tot, including
    tie-heavy and skew-weighted groups."""
    import random

    rng = random.Random(5)
    data = {
        0: [(v, rng.randint(1, 50)) for v in
            [10, 10, 10, 20, 30, 30, 40]],
        1: [(7, 1000), (8, 1), (9, 1)],          # one dominant mass
        2: [(v, 1) for v in range(100)],          # uniform weights
    }
    rows = [(g, v, w) for g, vw in data.items() for v, w in vw]
    df = spark.createDataFrame(rows, "g int, x long, w long")
    tots = {g: sum(w for _, w in vw) for g, vw in data.items()}
    got = exact_ranks_grouped(
        df, "g", "x", {g: [tots[g] // 2 + 1] for g in data},
        weight_col="w",
    )
    for g, vw in data.items():
        tot = tots[g]
        med = min(
            v for v, _ in vw
            if 2 * sum(w2 for v2, w2 in vw if v2 > v) <= tot
        )
        tail = got[g][0]
        assert tail.value == med, g
        assert tail.cnt_gt == sum(w for v, w in vw if v > med), g
        assert tail.sum_gt == sum(v * w for v, w in vw if v > med), g


def test_exact_ranks_grouped_null_weights_excluded(spark):
    """NULL weights are excluded exactly like NULL values: an
    all-NULL-weight bucket contributes no rows (not a NULL mass that
    would crash the driver fold), a mixed bucket drops only the
    NULL-weight rows, and ranks run over the remaining mass."""
    rows = [(1, 5, None), (1, 7, 2), (1, 9, 1)]
    df = spark.createDataFrame(rows, "g int, x long, w long")
    got = exact_ranks_grouped(df, "g", "x", {1: [2]}, weight_col="w")
    # mass from the top: 9 (w=1), 7 (w=2) -> threshold 2 lands on 7
    assert got[1][0].value == 7
    assert got[1][0].cnt_gt == 1
    with pytest.raises(ValueError, match="exceeds group"):
        exact_ranks_grouped(df, "g", "x", {1: [4]}, weight_col="w")


def test_exact_ranks_weighted_ungrouped(spark):
    """Ungrouped weighted selection (VERDICT r13 task #3) vs brute
    force: rank k is a cumulative-weight threshold from the top,
    cnt_gt is the exact weight strictly above, sum_gt the exact
    sum of x * w strictly above."""
    import random

    rng = random.Random(3)
    vw = [(v, rng.randint(1, 40)) for v in
          [10, 10, 20, 20, 20, 35, -5, 0, 7]]
    df = spark.createDataFrame(vw, "x long, w long")
    tot = sum(w for _, w in vw)
    for k in (1, tot // 3, tot // 2 + 1, tot):
        got = exact_ranks_with_tails(
            df, {"x": [k]}, weight_col="w"
        )["x"][0]
        med = min(
            v for v, _ in vw
            if sum(w2 for v2, w2 in vw if v2 > v) < k
        )
        assert got.value == med, k
        assert got.cnt_gt == sum(w for v, w in vw if v > med), k
        assert got.sum_gt == sum(v * w for v, w in vw if v > med), k


def test_exact_ranks_weighted_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(5, None), (7, 2), (9, 1)], "x long, w long"
    )
    got = exact_ranks_with_tails(df, {"x": [2]}, weight_col="w")
    assert got["x"][0].value == 7
    with pytest.raises(ValueError, match="exceeds the non-null"):
        exact_ranks_with_tails(df, {"x": [4]}, weight_col="w")


def test_exact_ranks_from_totals_median(spark):
    """Deferred ranks (VERDICT r13 task #4): the rank threshold is a
    function of the total mass discovered by the first pass — no
    separate stats job; totals come back exact."""
    from data_engineering_nd_spark.operators.selectors import (
        exact_ranks_from_totals,
    )

    vals = DISTRIBUTIONS["gaps_dups"]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    sel = exact_ranks_from_totals(
        df, {"x": lambda tot: [(tot + 1) // 2, 1, tot]}
    )["x"]
    n = len(vals)
    assert sel.total_mass == n
    assert sel.total_sum == sum(vals)
    s = sorted(vals, reverse=True)
    assert [t.value for t in sel.tails] == [
        s[(n + 1) // 2 - 1], s[0], s[-1]
    ]


def test_exact_ranks_from_totals_weighted(spark):
    from data_engineering_nd_spark.operators.selectors import (
        exact_ranks_from_totals,
    )

    vw = [(7, 1000), (8, 1), (9, 1)]
    df = spark.createDataFrame(vw, "x long, w long")
    sel = exact_ranks_from_totals(
        df, {"x": lambda tot: [tot // 2 + 1]}, weight_col="w"
    )["x"]
    assert sel.total_mass == 1002
    assert sel.total_sum == 7 * 1000 + 8 + 9
    assert sel.tails[0].value == 7
    assert sel.tails[0].cnt_gt == 2


def test_exact_ranks_from_totals_empty_ranks_skip(spark):
    from data_engineering_nd_spark.operators.selectors import (
        exact_ranks_from_totals,
    )

    df = spark.createDataFrame([(1,), (2,)], "x long")
    sel = exact_ranks_from_totals(df, {"x": lambda tot: []})["x"]
    assert sel.total_mass == 2 and sel.tails == []


def test_exact_ranks_grouped_from_totals(spark):
    """Grouped deferred ranks: discovery finds groups, totals, null
    counts; per-group medians match brute force; a [] callable skips
    bisection but still reports totals (the q121 NULLS-LAST shape)."""
    from data_engineering_nd_spark.operators.selectors import (
        exact_ranks_grouped_from_totals,
    )

    rows = (
        [(1, v) for v in [10, 3, 7, None, 5]]
        + [(2, v) for v in [100, 200]]
        + [(3, None), (3, None)]
    )
    df = spark.createDataFrame(rows, "g int, x long")
    got = exact_ranks_grouped_from_totals(
        df,
        "g",
        "x",
        lambda g, nn, nl: (
            [( nn + nl + 1) // 2] if (nn + nl + 1) // 2 <= nn else []
        ),
    )
    assert set(got) == {1, 2, 3}
    assert got[1].total_mass == 4 and got[1].null_rows == 1
    # upper-median rank over 5 rows NULLS LAST = rank 3 of [10,7,5,3]
    assert got[1].tails[0].value == 5
    assert got[2].total_mass == 2 and got[2].tails[0].value == 200
    assert got[3].total_mass == 0 and got[3].null_rows == 2
    assert got[3].tails == []


def test_exact_ranks_grouped_from_totals_weighted(spark):
    from data_engineering_nd_spark.operators.selectors import (
        exact_ranks_grouped_from_totals,
    )

    data = {
        0: [(10, 3), (20, 2), (30, 1)],
        1: [(7, 1000), (8, 1), (9, 1)],
    }
    rows = [(g, v, w) for g, vw in data.items() for v, w in vw]
    df = spark.createDataFrame(rows, "g int, x long, w long")
    got = exact_ranks_grouped_from_totals(
        df, "g", "x", lambda g, tot, _: [tot // 2 + 1],
        weight_col="w",
    )
    for g, vw in data.items():
        tot = sum(w for _, w in vw)
        assert got[g].total_mass == tot
        med = min(
            v for v, _ in vw
            if 2 * sum(w2 for v2, w2 in vw if v2 > v) <= tot
        )
        assert got[g].tails[0].value == med, g


def test_rank_lower_bound_empty_raises(spark):
    """ADVICE r13: empty input raises a documented ValueError, not a
    bare max()-arg crash."""
    df = spark.createDataFrame([], "c long, x long")
    with pytest.raises(ValueError, match="empty input"):
        rank_lower_bound(df, "x", "c", 1, 0)
    with pytest.raises(ValueError, match="empty input"):
        select_quota([], 1)


def test_selector_pass_plans_have_no_generate_or_window(spark):
    """ADVICE r13: the registered selector queries return driver-built
    literal frames, so their fingerprints (0 exchanges / 0 scans)
    cannot observe the selector's real distributed work.  This guard
    fingerprints the PASS frames themselves: a single-column ungrouped
    pass and every grouped pass must stay a plain project + hash-agg —
    no Generate (the pre-r14 explode broke whole-stage codegen every
    pass), no Window, no Sort, and at most the one aggregate exchange."""
    from data_engineering_nd_spark.operators.selectors import (
        _grouped_pass_frame,
        _mass_exprs,
        _sbits,
        _ungrouped_pass_frame,
    )

    df = spark.createDataFrame(
        [(g, v, 1) for g in (0, 1) for v in range(50)],
        "g int, x long, w long",
    )

    def physical(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    # grouped maps-driven pass, weighted, 2 slots (divergent windows)
    mk = lambda vals: F.create_map(
        *[l for g, v in vals.items() for l in (F.lit(g), F.lit(v))]
    )
    slot_maps = [
        (mk({0: 0}), mk({0: 30}), mk({0: 0}), mk({0: 0}), {0: 0}),
        (mk({1: 5}), mk({1: 45}), mk({1: 0}), mk({1: 5}), {1: 0}),
    ]
    _, _, aggs = _mass_exprs(F.col("x"), "w", True)
    frame = _grouped_pass_frame(
        df, "g", "x", slot_maps, False, "w", True
    ).groupBy("slot", "g", "b").agg(*aggs)
    plan = physical(frame)
    for bad in ("Generate", "Window", "Sort"):
        assert bad not in plan, (bad, plan)
    assert plan.count("Exchange") <= 1, plan

    # ungrouped single-column pass through the REAL frame builder the
    # engine uses (a regression reintroducing the pre-r14 explode in
    # the len(parts)==1 path would surface here as a Generate node)
    windows = {("x", 0, 49): 0}
    sbits = {0: _sbits(0, 49, 14)}
    _, _, aggs1 = _mass_exprs(F.col("x").cast("long"), None, True)
    frame2 = _ungrouped_pass_frame(
        df, windows, sbits, True, None, True
    ).groupBy("wid", "b").agg(*aggs1)
    plan2 = physical(frame2)
    for bad in ("Generate", "Window", "Sort"):
        assert bad not in plan2, (bad, plan2)
    assert plan2.count("Exchange") <= 1, plan2
    # the multi-COLUMN pass is the one documented Generate user
    windows3 = {("x", 0, 49): 0, ("w", 0, 10): 1}
    sbits3 = {0: 0, 1: 0}
    frame3 = _ungrouped_pass_frame(
        df, windows3, sbits3, True, None, False
    )
    assert "Generate" in physical(frame3)
