"""io.py: format-pluggable readers/writers (S2/S3/S9/S10)."""

from __future__ import annotations

from data_engineering_nd_spark import io


def test_csv_default_and_semicolon_delimiter(spark, tmp_path):
    # S2: comma CSV with header; S3: ';' delimiter (the demographics file)
    p1 = tmp_path / "a.csv"
    p1.mkdir()
    (p1 / "part.csv").write_text("ident,name\nJFK,Kennedy\nLAX,Los Angeles\n")
    df1 = io.read(spark, str(p1), "csv")
    assert df1.columns == ["ident", "name"] and df1.count() == 2

    p2 = tmp_path / "b.csv"
    p2.mkdir()
    (p2 / "part.csv").write_text("City;State Code;Count\nDallas;TX;100\n")
    df2 = io.read(spark, str(p2), "csv", delimiter=";")
    assert df2.columns == ["City", "State Code", "Count"] and df2.count() == 1


def test_csv_sink_roundtrip_with_append(spark, tmp_path):
    # S10: csv writer (header, overwrite/append) round-trips through io.read
    src = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    out = str(tmp_path / "out_csv")
    res = io.write(src, out, fmt="csv")
    assert res.rows == 2
    io.write(src, out, fmt="csv", mode="append")
    back = io.read(spark, out, "csv")
    assert back.count() == 4
    assert set(back.columns) == {"k", "v"}


def test_read_many_tolerates_schema_drift(spark, tmp_path):
    # U1/U2: by-name union with a missing column in one monthly shard
    a, b = str(tmp_path / "m1"), str(tmp_path / "m2")
    spark.createDataFrame([(1, "x")], ["k", "v"]).write.parquet(a)
    spark.createDataFrame([(2,)], ["k"]).write.parquet(b)
    df = io.read_many(spark, [a, b])
    assert df.count() == 2
    assert set(df.columns) == {"k", "v"}
    # drifted column is NULL-filled, not silently position-matched
    assert df.filter("v IS NULL").count() == 1


def test_upsert_parquet_is_key_idempotent(spark, tmp_path):
    from data_engineering_nd_spark.io import upsert_parquet

    out = str(tmp_path / "ups")
    first = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    upsert_parquet(first, out, ["k"])
    # re-running the same load adds nothing; a genuinely new key appends
    second = spark.createDataFrame([(2, "b"), (3, "c")], ["k", "v"])
    upsert_parquet(second, out, ["k"])
    upsert_parquet(second, out, ["k"])  # retry of the retry
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert {r.k for r in back.collect()} == {1, 2, 3}


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob

    from data_engineering_nd_spark.io import compact_parquet

    out = str(tmp_path / "frag")
    df = spark.range(1000).withColumnRenamed("id", "k")
    df.repartition(24).write.parquet(out)
    assert len(glob.glob(out + "/part-*")) == 24
    compact_parquet(spark, out, target_partitions=2)
    assert len(glob.glob(out + "/part-*")) == 2
    assert spark.read.parquet(out).count() == 1000
