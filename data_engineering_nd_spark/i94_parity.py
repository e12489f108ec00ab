"""Driver-facing oracle checks for the reference-parity i94 table builders.

``transforms.py`` holds the reference's 13 table builders (etl.py:161-376)
as pure DataFrame functions; pytest covers them on golden fixtures. These
queries additionally put the builders under the driver's DuckDB value-hash
gate: a raw i94-shaped frame (the 28-col SAS schema subset the builders
read, FIXTURES.md §5) is synthesized DETERMINISTICALLY from `orders` —
identical arithmetic on both engines — duplicated ~25% to exercise the
dedup path, then run through the real builders.

trip_id is excluded from the trips check: it is a Spark xxhash64 content
key with no DuckDB equivalent; its determinism is pinned by
tests/test_transforms.py::test_trip_id_deterministic instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark import transforms
from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.registry import query

# orders dates span 1992-1998 (+90 days reaches 1999)
_YEARS = tuple(range(1992, 2000))
_YEARS_SQL = tuple(str(y) for y in _YEARS)


def synth_i94_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> raw i94 frame (SAS-typed: doubles + strings), with a
    duplicated 25% slice so dropDuplicates has real work."""
    o = load(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    od = F.to_date("o_orderdate")
    arr = F.datediff(od, F.to_date(F.lit("1960-01-01")))
    base = o.select(
        k.cast("double").alias("cicid"),
        (k * 13 % 1000000000).cast("double").alias("admnum"),
        F.lit(2016.0).alias("i94yr"),
        F.month(od).cast("double").alias("i94mon"),
        (F.col("o_custkey") % 300).cast("double").alias("i94cit"),
        (F.col("o_custkey") % 250).cast("double").alias("i94res"),
        F.concat(F.lit("P"), (k % 50).cast("string")).alias("i94port"),
        arr.cast("double").alias("arrdate"),
        F.when(k % 7 == 0, F.lit(None))
        .otherwise((arr + k % 30))
        .cast("double")
        .alias("depdate"),
        (k % 4 + 1).cast("double").alias("i94mode"),
        F.when(k % 5 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("S"), (k % 45).cast("string")))
        .alias("i94addr"),
        (k % 3 + 1).cast("double").alias("i94visa"),
        F.concat(F.lit("V"), (k % 5).cast("string")).alias("visatype"),
        F.when(k % 10 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("FL"), (k % 500).cast("string")))
        .alias("fltno"),
        F.concat(F.lit("AL"), (k % 20).cast("string")).alias("airline"),
        F.when(k % 6 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("VP"), (k % 10).cast("string")))
        .alias("visapost"),
        F.when(k % 3 == 0, F.lit("G"))
        .when(k % 3 == 1, F.lit("Z"))
        .otherwise(F.lit("T"))
        .alias("entdepa"),
        F.when(k % 2 == 0, F.lit("O")).otherwise(F.lit(None)).alias("entdepd"),
        F.lit(None).cast("string").alias("entdepu"),
        F.when(k % 2 == 0, F.lit("M")).otherwise(F.lit(None)).alias("matflag"),
        F.when(k % 11 == 0, F.lit("STU")).otherwise(F.lit(None)).alias("occup"),
        (F.lit(1950) + k % 60).cast("double").alias("biryear"),
        F.when(k % 3 == 0, F.lit("M"))
        .when(k % 3 == 1, F.lit("F"))
        .otherwise(F.lit(None))
        .alias("gender"),
        F.date_format(od, "yyyyMMdd").alias("dtadfile"),
        F.when(k % 9 == 0, F.lit("D/S"))
        .otherwise(F.date_format(F.date_add(od, 90), "MMddyyyy"))
        .alias("dtaddto"),
    )
    return base.unionAll(base.filter(F.col("cicid") % 4 == 0))


# The same synthesis in DuckDB SQL, verbatim arithmetic.
_RAW_CTE = """
    base AS (
        SELECT
            CAST(o_orderkey AS DOUBLE) AS cicid,
            CAST(o_orderkey * 13 % 1000000000 AS DOUBLE) AS admnum,
            2016.0 AS i94yr,
            CAST(month(CAST(o_orderdate AS DATE)) AS DOUBLE) AS i94mon,
            CAST(o_custkey % 300 AS DOUBLE) AS i94cit,
            CAST(o_custkey % 250 AS DOUBLE) AS i94res,
            'P' || CAST(o_orderkey % 50 AS VARCHAR) AS i94port,
            CAST(datediff('day', DATE '1960-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS arrdate,
            CASE WHEN o_orderkey % 7 = 0 THEN NULL
                 ELSE CAST(datediff('day', DATE '1960-01-01', CAST(o_orderdate AS DATE))
                           + o_orderkey % 30 AS DOUBLE) END AS depdate,
            CAST(o_orderkey % 4 + 1 AS DOUBLE) AS i94mode,
            CASE WHEN o_orderkey % 5 = 0 THEN NULL
                 ELSE 'S' || CAST(o_orderkey % 45 AS VARCHAR) END AS i94addr,
            CAST(o_orderkey % 3 + 1 AS DOUBLE) AS i94visa,
            'V' || CAST(o_orderkey % 5 AS VARCHAR) AS visatype,
            CASE WHEN o_orderkey % 10 = 0 THEN NULL
                 ELSE 'FL' || CAST(o_orderkey % 500 AS VARCHAR) END AS fltno,
            'AL' || CAST(o_orderkey % 20 AS VARCHAR) AS airline,
            CASE WHEN o_orderkey % 6 = 0 THEN NULL
                 ELSE 'VP' || CAST(o_orderkey % 10 AS VARCHAR) END AS visapost,
            CASE WHEN o_orderkey % 3 = 0 THEN 'G'
                 WHEN o_orderkey % 3 = 1 THEN 'Z' ELSE 'T' END AS entdepa,
            CASE WHEN o_orderkey % 2 = 0 THEN 'O' ELSE NULL END AS entdepd,
            CAST(NULL AS VARCHAR) AS entdepu,
            CASE WHEN o_orderkey % 2 = 0 THEN 'M' ELSE NULL END AS matflag,
            CASE WHEN o_orderkey % 11 = 0 THEN 'STU' ELSE NULL END AS occup,
            CAST(1950 + o_orderkey % 60 AS DOUBLE) AS biryear,
            CASE WHEN o_orderkey % 3 = 0 THEN 'M'
                 WHEN o_orderkey % 3 = 1 THEN 'F' ELSE NULL END AS gender,
            strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS dtadfile,
            CASE WHEN o_orderkey % 9 = 0 THEN 'D/S'
                 ELSE strftime(CAST(o_orderdate AS DATE) + 90, '%m%d%Y') END AS dtaddto
        FROM orders
    ),
    raw AS (
        SELECT * FROM base
        UNION ALL
        SELECT * FROM base WHERE cicid % 4 = 0
    )
"""


@query(
    "i94_trips_build",
    oracle=f"""
    WITH {_RAW_CTE},
    dedup AS (SELECT DISTINCT * FROM raw)
    SELECT DISTINCT
        CAST(CAST(cicid AS INTEGER) AS VARCHAR) AS custom_client_id,
        CAST(CAST(admnum AS INTEGER) AS VARCHAR) AS admissions_number,
        CAST(i94yr AS INTEGER) AS i94_year,
        CAST(i94mon AS INTEGER) AS i94_month,
        CAST(CAST(i94cit AS INTEGER) AS VARCHAR) AS arrived_country_id,
        CAST(CAST(i94res AS INTEGER) AS VARCHAR) AS resident_country_id,
        CAST(DATE '1960-01-01' + CAST(arrdate AS INTEGER) AS TIMESTAMP) AS arrival_date,
        CAST(DATE '1960-01-01' + CAST(depdate AS INTEGER) AS TIMESTAMP) AS departure_date,
        CAST(fltno AS VARCHAR) AS flight_id,
        CAST(CAST(i94visa AS INTEGER) AS VARCHAR) AS visa_id,
        visatype AS visa_category,
        i94port AS i94_port,
        i94addr AS state_code,
        CAST(i94mode AS INTEGER) AS mode_of_entry
    FROM dedup
    """,
)
def i94_trips_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips = transforms.i94_trips(synth_i94_raw(spark, sf_dir))
    return trips.drop("trip_id").withColumns(
        {
            "arrival_date": F.col("arrival_date").cast("timestamp_ntz"),
            "departure_date": F.col("departure_date").cast("timestamp_ntz"),
        }
    )


@query(
    "i94_immigrations_build",
    oracle=f"""
    WITH {_RAW_CTE},
    subset AS (
        SELECT DISTINCT cicid, i94yr, i94mon, i94port, i94mode, visapost,
                        entdepa, entdepd, entdepu, matflag, dtadfile, dtaddto
        FROM raw
    )
    SELECT
        CAST(CAST(cicid AS INTEGER) AS VARCHAR) AS custom_client_id,
        CAST(i94yr AS INTEGER) AS i94_year,
        CAST(i94mon AS INTEGER) AS i94_month,
        i94port AS i94_port,
        CAST(i94mode AS INTEGER) AS mode_of_entry,
        visapost AS visa_post,
        entdepa AS arrival_flag,
        entdepd AS departure_flag,
        entdepu AS update_flag,
        matflag AS match_flag,
        CASE
            WHEN substr(dtadfile, 1, 4) IN {_YEARS_SQL}
                THEN CAST(CAST(try_strptime(dtadfile, '%Y%m%d') AS DATE) AS TIMESTAMP)
            WHEN right(dtadfile, 4) IN {_YEARS_SQL}
                THEN CAST(CAST(try_strptime(dtadfile, '%m%d%Y') AS DATE) AS TIMESTAMP)
            ELSE NULL
        END AS i94_entry_date,
        CASE
            WHEN substr(dtaddto, 1, 4) IN {_YEARS_SQL}
                THEN CAST(CAST(try_strptime(dtaddto, '%Y%m%d') AS DATE) AS TIMESTAMP)
            WHEN right(dtaddto, 4) IN {_YEARS_SQL}
                THEN CAST(CAST(try_strptime(dtaddto, '%m%d%Y') AS DATE) AS TIMESTAMP)
            ELSE NULL
        END AS i94_valid_till
    FROM subset
    """,
)
def i94_immigrations_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    imm = transforms.i94_immigrations(
        synth_i94_raw(spark, sf_dir), valid_years=_YEARS
    )
    return imm.withColumns(
        {
            "i94_entry_date": F.col("i94_entry_date").cast("timestamp_ntz"),
            "i94_valid_till": F.col("i94_valid_till").cast("timestamp_ntz"),
        }
    )


@query(
    "i94_visitors_build",
    oracle=f"""
    WITH {_RAW_CTE}
    SELECT DISTINCT
        CAST(CAST(admnum AS INTEGER) AS VARCHAR) AS admissions_number,
        CAST(i94yr AS INTEGER) AS i94_year,
        CAST(i94mon AS INTEGER) AS i94_month,
        occup AS occupation,
        CAST(CAST(i94res AS INTEGER) AS VARCHAR) AS resident_country_id,
        CAST(biryear AS INTEGER) AS birth_year,
        gender
    FROM raw
    """,
)
def i94_visitors_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transforms.i94_visitors(synth_i94_raw(spark, sf_dir))


@query(
    "i94_flights_build",
    oracle=f"""
    WITH {_RAW_CTE}
    SELECT DISTINCT
        CAST(fltno AS VARCHAR) AS flight_id,
        airline
    FROM raw
    WHERE fltno IS NOT NULL
    """,
)
def i94_flights_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transforms.i94_flights(synth_i94_raw(spark, sf_dir))


@query(
    "i94_dates_build",
    oracle=f"""
    WITH {_RAW_CTE},
    dedup AS (SELECT DISTINCT * FROM raw),
    trips AS (
        SELECT DISTINCT
            CAST(i94yr AS INTEGER) AS i94_year,
            CAST(i94mon AS INTEGER) AS i94_month,
            DATE '1960-01-01' + CAST(arrdate AS INTEGER) AS arrival_date
        FROM dedup
    )
    SELECT DISTINCT
        i94_year,
        i94_month,
        CAST(arrival_date AS TIMESTAMP) AS arrival_date,
        year(arrival_date) AS year,
        month(arrival_date) AS month,
        day(arrival_date) AS day,
        dayofweek(arrival_date) + 1 AS dayofweek,
        CASE WHEN dayofweek(arrival_date) IN (0, 6)
             THEN 'weekend' ELSE 'weekday' END AS is_weekend
    FROM trips
    """,
)
def i94_dates_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips = transforms.i94_trips(synth_i94_raw(spark, sf_dir))
    return transforms.i94_dates(trips).withColumn(
        "arrival_date", F.col("arrival_date").cast("timestamp_ntz")
    )
