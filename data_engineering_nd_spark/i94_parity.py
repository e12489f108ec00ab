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

import re

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


def synth_airport_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier -> airport-codes-shaped CSV frame (all-string columns, like
    the reference's header-only CSV read). Coordinates are assembled from
    integer text so Spark and DuckDB produce byte-identical strings."""
    s = load(spark, "supplier", sf_dir)
    k = F.col("s_suppkey")
    return s.select(
        F.concat(F.lit("AP"), k.cast("string")).alias("ident"),
        F.when(k % 3 == 0, F.lit("small_airport"))
        .when(k % 3 == 1, F.lit("heliport"))
        .otherwise(F.lit("closed"))
        .alias("type"),
        F.col("s_name").alias("name"),
        (k % 5000).cast("string").alias("elevation_ft"),
        F.lit("NA").alias("continent"),
        F.when(k % 4 == 0, F.lit("US")).otherwise(F.lit("MX")).alias("iso_country"),
        F.when(k % 4 == 0, F.concat(F.lit("US-S"), (k % 45).cast("string")))
        .otherwise(F.concat(F.lit("MX-S"), (k % 30).cast("string")))
        .alias("iso_region"),
        F.concat(F.lit("CITY"), (k % 100).cast("string")).alias("municipality"),
        F.concat(F.lit("G"), k.cast("string")).alias("gps_code"),
        F.when(k % 2 == 0, F.concat(F.lit("I"), (k % 900).cast("string")))
        .otherwise(F.lit(None))
        .alias("iata_code"),
        F.concat(F.lit("L"), k.cast("string")).alias("local_code"),
        F.concat(
            ((k % 180) - 90).cast("string"),
            F.lit(".5, "),
            ((k % 360) - 180).cast("string"),
            F.lit(".25"),
        ).alias("coordinates"),
    )


_AIRPORT_RAW_CTE = """
    raw AS (
        SELECT
            'AP' || CAST(s_suppkey AS VARCHAR) AS ident,
            CASE WHEN s_suppkey % 3 = 0 THEN 'small_airport'
                 WHEN s_suppkey % 3 = 1 THEN 'heliport'
                 ELSE 'closed' END AS type,
            s_name AS name,
            CAST(s_suppkey % 5000 AS VARCHAR) AS elevation_ft,
            'NA' AS continent,
            CASE WHEN s_suppkey % 4 = 0 THEN 'US' ELSE 'MX' END AS iso_country,
            CASE WHEN s_suppkey % 4 = 0 THEN 'US-S' || CAST(s_suppkey % 45 AS VARCHAR)
                 ELSE 'MX-S' || CAST(s_suppkey % 30 AS VARCHAR) END AS iso_region,
            'CITY' || CAST(s_suppkey % 100 AS VARCHAR) AS municipality,
            'G' || CAST(s_suppkey AS VARCHAR) AS gps_code,
            CASE WHEN s_suppkey % 2 = 0 THEN 'I' || CAST(s_suppkey % 900 AS VARCHAR)
                 ELSE NULL END AS iata_code,
            'L' || CAST(s_suppkey AS VARCHAR) AS local_code,
            CAST((s_suppkey % 180) - 90 AS VARCHAR) || '.5, '
                || CAST((s_suppkey % 360) - 180 AS VARCHAR) || '.25' AS coordinates
        FROM supplier
    )
"""


@query(
    "i94_airports_build",
    oracle=f"""
    WITH {_AIRPORT_RAW_CTE}
    SELECT DISTINCT
        ident AS airport_id,
        type AS airport_type,
        name AS airport_name,
        elevation_ft,
        continent,
        iso_country,
        iso_region,
        CASE WHEN iso_region LIKE 'US-%' THEN string_split(iso_region, '-')[2]
             ELSE NULL END AS us_state,
        municipality,
        gps_code,
        iata_code,
        local_code,
        CAST(string_split(coordinates, ',')[1] AS DOUBLE) AS latitude,
        CAST(string_split(coordinates, ',')[2] AS DOUBLE) AS longitude
    FROM raw
    """,
)
def i94_airports_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transforms.i94_airports(synth_airport_codes(spark, sf_dir))


def synth_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> us-cities-demographics-shaped frame, INCLUDING the
    reference CSV's spaced column names (exercises the backtick-identifier
    path F8 end-to-end). State-level values derive from the state key alone
    so the states builder's DISTINCT collapses city rows, like the real
    file; city/race rows vary per customer."""
    c = load(spark, "customer", sf_dir)
    k = F.col("c_custkey")
    st = F.col("c_nationkey") % 40
    return c.select(
        F.concat(F.lit("City"), (k % 60).cast("string")).alias("City"),
        F.concat(F.lit("State"), st.cast("string")).alias("State"),
        F.concat(((st % 30) + 20).cast("string"), F.lit(".5")).alias("Median Age"),
        ((st * 13791) % 500000).cast("string").alias("Male Population"),
        ((st * 17231) % 500000).cast("string").alias("Female Population"),
        ((st * 731) % 50000).cast("string").alias("Number of Veterans"),
        ((st * 977) % 100000).cast("string").alias("Foreign-born"),
        F.concat(F.lit("2."), ((st % 9) + 1).cast("string")).alias(
            "Average Household Size"
        ),
        F.concat(F.lit("S"), st.cast("string")).alias("State Code"),
        F.when(k % 5 == 0, F.lit("Asian"))
        .when(k % 5 == 1, F.lit("White"))
        .when(k % 5 == 2, F.lit("Black or African-American"))
        .when(k % 5 == 3, F.lit("Hispanic or Latino"))
        .otherwise(F.lit("American Indian and Alaska Native"))
        .alias("Race"),
        ((k * 37) % 90000).cast("string").alias("Count"),
    )


_DEMO_RAW_CTE = """
    raw AS (
        SELECT
            'City' || CAST(c_custkey % 60 AS VARCHAR) AS "City",
            'State' || CAST(c_nationkey % 40 AS VARCHAR) AS "State",
            CAST(((c_nationkey % 40) % 30) + 20 AS VARCHAR) || '.5' AS "Median Age",
            CAST(((c_nationkey % 40) * 13791) % 500000 AS VARCHAR) AS "Male Population",
            CAST(((c_nationkey % 40) * 17231) % 500000 AS VARCHAR) AS "Female Population",
            CAST(((c_nationkey % 40) * 731) % 50000 AS VARCHAR) AS "Number of Veterans",
            CAST(((c_nationkey % 40) * 977) % 100000 AS VARCHAR) AS "Foreign-born",
            '2.' || CAST(((c_nationkey % 40) % 9) + 1 AS VARCHAR) AS "Average Household Size",
            'S' || CAST(c_nationkey % 40 AS VARCHAR) AS "State Code",
            CASE WHEN c_custkey % 5 = 0 THEN 'Asian'
                 WHEN c_custkey % 5 = 1 THEN 'White'
                 WHEN c_custkey % 5 = 2 THEN 'Black or African-American'
                 WHEN c_custkey % 5 = 3 THEN 'Hispanic or Latino'
                 ELSE 'American Indian and Alaska Native' END AS "Race",
            CAST((c_custkey * 37) % 90000 AS VARCHAR) AS "Count"
        FROM customer
    )
"""


@query(
    "i94_states_demographic_build",
    oracle=f"""
    WITH {_DEMO_RAW_CTE}
    SELECT DISTINCT
        "State" AS state,
        CAST("Median Age" AS DOUBLE) AS median_age,
        CAST("Male Population" AS INTEGER) AS male_population,
        CAST("Female Population" AS INTEGER) AS female_population,
        CAST("Number of Veterans" AS INTEGER) AS num_veterans,
        CAST("Foreign-born" AS INTEGER) AS num_foreign_born,
        CAST("Average Household Size" AS DOUBLE) AS avg_household_size,
        "State Code" AS state_code
    FROM raw
    """,
)
def i94_states_demographic_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transforms.i94_us_states_demographic(synth_demographics(spark, sf_dir))


@query(
    "i94_cities_demographic_build",
    oracle=f"""
    WITH {_DEMO_RAW_CTE}
    SELECT
        upper("City") AS city,
        "Race" AS race,
        CAST("Count" AS INTEGER) AS population
    FROM raw
    """,
)
def i94_cities_demographic_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transforms.i94_us_cities_demographic(synth_demographics(spark, sf_dir))


# ---------------------------------------------------------------------------
# dictionary dims under the gate: a representative labels file (same proc-
# format shape as I94_SAS_Labels_Descriptions.SAS, incl. duplicate keys and
# embedded-comma ports) parsed by the real parser; the oracle is the
# expected VALUES list. Exercises: ';' section split, first-wins dedup,
# quote stripping, last-comma city/state split.
# ---------------------------------------------------------------------------
_LABELS_SAMPLE = """libname library 'path';
value i94yr 2016 = '2016' ;
value i94cntyl
   582 =  'MEXICO Air Sea, and Not Reported (I-94, no land arrivals)'
   236 =  'AFGHANISTAN'
   101 =  'ALBANIA'
   236 =  'DUPLICATE-LOSES'
;
value $i94prtl
   'ALC' = 'ALCAN, AK'
   'ANC' = 'ANCHORAGE, AK'
   'GPM' = 'GEN M. ESCOBEDO, Monterrey, MX'
   'NOL' = 'NO PORT CODE'
;
value i94model
   1 = 'Air'
   2 = 'Sea'
   3 = 'Land'
   9 = 'Not reported'
;
value i94addrl
   'AK' = 'ALASKA'
   'TX' = 'TEXAS'
;
value i94visa
   1 = 'Business'
   2 = 'Pleasure'
   3 = 'Student'
;"""


@query(
    "i94_dictionary_build",
    oracle="""
    SELECT * FROM (VALUES
        ('countries', '582', 'MEXICO Air Sea, and Not Reported (I-94, no land arrivals)', NULL),
        ('countries', '236', 'AFGHANISTAN', NULL),
        ('countries', '101', 'ALBANIA', NULL),
        ('ports', 'ALC', 'ALCAN', 'AK'),
        ('ports', 'ANC', 'ANCHORAGE', 'AK'),
        ('ports', 'GPM', 'GEN M. ESCOBEDO, Monterrey', 'MX'),
        ('ports', 'NOL', 'NO PORT CODE', NULL),
        ('mode', '1', 'Air', NULL),
        ('mode', '2', 'Sea', NULL),
        ('mode', '3', 'Land', NULL),
        ('mode', '9', 'Not reported', NULL),
        ('states', 'AK', 'ALASKA', NULL),
        ('states', 'TX', 'TEXAS', NULL),
        ('visa', '1', 'Business', NULL),
        ('visa', '2', 'Pleasure', NULL),
        ('visa', '3', 'Student', NULL)
    ) AS t(dim, key, value, state_code)
    """,
)
def i94_dictionary_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_nd_spark.dictionary import dictionary_frames

    frames = dictionary_frames(spark, _LABELS_SAMPLE)
    tagged = []
    for tag, name, key_col, val_col in (
        ("countries", "i94_countries", "country_id", "country_name"),
        ("mode", "i94_travel_mode", "mode_id", "mode_name"),
        ("states", "i94_state_mapping", "state_code", "state_name"),
        ("visa", "i94_visa", "visa_id", "visa_purpose"),
    ):
        tagged.append(
            frames[name].select(
                F.lit(tag).alias("dim"),
                F.col(key_col).alias("key"),
                F.col(val_col).alias("value"),
                F.lit(None).cast("string").alias("state_code"),
            )
        )
    tagged.append(
        frames["i94_port_state_mapping"].select(
            F.lit("ports").alias("dim"),
            F.col("i94_port").alias("key"),
            F.col("city").alias("value"),
            "state_code",
        )
    )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


# ---------------------------------------------------------------------------
# End-to-end pipeline run under the gate (VERDICT r06 #3): exercise the
# actual extract -> transform -> load -> DQ runner (pipeline.run — the
# reference's Airflow-driven path, i94_run_etl_dag.py:343-388 /
# etl.py:754-821) against the parity fixtures written to disk in their real
# formats, then checksum WHAT LANDED.  One row per table:
# (table_name, row_count, content_checksum, dq_pass).
# ---------------------------------------------------------------------------

#: per-table checksum column recipes over the LANDED schema.
#: kinds: s = string, i = integral, d = date/timestamp, f = double.
#: i94_trips excludes trip_id (xxhash64 content key — no DuckDB mirror; its
#: determinism/null-freeness is pinned in tests/test_transforms.py instead).
_PIPELINE_CHECKSUM_COLS: dict[str, list[tuple[str, str]]] = {
    "i94_immigrations": [
        ("custom_client_id", "s"), ("i94_year", "i"), ("i94_month", "i"),
        ("i94_port", "s"), ("mode_of_entry", "i"), ("visa_post", "s"),
        ("arrival_flag", "s"), ("departure_flag", "s"), ("update_flag", "s"),
        ("match_flag", "s"), ("i94_entry_date", "d"), ("i94_valid_till", "d"),
    ],
    "i94_trips": [
        ("custom_client_id", "s"), ("admissions_number", "s"),
        ("i94_year", "i"), ("i94_month", "i"), ("arrived_country_id", "s"),
        ("resident_country_id", "s"), ("arrival_date", "d"),
        ("departure_date", "d"), ("flight_id", "s"), ("visa_id", "s"),
        ("visa_category", "s"), ("i94_port", "s"), ("state_code", "s"),
        ("mode_of_entry", "i"),
    ],
    "i94_visitors": [
        ("admissions_number", "s"), ("i94_year", "i"), ("i94_month", "i"),
        ("occupation", "s"), ("resident_country_id", "s"),
        ("birth_year", "i"), ("gender", "s"),
    ],
    "i94_flights": [("flight_id", "s"), ("airline", "s")],
    "i94_dates": [
        ("i94_year", "i"), ("i94_month", "i"), ("arrival_date", "d"),
        ("year", "i"), ("month", "i"), ("day", "i"), ("dayofweek", "i"),
        ("is_weekend", "s"),
    ],
    "i94_airports": [
        ("airport_id", "s"), ("airport_type", "s"), ("airport_name", "s"),
        ("elevation_ft", "s"), ("continent", "s"), ("iso_country", "s"),
        ("iso_region", "s"), ("us_state", "s"), ("municipality", "s"),
        ("gps_code", "s"), ("iata_code", "s"), ("local_code", "s"),
        ("latitude", "f"), ("longitude", "f"),
    ],
    "i94_us_states_demographic": [
        ("state", "s"), ("median_age", "f"), ("male_population", "i"),
        ("female_population", "i"), ("num_veterans", "i"),
        ("num_foreign_born", "i"), ("avg_household_size", "f"),
        ("state_code", "s"),
    ],
    "i94_us_cities_demographic": [
        ("city", "s"), ("race", "s"), ("population", "i"),
    ],
}

#: maps a landed table to the registered builder-oracle that recomputes its
#: expected content from the fixture arithmetic (single source of truth —
#: the pipeline oracle embeds these registered SQL bodies as CTEs).
_PIPELINE_TABLE_ORACLES: dict[str, str] = {
    "i94_immigrations": "i94_immigrations_build",
    "i94_trips": "i94_trips_build",
    "i94_visitors": "i94_visitors_build",
    "i94_flights": "i94_flights_build",
    "i94_dates": "i94_dates_build",
    "i94_airports": "i94_airports_build",
    "i94_us_states_demographic": "i94_states_demographic_build",
    "i94_us_cities_demographic": "i94_cities_demographic_build",
}

#: SQL-mirrorable slice of pipeline.DEFAULT_PK_CHECKS (trip_id is a
#: never-null xxhash64 key; the Spark side's real null_audit covers it, the
#: oracle asserts the mirrorable PK columns).
_PIPELINE_DQ_COLS: dict[str, list[str]] = {
    "i94_trips": ["custom_client_id"],
    "i94_immigrations": ["custom_client_id"],
    "i94_visitors": ["admissions_number"],
    "i94_flights": ["flight_id"],
}


def _checksum_digest_spark(cols: list[tuple[str, str]]):
    """48->40-bit md5-prefix digest of the rendered row; summed per table it
    is an order-insensitive content checksum that stays inside BIGINT far
    past sf1 (row_count * 2^40)."""
    rendered = []
    for name, kind in cols:
        c = F.col(f"`{name}`")
        if kind == "i":
            c = c.cast("string")
        elif kind == "d":
            c = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        elif kind == "f":
            c = c.cast("decimal(18,4)").cast("string")
        rendered.append(F.coalesce(c, F.lit("~N~")))
    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    return md5_prefix_long(F.concat_ws("|", *rendered))


def _checksum_digest_sql(cols: list[tuple[str, str]]) -> str:
    rendered = []
    for name, kind in cols:
        c = f'"{name}"'
        if kind == "i":
            c = f"CAST({c} AS VARCHAR)"
        elif kind == "d":
            c = f"strftime(CAST({c} AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')"
        elif kind == "f":
            c = f"CAST(CAST({c} AS DECIMAL(18,4)) AS VARCHAR)"
        rendered.append(f"COALESCE({c}, '~N~')")
    from data_engineering_nd_spark.functions.hashing import (
        sql_md5_prefix_long,
    )

    args = ",\n                ".join(rendered)
    return sql_md5_prefix_long("concat_ws('|',\n                " + args + ")")


def _rebase_onto_slice(sql: str) -> str:
    """Rewrite table references ``FROM/JOIN orders`` → ``orders_slice``.

    Word-boundary regex, not plain ``str.replace``: ``JOIN orders`` must
    rebase too, and a hypothetical future ``orders_raw`` table must be
    left alone (ADVICE r07 — the old textual surgery would have produced
    ``orders_slice_raw`` and silently scanned the unsliced view)."""
    return re.sub(r"\b(FROM|JOIN)(\s+)orders\b", r"\1\2orders_slice", sql)


def _register_pipeline_oracle() -> None:
    from data_engineering_nd_spark.registry import ORACLE_SQL

    ctes, selects = [], []
    for table, oracle_name in _PIPELINE_TABLE_ORACLES.items():
        # the builder oracles read the full `orders` view; the pipeline
        # fixture is the 1/3 slice, so the embedded bodies are rebased
        # onto the slice CTE (a CTE cannot shadow its own base view)
        body = _rebase_onto_slice(ORACLE_SQL[oracle_name].strip())
        ctes.append(f"t_{table} AS (\n{body}\n)")
        dq_cols = _PIPELINE_DQ_COLS.get(table)
        dq = (
            "(COUNT(*) FILTER (WHERE "
            + " OR ".join(f'"{c}" IS NULL' for c in dq_cols)
            + ") = 0)"
            if dq_cols
            else "TRUE"
        )
        digest = _checksum_digest_sql(_PIPELINE_CHECKSUM_COLS[table])
        selects.append(
            f"""SELECT '{table}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS row_count,
           CAST(SUM({digest}) AS BIGINT) AS content_checksum,
           {dq} AS dq_pass
    FROM t_{table}"""
        )
    # deterministic 1/3 orders slice, SHADOWING the base view so every
    # embedded builder-oracle CTE sees the same fixture the Spark side
    # feeds the runner (the slice commutes with the synthesis: cicid is
    # o_orderkey). Keeps the E2E run SF-proportional but bench-bounded.
    slice_cte = (
        "orders_slice AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0)"
    )
    ORACLE_SQL["i94_pipeline_run"] = (
        "WITH "
        + ",\n    ".join([slice_cte, *ctes])
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
    )


@query("i94_pipeline_run")  # oracle registered below (generated from the
                            # builder oracles — single source of truth)
def i94_pipeline_run_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline.run() under the value-hash gate: the fixtures are
    WRITTEN TO DISK in the reference's real input formats (raw i94 parquet,
    airport-codes comma CSV, demographics ';' CSV — etl.py:739-740,
    799-807), the runner extracts/builds/loads all 8 tables into a scratch
    warehouse with the production layout (partitioned facts), runs the PK
    null audit on what landed, and the query checksums the LANDED files —
    so the parquet/CSV round-trip, the partitioned write, and the DQ gate
    are all inside the verified surface, not just the builders.

    The 8-row result is localCheckpoint-ed (it is the audit artifact, not a
    data path) so the scratch warehouse can be deleted eagerly."""
    import os
    import shutil
    import tempfile
    from functools import reduce

    from data_engineering_nd_spark import io as engine_io
    from data_engineering_nd_spark import pipeline

    work = tempfile.mkdtemp(prefix="i94_pipeline_run_")
    try:
        raw_path = os.path.join(work, "i94_raw")
        # deterministic 1/3 slice (cicid == o_orderkey, so this equals
        # slicing orders before synthesis — the oracle shadows the orders
        # view with the same predicate); keeps the heaviest registered
        # query SF-proportional without losing any pipeline surface
        synth_i94_raw(spark, sf_dir).filter(
            F.col("cicid") % 3 == 0
        ).write.mode("overwrite").parquet(raw_path)
        ap_path = os.path.join(work, "airport_codes")
        synth_airport_codes(spark, sf_dir).write.mode("overwrite").option(
            "header", "true"
        ).csv(ap_path)
        demo_path = os.path.join(work, "demographics")
        synth_demographics(spark, sf_dir).write.mode("overwrite").option(
            "header", "true"
        ).option("sep", ";").csv(demo_path)

        out_dir = os.path.join(work, "warehouse")
        res = pipeline.run(
            spark,
            [raw_path],
            out_dir,
            raw_fmt="parquet",
            airport_codes_path=ap_path,
            demographics_path=demo_path,
            valid_years=_YEARS,
        )

        per_table = []
        for table in sorted(_PIPELINE_CHECKSUM_COLS):
            landed = engine_io.read(spark, res.tables[table].path)
            digest = _checksum_digest_spark(_PIPELINE_CHECKSUM_COLS[table])
            audit = res.quality.get(table)
            per_table.append(
                landed.agg(
                    F.count(F.lit(1)).cast("bigint").alias("row_count"),
                    F.sum(digest).cast("bigint").alias("content_checksum"),
                ).select(
                    F.lit(table).alias("table_name"),
                    "row_count",
                    "content_checksum",
                    F.lit(audit.ok if audit is not None else True).alias(
                        "dq_pass"
                    ),
                )
            )
        return reduce(
            lambda a, b: a.unionByName(b), per_table
        ).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


_register_pipeline_oracle()
