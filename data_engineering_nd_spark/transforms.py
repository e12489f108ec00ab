"""The reference's 13 modeled tables (SURVEY.md §1.1) as pure
DataFrame -> DataFrame builders.

Source parity: Capstone/scripts/etl.py — i94_immigrations (:161-193),
i94_trips (:195-228), i94_visitors (:230-256), i94_flights (:258-281),
i94_airports (:283-311), i94_us_states_demographic (:313-335),
i94_us_cities_demographic (:337-353), i94_dates (:355-376); dictionary dims
in dictionary.py.

Documented divergences from the shipped reference (intended-semantics fixes,
SURVEY.md §7.4):
- trip_id is a content-derived xxhash64 key, not monotonically_increasing_id
  (etl.py:204) — reproducible across runs/partitionings.
- date parsing is native (functions/dates.py), and `i94_valid_till` actually
  parses (the shipped change_date_format UDF, etl.py:142-159, returns NULL
  for every row due to a str-vs-int year comparison).
- column-name typos fixed: depature_date -> departure_date,
  airpot_name -> airport_name (kept consistently engine-wide).
- i94_trips carries the FK columns the reference's model diagram promises
  but its SQL omits (i94_port, state_code, mode_of_entry) so the analytics
  layer can actually join the star (Capstone/README.md:44-67).

All builders are lazy logical-plan constructors; nothing executes here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_nd_spark.functions.dates import flexible_date, sas_date, weekend_flag
from data_engineering_nd_spark.functions.hashing import content_key

# The 12-of-28 projection the reference applies before building
# i94_immigrations (etl.py:751-753).
IMMIGRATION_COLS = [
    "cicid",
    "i94yr",
    "i94mon",
    "i94port",
    "i94mode",
    "visapost",
    "entdepa",
    "entdepd",
    "entdepu",
    "matflag",
    "dtadfile",
    "dtaddto",
]


def _int_str(col: str) -> F.Column:
    """The reference's surrogate-key idiom STRING(INT(x)) for SAS doubles
    (etl.py:173,210...)."""
    return F.col(col).cast("int").cast("string")


def i94_immigrations(
    raw: DataFrame,
    cols: Sequence[str] = tuple(IMMIGRATION_COLS),
    valid_years: Sequence[int] = (2016,),
) -> DataFrame:
    """Per-entry immigration administrative dimension."""
    return (
        raw.select(*cols)
        .dropDuplicates()
        .select(
            _int_str("cicid").alias("custom_client_id"),
            F.col("i94yr").cast("int").alias("i94_year"),
            F.col("i94mon").cast("int").alias("i94_month"),
            F.col("i94port").alias("i94_port"),
            F.col("i94mode").cast("int").alias("mode_of_entry"),
            F.col("visapost").alias("visa_post"),
            F.col("entdepa").alias("arrival_flag"),
            F.col("entdepd").alias("departure_flag"),
            F.col("entdepu").alias("update_flag"),
            F.col("matflag").alias("match_flag"),
            # dtadfile is yyyyMMdd, dtaddto is MMddyyyy; both flow through the
            # format-disambiguating kernel (junk like 'D/S' -> NULL).
            flexible_date("dtadfile", valid_years).alias("i94_entry_date"),
            flexible_date("dtaddto", valid_years).alias("i94_valid_till"),
        )
    )


def i94_trips(raw: DataFrame) -> DataFrame:
    """The fact table: one row per deduplicated I94 record."""
    deduped = raw.dropDuplicates()
    return deduped.select(
        # content-derived PK over the natural key (record id + admission no +
        # period) — deterministic, unlike the reference's
        # monotonically_increasing_id.
        content_key(
            F.col("cicid"), F.col("admnum"), F.col("i94yr"), F.col("i94mon")
        ).cast("string").alias("trip_id"),
        _int_str("cicid").alias("custom_client_id"),
        _int_str("admnum").alias("admissions_number"),
        F.col("i94yr").cast("int").alias("i94_year"),
        F.col("i94mon").cast("int").alias("i94_month"),
        _int_str("i94cit").alias("arrived_country_id"),
        _int_str("i94res").alias("resident_country_id"),
        sas_date("arrdate").alias("arrival_date"),
        sas_date("depdate").alias("departure_date"),
        F.col("fltno").cast("string").alias("flight_id"),
        _int_str("i94visa").alias("visa_id"),
        F.col("visatype").cast("string").alias("visa_category"),
        # FKs promised by the model diagram (README.md:44-67) but missing
        # from the shipped SQL:
        F.col("i94port").alias("i94_port"),
        F.col("i94addr").alias("state_code"),
        F.col("i94mode").cast("int").alias("mode_of_entry"),
    ).dropDuplicates()


def i94_visitors(raw: DataFrame) -> DataFrame:
    """Visitor demographic dimension keyed on admissions_number."""
    return raw.select(
        _int_str("admnum").alias("admissions_number"),
        F.col("i94yr").cast("int").alias("i94_year"),
        F.col("i94mon").cast("int").alias("i94_month"),
        F.col("occup").alias("occupation"),
        _int_str("i94res").alias("resident_country_id"),
        F.col("biryear").cast("int").alias("birth_year"),
        F.col("gender"),
    ).dropDuplicates()


def i94_flights(raw: DataFrame) -> DataFrame:
    """Flight dimension: distinct (flight, airline), null flight numbers
    filtered (etl.py:274-275)."""
    return (
        raw.filter(F.col("fltno").isNotNull())
        .select(F.col("fltno").cast("string").alias("flight_id"), F.col("airline"))
        .dropDuplicates()
    )


def i94_dates(trips: DataFrame) -> DataFrame:
    """Date dimension derived from the fact's arrival_date (etl.py:355-376).
    Chained off the trips build exactly like the reference (etl.py:784-792)."""
    d = F.col("arrival_date")
    return trips.select(
        F.col("i94_year"),
        F.col("i94_month"),
        d,
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.dayofweek(d).alias("dayofweek"),
        weekend_flag(d).alias("is_weekend"),
    ).dropDuplicates()


def i94_airports(airport_codes: DataFrame) -> DataFrame:
    """Airport dimension from the airport-codes CSV (etl.py:283-311):
    US state extraction from iso_region, coordinate pair split to doubles."""
    us_state = F.when(
        F.col("iso_region").like("US-%"), F.split("iso_region", "-").getItem(1)
    ).otherwise(F.lit(None))
    return airport_codes.select(
        F.col("ident").cast("string").alias("airport_id"),
        F.col("type").alias("airport_type"),
        F.col("name").alias("airport_name"),
        F.col("elevation_ft"),
        F.col("continent"),
        F.col("iso_country"),
        F.col("iso_region"),
        us_state.alias("us_state"),
        F.col("municipality"),
        F.col("gps_code"),
        F.col("iata_code"),
        F.col("local_code"),
        F.split("coordinates", ",").getItem(0).cast("double").alias("latitude"),
        F.split("coordinates", ",").getItem(1).cast("double").alias("longitude"),
    ).dropDuplicates()


def i94_us_states_demographic(demographics: DataFrame) -> DataFrame:
    """State-level demographic dimension; the source repeats state figures
    per (city, race) row, so DISTINCT collapses them (etl.py:313-335).
    Backtick-quoted spaced column names are the CSV's own (FIXTURES.md §3)."""
    return demographics.select(
        F.col("State").alias("state"),
        F.col("`Median Age`").cast("double").alias("median_age"),
        F.col("`Male Population`").cast("int").alias("male_population"),
        F.col("`Female Population`").cast("int").alias("female_population"),
        F.col("`Number of Veterans`").cast("int").alias("num_veterans"),
        F.col("`Foreign-born`").cast("int").alias("num_foreign_born"),
        F.col("`Average Household Size`").cast("double").alias("avg_household_size"),
        F.col("`State Code`").alias("state_code"),
    ).dropDuplicates()


def i94_us_cities_demographic(demographics: DataFrame) -> DataFrame:
    """City/race population dimension with city-name normalization
    (etl.py:337-353)."""
    return demographics.select(
        F.upper(F.col("City")).alias("city"),
        F.col("Race").alias("race"),
        F.col("Count").cast("int").alias("population"),
    )


def build_all(
    raw: DataFrame,
    airport_codes: DataFrame | None = None,
    demographics: DataFrame | None = None,
    valid_years: Sequence[int] = (2016,),
) -> dict[str, DataFrame]:
    """Assemble every i94 table reachable from the given sources (the
    reference's transform loop, etl.py:754-821, as a pure function)."""
    trips = i94_trips(raw)
    out = {
        "i94_immigrations": i94_immigrations(raw, valid_years=valid_years),
        "i94_trips": trips,
        "i94_visitors": i94_visitors(raw),
        "i94_flights": i94_flights(raw),
        "i94_dates": i94_dates(trips),
    }
    if airport_codes is not None:
        out["i94_airports"] = i94_airports(airport_codes)
    if demographics is not None:
        out["i94_us_states_demographic"] = i94_us_states_demographic(demographics)
        out["i94_us_cities_demographic"] = i94_us_cities_demographic(demographics)
    return out
