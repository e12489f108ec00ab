"""Golden-row tests for the i94 table builders + dictionary parser +
end-to-end pipeline, on FIXTURES.md-shaped synthetic inputs (the per-operator
test layer the reference lacks, SURVEY.md §5)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from data_engineering_nd_spark import dictionary, pipeline, transforms

# 28-column raw i94 shape (FIXTURES.md §1), junk values included.
RAW_ROWS = [
    dict(
        cicid=6.0, i94yr=2016.0, i94mon=4.0, i94cit=692.0, i94res=692.0,
        i94port="XXX", arrdate=20545.0, i94mode=1.0, i94addr="CA",
        depdate=20550.0, i94bir=37.0, i94visa=2.0, count=1.0,
        dtadfile="20160401", visapost=None, occup=None, entdepa="T",
        entdepd="O", entdepu=None, matflag="M", biryear=1979.0,
        dtaddto="10282016", gender="M", insnum=None, airline="AA",
        admnum=1897628485.0, fltno="00296", visatype="B2",
    ),
    dict(  # junk dates, null flight, null departure
        cicid=7.0, i94yr=2016.0, i94mon=4.0, i94cit=582.0, i94res=245.0,
        i94port="ALC", arrdate=20546.0, i94mode=3.0, i94addr="99",
        depdate=None, i94bir=25.0, i94visa=1.0, count=1.0,
        dtadfile="junk", visapost="LND", occup=None, entdepa="G",
        entdepd=None, entdepu="U", matflag=None, biryear=1991.0,
        dtaddto="D/S", gender="F", insnum=None, airline=None,
        admnum=333.0, fltno=None, visatype="WT",
    ),
]
# full-row duplicate of row 0 (exercises dropDuplicates, etl.py:203)
RAW_ROWS.append(dict(RAW_ROWS[0]))

MINI_LABELS = """libname library 'x' ;
proc format library=library ;
/* I94CIT & I94RES */
  value i94cntyl
   582 =  'MEXICO Air Sea, and Not Reported (I-94, no land arrivals)'
   692 =  'PERU'
   582 =  'DUPLICATE-IGNORED' ;
/* I94PORT */
  value $i94prtl
   'ALC'\t=\t'ALCAN, AK             '
   'XXX'\t=\t'NOT REPORTED/UNKNOWN'
   'GEN'\t=\t'GEN M. ESCOBEDO, Monterrey, MX' ;
/* I94MODE */
  value i94model
   1 = 'Air'
   3 = 'Land' ;
/* I94ADDR */
  value i94addrl
   'CA'='CALIFORNIA'
   '99'='All Other Codes' ;
/* I94VISA */
  value i94visa
   1 = 'Business'
   2 = 'Pleasure' ;
"""


RAW_SCHEMA = (
    "cicid double, i94yr double, i94mon double, i94cit double, i94res double, "
    "i94port string, arrdate double, i94mode double, i94addr string, "
    "depdate double, i94bir double, i94visa double, count double, "
    "dtadfile string, visapost string, occup string, entdepa string, "
    "entdepd string, entdepu string, matflag string, biryear double, "
    "dtaddto string, gender string, insnum string, airline string, "
    "admnum double, fltno string, visatype string"
)


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame([Row(**r) for r in RAW_ROWS], RAW_SCHEMA)


def test_trips_golden(spark, raw):
    trips = transforms.i94_trips(raw)
    rows = {r.custom_client_id: r for r in trips.collect()}
    assert len(rows) == 2  # full-row duplicate collapsed
    t = rows["6"]
    assert t.admissions_number == "1897628485"
    assert t.arrival_date == datetime.date(2016, 4, 1)  # SAS 20545
    assert t.departure_date == datetime.date(2016, 4, 6)
    assert t.flight_id == "00296" and t.visa_id == "2" and t.visa_category == "B2"
    assert t.i94_year == 2016 and t.i94_month == 4
    assert t.state_code == "CA" and t.mode_of_entry == 1
    u = rows["7"]
    assert u.departure_date is None and u.flight_id is None


def test_trip_id_deterministic(spark, raw):
    a = {r.custom_client_id: r.trip_id for r in transforms.i94_trips(raw).collect()}
    b = {
        r.custom_client_id: r.trip_id
        for r in transforms.i94_trips(raw.repartition(5)).collect()
    }
    assert a == b  # divergence fix vs monotonically_increasing_id


def test_immigrations_dates(spark, raw):
    imm = {r.custom_client_id: r for r in transforms.i94_immigrations(raw).collect()}
    assert imm["6"].i94_entry_date == datetime.date(2016, 4, 1)  # yyyyMMdd
    assert imm["6"].i94_valid_till == datetime.date(2016, 10, 28)  # MMddyyyy
    # the shipped reference UDF nulls these; intended semantics parse them.
    assert imm["7"].i94_entry_date is None  # 'junk'
    assert imm["7"].i94_valid_till is None  # 'D/S'
    assert imm["6"].arrival_flag == "T" and imm["7"].update_flag == "U"


def test_visitors_flights_dates(spark, raw):
    visitors = {r.admissions_number: r for r in transforms.i94_visitors(raw).collect()}
    assert visitors["1897628485"].birth_year == 1979
    flights = transforms.i94_flights(raw).collect()
    assert [(r.flight_id, r.airline) for r in flights] == [("00296", "AA")]
    dates = transforms.i94_dates(transforms.i94_trips(raw)).collect()
    by_date = {r.arrival_date: r for r in dates}
    assert by_date[datetime.date(2016, 4, 1)].is_weekend == "weekday"  # Friday
    assert by_date[datetime.date(2016, 4, 2)].day == 2


def test_airports(spark):
    df = spark.createDataFrame(
        [
            Row(
                ident="00AK", type="small_airport", name="Lowell Field",
                elevation_ft="450", continent="NA", iso_country="US",
                iso_region="US-AK", municipality="Anchor Point",
                gps_code="00AK", iata_code=None, local_code="00AK",
                coordinates="-151.695999146, 59.94919968",
            ),
            Row(
                ident="MX-1", type="heliport", name="H", elevation_ft="1",
                continent="NA", iso_country="MX", iso_region="MX-NLE",
                municipality="M", gps_code=None, iata_code=None,
                local_code=None, coordinates="-100.1, 25.8",
            ),
        ],
        "ident string, type string, name string, elevation_ft string, "
        "continent string, iso_country string, iso_region string, "
        "municipality string, gps_code string, iata_code string, "
        "local_code string, coordinates string",
    )
    out = {r.airport_id: r for r in transforms.i94_airports(df).collect()}
    assert out["00AK"].us_state == "AK"
    assert out["MX-1"].us_state is None
    assert out["00AK"].latitude == pytest.approx(-151.695999146)
    assert out["00AK"].longitude == pytest.approx(59.94919968)


def test_demographics(spark):
    df = spark.createDataFrame(
        [
            Row(**{
                "City": "Quincy", "State": "Massachusetts", "Median Age": "41.0",
                "Male Population": "44129", "Female Population": "49500",
                "Total Population": "93629", "Number of Veterans": "4147",
                "Foreign-born": "32935", "Average Household Size": "2.39",
                "State Code": "MA", "Race": "White", "Count": "58723",
            }),
            Row(**{
                "City": "Quincy", "State": "Massachusetts", "Median Age": "41.0",
                "Male Population": "44129", "Female Population": "49500",
                "Total Population": "93629", "Number of Veterans": "4147",
                "Foreign-born": "32935", "Average Household Size": "2.39",
                "State Code": "MA", "Race": "Asian", "Count": "29470",
            }),
        ]
    )
    states = transforms.i94_us_states_demographic(df).collect()
    assert len(states) == 1  # per-race rows collapse to one state row
    assert states[0].median_age == 41.0 and states[0].state_code == "MA"
    cities = {r.race: r for r in transforms.i94_us_cities_demographic(df).collect()}
    assert cities["White"].city == "QUINCY" and cities["White"].population == 58723


def test_dictionary_parser(spark):
    frames = dictionary.dictionary_frames(spark, MINI_LABELS)
    countries = dict(frames["i94_countries"].collect())
    assert countries["692"] == "PERU"
    assert countries["582"].startswith("MEXICO")  # first occurrence wins
    ports = {r.i94_port: r for r in frames["i94_port_state_mapping"].collect()}
    assert ports["ALC"].city == "ALCAN" and ports["ALC"].state_code == "AK"
    # embedded comma: split on LAST comma only (etl.py:561-562)
    assert ports["GEN"].city == "GEN M. ESCOBEDO, Monterrey"
    assert ports["GEN"].state_code == "MX"
    assert dict(frames["i94_travel_mode"].collect())["1"] == "Air"
    assert dict(frames["i94_visa"].collect())["2"] == "Pleasure"


def test_pipeline_end_to_end(spark, raw, tmp_path):
    raw_path = str(tmp_path / "raw")
    raw.write.parquet(raw_path)
    out = str(tmp_path / "warehouse")
    res = pipeline.run(spark, [raw_path], out)
    assert res.ok, {k: v.null_counts for k, v in res.quality.items()}
    assert set(res.tables) == {
        "i94_immigrations", "i94_trips", "i94_visitors", "i94_flights", "i94_dates",
    }
    # partitioned layout landed (hive dirs) and reads back with pruning keys
    trips = spark.read.parquet(res.tables["i94_trips"].path)
    assert trips.count() == 2
    assert set(trips.columns) >= {"trip_id", "i94_year", "i94_month"}
    # audit row counts came from the write job's observation — no extra
    # count() scan (the reference's double execution, etl.py:528)
    assert res.tables["i94_trips"].rows == 2
    # append mode doubles rows
    pipeline.run(spark, [raw_path], out, mode="append")
    assert spark.read.parquet(res.tables["i94_trips"].path).count() == 4
