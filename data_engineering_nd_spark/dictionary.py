"""SAS-labels data-dictionary parser (the reference's custom text source S8).

Parses `proc format` blocks like the reference's
I94_SAS_Labels_Descriptions.SAS (ref: Capstone/scripts/etl.py:378-420,
section positions etl.py:826-832) into Spark dimension tables:

    value i94cntyl
       582 =  'MEXICO ...'
       236 =  'AFGHANISTAN'
       ...  ;

Reference behavior reproduced:
- file split on ';', section index selects a block (2=countries, 3=ports,
  4=travel mode, 5=states, 6=visa);
- entries are `key = 'value'` lines; keys may be quoted ('ALC') or bare
  (582); values single-quoted, possibly containing commas;
- first occurrence wins on duplicate keys (etl.py:396-399);
- keys and values are stripped of quotes/whitespace;
- port values 'CITY, ST' split on the LAST comma into (city, state)
  (etl.py:559-562) — embedded commas stay in the city part.

This is driver-side Python by design: dictionary files are KBs of reference
metadata, not data. The resulting frames are the canonical broadcast dims.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

_ENTRY_RE = re.compile(r"^\s*'?([^'=]+?)'?\s*=\s*'(.*?)'\s*$")

SECTIONS = {
    "i94_countries": 2,
    "i94_port_state_mapping": 3,
    "i94_travel_mode": 4,
    "i94_state_mapping": 5,
    "i94_visa": 6,
}


def parse_sections(text: str) -> list[str]:
    """Split the labels file on ';' exactly as the reference does
    (etl.py:392)."""
    return text.split(";")


def parse_entries(section: str) -> list[tuple[str, str]]:
    """Extract `key = 'value'` pairs, first occurrence wins, order kept."""
    seen: dict[str, str] = {}
    for line in section.splitlines():
        m = _ENTRY_RE.match(line)
        if not m:
            continue
        key = m.group(1).strip().strip("'").strip()
        val = m.group(2).strip()
        if key and key not in seen:
            seen[key] = val
    return list(seen.items())


def split_city_state(value: str) -> tuple[str, str | None]:
    """'HOUSTON, TX' -> ('HOUSTON', 'TX'); embedded commas stay in the city:
    'GEN M. ESCOBEDO, Monterrey, MX' -> ('GEN M. ESCOBEDO, Monterrey', 'MX').
    No comma -> state None (ref etl.py:561-562 rsplit(',', 1))."""
    if "," in value:
        city, state = value.rsplit(",", 1)
        return city.strip(), state.strip()
    return value.strip(), None


def section_frame(
    spark: SparkSession,
    text: str,
    section_index: int,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """One dictionary section -> a 2-column Spark dim (key/value strings)."""
    entries = parse_entries(parse_sections(text)[section_index])
    schema = StructType(
        [StructField(key_col, StringType()), StructField(value_col, StringType())]
    )
    return spark.createDataFrame(entries, schema)


def port_frame(spark: SparkSession, text: str, section_index: int = 3) -> DataFrame:
    """The ports section with the city/state split applied
    (-> i94_port_state_mapping: i94_port, city, state_code)."""
    entries = parse_entries(parse_sections(text)[section_index])
    rows = [(k, *split_city_state(v)) for k, v in entries]
    schema = StructType(
        [
            StructField("i94_port", StringType()),
            StructField("city", StringType()),
            StructField("state_code", StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def dictionary_frames(spark: SparkSession, text: str) -> dict[str, DataFrame]:
    """All five reference dictionary dims from one labels file."""
    return {
        "i94_countries": section_frame(
            spark, text, SECTIONS["i94_countries"], "country_id", "country_name"
        ),
        "i94_port_state_mapping": port_frame(
            spark, text, SECTIONS["i94_port_state_mapping"]
        ),
        "i94_travel_mode": section_frame(
            spark, text, SECTIONS["i94_travel_mode"], "mode_id", "mode_name"
        ),
        "i94_state_mapping": section_frame(
            spark, text, SECTIONS["i94_state_mapping"], "state_code", "state_name"
        ),
        "i94_visa": section_frame(
            spark, text, SECTIONS["i94_visa"], "visa_id", "visa_purpose"
        ),
    }
