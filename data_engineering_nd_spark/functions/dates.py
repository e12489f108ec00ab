"""Date kernels.

The reference implements these as row-at-a-time Python UDFs
(Capstone/scripts/etl.py:130-159), which serialize every row across the
Python-worker boundary and block whole-stage codegen — the single biggest
perf problem in the reference (SURVEY.md §4.1). Here they are native column
expressions; one optional registered UDF is kept to preserve the reference's
``spark.udf.register`` surface (etl.py:728).

Also note: the shipped ``change_date_format`` (etl.py:142-159) is dead code —
it compares a string year slice against a list of ints, so every row returns
NULL. ``flexible_date`` implements the *intended* semantics from the notebook
prototype (Explore_using_PySpark.ipynb cell 19): a string is ``yyyyMMdd`` when
it starts with a whitelisted year, ``MMddyyyy`` when it ends with one, junk
(e.g. 'D/S') otherwise.
"""

from __future__ import annotations

import datetime
from collections.abc import Sequence

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DateType

SAS_EPOCH = "1960-01-01"


def sas_date(col: Column | str) -> Column:
    """SAS day-offset double -> DateType. NULL-safe (etl.py:130-140 parity).

    Native equivalent of the reference's ``sas_date_converter`` UDF:
    date'1960-01-01' + INT(x) days.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(F.to_date(F.lit(SAS_EPOCH)), c.cast("int"))


def flexible_date(col: Column | str, valid_years: Sequence[int] = (2016,)) -> Column:
    """Parse an 8-digit date string that is either yyyyMMdd or MMddyyyy.

    Disambiguation (intended semantics of etl.py:142-159, per the notebook
    prototype): leading 4 chars in ``valid_years`` -> yyyyMMdd; trailing 4
    chars in ``valid_years`` -> MMddyyyy; anything else (including junk like
    'D/S', '/   183D') -> NULL. try_to_date avoids the Spark>=3.0 legacy
    parser exceptions on malformed input.
    """
    c = F.col(col) if isinstance(col, str) else col
    years = [str(y) for y in valid_years]
    return (
        F.when(F.substring(c, 1, 4).isin(years), F.try_to_date(c, "yyyyMMdd"))
        .when(F.substring(c, -4, 4).isin(years), F.try_to_date(c, "MMddyyyy"))
        .otherwise(F.lit(None).cast(DateType()))
    )


def weekend_flag(date_col: Column | str) -> Column:
    """'weekend' when day-of-week is Sunday(1)/Saturday(7) else 'weekday'
    (etl.py:372-373 parity)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    dow = F.dayofweek(c)
    return F.when((dow == 1) | (dow == 7), F.lit("weekend")).otherwise(F.lit("weekday"))


def date_parts(date_col: Column | str) -> dict[str, Column]:
    """The i94_dates attribute set (etl.py:368-373): year/month/day/dow/flag."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day_of_month": F.dayofmonth(c),
        "day_of_week": F.dayofweek(c),
        "weekend_flag": weekend_flag(c),
    }


def register_sas_date_udf(spark: SparkSession, name: str = "SASDateConverter") -> None:
    """Preserve the reference's SQL-registered-UDF surface (etl.py:728).

    Row-at-a-time Python UDF — intentionally NOT used by the engine's own
    plans (use ``sas_date``); exists so spark.sql strings that reference
    ``SASDateConverter(col)`` keep working.
    """
    epoch = datetime.date(1960, 1, 1)

    def _convert(x: float | None) -> datetime.date | None:
        if x is None:
            return None
        return epoch + datetime.timedelta(days=int(x))

    spark.udf.register(name, _convert, DateType())
