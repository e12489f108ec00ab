"""Pluggable source formats beyond the parquet/csv core in ``io.py``.

- ``sas7bdat``: the reference's raw-input format (SURVEY.md §2.1 S1),
  gated on the third-party saurfang jar being on the session classpath.
- the SAS-labels dictionary text source lives in
  ``data_engineering_nd_spark.dictionary`` (S8).
"""

from data_engineering_nd_spark.sources.sas7bdat import (
    SAS_FORMAT,
    read_sas,
    sas_jar_available,
)

__all__ = ["SAS_FORMAT", "read_sas", "sas_jar_available"]
