"""Vectorized scalar pandas UDFs (Arrow-batched).

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
the type hints at definition time, and PEP-563 string annotations break its
signature inference.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def sigmoid_length_score(n_chars: pd.Series) -> pd.Series:
    """Document length score 1/(1+e^(-len/1000)) on whole numpy arrays per
    Arrow batch — the vectorized-Python tier (~10-100x over row-wise UDFs);
    still second choice to pure native expressions for anything expressible
    in pyspark.sql.functions."""
    import numpy as np

    return pd.Series(
        1.0 / (1.0 + np.exp(-(n_chars.to_numpy(dtype="float64") / 1000.0)))
    )
