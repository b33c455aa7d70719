"""Shared Spark session for the test suite (local[4], small shuffle count).

Mirrors the reference's test strategy (SURVEY.md §5): kernel-vs-oracle golden
tests against NumPy, operator unit tests incl. error paths, and randomized
inputs with pinned seeds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sed_binning_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="sed-binning-spark-tests", master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="session")
def events_pdf():
    """Reference-shaped synthetic event table (F-1 fixture semantics):
    X/Y uniform [0,2048], t uniform [60000,120000], ADC uniform [2000,20000],
    monotone timestamps, pinned seed."""
    rng = np.random.default_rng(42)
    n = 20_000
    return pd.DataFrame(
        {
            "X": rng.uniform(0, 2048, n),
            "Y": rng.uniform(0, 2048, n),
            "t": rng.uniform(60000, 120000, n),
            "ADC": rng.uniform(2000, 20000, n),
            "timeStamps": np.cumsum(rng.exponential(0.001, n)) + 1.6e9,
            "file_id": np.repeat(np.arange(4), n // 4).astype("int64"),
            "row_id": np.tile(np.arange(n // 4), 4).astype("int64"),
        },
    )


@pytest.fixture(scope="session")
def events_df(spark, events_pdf):
    return spark.createDataFrame(events_pdf).cache()
