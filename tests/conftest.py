import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from mobilityduck_spark.session import get_spark  # noqa: E402
from mobilityduck_spark import types as mt  # noqa: E402
from mobilityduck_spark import textio  # noqa: E402

BASE_TYPES = {
    "int": T.LongType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "text": T.StringType(),
    "timestamp": T.TimestampType(),
    "point": mt.POINT_TYPE,
}


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mobilityduck_spark_tests", shuffle_partitions=4)
    yield s


def temporal_df(spark, literals, base):
    """One-column df `t` from temporal text literals."""
    schema = T.StructType(
        [T.StructField("t", mt.temporal_type(BASE_TYPES[base]), True)]
    )
    rows = [(textio.parse_temporal(s, base),) for s in literals]
    return spark.createDataFrame(rows, schema)


def span_df(spark, literals, base):
    schema = T.StructType([T.StructField("s", mt.span_type(BASE_TYPES[base]), True)])
    rows = [(textio.parse_span(s, base),) for s in literals]
    return spark.createDataFrame(rows, schema)


def spanset_df(spark, literals, base):
    schema = T.StructType(
        [T.StructField("ss", mt.spanset_type(BASE_TYPES[base]), True)]
    )
    rows = [(textio.parse_spanset(s, base),) for s in literals]
    return spark.createDataFrame(rows, schema)
