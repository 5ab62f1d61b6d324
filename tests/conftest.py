import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventkit_spark.session import get_spark
from eventkit_spark.sources.create import sequence


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("eventkit_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def ints(spark):
    """F1 int_stream: list(range(10)), 10ms spacing (FIXTURES.md)."""
    return sequence(spark, list(range(10)), interval=0.01)


@pytest.fixture(scope="session")
def dups(spark):
    """F3 dup_stream (tests/select_test.py:31,36)."""
    return sequence(spark, [1, 1, 2, 1, 2, 2, 2, 3, 1, 4, 4], interval=0.01)
