import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventkit_spark.session import get_spark
from eventkit_spark.sources.create import sequence


def seq_ema_model(vals, n=10, weight=None):
    """Sequential SUM-algebra EMA reference — the pinned missing-value
    semantics shared by every implementation (window `_ema_staged`,
    bucketed `ema_scaled`, exact `ema_exact`, streaming
    `_running_scan`, and the DuckDB oracles): NULL until the first
    value, NULL rows decay by (1-w), full-weight seed only for a
    non-NULL literal first row. ONE copy, imported by every test that
    pins these semantics — model drift is the bug class the r11
    review caught."""
    w = weight if weight is not None else 2.0 / (n + 1)
    exp, ema, seen = [], None, False
    for i, v in enumerate(vals):
        if v is not None:
            if not seen:
                ema = v if i == 0 else w * v
                seen = True
            else:
                ema = (1 - w) * ema + w * v
        elif seen:
            ema = (1 - w) * ema
        exp.append(ema if seen else None)
    return exp


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
