from __future__ import annotations

import pytest

from accident_prediction_montreal_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    # Small local session: tests exercise semantics, not throughput.
    s = get_session("tests", master="local[4]", shuffle_partitions=4)
    yield s
