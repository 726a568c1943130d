from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from rensa_spark.session import get_spark

    s = get_spark(app_name="rensa-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
