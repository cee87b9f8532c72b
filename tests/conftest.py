from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from tei_chunker_spark.sources.session import get_spark

    s = get_spark("tei-chunker-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
