from __future__ import annotations

import pytest

from communitydetection_jl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("linkgraph-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
