from __future__ import annotations

import pytest

from yadex_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("yadex-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
