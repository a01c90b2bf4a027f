from __future__ import annotations

import pytest

from kuibadb_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kuibadb-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
