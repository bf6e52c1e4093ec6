import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orc_spark import get_spark  # noqa: E402

TESTDATA = "/root/testdata"
REAL_CSV = "/root/reference/Python Plotting/Vibration_test/High Speed/ORCLOG_vibration_HS.CSV"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("orc_spark_tests", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def sf_mid():
    return os.path.join(TESTDATA, "sf0.01")
