"""Every registry query with an oracle must hash-match DuckDB at sf0.001 —
the same comparison the driver's correctness gate performs at sf0.01."""

import pytest

from orc_spark.plans import registry
from tests.parity import compare, duck_con

REG = registry()


@pytest.fixture(scope="module")
def con(sf_small):
    c = duck_con(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REG))
def test_parity(name, spark, sf_small, con):
    q = REG[name]
    sdf = q.spark_fn(spark, sf_small)
    if q.oracle is None:
        # rows-only check, like the driver's weak mode
        assert sdf.count() >= 0
        return
    odf = con.execute(q.oracle).df()
    problems = compare(sdf, odf, name)
    assert not problems, "\n".join(problems)
