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


@pytest.mark.sweep
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


# r05/r06 VERDICT hardening: with every bounded-driver-finish cap forced
# off, the DISTRIBUTED graph paths (pointer-jumping CC, unrolled BFS,
# label-prop rounds, k-core peels) are held to the same driver-strength
# oracle hash comparison end-to-end — not just to their local twins.
_GRAPH_DISTRIBUTED = ["gr_kcore", "gr_bfs", "gr_linkpred", "gr_label_prop", "gr_pagerank", "dd_cluster"]


@pytest.mark.sweep
@pytest.mark.parametrize("name", _GRAPH_DISTRIBUTED)
def test_parity_distributed_graph(name, spark, sf_small, con, monkeypatch):
    import orc_spark.operators.graph as g
    import orc_spark.plans.graph_q as gq

    monkeypatch.setattr(gq, "GRAPH_LOCAL_FINISH_EDGES", -1)
    monkeypatch.setattr(gq, "KCORE_LOCAL_FINISH_EDGES", -1)
    monkeypatch.setattr(gq, "PR_LOCAL_FINISH_EDGES", -1)
    monkeypatch.setattr(g, "CC_LOCAL_FINISH_ROWS", -1)
    q = REG[name]
    sdf = q.spark_fn(spark, sf_small)
    odf = con.execute(q.oracle).df()
    problems = compare(sdf, odf, name)
    assert not problems, "\n".join(problems)
