"""Distributed connected components (min-label propagation).

The dedup pipeline's last mile: LSH/SimHash emit near-duplicate PAIRS, but
keep/drop decisions need CLUSTERS — every doc labeled with a canonical
representative. That resolution is a connected-components problem on the
similarity graph.

Algorithm: min-label propagation with pointer jumping. Every node starts
labeled with its own id; each round (a) every node takes the min label over
itself and its neighbors (one shuffle join edges ⋈ labels + one min agg),
then (b) labels chase labels — node → label(label(node)) — which halves the
distance any label still has to travel (pointer doubling). Rounds needed:
O(log diameter) instead of O(diameter), the same bound as the alternating
large-star/small-star scheme of Kiveris et al. ("Connected Components in
MapReduce and Beyond"); near-dup clusters are small and dense so in
practice 3-5 rounds finish. `localCheckpoint` after each round truncates
lineage so the plan doesn't grow with iterations.

Convergence detection: labels only ever decrease, so sum(label) is a strict
monovariant — one cheap scalar agg per round, no row-level diff join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Bounded driver-finish handoff (same policy as gr_kcore): once the
# symmetric-closure edge list fits this many rows, ONE collect + exact
# union-find replaces the iterative rounds — tiny graphs stop paying the
# per-round job-scheduling floor, and above the cap the distributed
# pointer-jumping loop runs unchanged (the 100 TB path). The cap bounds
# PYTHON-OBJECT driver memory, not just raw bytes: 1M edges ≈ 1M Row
# objects + a ≤2M-entry parent dict ≈ low hundreds of MB worst case
# (16 bytes of payload per edge, ~100× object overhead).
CC_LOCAL_FINISH_ROWS = 1_000_000


def _step(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One neighbor-min propagation + one pointer jump (comp ← comp[comp]).

    `sym` carries a self-loop per node, so one join + min-agg covers
    min(self ∪ neighbors) — no union (which Spark 4's constraint propagation
    mis-rewrites when both branches share lineage) and no second join.
    """
    stepped = (
        sym.join(labels, sym.src == labels.node)
        .select(F.col("dst").alias("node"), "comp")
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )
    a, b = stepped.alias("a"), stepped.alias("b")
    return a.join(b, F.col("a.comp") == F.col("b.node")).select(
        F.col("a.node").alias("node"), F.col("b.comp").alias("comp")
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 25,
    steps_per_round: int = 3,
) -> DataFrame:
    """nodes(node), edges(src, dst) undirected (either orientation is fine)
    → (node, comp) where comp = min node id in the component.

    Isolated nodes (present in `nodes`, absent from `edges`) come out as
    their own singleton component.

    `steps_per_round` propagation steps are fused into each materialized
    round: checkpoint + convergence-check actions are per ROUND, so the
    driver/job overhead amortizes over several label-wave hops (on a busy
    cluster each action is a scheduling round-trip; fusing them roughly
    halves wall time at identical shuffle volume).
    """
    # symmetric closure + one self-loop per endpoint (so each step's min-agg
    # sees the node's own label without a union/extra join), materialized
    # once; every round re-reads this, not the upstream LSH plan.
    # ONE explode pass, not nested unions: union branches re-evaluate their
    # shared lineage per branch (the documented multi-consumer recompute
    # trap), so the old both=(e ∪ e.rev); sym=(both ∪ both.self) shape ran
    # the entire upstream LSH pipeline FOUR times inside the materializing
    # job. The checkpoint is lazy: the gate count below materializes it, so
    # closure-build + count is one job round instead of two.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                    F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
                    F.struct(F.col("src").alias("s"), F.col("src").alias("d")),
                    F.struct(F.col("dst").alias("s"), F.col("dst").alias("d")),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # iterate ONLY over nodes that have at least one edge: in a dedup corpus
    # the overwhelming majority of docs are singletons, so the iterated
    # label state is |V_edges|, not |V| (100× smaller at a 1% dup rate);
    # singletons rejoin as their own component at the end
    # lazy checkpoints: the convergence aggregate is the action that both
    # materializes the round's label state AND reads the monovariant — ONE
    # Spark job per round instead of two (eager checkpoint + separate agg),
    # which matters because round cost here is job/stage scheduling overhead,
    # not data volume
    if sym.count() <= CC_LOCAL_FINISH_ROWS:
        # exact local finish: union-find with union-by-min root, so each
        # root IS the component's min id — identical labels to the
        # distributed min-label fixpoint
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        # Arrow handoff, not collect(): two int64 columns move at ~16 B/edge
        # vs ~100 B/edge of Row objects (CLAUDE.md transfer-format budgets;
        # measured 0.47 s vs 5.0 s at 1.17M edges) — the cap stays sized for
        # the pessimistic Row budget, so this only widens the safety margin
        spdf = sym.toPandas()
        for a, b in zip(
            spdf["src"].to_numpy().tolist(), spdf["dst"].to_numpy().tolist()
        ):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        label_rows = [(n, find(n)) for n in parent]
        spark = nodes.sparkSession
        labels = spark.createDataFrame(
            label_rows or [(-1, -1)], "node bigint, comp bigint"
        )
        if not label_rows:
            labels = labels.limit(0)
        return (
            nodes.select("node")
            .join(F.broadcast(labels), "node", "left")
            .select("node", F.coalesce("comp", "node").alias("comp"))
        )
    labels = (
        sym.select("src").distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("comp"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("comp")).first()[0]
    if prev_sum is not None:
        for _ in range(max_iters):
            d = labels
            for _ in range(steps_per_round):
                d = _step(sym, d)
            labels = d.localCheckpoint(eager=False)
            cur_sum = labels.agg(F.sum("comp")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    return (
        nodes.select("node")
        .join(labels, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
    )
