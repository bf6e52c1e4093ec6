"""Gate-rotation invariants (COVERAGE.md §gate): the registry's iteration
order is a CONTRACT with the driver's budget-limited correctness gate, and
every round rewrites the priority lists by hand. These checks make a botched
rotation (dropped query, duplicate, short head) fail in CI instead of
silently costing a round of driver evidence."""


def test_priority_lists_partition_registry():
    from orc_spark.plans import _DEFERRED_LAST, _PRIORITY_FIRST, registry

    names = list(registry())
    head, tail = set(_PRIORITY_FIRST), set(_DEFERRED_LAST)
    assert len(_PRIORITY_FIRST) == len(head), "duplicate in _PRIORITY_FIRST"
    assert len(_DEFERRED_LAST) == len(tail), "duplicate in _DEFERRED_LAST"
    assert not head & tail, sorted(head & tail)
    # every listed name must exist (a typo would silently rank as tier 1/3)
    assert head | tail <= set(names), sorted((head | tail) - set(names))


def test_gate_head_is_exactly_the_priority_list():
    from orc_spark.plans import _PRIORITY_FIRST, registry

    names = list(registry())
    # the driver's budget covers ~50 entries; the head must fill it exactly
    assert len(_PRIORITY_FIRST) == 50
    assert names[: len(_PRIORITY_FIRST)] == _PRIORITY_FIRST


def test_every_query_is_explicitly_ranked():
    """Unlisted queries fall into implicit tiers between the two lists —
    fine for brand-new queries mid-round, but a finished rotation should
    place everything explicitly so the order is fully deterministic."""
    from orc_spark.plans import _DEFERRED_LAST, _PRIORITY_FIRST, registry

    unranked = set(registry()) - set(_PRIORITY_FIRST) - set(_DEFERRED_LAST)
    assert unranked == set(), sorted(unranked)
