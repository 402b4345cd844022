"""Driver-gate window arithmetic — no Spark session needed.

The round driver records CORRECTNESS rows for only the first
``DRIVER_GATE_CAP`` entries of ``queries()`` (observed as an exact 50-row
cap).  These asserts turn the window invariant from a comment into a
failure: adding a new query (which auto-fronts) without rotating a
veteran into ``_GATE_ROTATED_OUT`` would silently ungate the tail of the
active set.
"""

from hg64spark.queries import (
    DRIVER_GATE_CAP,
    _GATE_ACTIVE,
    _GATE_ORDER,
    _GATE_ROTATED_OUT,
    oracle_sql,
    queries,
)


def test_gate_window_exactly_fills_driver_cap():
    q = list(queries())
    fronted = [n for n in q if n not in _GATE_ORDER]
    assert len(fronted) + len(_GATE_ACTIVE) == DRIVER_GATE_CAP, (
        f"window overflow/underflow: {len(fronted)} auto-fronted new queries "
        f"+ {len(_GATE_ACTIVE)} active = {len(fronted) + len(_GATE_ACTIVE)} "
        f"!= cap {DRIVER_GATE_CAP} — rotate a veteran in/out of "
        f"_GATE_ROTATED_OUT (fronted: {fronted})"
    )
    # dict order must realize the window: positions [0, cap) are exactly
    # the fronted + active set
    assert set(q[:DRIVER_GATE_CAP]) == set(fronted) | set(_GATE_ACTIVE)


def test_gate_order_is_consistent():
    q = list(queries())
    assert len(_GATE_ORDER) == len(set(_GATE_ORDER)), "duplicate in _GATE_ORDER"
    assert set(_GATE_ORDER) <= set(q), "stale _GATE_ORDER entries"
    assert not (set(_GATE_ACTIVE) & set(_GATE_ROTATED_OUT))
    # every exposed query has an oracle entry (the weaker rows-only check
    # is opted into by OMITTING the oracle; none does today)
    assert set(q) == set(oracle_sql())
