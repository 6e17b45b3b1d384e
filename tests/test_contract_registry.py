"""Registry-order invariants: the driver records (at most) the first
~50 entries of queries() in dict order, so everything that must appear
in CORRECTNESS_r{N}.json has to sit inside that window."""

from __future__ import annotations

from poc_spark.contract import REGISTRY, _TAIL

WINDOW = 50


def test_every_oracled_entry_inside_driver_window():
    names = list(REGISTRY)
    window = set(names[:WINDOW])
    oracled = {n for n, s in REGISTRY.items() if s.sql is not None}
    # the declared tail may sacrifice an oracled entry (a deliberate
    # trade when the window is full); anything else must fit inside
    missing = oracled - window - set(_TAIL)
    assert not missing, f"oracled entries outside the driver window: {missing}"


def test_must_be_green_rows_only_entries_inside_window():
    names = list(REGISTRY)
    window = set(names[:WINDOW])
    assert "mm_decode" in window  # round-1 red row's successor — now oracled


def test_overflow_is_exactly_the_declared_tail():
    names = list(REGISTRY)
    overflow = set(names[WINDOW:])
    assert overflow <= set(_TAIL), (
        f"undeclared entries pushed past the driver window: "
        f"{overflow - set(_TAIL)}"
    )


def test_no_duplicate_or_lost_entries():
    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert set(_TAIL) <= set(names)
