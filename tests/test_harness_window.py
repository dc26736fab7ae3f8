"""Registry-order invariants for the driver's 50-query verification window.

The driver verifies exactly the first 50 names of ``harness.queries()`` per
round. Entries demoted past slot 50 get no correctness row, so the window
must always hold every entry that has not yet earned a driver row; only
twice-verified entries may be demoted (see harness._WINDOW_DEMOTED).
"""

from airflow_etl_finance_market_spark import harness

DRIVER_WINDOW = 50

#: Entries with no driver correctness row as of CORRECTNESS_r04.json — they
#: MUST be in-window now (qty_cube and the reorder gate earned their rows
#: in r04; the degree-oriented triangle entry is new in round 5).
NEVER_DRIVER_VERIFIED = [
    "doc_near_dup_triangles_degree",
]


def test_unverified_entries_inside_driver_window():
    window = list(harness.queries())[:DRIVER_WINDOW]
    missing = [n for n in NEVER_DRIVER_VERIFIED if n not in window]
    assert not missing, f"never-driver-verified entries outside window: {missing}"


def test_demoted_names_exist_and_registered():
    names = set(harness.queries())
    bad = [n for n in harness._WINDOW_DEMOTED if n not in names]
    assert not bad, f"_WINDOW_DEMOTED references unknown entries: {bad}"


def test_non_demoted_fit_in_window():
    n_in_window = len(harness.queries()) - len(harness._WINDOW_DEMOTED)
    assert n_in_window <= DRIVER_WINDOW, (
        f"{n_in_window} non-demoted entries exceed the {DRIVER_WINDOW}-query "
        "driver window; demote more twice-verified entries in harness.py"
    )


def test_oracle_order_mirrors_query_order():
    q = [n for n in harness.queries() if n in harness.oracles()]
    assert q == list(harness.oracles())
