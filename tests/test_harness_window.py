"""Registry-order invariants for the driver's 50-query verification window.

The driver verifies exactly the first 50 names of ``harness.queries()`` per
round. Entries demoted past slot 50 get no correctness row that round, so
the window is run as a RE-VERIFICATION cadence (harness._WINDOW_DEMOTED
docstring, adopted round 5):

1. never-driver-verified entries are always in-window;
2. entries whose depended-on code changed re-enter the window (judged at
   rotation time — not mechanically checkable here);
3. no demoted entry's last green driver row may be more than
   ``STALENESS_BUDGET`` rounds behind the newest CORRECTNESS file.

Rules 1 and 3 are derived from the CORRECTNESS_r*.json ledger itself, so a
forgotten rotation fails this suite rather than surfacing in the next
verdict.
"""

from __future__ import annotations

import glob
import json
import os
import re

from airflow_etl_finance_market_spark import harness

DRIVER_WINDOW = 50

#: A demoted entry's last green driver row may trail the newest recorded
#: round by at most this many rounds (a full 96-entry registry cycles
#: through a 50-slot window in two rounds).
STALENESS_BUDGET = 2

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_ledger() -> tuple[int, dict[str, int]]:
    """(newest round number, entry -> last round with a fully-green row)."""
    last_green: dict[str, int] = {}
    latest = 0
    for path in glob.glob(f"{_REPO}/CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") in (True, None)
                and row.get("err") in (None, "")
            )
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return latest, last_green


def test_never_verified_entries_inside_driver_window():
    """Rule 1, derived: any registered entry absent from every CORRECTNESS
    file has no driver row and must sit in the first 50 slots."""
    latest, last_green = _driver_ledger()
    assert latest >= 4, "driver ledger missing — run from the repo root"
    window = list(harness.queries())[:DRIVER_WINDOW]
    never = [n for n in harness.queries() if n not in last_green]
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"never-driver-verified entries outside window: {missing}"
    )


def test_demoted_entries_within_staleness_budget():
    """Rule 3, derived: demotion is only legal on a recent green row.

    "Trails by at most STALENESS_BUDGET rounds" means ``last_green >=
    latest - STALENESS_BUDGET`` (trail > budget flags). The r05 verdict
    caught the previous ``< latest - STALENESS_BUDGET + 1`` form (trail
    >= budget flags): it outlawed the harness's own documented plan
    ("staleness 2 at r05 -> rotate by r06") the moment each round's
    ledger landed, and with >100 registered entries a 3-round cycle
    REQUIRES trail-2 demoted entries, so the budget became structurally
    unsatisfiable. Condition now matches the docstring above.
    """
    latest, last_green = _driver_ledger()
    offenders = {
        n: last_green.get(n)
        for n in harness._WINDOW_DEMOTED
        if last_green.get(n, 0) < latest - STALENESS_BUDGET
    }
    assert not offenders, (
        "demoted entries whose last green driver row is older than "
        f"{STALENESS_BUDGET} rounds (latest ledger: r{latest:02d}): "
        f"{offenders} — rotate them into the window"
    )


def test_demoted_names_exist_and_registered():
    names = set(harness.queries())
    bad = [n for n in harness._WINDOW_DEMOTED if n not in names]
    assert not bad, f"_WINDOW_DEMOTED references unknown entries: {bad}"


def test_non_demoted_fit_in_window():
    n_in_window = len(harness.queries()) - len(harness._WINDOW_DEMOTED)
    assert n_in_window <= DRIVER_WINDOW, (
        f"{n_in_window} non-demoted entries exceed the {DRIVER_WINDOW}-query "
        "driver window; demote more recently-verified entries in harness.py"
    )


def test_oracle_order_mirrors_query_order():
    q = [n for n in harness.queries() if n in harness.oracles()]
    assert q == list(harness.oracles())
