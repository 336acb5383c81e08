"""Driver-contract invariants (VERDICT r3 wrong-#1).

The driver verifies only ``queries()[:GATE_WINDOW]``; these tests pin the
window ordering so no gate silently falls out of verification again.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def test_every_query_has_oracle_or_documented_exception():
    qs = set(entry.queries())
    osql = set(entry.oracle_sql())
    # oracle keys must be a subset of queries (no dangling SQL)
    assert osql <= qs, osql - qs


def test_window_head_covers_priority_gates():
    qs = list(entry.queries())
    window = set(qs[: entry.GATE_WINDOW])
    missing = [k for k in entry._WINDOW_HEAD
               if k in set(qs) and k not in window]
    assert not missing, f"priority gates outside driver window: {missing}"


def test_window_head_has_no_duplicates():
    head = entry._WINDOW_HEAD
    assert len(head) == len(set(head))


def test_window_head_not_overfull():
    qs = set(entry.queries())
    present = [k for k in entry._WINDOW_HEAD if k in qs]
    assert len(present) <= entry.GATE_WINDOW, (
        f"{len(present)} priority gates > {entry.GATE_WINDOW}-slot window"
    )
