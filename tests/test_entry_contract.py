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


# ---- staleness manifest (VERDICT r4 wrong-#4 / next-#9) --------------------

import glob  # noqa: E402
import json  # noqa: E402
import math  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _manifest():
    with open(os.path.join(REPO, "gate_rounds.json")) as f:
        return json.load(f)


def _driver_rows_by_gate(upto_round=None):
    rows = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        if upto_round is not None and rnd >= upto_round:
            continue  # the manifest snapshots rounds STRICTLY BEFORE its
            # generated_round: the driver writes CORRECTNESS_r{N}.json after
            # round N's manifest was generated; it's folded in when the
            # manifest regenerates at round N+1's start
        for gate, res in json.load(open(path)).items():
            if res.get("err") is None:
                rows.setdefault(gate, []).append(rnd)
    return rows


def test_manifest_covers_every_gate_and_matches_correctness_files():
    m = _manifest()
    qs = set(entry.queries())
    assert set(m["gates"]) == qs, (
        "gate_rounds.json out of date — rerun tools/gate_manifest.py: "
        f"missing={qs - set(m['gates'])} stale={set(m['gates']) - qs}")
    rows = _driver_rows_by_gate(upto_round=m["generated_round"])
    for gate, info in m["gates"].items():
        assert info["verified"] == sorted(rows.get(gate, [])), gate
    assert m["window"] == entry.GATE_WINDOW


def test_manifest_not_stale_against_newer_rounds():
    """A CORRECTNESS file from a round NEWER than the manifest snapshot is
    allowed transiently (the driver writes it after this round ends), but
    at most one such round may exist — two or more means a whole round ran
    without regenerating the manifest, so the rotation window was computed
    from stale staleness data."""
    m = _manifest()
    newer = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= m["generated_round"]:
            newer.add(rnd)
    assert len(newer) <= 1, (
        f"gate_rounds.json generated in round {m['generated_round']} but "
        f"driver rows exist for rounds {sorted(newer)} — rerun "
        "tools/gate_manifest.py and reorder _WINDOW_HEAD")


def test_no_gate_staleness_exceeds_rotation_bound():
    """Every gate must earn a driver row at least every ceil(N/window)
    rounds, counting from the round it was added."""
    m = _manifest()
    current = m["generated_round"] + 1  # the round this window will run in
    bound = math.ceil(len(m["gates"]) / m["window"])
    over = {
        g: current - max(info["verified"] + [info["added"]])
        for g, info in m["gates"].items()
        if current - max(info["verified"] + [info["added"]]) > bound
    }
    assert not over, (
        f"gates past the {bound}-round staleness bound "
        f"(rotate them into _WINDOW_HEAD): {over}")


def test_window_draws_from_never_verified_pool_first():
    """While any gate has zero driver rows, the window may contain ONLY such
    gates — the rotation can't re-verify green gates while others have no
    evidence at all."""
    m = _manifest()
    never = {g for g, info in m["gates"].items() if not info["verified"]}
    if len(never) < entry.GATE_WINDOW:
        return  # pool smaller than the window: mixed windows are fine
    qs = list(entry.queries())
    window = qs[: entry.GATE_WINDOW]
    revisits = [g for g in window if g not in never]
    assert not revisits, f"window re-verifies while backlog exists: {revisits}"
