"""Regenerate gate_rounds.json — the per-gate driver-verification manifest.

VERDICT r4 wrong-#4: the correctness window had no staleness guarantee; a
gate could ship and never earn a driver CORRECTNESS row. This manifest
records, for every gate in ``queries()``, the rounds in which the driver
produced a green row (scanned from CORRECTNESS_r0*.json) and the round the
gate was added; ``tests/test_entry_contract.py`` fails when any gate's
staleness exceeds ceil(n_gates / window) rounds, and forces the window to
draw from the never-verified pool while one exists.

``added`` provenance: min(verified rounds) when the gate has rows; otherwise
the round recorded in ``_ADDED_OVERRIDES`` (gates introduced after the last
CORRECTNESS scan), defaulting to 4 — every never-verified legacy gate was
present by round 4's snapshot.

Usage: python tools/gate_manifest.py [current_round]   (writes repo root)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# gates added in round 5 (no CORRECTNESS file can witness them yet)
_ADDED_OVERRIDES = {
    "multilang_stem_topk": 5,
    "icu_fold_topk": 5,
    "cjk_morph_topk": 5,
}


def build(current_round: int) -> dict:
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    rows: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= current_round:
            continue  # manifest snapshots rounds STRICTLY BEFORE its own
        data = json.load(open(path))
        for gate, res in data.items():
            if res.get("err") is None:
                rows.setdefault(gate, []).append(rnd)

    gates = {}
    for gate in e.queries():
        verified = sorted(rows.get(gate, []))
        added = (min(verified) if verified
                 else _ADDED_OVERRIDES.get(gate, 4))
        gates[gate] = {"added": added, "verified": verified}
    return {
        "generated_round": current_round,
        "window": e.GATE_WINDOW,
        "gates": gates,
    }


def main():
    current_round = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    manifest = build(current_round)
    out = os.path.join(REPO, "gate_rounds.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    n = len(manifest["gates"])
    never = [g for g, v in manifest["gates"].items() if not v["verified"]]
    print(f"{n} gates, {len(never)} never driver-verified -> {out}")


if __name__ == "__main__":
    main()
