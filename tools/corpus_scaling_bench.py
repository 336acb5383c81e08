"""Corpus-growth scaling bench (VERDICT r4 next-#6).

Runs the SAME bench job (full index build + the 7-query top-k set) at fixed
parallelism while the corpus grows 10× and 100× (sf0.1 ≈ 600k turns → sf1 ≈
6M → sf10 ≈ 60M), to validate the two documented codec cuts at scale:

* no FST term index (sorted parquet + row-group min/max + LRU driver dict
  stand in for the .tip/.tim block tree), and
* no multi-level skip FILES (level-0 block metadata + the lazy two-level
  in-kernel bound stand in for MultiLevelSkipListWriter).

The cut survives if top-k latency grows SUBLINEARLY in corpus size — rare
terms should be near-flat (their posting volume is corpus-proportional but
tiny; the cost that could bite is term-dict lookup, which an FST would make
O(term) vs our O(log n) parquet binary search), and hot terms are the
block-max stress case (WAND must prune ~10× more blocks per step-up; a
superlinear trend there would mandate the multi-level hierarchy).

Writes BENCH/corpus_scaling.json; the verdict prose lives in
BENCH/BASELINE.md. Usage:
    python tools/corpus_scaling_bench.py [cpus] [turns ...]
defaults: 32 cores, levels 600000 6000000 60000000.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(turns: int, cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_TURNS=str(turns))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    print(f"turns={r['turns']:,}: build {r['queries']['index_build']:.1f}s "
          f"({r['turns_per_sec']:,.0f} t/s), "
          f"hot {r['queries']['topk_hot']:.2f}s "
          f"rare {r['queries']['topk_rare']:.2f}s", flush=True)
    return r


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    levels = ([int(x) for x in sys.argv[2:]]
              or [600_000, 6_000_000, 60_000_000])
    results = {}
    for turns in levels:
        results[str(turns)] = run_level(turns, cpus)

    base = results[str(levels[0])]
    table = {}
    for turns in levels[1:]:
        r = results[str(turns)]
        growth = r["turns"] / base["turns"]
        table[str(turns)] = {
            "corpus_growth": round(growth, 1),
            "latency_ratio_vs_base": {
                q: round(r["queries"][q] / base["queries"][q], 2)
                for q in r["queries"] if q != "index_build"
            },
            "build_turns_per_sec": r["turns_per_sec"],
        }
    out = {
        "cpus": cpus,
        "levels": {k: {"turns": v["turns"], "queries": v["queries"],
                       "turns_per_sec": v["turns_per_sec"]}
                   for k, v in results.items()},
        "sublinearity": table,
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/corpus_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["sublinearity"], indent=1))


if __name__ == "__main__":
    main()
