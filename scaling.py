"""Two-parallelism-level scaling evidence (the sandbox stand-in for the
north rule's N vs 4N executor criterion — see BASELINE.md).

Runs bench.py in separate processes at local[8] and local[32] on identical
input and writes BENCH.md with throughput at both plus
efficiency = (throughput_32 / throughput_8) / 4.

Usage: python scaling.py [sf_dir] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_bench(cpus: int, sf_dir: str, replicate: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_REPLICATE=str(replicate))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(f"bench at local[{cpus}] produced no JSON:\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    r8 = run_bench(8, sf_dir, replicate)
    r32 = run_bench(32, sf_dir, replicate)
    eff = (r32["value"] / r8["value"]) / 4.0

    md = f"""# BENCH — scaling evidence (local[8] vs local[32])

Same job, same input ({sf_dir}, replicate={replicate},
n_pages={r8['n_pages']:,}), two parallelism levels in separate JVMs —
the sandbox evidence for the north rule's "N vs 4N executors, scaling
efficiency >= 0.8" criterion (BASELINE.md).

| parallelism | pages/sec (encode+join pipeline) | per-query seconds |
|---|---|---|
| local[8]  | {r8['value']:,.0f} | {json.dumps(r8['queries'])} |
| local[32] | {r32['value']:,.0f} | {json.dumps(r32['queries'])} |

**Scaling efficiency = (throughput_32 / throughput_8) / 4 = {eff:.3f}**
(criterion: >= 0.8; a value near 0.25 would mean no parallel speedup,
1.0 = perfect linear scaling).

Notes
- Throughput metric: pages/sec through geocode -> JVM-native geohash
  encode (p7) -> broadcast covering join -> per-tile aggregation.
- All stages are shuffle-light by design: the join broadcasts the covering
  set, the aggregations are partial+final hash aggs keyed by tile.
"""
    with open(os.path.join(HERE, "BENCH.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": round(eff, 3), "t8": r8["value"],
                      "t32": r32["value"]}))


if __name__ == "__main__":
    main()
