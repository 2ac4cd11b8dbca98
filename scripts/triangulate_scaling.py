"""One-off triangulation run for BENCH.md: a second independent core
pair (default 3 vs 12) at the 2.4M-page corpus, same interleaved
fresh-JVM pinned methodology as scripts/bench_scaling.py, WITHOUT
rewriting BENCH.md (results are printed as JSON lines and hand-merged
into BENCH.md's pair table).

Usage: python scripts/triangulate_scaling.py [n_pages] [repeats]
Env: SPARK_GRAFT_SCALE_CORES="3,12" (default)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling  # noqa: E402


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pair = os.environ.get("SPARK_GRAFT_SCALE_CORES", "3,12")
    n_cores, n4_cores = (int(x) for x in pair.split(","))
    samples: dict[int, list[dict]] = {n_cores: [], n4_cores: []}
    for i in range(repeats):
        for cores in (n_cores, n4_cores):
            r = bench_scaling.run(cores, n_pages)
            samples[cores].append(r)
            print(f"SAMPLE {json.dumps({'round': i, **r})}", flush=True)
    best = {c: min(rs, key=lambda r: r["sec"]) for c, rs in samples.items()}
    eff = (best[n4_cores]["tps"] / best[n_cores]["tps"]) / (n4_cores / n_cores)
    fps = {r["fingerprint"] for rs in samples.values() for r in rs}
    print(
        "FINAL "
        + json.dumps(
            {
                "pair": pair,
                "n_pages": n_pages,
                "thr_N": best[n_cores]["tps"],
                "thr_4N": best[n4_cores]["tps"],
                "efficiency": round(eff, 3),
                "distinct_fingerprints": len(fps),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
