"""Interleaved fresh-JVM A/B between two source trees for a handful of
bench rows — the adjudication protocol for cross-round bench drift
(BASELINE §29/§36): same box, same inputs, trees alternating A,B,B,A,…
per rep so slow box drift cancels, and every rep its own subprocess so
JVM/JIT state can't leak between trees.

Rows include an untouched CONTROL (d01: exact dedup, no code change
between the trees under comparison) — if the control moves with the
suspects, the drift is box noise; if the suspects move and the control
doesn't, the code is guilty.

Usage:
    python tools/bench_ab_interleaved.py TREE_A TREE_B [reps] [sf_dir]

Prints per-rep walls as they land and a final JSON summary with
per-row, per-tree medians and the B/A ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

#: rows under adjudication (r12→r13 risers) + the untouched control +
#: (round 15) the streaming topology row — the one expensive row the
#: r12/r14 A/B never covered (VERDICT r14 watch item) — + the two
#: rows this optimization round changed on purpose (q13 join-strategy
#: rework, q14 pruned-build), so the claimed wins ride the same
#: noise-controlled instrument as the drift adjudications + (round 16)
#: the two tail rows of the driver's unexplained t27–t31 collapse
#: (VERDICT r15 item 2: code-identical rows 2–4× slower only in the
#: driver's 32-core run — adjudicate in-tree vs box)
ROWS = ("d01_control", "ivm_delta_batch", "dedup_stream_batch",
        "s08_ivf_quantized", "ivm_stream_e2e",
        "q13_denormalized_order", "q14_doc_projection",
        "t29_corpus_profile", "t31_gopher_repetition")

_RUNNER = r"""
import json, os, sys, time
tree = sys.argv[1]; sf_dir = sys.argv[2]; out_path = sys.argv[3]
os.chdir(tree); sys.path.insert(0, tree)
import bench
from southpaw_spark import suite
from southpaw_spark.session import get_spark

spark = get_spark("ab-rep")
spark.sparkContext.setLogLevel("ERROR")
warm = "/root/testdata/sf0.001"

def d01(sf):
    # rows rotate between QUERIES and EXTRA_QUERIES across rounds —
    # resolve either way (d01 rotated to EXTRA in round 15)
    fn = suite.QUERIES.get("d01_dedup_exact") or suite.EXTRA_QUERIES[
        "d01_dedup_exact"]
    t0 = time.monotonic()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)

def s08(sf):
    fn = suite.EXTRA_QUERIES.get("s08_ivf_quantized_topk") or suite.QUERIES[
        "s08_ivf_quantized_topk"]
    t0 = time.monotonic()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)

def query_row(name):
    fn = suite.QUERIES.get(name) or suite.EXTRA_QUERIES[name]
    def run(sf):
        t0 = time.monotonic()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)
    return run

runners = {
    "d01_control": d01,
    "ivm_delta_batch": lambda sf: bench.ivm_delta_batch(
        spark, sf, "/tmp/ab_ivm_state"),
    "dedup_stream_batch": lambda sf: bench.dedup_stream_batch(spark, sf),
    "s08_ivf_quantized": s08,
    "ivm_stream_e2e": lambda sf: bench.ivm_stream_e2e(spark, sf),
    "q13_denormalized_order": query_row("q13_denormalized_order"),
    "q14_doc_projection": query_row("q14_doc_projection"),
    "t29_corpus_profile": query_row("t29_corpus_profile"),
    "t31_gopher_repetition": query_row("t31_gopher_repetition"),
}
# warm-up: identical plan shapes through codegen + JIT at the small SF
for fn in runners.values():
    fn(warm)
# two measured passes per row per JVM (reported separately)
walls = {name: [fn(sf_dir), fn(sf_dir)] for name, fn in runners.items()}
with open(out_path, "w") as f:
    json.dump(walls, f)
"""


def run_rep(tree: str, sf_dir: str) -> dict[str, list[float]]:
    with tempfile.NamedTemporaryFile("r", suffix=".json") as out:
        subprocess.run(
            [sys.executable, "-c", _RUNNER, tree, sf_dir, out.name],
            check=True, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(out.name) as f:
            return json.load(f)


def main() -> None:
    tree_a = os.path.abspath(sys.argv[1])
    tree_b = os.path.abspath(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

    walls: dict[str, dict[str, list[float]]] = {
        "A": {r: [] for r in ROWS}, "B": {r: [] for r in ROWS},
    }
    # ABBA ordering: each adjacent pair runs both trees, so a monotone
    # box slowdown contributes equally to both medians
    order: list[str] = []
    for i in range(reps):
        order += ["A", "B"] if i % 2 == 0 else ["B", "A"]
    for i, side in enumerate(order):
        tree = tree_a if side == "A" else tree_b
        got = run_rep(tree, sf_dir)
        for row, vals in got.items():
            walls[side][row] += vals
        print(f"proc {i} [{side}] " + " ".join(
            f"{r}={got[r]}" for r in ROWS), flush=True)

    summary = {"tree_a": tree_a, "tree_b": tree_b, "sf_dir": sf_dir,
               "procs_per_tree": reps, "rows": {}}
    for row in ROWS:
        ma = statistics.median(walls["A"][row])
        mb = statistics.median(walls["B"][row])
        summary["rows"][row] = {
            "median_a": ma, "median_b": mb,
            "ratio_b_over_a": round(mb / ma, 3),
            "walls_a": sorted(walls["A"][row]),
            "walls_b": sorted(walls["B"][row]),
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
