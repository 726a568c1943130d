"""Throughput scaling evidence for the north rule: the same one-shot dedup
job at two parallelism levels (local[N] vs local[4N]) on the same input,
reporting both throughputs and eff = T_put(4N) / (4 * T_put(N)).

This is the sandbox proxy for N vs 4N executors (BASELINE.md): no real
cluster exists here, so cores-within-one-host stand in for executors. Run:

    python tools/scaling_bench.py [n_rows] [N]

Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 400_000
BASE_CORES = 8


def corpus_path(n_rows: int) -> str:
    path = f"/tmp/rensa_bench_corpus_{n_rows}.parquet"
    if not os.path.exists(path):
        from rensa_spark.sources.synthetic import generate_corpus

        pdf = generate_corpus(n_rows, seed=12345, with_images=False)
        pdf[["image_id", "caption"]].to_parquet(path, index=False)
    return path


def child(cores: int, path: str) -> None:
    from pyspark.sql import functions as F

    from rensa_spark.config import RensaConfig
    from rensa_spark.operators.dedup import dup_flags
    from rensa_spark.session import get_spark

    cfg = RensaConfig(num_perm=128, seed=12345, threshold=0.8, num_bands=8)
    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 16),
    )
    corpus = spark.read.parquet(path).repartition(cores * 3).cache()
    n = corpus.count()
    from rensa_spark.operators.sketch import rminhash_band_rows

    # steady-state measurement: run once to warm every python worker
    # (imports + permutation tables) and the JIT, time the second run —
    # a long-running cluster pays worker startup once per executor, not
    # per job, so the steady state is the number that scales
    def run_dedup():
        dup_flags(corpus, cfg, "image_id", "caption").write.format("noop").mode(
            "overwrite"
        ).save()

    def run_sketch():
        rminhash_band_rows(corpus, cfg, "image_id", "caption").write.format(
            "noop"
        ).mode("overwrite").save()

    def best_of(fn, trials: int = int(os.environ.get("SCALING_TRIALS", "2"))) -> float:
        fn()  # warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    sk_sec = best_of(run_sketch)
    sec = best_of(run_dedup)
    spark.stop()
    print(
        "CHILD_RESULT "
        + json.dumps({"cores": cores, "dedup_sec": sec, "sketch_sec": sk_sec, "rows": n})
    )


def main() -> None:
    global N_ROWS, BASE_CORES
    if len(sys.argv) > 1:
        N_ROWS = int(sys.argv[1])
    if len(sys.argv) > 2:
        BASE_CORES = int(sys.argv[2])
    path = corpus_path(N_ROWS)
    # the no-Spark hardware control runs INTERLEAVED with each Spark phase
    # (round-4: a sequential control an hour later certifies nothing on this
    # host — per-core speed swings 2x between windows; see BENCH/BASELINE.md
    # window 4, where the control itself collapsed to 0.39)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import mp_control  # spawn workers re-import by module name

    import pandas as pd

    captions = list(pd.read_parquet(path)["caption"])

    results = {}
    control = {}
    for cores in [BASE_CORES, BASE_CORES * 4]:
        time.sleep(5)  # cool-down between children
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(cores), path],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("CHILD_RESULT ")][-1]
        results[cores] = json.loads(line[len("CHILD_RESULT ") :])
        control[cores] = mp_control.run(cores, captions)

    n, n4 = BASE_CORES, BASE_CORES * 4
    tput = {c: results[c]["rows"] / results[c]["dedup_sec"] for c in results}
    sk_tput = {c: results[c]["rows"] / results[c]["sketch_sec"] for c in results}
    eff = tput[n4] / (4 * tput[n])
    sk_eff = sk_tput[n4] / (4 * sk_tput[n])
    summary = {
        "rows": N_ROWS,
        "cores_low": n,
        "cores_high": n4,
        "dedup_rows_per_sec": {str(c): round(tput[c], 1) for c in tput},
        "sketch_rows_per_sec": {str(c): round(sk_tput[c], 1) for c in sk_tput},
        "dedup_scaling_efficiency": round(eff, 3),
        "sketch_scaling_efficiency": round(sk_eff, 3),
        "control_rows_per_sec": {str(c): round(control[c], 1) for c in control},
        "control_efficiency": round(control[n4] / (4 * control[n]), 3),
        # a window only counts when the hardware itself scaled: per-core
        # control throughput at 4N within [0.8, 1.25] of linear
        "window_certified": bool(
            0.8 <= control[n4] / (4 * control[n]) <= 1.25
        ),
    }
    print(json.dumps(summary))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_runs.jsonl", "a") as f:
        f.write(json.dumps({**summary, "raw": results}) + "\n")
    return

    # (superseded by the curated BENCH/BASELINE.md; kept for reference)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — throughput + scaling efficiency

One-shot MinHash dedup (sketch -> bands -> bucket-size flags; the reference
benchmark lane, `benchmarks/full_benchmark.py:542-547`) on the deterministic
synthetic caption corpus ({N_ROWS:,} rows, seed=12345, num_perm=128, bands=8,
threshold=0.8, word 3-grams), identical input at both parallelism levels.

Sandbox proxy for N vs 4N executors: `local[{n}]` vs `local[{n4}]` on one
host (no real cluster available here; see BASELINE.md).

| lane | local[{n}] rows/s | local[{n4}] rows/s | efficiency T({n4})/(4*T({n})) |
|---|---|---|---|
| sketch (signatures/sec) | {sk_tput[n]:.0f} | {sk_tput[n4]:.0f} | **{sk_eff:.3f}** |
| end-to-end one-shot dedup | {tput[n]:.0f} | {tput[n4]:.0f} | **{eff:.3f}** |

Raw child timings: {json.dumps({str(c): results[c] for c in results})}

Reference single-node comparison: rensa's README reports its advantage as
608x vs datasketch on HF corpora (README.md:18-25); on this host the Spark
pipeline sustains {max(sk_tput.values()):.0f} signatures/sec end-to-end across
{n4} cores including Arrow transfer and shuffle.
"""
        )


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        main()
