"""No-Spark scaling control: the identical numpy sketch kernels under plain
``multiprocessing`` at two process counts, over the same synthetic corpus the
Spark scaling bench uses.

Purpose (BENCH/BASELINE.md): separates engine overhead from hardware limits.
If raw numpy under multiprocessing shows the same per-core throughput cliff
at 32 procs as Spark does, the cliff is the shared socket (memory bandwidth /
turbo headroom), not the engine — and on a real 4N-executor cluster (4N
sockets) that term scales. Run:

    python tools/mp_control.py [n_rows] [N]

Prints one JSON line with rows/s at N and 4N procs and the efficiency ratio.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 400_000
BASE_PROCS = 8


def _corpus(n_rows: int):
    import pandas as pd

    path = f"/tmp/rensa_bench_corpus_{n_rows}.parquet"
    if not os.path.exists(path):
        from rensa_spark.sources.synthetic import generate_corpus

        pdf = generate_corpus(n_rows, seed=12345, with_images=False)
        pdf[["image_id", "caption"]].to_parquet(path, index=False)
    return pd.read_parquet(path)


def _worker(captions) -> int:
    from rensa_spark.kernels.prng import rminhash_permutations
    from rensa_spark.kernels.rminhash import rminhash_matrix
    from rensa_spark.kernels.shingle import shingle_hashes_batch

    a, b = rminhash_permutations(128, 12345)
    flat, offsets = shingle_hashes_batch(captions, 3)
    sig = rminhash_matrix(flat, offsets, a, b)
    return int(sig[:, 0].sum())  # consume the result


def run(procs: int, captions: list[str], trials: int = 2) -> float:
    chunk = (len(captions) + procs - 1) // procs
    parts = [captions[i : i + chunk] for i in range(0, len(captions), chunk)]
    best = float("inf")
    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(_worker, [p[:64] for p in parts])  # warm imports
        for _ in range(trials):
            t0 = time.perf_counter()
            pool.map(_worker, parts)
            best = min(best, time.perf_counter() - t0)
    return len(captions) / best


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else N_ROWS
    base = int(sys.argv[2]) if len(sys.argv) > 2 else BASE_PROCS
    captions = list(_corpus(n_rows)["caption"])
    tput_n = run(base, captions)
    tput_4n = run(base * 4, captions)
    print(
        json.dumps(
            {
                "metric": "mp_control sketch rows/s (no Spark)",
                "rows": n_rows,
                "procs_n": base,
                "rows_per_sec_n": round(tput_n, 1),
                "procs_4n": base * 4,
                "rows_per_sec_4n": round(tput_4n, 1),
                "efficiency_n_to_4n": round(tput_4n / (4 * tput_n), 3),
                "per_core_n": round(tput_n / base, 1),
                "per_core_4n": round(tput_4n / (base * 4), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
