"""Driver-contract rehearsal under a BARE SparkSession — exactly what the
external checker builds (no package session configs), driving
``__spark_entry__``'s entry()/queries()/oracle_sql() end to end with the same
row-count + column + value-multiset compare as the correctness gate.

Wall-clock structure (VERDICT r2 item 5 — keep the sweep under 180 s so no
external budget ever truncates it): most queries are pure plan-build +
collect, so they run on a small thread pool (each worker owns its own
DuckDB connection; Spark job submission is thread-safe and 32 local cores
are otherwise underutilized by one query at sf0.01). The one piece of
shared mutable state — the session-global shuffle-partitions pin some
trainers take — is serialized by a lock inside ``shuffle_partitions``
itself, and the trainer fits are warmed up-front so pool workers rarely
enter it at all. Three groups stay ORDERED/serial:

1. warm-up compares that populate the shared fit caches (minhash subtree,
   k-means centroids, PQ codebooks) run BEFORE the pool so pool workers
   never duplicate a fit — but the five warm-ups build five DISJOINT
   caches, so they run concurrently with each other on a small pool
   (r9: 30.8s serial -> ~max of the five; the serialization that matters
   is warmups-before-pool, not warmup-vs-warmup),
2. streaming / write-side-effect queries (st_*, lake_*, sdp_*, rollups,
   warehouse e2e) — each owns its temp dirs and checkpoints (mkdtemp) and
   Spark runs concurrent availableNow streams in one session, so they run
   on their own pool, merely capped lower than the main one,
3. everything already covered — the pool.

Pass --serial to force the old strictly-sequential order when debugging.

Run: python tools/vanilla_rehearsal.py [sf_dir] [--serial]
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_check import compare_query

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Compares that build the shared per-session fit caches; run first, alone,
# so the pool never races two identical Lloyd fits.
WARMUP = [
    "dedup_minhash_pairs",  # minhash subtree cache
    "sim_ann_ivf",  # IVF centroid cache
    "emb_pq_stats",  # PQ codebook cache
    "quality_lr_train",  # LR weight cache (else train+eval race duplicate fits)
    "graph_pagerank",  # weighted-edge cache
]

# Streaming / write-side-effect prefixes stay serial (own temp dirs and
# checkpoints; ordering kept out of caution, not a known conflict).
_SERIAL_PREFIXES = ("st_", "st8_", "lake_", "sdp_", "rollup_", "pipeline_", "s9_")

POOL_WORKERS = 6  # 32-core box: 6 workers x ~5 spark threads — measured best
# (8 workers only inflates per-query contention: spark-side total grew
# 351s -> 420s for the same wall). The r6 SHINGLES_SQL oracle fix dropped the
# DuckDB side to ~27s total, so the remaining levers are Spark-side.
STREAM_POOL_WORKERS = 5  # the write-side group: each query owns its temp
# dirs/checkpoints (mkdtemp) and Spark supports concurrent availableNow
# streams in one session; 3 workers cut the 40s serial tail to ~15s, and
# r9 raised it to 5 (the group grew to 23 queries / ~70s wall at 3 — the
# long pole st_stream_stream_join bounds the floor).
WARMUP_POOL_WORKERS = 5  # the five warm-ups build five DISJOINT fit caches


def _is_serial(name: str) -> bool:
    return name.startswith(_SERIAL_PREFIXES)


def main() -> int:
    from pyspark.sql import SparkSession

    args = [a for a in sys.argv[1:] if a != "--serial"]
    serial_only = "--serial" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("vanilla-rehearsal")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    n = entrymod.entry(spark).count()
    print(f"entry(): {n} rows in {time.monotonic() - t0:.1f}s")

    def new_con():
        con = duckdb.connect()
        # Each connection defaults to one thread per core: 6 pool workers x
        # 32 duckdb threads + 32 Spark threads thrashed the box at sf0.1
        # (o8's trivial projection oracle read 21s; suffix-lcs's 256s).
        # 4 threads/connection keeps the duck side at ~pool-width cores.
        con.execute("SET threads = 4")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return con

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    t_all = time.monotonic()
    timings: dict[str, float] = {}
    spark_ts: dict[str, float] = {}
    duck_ts: dict[str, float] = {}
    results: dict[str, dict] = {}

    def run_one(name: str, con) -> None:
        fn = queries[name]
        sql = oracles.get(name)
        t_q = time.monotonic()
        if sql is None:
            try:
                nrows = fn(spark, sf_dir).count()
                results[name] = {"ok": True, "rows_only": nrows}
                print(f"ROWS-ONLY {name}: {nrows} rows")
            except Exception as e:
                results[name] = {"ok": False, "why": f"rows-only error {e}"}
                print(f"FAIL {name}: rows-only error {e}")
            timings[name] = time.monotonic() - t_q
            return
        try:
            r = compare_query(spark, con, name, fn, sql, sf_dir)
        except Exception as e:
            r = {"name": name, "ok": False, "why": f"spark error: {e}"}
        timings[name] = time.monotonic() - t_q
        spark_ts[name] = r.get("t_spark", 0.0)
        duck_ts[name] = r.get("t_duck", 0.0)
        results[name] = r
        if not r["ok"]:
            print(f"FAIL {name}: {r['why'][:300]}")

    warm = [n for n in WARMUP if n in queries]
    serial = [n for n in queries if _is_serial(n) and n not in warm]
    pooled = [n for n in queries if n not in set(warm) | set(serial)]
    if serial_only:
        serial, pooled = serial + pooled, []

    # one DuckDB connection per worker; Spark session is shared (job
    # submission is thread-safe; results are collected per-thread)
    import threading

    local = threading.local()

    def pool_run(name: str) -> None:
        if not hasattr(local, "con"):
            local.con = new_con()
        run_one(name, local.con)

    main_con = new_con()
    t_warm = time.monotonic()
    if serial_only:
        for name in warm:
            run_one(name, main_con)
    else:
        with ThreadPoolExecutor(max_workers=WARMUP_POOL_WORKERS) as pool:
            list(pool.map(pool_run, warm))
    t_serial = time.monotonic()
    if serial_only:
        for name in serial:
            run_one(name, main_con)
    elif serial:
        # The write-side group runs on its own SMALL pool: each query owns
        # its temp dirs and checkpoint locations (tempfile.mkdtemp), and
        # Spark runs concurrent availableNow streams in one session fine.
        # Kept separate from the big pool so at most a few streaming
        # queries are ever in flight together.
        with ThreadPoolExecutor(max_workers=STREAM_POOL_WORKERS) as pool:
            list(pool.map(pool_run, serial))
    t_pool = time.monotonic()
    print(
        f"[groups] warmup {t_serial - t_warm:.1f}s ({len(warm)}), "
        f"write-side {t_pool - t_serial:.1f}s ({len(serial)})"
    )
    if pooled:
        with ThreadPoolExecutor(max_workers=POOL_WORKERS) as pool:
            list(pool.map(pool_run, pooled))

    n_pass = sum(1 for r in results.values() if r["ok"])
    n_fail = len(results) - n_pass
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    print("\nslowest (spark+oracle wall):")
    for name, t in slowest:
        print(f"  {t:6.2f}s  {name}")
    print(
        f"split: spark {sum(spark_ts.values()):.1f}s, duckdb {sum(duck_ts.values()):.1f}s; "
        f"duck top: {sorted(duck_ts.items(), key=lambda kv: -kv[1])[:5]}"
    )
    print(
        f"\n{n_pass} pass, {n_fail} fail over {len(queries)} queries "
        f"in {time.monotonic() - t_all:.1f}s (bare session, {sf_dir})"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
