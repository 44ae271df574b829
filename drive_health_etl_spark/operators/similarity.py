"""Similarity search over ``embeddings`` (north-star extension).

Brute-force cosine top-k as the correctness baseline: broadcast the (small)
query set against the full corpus — a narrow map over candidates, no shuffle
until the per-query top-k (window over ~n_queries * k rows). At 100 TB the
candidate scan is embarrassingly parallel; the LSH/IVF bucketed variant
(round 2) cuts the scanned fraction.

Float policy: all math in double with a left-to-right fold (Spark
``aggregate``), mirrored in DuckDB by ``list_dot_product`` on DOUBLE[];
outputs rounded to 6 dp.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drive_health_etl_spark.operators.fitcache import FitCache
from drive_health_etl_spark.sources.tables import load_table

N_QUERIES = 8
TOP_K = 5


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = N_QUERIES,
    top_k: int = TOP_K,
) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        # single-file scan -> spread the dot-product evaluation across cores
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    pairs = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("qe"), F.col("e")) / (_norm(F.col("qe")) * _norm(F.col("e"))), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(spark, sf_dir)


SIM_COSINE_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
  FROM e q JOIN e c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics: count, mean L2 norm, mean of the first
    component — the sanity profile run before any ANN indexing."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("e")
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(_norm(F.col("e"))), 6).alias("avg_norm"),
        F.round(F.avg(F.col("e").getItem(0)), 6).alias("avg_first_dim"),
    )


EMB_NORM_STATS_SQL = """
SELECT label, COUNT(*) AS n,
       ROUND(AVG(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm,
       ROUND(AVG((embedding::DOUBLE[])[1]), 6) AS avg_first_dim
FROM embeddings GROUP BY label
"""


N_CELLS = 16
EMB_DIM = 64
KMEANS_ROUNDS = 3


def _const_norm(weights: list[float]) -> float:
    # plain left-to-right double accumulation (sum()), NOT fsum: must match
    # list_dot_product's fold exactly
    return math.sqrt(sum(w * w for w in weights))


def _cents_df(spark: SparkSession, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """The centroid matrix as a ONE-ROW DataFrame (column ``cmat``:
    array<struct<negid:int, ce:array<double>, nrm:double>>). Joined in as a
    broadcast so the N_CELLS x 64 weights stay OUT of the expression tree —
    the same matrix as nested literals costs ~1s of Catalyst
    analysis/codegen per round at any data size (same fix as the LSH plane
    matrix in plans/extended.py)."""
    import pyspark.sql.types as T

    rows = [
        {"negid": -cent_id, "ce": ce, "nrm": _const_norm(ce)} for cent_id, ce in sorted(cents)
    ]
    schema = T.StructType(
        [
            T.StructField(
                "cmat",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("negid", T.IntegerType()),
                            T.StructField("ce", T.ArrayType(T.DoubleType())),
                            T.StructField("nrm", T.DoubleType()),
                        ]
                    )
                ),
            )
        ]
    )
    return spark.createDataFrame([(rows,)], schema)


def _assign_cell_expr(e: Column) -> Column:
    """Nearest-centroid (max-cosine) id as a pure column expression over the
    joined ``cmat`` column: a narrow map, no shuffle, no window. Ties keep
    the lowest cent_id — identical to the oracle's ROW_NUMBER ... ORDER BY
    ccos DESC, cent_id. Implemented as array_max over (score, -cent_id)
    structs (struct ordering is lexicographic by field position), which is
    LINEAR in N_CELLS; a when/otherwise fold would duplicate the running
    `best` subtree at every step — an exponentially-sized expression tree
    that stalls Catalyst for minutes at 16 centroids."""
    # argmax over cosine == argmax over dot/||c|| (||e|| is a shared positive
    # factor): skip the 16 redundant norm(e) folds. Exact ties (identical
    # vectors) tie in both formulations, so tiebreak behavior is unchanged.
    scored = F.transform(
        F.col("cmat"),
        lambda c: F.struct(
            (
                F.aggregate(
                    F.zip_with(e, c["ce"], lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / c["nrm"]
            ).alias("c"),
            c["negid"].alias("negid"),
        ),
    )
    return -F.array_max(scored)["negid"]


def kmeans_centroids(
    emb: DataFrame, rounds: int = KMEANS_ROUNDS, k: int = N_CELLS
) -> list[tuple[int, list[float]]]:
    """Spherical k-means (Lloyd) with deterministic seeding: init = the first
    N_CELLS vectors by vec_id, then ``rounds`` iterations of assign -> mean.
    Assignment is a narrow map over centroid literals; the centroid update is
    one groupBy with 64 per-dimension sums (map-side combinable). The only
    driver-side data is the N_CELLS x 64 centroid matrix per round — the
    same bounded collect Spark MLlib's KMeans performs each iteration.

    Cross-engine determinism: per-dimension sums go through DECIMAL(28,12)
    (exact, order-independent) before the double division, so the DuckDB
    oracle's unrolled iterations reproduce centroids bit-for-bit; assignment
    ties break on cent_id. Empty cells drop out in both engines alike."""
    from drive_health_etl_spark.session import shuffle_partitions

    spark = emb.sparkSession
    cents = [
        (r["vec_id"], list(r["e"]))
        for r in emb.filter(F.col("vec_id") < k).select("vec_id", "e").collect()
    ]
    # the per-round shuffle is N_CELLS x 64 keys — 32 shuffle partitions make
    # each round scheduling-bound (32 tasks for ~1k groups); 8 is plenty
    with shuffle_partitions(spark, 8):
        for _ in range(rounds):
            assigned = (
                emb.join(F.broadcast(_cents_df(spark, cents)))
                .withColumn("cell", _assign_cell_expr(F.col("e")))
                .drop("cmat")
            )
            # posexplode to (cell, dim, value) and run ONE narrow 2-key
            # aggregate instead of 64 wide decimal-sum columns: a 64x-smaller
            # logical plan (26% faster fit at sf0.01), same exact decimal
            # sums. The explode is map-side-combined before the tiny shuffle.
            sums = (
                assigned.select("cell", F.posexplode("e").alias("d", "v"))
                .groupBy("cell", "d")
                .agg(
                    F.sum(F.col("v").cast("decimal(28,12)")).cast("double").alias("s"),
                    F.count("*").alias("n"),
                )
            )
            by_cell: dict[int, list[float]] = {}
            for r in sums.collect():
                by_cell.setdefault(r["cell"], [0.0] * EMB_DIM)[r["d"]] = r["s"] / r["n"]
            cents = [(c, v) for c, v in sorted(by_cell.items())]
    return cents


# Fitted centroids per (session, sf_dir): the fit is deterministic, so
# repeated sim_ann_ivf calls (contract sweep + bench + bench recall pass)
# reuse one Lloyd run instead of re-fitting. Same pattern as the MinHash
# subtree cache in operators/dedup.py.
_CENTROID_CACHE = FitCache()  # keys (appId, sf_dir, k); scope-LRU bounded


def _centroids_cached(
    spark: SparkSession, sf_dir: str, emb: DataFrame, k: int = N_CELLS
) -> list[tuple[int, list[float]]]:
    key = (spark.sparkContext.applicationId, sf_dir, k)
    return _CENTROID_CACHE.get_or_build(key, lambda: kmeans_centroids(emb, k=k))


_ASSIGN_CACHE = FitCache()  # keys (appId, sf_dir, k); scope-LRU bounded


def _assigned_cached(
    spark: SparkSession, sf_dir: str, emb: DataFrame, cents, k: int = N_CELLS
) -> DataFrame:
    """The INVERTED FILE — every vector's nearest-centroid cell plus its
    precomputed L2 norm — persisted once per (session, dataset, k). The
    16-centroid argmax fold is the single most expensive narrow map in the
    similarity family, and pre-r11 it re-executed per CONSUMER of every
    query's `assigned` relation (SemDeDup's stats query alone consumed it
    three times: both pair-join sides and the verdict join). The IVF
    assignment is a fitted index artifact exactly like the centroids and
    PQ codebooks above — at production scale the inverted file is
    materialized by the indexer, not recomputed per search (guide §5:
    cache what is reused and expensive). Columns: vec_id, e, cell, enorm,
    ccos (cosine to the assigned centroid — SemDeDup's keep priority, one
    fold at index time instead of per consumer); consumers project what
    they need."""

    def build() -> DataFrame:
        cent_rows = spark.createDataFrame(
            [(cid, ce, _const_norm(ce)) for cid, ce in cents],
            "cell int, ce array<double>, cnorm double",
        )
        return (
            emb.join(F.broadcast(_cents_df(spark, cents)))
            .withColumn("cell", _assign_cell_expr(F.col("e")))
            .select("vec_id", "e", "cell", _norm(F.col("e")).alias("enorm"))
            .join(F.broadcast(cent_rows), "cell")
            .select(
                "vec_id", "e", "cell", "enorm",
                (_dot(F.col("e"), F.col("ce")) / (F.col("enorm") * F.col("cnorm"))).alias("ccos"),
            )
            .persist()
        )

    key = (spark.sparkContext.applicationId, sf_dir, k)
    return _ASSIGN_CACHE.get_or_build(key, build)


def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: k-means the corpus into N_CELLS centroids (real Lloyd
    iterations, deterministic seed), assign every vector to its cell
    (inverted file), then search only the query's cell. Assignment is a
    narrow centroid-literal scoring map; search joins on cell id with the
    8-query side broadcast — never all-pairs."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    cents = _centroids_cached(spark, sf_dir, emb)
    assigned = _assigned_cached(spark, sf_dir, emb, cents).select(
        "vec_id", "e", "cell"
    )
    q = assigned.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("cell").alias("qcell")
    )
    cand = assigned.join(
        F.broadcast(q), (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("qe"), F.col("e")) / (_norm(F.col("qe")) * _norm(F.col("e"))), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


_COS_SQL = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _kmeans_sql_ctes(rounds: int = KMEANS_ROUNDS) -> str:
    """Unrolled Lloyd iterations mirroring kmeans_centroids exactly."""
    parts = [f"cent0 AS (SELECT vec_id AS cent_id, emb AS ce FROM e WHERE vec_id < {N_CELLS})"]
    for r in range(rounds):
        cos = _COS_SQL.format(a="e.emb", b="c.ce")
        parts.append(
            f"""assign{r} AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cent_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos} DESC, c.cent_id ASC) AS rn
    FROM e CROSS JOIN cent{r} c
  ) WHERE rn = 1
)"""
        )
        dims = ",\n    ".join(
            f"CAST(SUM(CAST(emb[{d + 1}] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)"
            for d in range(EMB_DIM)
        )
        parts.append(
            f"cent{r + 1} AS (\n  SELECT cell AS cent_id, [{dims}] AS ce\n  FROM assign{r} GROUP BY cell\n)"
        )
    return ",\n".join(parts)


SIM_ANN_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
{_kmeans_sql_ctes()},
assigned AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_SQL.format(a="e.emb", b="c.ce")} DESC,
                      c.cent_id ASC) AS rn
    FROM e CROSS JOIN cent{KMEANS_ROUNDS} c
  ) WHERE rn = 1
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
  FROM assigned q JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
  WHERE q.vec_id < 8
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


# --- SemDeDup: semantic dedup via k-means clusters --------------------------

# On this corpus (near-random embeddings, max cosine ~0.51) 0.35 selects a
# meaningful near-dup tail (68/500 dropped at sf0.01, 671/2000 at sf0.1); a
# real near-dup corpus would use 0.95+. The comparison is on the raw IEEE
# cosine (identical in both engines), never a rounded value.
SEMDEDUP_TAU = 0.35


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop embeddings whose cosine to an
    EARLIER vector in the SAME k-means cluster exceeds a threshold — the
    cluster step bounds the quadratic pair term to within-cell pairs, which
    is what makes semantic dedup tractable at corpus scale (all-pairs is
    O(n^2); cells make it sum of O(|cell|^2) with |cell| ~ n/k, and k grows
    with the corpus). Keeps the lowest vec_id of each near-dup group
    (deterministic, order-independent).

    Reuses the fitted IVF centroids (same Lloyd run, cached per session);
    the pair join shuffles on cell id only. Returns per-cell dedup stats;
    the oracle recomputes the identical clustering via unrolled CTEs."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    cents = _centroids_cached(spark, sf_dir, emb)
    return _semdedup_stats(spark, sf_dir, emb, cents)


SEMDEDUP_CELL_TARGET = 256  # target vectors per cell for the k ~ n/cell policy


def dedup_semantic_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-scale SemDeDup: k grows with the corpus so cells stay
    ~SEMDEDUP_CELL_TARGET vectors — total in-cell pair work is then
    O(n * cell) = LINEAR in n, the k ∝ n policy from the SemDeDup paper.
    The fixed-k `dedup_semantic` stays the oracle-checked configuration
    (its unrolled Lloyd CTEs need a static centroid count; a data-dependent
    k cannot be replayed by static SQL) — this variant is the shape you run
    at 100 TB and the one `tools/scale_probe.py` measures for the slope
    table. Same fit/assign/pair machinery; only k differs."""
    import math as _math

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    n = emb.count()  # one cheap count; the Lloyd fit scans the corpus anyway
    k = max(N_CELLS, _math.ceil(n / SEMDEDUP_CELL_TARGET))
    cents = _centroids_cached(spark, sf_dir, emb, k=k)
    return _semdedup_stats(spark, sf_dir, emb, cents, k=k)


def _semdedup_stats(
    spark: SparkSession, sf_dir: str, emb: DataFrame, cents, k: int = N_CELLS
) -> DataFrame:
    # Norm is precomputed per VECTOR (linear work) so the quadratic in-cell
    # pair filter below evaluates a single array fold (the dot) per pair
    # instead of three — at |cell| ~ n/k this is the dominant cost term.
    # The cosine expression keeps the exact same operation order as the
    # oracle (dot / (|u|·|v|)), so threshold comparisons stay bit-identical.
    # r11: the assignment relation feeds three consumers (both pair-join
    # sides and the verdict join) — read it from the shared inverted-file
    # cache instead of re-running the argmax fold per consumer.
    assigned = _assigned_cached(spark, sf_dir, emb, cents, k=k)
    u = assigned.select(
        F.col("cell").alias("ucell"),
        F.col("vec_id").alias("u_id"),
        F.col("e").alias("ue"),
        F.col("enorm").alias("unorm"),
    )
    v = assigned.select(
        F.col("cell").alias("vcell"),
        F.col("vec_id").alias("v_id"),
        F.col("e").alias("ve"),
        F.col("enorm").alias("vnorm"),
    )
    dropped = (
        u.join(v, (F.col("ucell") == F.col("vcell")) & (F.col("u_id") < F.col("v_id")))
        .filter(
            _dot(F.col("ue"), F.col("ve")) / (F.col("unorm") * F.col("vnorm"))
            >= SEMDEDUP_TAU
        )
        .select(F.col("v_id").alias("dropped_id"))
        .distinct()
    )
    return (
        assigned.join(dropped, assigned.vec_id == dropped.dropped_id, "left_outer")
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            F.count("dropped_id").alias("n_dropped"),
        )
        .orderBy("cell")
    )


DEDUP_SEMANTIC_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
{_kmeans_sql_ctes()},
assigned AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_SQL.format(a="e.emb", b="c.ce")} DESC,
                      c.cent_id ASC) AS rn
    FROM e CROSS JOIN cent{KMEANS_ROUNDS} c
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT v.vec_id AS dropped_id
  FROM assigned u JOIN assigned v ON u.cell = v.cell AND u.vec_id < v.vec_id
  WHERE {_COS_SQL.format(a="u.emb", b="v.emb")} >= {SEMDEDUP_TAU}
)
SELECT cell, COUNT(*) AS n_vectors, COUNT(dropped_id) AS n_dropped
FROM assigned LEFT JOIN dropped ON vec_id = dropped_id
GROUP BY cell ORDER BY cell
"""


def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup's PRUNE half with the paper's keeper rule (Abbas et al.
    2023, "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", §2.2): per-vector keep/drop verdicts — the corpus
    transformation a pipeline actually applies — where each group of
    cosine-near in-cluster vectors keeps the exemplar with the LOWEST
    cosine to its cluster centroid (the paper's diversity-preserving
    choice: the item farthest from the cluster center survives).
    `dedup_semantic` reports per-cell drop COUNTS under a lowest-id rule;
    this emits the row-level verdict table under the published priority.

    Drop rule in the order-free DOMINANCE form: x is dropped iff some
    same-cell y with higher keep priority — lower centroid-cosine, ties by
    lower vec_id — has cos(x, y) >= SEMDEDUP_TAU. Any mutually-near clique
    keeps exactly its highest-priority member, matching the paper's
    per-cluster sweep; the forms differ only on chains whose middle
    element is the sole link between survivors. The dominance form is one
    bounded in-cell join (no sequential per-cluster scan), deterministic
    under any row/partition order.

    Scale shape: identical to `dedup_semantic` — one centroid broadcast
    (fit cached per session/dataset), assignment as a narrow
    centroid-literal map, the quadratic term bounded to within-cell pairs
    (k grows with the corpus via the `dedup_semantic_scaled` policy at
    production scale), plus one K-row centroid broadcast join to attach
    the assigned cell's vector for the centroid-cosine priority. Parity
    contract (ADVICE r10, closed in r11): BOTH the centroid cosine and the
    pair cosine are the native `aggregate` fold — the same sequential IEEE
    op order as DuckDB's list_dot_product — so priority ordering AND the
    `>= SEMDEDUP_TAU` verdicts are bit-identical across engines with no
    real-margin caveat. (The earlier Arrow/numpy-einsum pair dot was also
    MEASURED slower here: the quadratic pair volume is in-cell bounded, so
    the per-batch Python round-trip dominated — r11 A/B 0.75 s vs 0.52 s
    warm at sf0.1's 125k pairs, and the fold fuses into codegen.)"""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    cents = _centroids_cached(spark, sf_dir, emb)
    return _semdedup_prune_verdicts(spark, sf_dir, emb, cents)


def dedup_semantic_prune_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-scale prune: k grows with the corpus (the same
    k ~ n/{SEMDEDUP_CELL_TARGET} policy as `dedup_semantic_scaled`) so
    in-cell pair work stays LINEAR in n. The fixed-k `dedup_semantic_prune`
    stays the oracle-checked configuration (its unrolled Lloyd CTEs need a
    static centroid count); this variant is the 100 TB shape and the one
    `tools/scale_probe.py` measures for the slope table."""
    import math as _math

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    n = emb.count()
    k = max(N_CELLS, _math.ceil(n / SEMDEDUP_CELL_TARGET))
    cents = _centroids_cached(spark, sf_dir, emb, k=k)
    return _semdedup_prune_verdicts(spark, sf_dir, emb, cents, k=k)


def _semdedup_prune_verdicts(
    spark: SparkSession, sf_dir: str, emb: DataFrame, cents, k: int = N_CELLS
) -> DataFrame:
    # r11: assignment, norm AND the centroid-cosine priority come from the
    # shared inverted-file cache (three consumers below).
    assigned = _assigned_cached(spark, sf_dir, emb, cents, k=k).select(
        "vec_id", "cell", "e", "enorm", "ccos"
    )
    u = assigned.select(
        F.col("cell").alias("ucell"), F.col("vec_id").alias("u_id"),
        F.col("e").alias("ue"), F.col("enorm").alias("unorm"),
        F.col("ccos").alias("ucos"),
    )
    v = assigned.select(
        F.col("cell").alias("vcell"), F.col("vec_id").alias("v_id"),
        F.col("e").alias("ve"), F.col("enorm").alias("vnorm"),
        F.col("ccos").alias("vcos"),
    )
    dropped = (
        u.join(
            v,
            (F.col("ucell") == F.col("vcell"))
            & (
                (F.col("ucos") < F.col("vcos"))
                | ((F.col("ucos") == F.col("vcos")) & (F.col("u_id") < F.col("v_id")))
            ),
        )
        .filter(
            _dot(F.col("ue"), F.col("ve")) / (F.col("unorm") * F.col("vnorm"))
            >= SEMDEDUP_TAU
        )
        .select(F.col("v_id").alias("dropped_id"))
        .distinct()
    )
    return (
        assigned.join(dropped, assigned.vec_id == dropped.dropped_id, "left_outer")
        .select(
            "vec_id", "cell",
            F.round(F.col("ccos"), 6).alias("cent_cos"),
            F.col("dropped_id").isNull().alias("kept"),
        )
        .orderBy("vec_id")
    )


DEDUP_SEMANTIC_PRUNE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
{_kmeans_sql_ctes()},
assigned AS (
  SELECT vec_id, emb, cell, ccos FROM (
    SELECT e.vec_id, e.emb, c.cent_id AS cell,
           {_COS_SQL.format(a="e.emb", b="c.ce")} AS ccos,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_SQL.format(a="e.emb", b="c.ce")} DESC,
                      c.cent_id ASC) AS rn
    FROM e CROSS JOIN cent{KMEANS_ROUNDS} c
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT v.vec_id AS dropped_id
  FROM assigned u JOIN assigned v
    ON u.cell = v.cell
   AND (u.ccos < v.ccos OR (u.ccos = v.ccos AND u.vec_id < v.vec_id))
  WHERE {_COS_SQL.format(a="u.emb", b="v.emb")} >= {SEMDEDUP_TAU}
)
SELECT a.vec_id, a.cell, ROUND(a.ccos, 6) AS cent_cos,
       (d.dropped_id IS NULL) AS kept
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.dropped_id
ORDER BY a.vec_id
"""


# --- kNN classification eval -------------------------------------------------

KNN_EVAL_N = 64  # vec_id < KNN_EVAL_N form the held-out eval set
KNN_K = 5


def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label prediction as a retrieval-quality eval: hold out the first
    ``KNN_EVAL_N`` vectors, predict each one's ``label`` by majority vote of
    its ``KNN_K`` nearest train-set neighbors (cosine), report per-true-label
    accuracy. The standard 'is this embedding space any good' probe a
    training pipeline runs after every encoder refresh.

    Plan shape mirrors ``sim_cosine_topk``: the eval set broadcasts against
    the train scan (narrow), the only shuffles are the per-query top-k window
    and the vote/accuracy aggregations over ``KNN_EVAL_N × KNN_K`` rows —
    driver-scale-independent. Vote and rank tiebreaks are fully deterministic
    (count desc, label asc; cosine rounded to 6 before ranking so both
    engines rank identical values)."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
    )
    # norms precomputed per vector (linear) so the eval×train pair map folds
    # one dot, not three — same trick as the SemDeDup pair filter.
    evals = emb.filter(F.col("vec_id") < KNN_EVAL_N).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("e").alias("qe"),
        _norm(F.col("e")).alias("qnorm"),
    )
    train = emb.filter(F.col("vec_id") >= KNN_EVAL_N).withColumn("enorm", _norm(F.col("e")))
    scored = train.join(F.broadcast(evals)).select(
        "query_id",
        "true_label",
        F.col("label").alias("neighbor_label"),
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qe"), F.col("e")) / (F.col("qnorm") * F.col("enorm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    topk = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= KNN_K)
    votes = topk.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count("*").alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("neighbor_label").asc()
    )
    pred = (
        votes.withColumn("vrnk", F.row_number().over(wv))
        .filter(F.col("vrnk") == 1)
        .select("query_id", "true_label", F.col("neighbor_label").alias("pred_label"))
    )
    return (
        pred.groupBy("true_label")
        .agg(
            F.count("*").alias("n_eval"),
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        )
        .withColumn(
            "accuracy", F.round(F.col("n_correct").cast("double") / F.col("n_eval"), 6)
        )
        .orderBy("true_label")
    )


SIM_KNN_CLASSIFY_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS true_label,
         c.label AS neighbor_label, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.emb, c.emb)
               / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
  FROM e q JOIN e c ON c.vec_id >= {KNN_EVAL_N}
  WHERE q.vec_id < {KNN_EVAL_N}
),
topk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {KNN_K}
),
votes AS (
  SELECT query_id, true_label, neighbor_label, COUNT(*) AS n_votes
  FROM topk GROUP BY query_id, true_label, neighbor_label
),
pred AS (
  SELECT query_id, true_label, neighbor_label AS pred_label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY n_votes DESC, neighbor_label ASC) AS vrnk
    FROM votes
  ) WHERE vrnk = 1
)
SELECT true_label, COUNT(*) AS n_eval,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS accuracy
FROM pred GROUP BY true_label ORDER BY true_label
"""


# --- int8 quantization stats -------------------------------------------------


def emb_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = 127/max|x|) with
    reconstruction-error stats — the compression step that makes a 100 TB
    embedding store 4× smaller before ANN indexing; the MSE column is the
    go/no-go signal for it. Pure narrow map: scale, round, reconstruct and
    fold the squared error per row; no shuffle at all (the report keeps one
    row per vector so the gate hashes every reconstruction)."""
    # max_abs is SELECTed into a column before the per-element lambda uses it:
    # inlining the array_max fold into the lambda body would re-evaluate it
    # twice per element (the duplicated-subtree trap — see ROADMAP gotchas).
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        F.array_max(F.transform(F.col("embedding").cast("array<double>"), F.abs)).alias(
            "max_abs"
        ),
    )
    s = F.lit(127.0) / F.col("max_abs")
    err = F.transform(
        F.col("e"), lambda x: F.pow(x - F.round(x * s) / s, F.lit(2))
    )
    mse = F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x) / F.size("e")
    return emb.filter(F.col("max_abs") > 0).select(
        "vec_id",
        F.size("e").alias("n_dims"),
        F.round("max_abs", 6).alias("max_abs"),
        F.round(mse, 6).alias("mse"),
    )


EMB_QUANTIZE_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS max_abs
  FROM embeddings
)
SELECT vec_id, len(emb) AS n_dims, ROUND(max_abs, 6) AS max_abs,
       ROUND(list_sum(list_transform(emb,
                x -> pow(x - round(x * (127.0 / max_abs)) / (127.0 / max_abs), 2)))
             / len(emb), 6) AS mse
FROM e WHERE max_abs > 0
"""


ENERGY_DIMS = (16, 32, 48)


def emb_dim_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-energy profile (the Matryoshka/MRL truncation question):
    what fraction of each vector's squared L2 mass lives in its first
    16/32/48 dimensions — i.e. how much quality survives truncating the
    embedding column for a cheaper index. One row: corpus means.

    Plan: narrow map (three prefix dot products per row, sequential fold
    identical in both engines), then a single-row aggregate with
    decimal-cast terms so summation order cannot diverge."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    tot = _dot(F.col("e"), F.col("e"))
    ratios = emb.select(
        *[
            (_dot(F.slice("e", 1, k), F.slice("e", 1, k)) / tot).alias(f"r{k}")
            for k in ENERGY_DIMS
        ]
    )
    return ratios.agg(
        F.count("*").alias("n_vecs"),
        *[
            F.round(
                F.sum(F.col(f"r{k}").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias(f"mean_energy_{k}")
            for k in ENERGY_DIMS
        ],
    )


_ENERGY_TERMS = ",\n       ".join(
    "ROUND(CAST(SUM(CAST(list_dot_product((embedding::DOUBLE[])[1:{k}], "
    "(embedding::DOUBLE[])[1:{k}]) / list_dot_product(embedding::DOUBLE[], "
    "embedding::DOUBLE[]) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) "
    "AS mean_energy_{k}".format(k=k)
    for k in ENERGY_DIMS
)

EMB_DIM_ENERGY_SQL = f"""
SELECT COUNT(*) AS n_vecs,
       {_ENERGY_TERMS}
FROM embeddings
"""


# --- Product quantization (PQ) ----------------------------------------------

PQ_M = 4  # subspaces
PQ_SUB = EMB_DIM // PQ_M  # dims per subspace
PQ_K = 16  # codewords per subspace -> 4 bits/subspace, 2 bytes/vector
PQ_ROUNDS = 2  # Lloyd iterations per subspace codebook


def _pq_all_schema():
    import pyspark.sql.types as T

    return T.StructType(
        [
            T.StructField(
                "pqall",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("m", T.IntegerType()),
                            T.StructField("code", T.IntegerType()),
                            T.StructField("cv", T.ArrayType(T.DoubleType())),
                        ]
                    )
                ),
            )
        ]
    )


def _pq_all_cb_df(spark: SparkSession, cbs: list[tuple[int, int, list[float]]]) -> DataFrame:
    """All subspaces' codebooks as ONE 1-row broadcast frame — consumers
    slice per-m inside the lambda (F.filter on c.m), so a single scan
    encodes every subspace in one pass."""
    return spark.createDataFrame(
        [([{"m": m, "code": c, "cv": cv} for m, c, cv in cbs],)], _pq_all_schema()
    )


def pq_codebooks(emb: DataFrame, rounds: int = PQ_ROUNDS) -> list[tuple[int, int, list[float]]]:
    """Per-subspace Lloyd k-means PQ codebooks — the trained replacement for
    the round-2 first-``PQ_K``-subvectors stand-in. Deterministic seeding
    (init = the first ``PQ_K`` vectors' subvectors by vec_id), then
    ``rounds`` iterations of squared-L2 argmin assignment (ties to the
    lowest code — array_min over (dist, code) structs, the audited fold) and
    a decimal-exact per-dimension mean update. All ``PQ_M`` subspaces train
    in ONE pass per round: subvectors posexplode to (vec_id, m, sv), the
    full codebook rides as a single 1-row broadcast, and the update is one
    map-side-combinable (m, code, d) aggregate — PQ_M*PQ_K*PQ_SUB = 1024
    keys per round regardless of corpus size. Driver state is the 4x16x16
    codebook matrix, the same bounded collect MLlib KMeans performs.

    Cross-engine determinism: per-dim sums via DECIMAL(28,12) (exact,
    order-independent) before the double division, so the oracle's unrolled
    ``_pq_kmeans_sql_ctes`` reproduce every codebook bit-for-bit; empty
    codes drop out in both engines alike."""
    from drive_health_etl_spark.session import shuffle_partitions

    spark = emb.sparkSession
    sub = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("e", m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)])
        ).alias("m", "sv"),
    )
    init = emb.filter(F.col("vec_id") < PQ_K).select("vec_id", "e").collect()
    cbs = [
        (m, int(r["vec_id"]), list(r["e"])[m * PQ_SUB : (m + 1) * PQ_SUB])
        for m in range(PQ_M)
        for r in sorted(init, key=lambda r: r["vec_id"])
    ]
    with shuffle_partitions(spark, 8):
        for _ in range(rounds):
            cb_df = _pq_all_cb_df(spark, cbs)
            best = F.array_min(
                F.transform(
                    F.filter(F.col("pqall"), lambda c: c["m"] == F.col("m")),
                    lambda c: F.struct(
                        (
                            F.col("svv")
                            - F.lit(2.0) * _dot(F.col("sv"), c["cv"])
                            + _dot(c["cv"], c["cv"])
                        ).alias("d"),
                        c["code"].alias("code"),
                    ),
                )
            )
            assigned = (
                sub.join(F.broadcast(cb_df))
                .withColumn("svv", _dot(F.col("sv"), F.col("sv")))
                .select("m", best["code"].alias("code"), "sv")
            )
            sums = (
                assigned.select("m", "code", F.posexplode("sv").alias("d", "v"))
                .groupBy("m", "code", "d")
                .agg(
                    F.sum(F.col("v").cast("decimal(28,12)")).cast("double").alias("s"),
                    F.count("*").alias("n"),
                )
            )
            by_key: dict[tuple[int, int], list[float]] = {}
            for r in sums.collect():
                by_key.setdefault((r["m"], r["code"]), [0.0] * PQ_SUB)[r["d"]] = r["s"] / r["n"]
            cbs = [(m, c, v) for (m, c), v in sorted(by_key.items())]
    return cbs


# Trained codebooks per (session, sf_dir): the fit is deterministic, so the
# three PQ consumers (emb_pq_stats, sim_ann_pq_adc/_adc_distances,
# sim_ann_ivfpq) and repeated bench/sweep calls share ONE Lloyd run — the
# same pattern as _CENTROID_CACHE.
_PQ_CB_CACHE = FitCache()  # scope-LRU bounded


def _pq_codebooks_cached(spark: SparkSession, sf_dir: str, emb: DataFrame) -> list[tuple[int, int, list[float]]]:
    ckey = (spark.sparkContext.applicationId, sf_dir)
    return _PQ_CB_CACHE.get_or_build(ckey, lambda: pq_codebooks(emb))


_PQ_CODES_CACHE = FitCache()  # keys (appId, sf_dir); scope-LRU bounded


def _pq_codes_cached(
    spark: SparkSession, sf_dir: str, emb: DataFrame,
    cbs: list[tuple[int, int, list[float]]],
) -> DataFrame:
    """The PQ-ENCODED CORPUS — every vector's per-subspace (best squared
    distance, code) — persisted once per (session, dataset), like the
    codebooks it derives from. r11: the corpus encode (posexplode to
    PQ_M subvectors + argmin fold against the broadcast codebook) re-ran
    per CALL of `_adc_distances` (so twice per ivfpq build: pq_adc and
    ivfpq both score through it) and again, with the same folds, inside
    `emb_pq_stats`. A real IVF-PQ index stores codes at indexing time and
    search never touches the float vectors — materializing them is the
    index build, not result caching (guide §5: cache what is reused and
    expensive). Expressions are byte-for-byte the consumers' own folds,
    so codes/distances are bit-identical whether read from this cache or
    recomputed. Columns: vec_id, m, d (best squared distance, the MSE
    numerator), code; consumers project what they need."""

    def build() -> DataFrame:
        cb_all = _pq_all_cb_df(spark, cbs)
        slices = F.posexplode(
            F.array(*[F.slice("e", m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)])
        ).alias("m", "sv")
        mycb = F.filter(F.col("pqall"), lambda c: c["m"] == F.col("m"))
        base = (
            emb.select("vec_id", slices)
            .join(F.broadcast(cb_all))
            .withColumn("svv", _dot(F.col("sv"), F.col("sv")))
        )
        best = F.array_min(
            F.transform(
                mycb,
                lambda c: F.struct(
                    (
                        F.col("svv")
                        - F.lit(2.0) * _dot(F.col("sv"), c["cv"])
                        + _dot(c["cv"], c["cv"])
                    ).alias("d"),
                    c["code"].alias("code"),
                ),
            )
        )
        return (
            base.select("vec_id", "m", best["d"].alias("d"), best["code"].alias("code"))
            .persist()
        )

    key = (spark.sparkContext.applicationId, sf_dir)
    return _PQ_CODES_CACHE.get_or_build(key, build)


_ADC_LUT_CACHE = FitCache()  # keys (appId, sf_dir); scope-LRU bounded


def _adc_lut_cached(
    spark: SparkSession, sf_dir: str, emb: DataFrame, qid: int,
    cbs: list[tuple[int, int, list[float]]],
) -> DataFrame:
    """The ADC LOOKUP TABLE — per (subspace, codeword) exact ``||q_m - c||^2``
    — persisted once per (session, dataset). A real ADC scorer builds the
    LUT once per query at search time; here the demo query (MAX vec_id) is
    itself a dataset artifact, so the ≤ PQ_M*PQ_K-row table is index state,
    same as the codes (`_pq_codes_cached`). r12: every `_adc_distances`
    call (pq_adc, ivfpq, adc_quality) re-ran the query-row scan + slice
    explode + codebook broadcast-join per call. Expressions are
    byte-for-byte the inline build's, so LUT entries are bit-identical."""

    def build() -> DataFrame:
        cb_all = _pq_all_cb_df(spark, cbs)
        slices = F.posexplode(
            F.array(*[F.slice("e", m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)])
        ).alias("m", "sv")
        mycb = F.filter(F.col("pqall"), lambda c: c["m"] == F.col("m"))
        dist_struct = lambda c: F.struct(  # noqa: E731 — the shared (d, code) fold
            (
                F.col("svv")
                - F.lit(2.0) * _dot(F.col("sv"), c["cv"])
                + _dot(c["cv"], c["cv"])
            ).alias("d"),
            c["code"].alias("code"),
        )
        return (
            emb.filter(F.col("vec_id") == qid)
            .select(slices)
            .join(F.broadcast(cb_all))
            .withColumn("svv", _dot(F.col("sv"), F.col("sv")))
            .select("m", F.explode(F.transform(mycb, dist_struct)).alias("lc"))
            .select("m", F.col("lc.code").alias("code"), F.col("lc.d").alias("d"))
            .persist()
        )

    key = (spark.sparkContext.applicationId, sf_dir)
    return _ADC_LUT_CACHE.get_or_build(key, build)


_QID_CACHE = FitCache()  # keys (appId, sf_dir); the demo-query vector id


def _qid_cached(spark: SparkSession, sf_dir: str, emb: DataFrame) -> int:
    """MAX(vec_id) — the deterministic demo-query row every ANN search
    uses. A dataset scalar (the `_pagerank_nodes` count precedent): each
    of sim_ann_ivfpq / _adc_distances / sim_adc_quality ran its own
    one-job collect per BUILD, so one ivfpq sample paid it twice."""
    key = (spark.sparkContext.applicationId, sf_dir)
    return _QID_CACHE.get_or_build(
        key, lambda: emb.agg(F.max("vec_id")).collect()[0][0]
    )


def _pq_kmeans_sql_ctes(rounds: int = PQ_ROUNDS) -> str:
    """Unrolled per-subspace Lloyd iterations mirroring pq_codebooks exactly;
    expects a ``sub(vec_id, m, sv)`` CTE in scope, emits ``cb(m, code, cv)``."""
    parts = [f"pcb0 AS (SELECT m, vec_id AS code, sv AS cv FROM sub WHERE vec_id < {PQ_K})"]
    for r in range(rounds):
        parts.append(
            f"""passign{r} AS (
  SELECT m, code, sv FROM (
    SELECT s.m, s.sv, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cv)
                      + list_dot_product(c.cv, c.cv) ASC, c.code ASC) AS rn
    FROM sub s JOIN pcb{r} c ON c.m = s.m
  ) WHERE rn = 1
)"""
        )
        dims = ",\n    ".join(
            f"CAST(SUM(CAST(sv[{d + 1}] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)"
            for d in range(PQ_SUB)
        )
        parts.append(
            f"pcb{r + 1} AS (\n  SELECT m, code, [{dims}] AS cv\n  FROM passign{r} GROUP BY m, code\n)"
        )
    parts.append(f"cb AS (SELECT m, code, cv FROM pcb{rounds})")
    return ",\n".join(parts)


def emb_pq_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: split each 64-d vector into 4 x 16-d
    subvectors, encode each against a 16-entry per-subspace codebook
    (argmin squared L2, ties to the lowest code), and report per-subspace
    reconstruction MSE and codebook utilization. 2 bytes/vector vs 64
    bytes int8 — the memory tier below int8 for billion-vector ANN, and
    the code layout IVF-PQ search operates on.

    Codebooks are per-subspace-TRAINED via ``pq_codebooks`` (Lloyd k-means,
    deterministic seed, shared through ``_PQ_CB_CACHE`` with the ADC/IVF-PQ
    consumers). Encoding is ONE pass over the corpus: subvectors posexplode
    to (m, sv) and score against the all-subspace codebook riding as a
    single 1-row broadcast (the round-2 per-subspace loop scanned the table
    PQ_M times — 4 scans for the same math); argmin via array_min over
    (dist, code) structs with the subvector self-dot SELECTed before the
    lambda (a derived expression referenced inside transform() is inlined
    per element — the emb_quantize gotcha). Distances use the dot-product
    expansion |s|^2 - 2<s,c> + |c|^2 with every term evaluated as the same
    left-to-right fold in both engines, so code choice and MSE are
    bit-identical to the oracle (which retrains the identical codebooks via
    ``_pq_kmeans_sql_ctes``)."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    cbs = _pq_codebooks_cached(spark, sf_dir, emb)
    # r11: read the persisted PQ index (identical argmin folds, materialized
    # once per session/dataset) instead of re-encoding the corpus
    allm = _pq_codes_cached(spark, sf_dir, emb, cbs).select(
        F.col("m").alias("subspace"),
        F.col("d").alias("sq"),
        F.col("code"),
    )
    return allm.groupBy("subspace").agg(
        F.count("*").alias("n_vecs"),
        F.count_distinct("code").alias("n_codes_used"),
        F.round(
            F.sum(F.col("sq").cast("decimal(28,12)")).cast("double")
            / (F.count("*") * PQ_SUB),
            6,
        ).alias("mse"),
    )


EMB_PQ_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
sub AS (
  SELECT vec_id, m, emb[(m*{PQ_SUB}+1):((m+1)*{PQ_SUB})] AS sv
  FROM e CROSS JOIN (SELECT unnest(range({PQ_M})) AS m)
),
{_pq_kmeans_sql_ctes()},
assigned AS (
  SELECT vec_id, m, sq, code FROM (
    SELECT s.vec_id, s.m, c.code,
           list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cv)
             + list_dot_product(c.cv, c.cv) AS sq,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cv)
                      + list_dot_product(c.cv, c.cv) ASC, c.code ASC) AS rn
    FROM sub s JOIN cb c ON c.m = s.m
  ) WHERE rn = 1
)
SELECT m AS subspace, COUNT(*) AS n_vecs, COUNT(DISTINCT code) AS n_codes_used,
       ROUND(CAST(SUM(CAST(sq AS DECIMAL(28,12))) AS DOUBLE) / (COUNT(*) * {PQ_SUB}), 6) AS mse
FROM assigned GROUP BY m
"""


_ADC_TOP = 10


def sim_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) search over PQ codes — how billion-vector
    ANN actually scores candidates: vectors are stored as 2-byte PQ codes;
    at query time a (subspace x codeword) lookup table of exact
    ``||q_m - c||^2`` distances is built ONCE, and each candidate's
    approximate distance is the sum of ``PQ_M`` table lookups — no float
    vector is ever touched per candidate. Returns the top-``_ADC_TOP`` by
    approximate distance (ties on vec_id). Composing this scorer with the
    `sim_ann_ivf` cell probe is exactly IVF-PQ.

    Determinism: codes come from the same argmin-fold as `emb_pq_stats`;
    the LUT is computed IN-ENGINE with the identical dot-fold expansion
    (never driver-side floats); per-candidate sums are decimal-cast and
    the output distance rounds 6 dp. Scale: encode is a narrow map; the
    score join is (n x PQ_M) rows against a broadcast 64-entry LUT with a
    map-side-combinable sum. Codebooks are per-subspace-trained
    (``pq_codebooks``, shared via ``_PQ_CB_CACHE``). The scorer itself is
    ``_adc_distances`` (shared verbatim with IVF-PQ); this query is that
    scorer plus the deterministic top-``_ADC_TOP``."""
    dist = _adc_distances(spark, sf_dir)
    w = Window.orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
    return (
        dist.orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
        .limit(_ADC_TOP)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "vec_id", "approx_dist")
    )


SIM_PQ_ADC_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
qid AS (SELECT MAX(vec_id) AS qid FROM e),
sub AS (
  SELECT vec_id, m, emb[(m*{PQ_SUB}+1):((m+1)*{PQ_SUB})] AS sv
  FROM e CROSS JOIN (SELECT unnest(range({PQ_M})) AS m)
),
{_pq_kmeans_sql_ctes()},
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cv)
                      + list_dot_product(c.cv, c.cv) ASC, c.code ASC) AS rn
    FROM sub s JOIN cb c ON c.m = s.m
    WHERE s.vec_id <> (SELECT qid FROM qid)
  ) WHERE rn = 1
),
lut AS (
  SELECT c.m, c.code,
         list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cv)
           + list_dot_product(c.cv, c.cv) AS d
  FROM sub s JOIN cb c ON c.m = s.m
  WHERE s.vec_id = (SELECT qid FROM qid)
),
dist AS (
  SELECT codes.vec_id,
         ROUND(CAST(SUM(CAST(lut.d AS DECIMAL(38,18))) AS DOUBLE), 6) AS approx_dist
  FROM codes JOIN lut ON lut.m = codes.m AND lut.code = codes.code
  GROUP BY codes.vec_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY approx_dist ASC, vec_id ASC) AS INT) AS rank,
       vec_id, approx_dist
FROM dist ORDER BY approx_dist ASC, vec_id ASC LIMIT {_ADC_TOP}
"""


_IVFPQ_PROBE = 2  # cells probed per query
_IVFPQ_TOP = 10
# Broadcast the probed-cell candidate fence below this corpus size — slim
# (vec_id, cell) rows, ~32 MB framed at 2M, matching the session broadcast
# sizing; a 100 TB corpus falls back to the vec_id equi-join.
_IVFPQ_BCAST_VECS = 2_000_000


def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production ANN layout, end to end: IVF cell probing (real k-means
    centroids, top-``_IVFPQ_PROBE`` cells by query-centroid cosine) fences
    the candidate set, then PQ asymmetric distance scores ONLY the probed
    candidates from their compact codes — `sim_ann_ivf`'s recall machinery
    composed with `sim_ann_pq_adc`'s scorer, the way FAISS IVF-PQ works.

    Determinism: cell assignment ties on cent_id (the audited IVF argmax),
    probe ranking ties on cent_id, codes/LUT reuse `sim_ann_pq_adc`'s
    audited folds verbatim, and the final top-``_IVFPQ_TOP`` ties on
    vec_id. Scale: only probed-cell candidates are scored; the codes join
    is an equi-join on vec_id; the LUT broadcast is 64 entries."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    cents = _centroids_cached(spark, sf_dir, emb)
    cmat = _cents_df(spark, cents)
    assigned = _assigned_cached(spark, sf_dir, emb, cents).select("vec_id", "cell")
    qid = _qid_cached(spark, sf_dir, emb)
    probe = (
        emb.filter(F.col("vec_id") == qid)
        .join(F.broadcast(cmat))
        .select(
            F.slice(
                F.sort_array(
                    F.transform(
                        F.col("cmat"),
                        lambda c: F.struct(
                            (
                                F.aggregate(
                                    F.zip_with(F.col("e"), c["ce"], lambda x, y: x * y),
                                    F.lit(0.0),
                                    lambda a, x: a + x,
                                )
                                / c["nrm"]
                            ).alias("c"),
                            c["negid"].alias("negid"),
                        ),
                    ),
                    asc=False,
                ),
                1,
                _IVFPQ_PROBE,
            ).alias("top_cells")
        )
        .select(F.explode("top_cells").alias("tc"))
        .select((-F.col("tc.negid")).alias("cell"))
    )
    cand_ids = (
        assigned.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != qid)
        .select("vec_id", "cell")
    )
    # the full ADC ranking over the corpus reuses the audited scorer; the
    # IVF fence then keeps only probed-cell candidates (at scale the codes
    # table is partitioned BY cell so the fence prunes before the scorer —
    # same result, demonstrated here result-first)
    adc = _adc_distances(spark, sf_dir)
    # r12: the probed-cell fence is at most (probe/cells) of the corpus but
    # scans stat-less cached relations, so the planner sort-merge-joined it
    # against the ADC scores. Below the corpus-size threshold (gated on the
    # cached MAX vec_id — an overestimate of the count, so the fallback is
    # conservative) the fence broadcasts; above it the equi-join stands.
    if qid + 1 <= _IVFPQ_BCAST_VECS:
        cand_ids = F.broadcast(cand_ids)
    w = Window.orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
    return (
        adc.join(cand_ids, "vec_id")
        .orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
        .limit(_IVFPQ_TOP)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "vec_id", "cell", "approx_dist")
    )


def _adc_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unranked ADC distances for every non-query vector — the scorer
    shared by `sim_ann_pq_adc` (this plus a top-k) and `sim_ann_ivfpq`
    (this fenced by the IVF probe). ONE pass over the corpus: subvectors
    posexplode to (m, sv) and encode against the all-subspace codebook as
    a single 1-row broadcast (the round-2 per-subspace loop scanned the
    table PQ_M times); the LUT is built the same single-pass way from the
    query row. Folds are identical to the audited per-subspace layout, so
    codes, LUT entries, and distances are bit-unchanged."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    qid = _qid_cached(spark, sf_dir, emb)
    cbs = _pq_codebooks_cached(spark, sf_dir, emb)
    # r11: the corpus side reads the persisted PQ index (same folds, the
    # query row filtered AFTER the cached encode — identical row set).
    # r12: the LUT side reads the persisted per-dataset lookup table too
    # (`_adc_lut_cached`, same folds) instead of re-scanning the query row
    # and re-joining the codebooks per call.
    codes = (
        _pq_codes_cached(spark, sf_dir, emb, cbs)
        .filter(F.col("vec_id") != qid)
        .select("vec_id", "m", "code")
    )
    lut = _adc_lut_cached(spark, sf_dir, emb, qid, cbs)
    return (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(F.col("d").cast("decimal(38,18)")).cast("double"), 6
            ).alias("approx_dist")
        )
    )


def _ivfpq_sql() -> str:
    cos_q = _COS_SQL.format(a="q.emb", b="c.ce")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
{_kmeans_sql_ctes()},
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_SQL.format(a="e.emb", b="c.ce")} DESC,
                      c.cent_id ASC) AS rn
    FROM e CROSS JOIN cent{KMEANS_ROUNDS} c
  ) WHERE rn = 1
),
qid AS (SELECT MAX(vec_id) AS qid FROM e),
probe AS (
  SELECT cell FROM (
    SELECT c.cent_id AS cell,
           ROW_NUMBER() OVER (ORDER BY {cos_q} DESC, c.cent_id ASC) AS rn
    FROM (SELECT emb FROM e WHERE vec_id = (SELECT qid FROM qid)) q
    CROSS JOIN cent{KMEANS_ROUNDS} c
  ) WHERE rn <= {_IVFPQ_PROBE}
),
cand AS (
  SELECT a.vec_id, a.cell FROM assigned a JOIN probe p ON p.cell = a.cell
  WHERE a.vec_id <> (SELECT qid FROM qid)
),
sub AS (
  SELECT vec_id, m, emb[(m*{PQ_SUB}+1):((m+1)*{PQ_SUB})] AS sv
  FROM e CROSS JOIN (SELECT unnest(range({PQ_M})) AS m)
),
{_pq_kmeans_sql_ctes()},
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cv)
                      + list_dot_product(c.cv, c.cv) ASC, c.code ASC) AS rn
    FROM sub s JOIN cb c ON c.m = s.m
    WHERE s.vec_id <> (SELECT qid FROM qid)
  ) WHERE rn = 1
),
lut AS (
  SELECT c.m, c.code,
         list_dot_product(s.sv, s.sv) - 2*list_dot_product(s.sv, c.cv)
           + list_dot_product(c.cv, c.cv) AS d
  FROM sub s JOIN cb c ON c.m = s.m
  WHERE s.vec_id = (SELECT qid FROM qid)
),
dist AS (
  SELECT codes.vec_id,
         ROUND(CAST(SUM(CAST(lut.d AS DECIMAL(38,18))) AS DOUBLE), 6) AS approx_dist
  FROM codes JOIN lut ON lut.m = codes.m AND lut.code = codes.code
  GROUP BY codes.vec_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY d.approx_dist ASC, d.vec_id ASC) AS INT) AS rank,
       d.vec_id, cand.cell, d.approx_dist
FROM dist d JOIN cand ON cand.vec_id = d.vec_id
ORDER BY d.approx_dist ASC, d.vec_id ASC LIMIT {_IVFPQ_TOP}
"""


SIM_ANN_IVFPQ_SQL = _ivfpq_sql()


def sim_adc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured PQ-ADC quality: the overlap between the ADC top-10 and the
    EXACT squared-L2 top-10 for the same query — the recall readout that
    decides codebook size in production (the `dedup_lsh_quality` pattern
    applied to the PQ scorer). One row: pool sizes, overlap, recall."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    qid = _qid_cached(spark, sf_dir, emb)
    q = emb.filter(F.col("vec_id") == qid).select(F.col("e").alias("qe"))
    d2 = (
        _dot(F.col("qe"), F.col("qe"))
        - F.lit(2.0) * _dot(F.col("qe"), F.col("e"))
        + _dot(F.col("e"), F.col("e"))
    )
    exact = (
        emb.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(d2, 9).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
        .limit(_ADC_TOP)
    )
    adc = sim_ann_pq_adc(spark, sf_dir).select("vec_id")
    overlap = exact.join(adc, "vec_id").count()
    return spark.createDataFrame(
        [(int(_ADC_TOP), int(_ADC_TOP), int(overlap), round(overlap / _ADC_TOP, 6))],
        "n_exact int, n_adc int, n_overlap int, recall double",
    )


def _adc_quality_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
qid AS (SELECT MAX(vec_id) AS qid FROM e),
q AS (SELECT emb AS qe FROM e WHERE vec_id = (SELECT qid FROM qid)),
exact AS (
  SELECT e.vec_id,
         ROUND(list_dot_product(q.qe, q.qe) - 2*list_dot_product(q.qe, e.emb)
               + list_dot_product(e.emb, e.emb), 9) AS dist
  FROM e CROSS JOIN q WHERE e.vec_id <> (SELECT qid FROM qid)
  ORDER BY dist ASC, e.vec_id ASC LIMIT {_ADC_TOP}
),
adc AS (SELECT vec_id FROM ({SIM_PQ_ADC_SQL}) t)
SELECT {_ADC_TOP} AS n_exact, {_ADC_TOP} AS n_adc,
       CAST((SELECT COUNT(*) FROM exact JOIN adc USING (vec_id)) AS INT) AS n_overlap,
       ROUND(CAST((SELECT COUNT(*) FROM exact JOIN adc USING (vec_id)) AS DOUBLE)
             / {_ADC_TOP}, 6) AS recall
"""


SIM_ADC_QUALITY_SQL = _adc_quality_sql()


# --- Gram matrix via numpy partial aggregation ------------------------------

GRAM_SCALE = 1_000_000  # fixed-point quantization: floor(x * 1e6 + 0.5)
GRAM_TOP = 20


def emb_gram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix (X^T X) of the embedding corpus via numpy partial
    aggregation — the X^T X / covariance primitive behind PCA, whitening,
    and closed-form linear probes. Each Arrow batch computes its d x d
    partial Gram with one int64 matmul inside ``mapInPandas`` and emits the
    upper triangle as (i, j, partial) rows; one shuffle over at most
    d(d+1)/2 keys reduces the partials. Output: the ``GRAM_TOP`` strongest
    entries by |G_ij| (deterministic ties on (i, j)) — the correlated
    dimension pairs.

    Exactness trick: values are fixed-point quantized to int64
    (``floor(x * 1e6 + 0.5)`` — floor, NOT round: round-half is
    banker's in numpy but half-away in DuckDB) so every product and sum is
    exact integer arithmetic on both engines — no float summation-order
    divergence, no rounding discipline needed downstream. Magnitudes:
    |x| <= ~1 -> products ~1e12, summed over the corpus << 2^63.

    Scale shape: per-executor work is a vectorized matmul; shuffle volume
    is O(d^2 x n_batches), independent of row count — the same partial-
    aggregate layout a 1000-executor PCA uses."""
    import numpy as np
    import pandas as pd

    d = EMB_DIM

    def gram_partials(batches):
        iu = np.triu_indices(d)
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Q = np.floor(E * GRAM_SCALE + 0.5).astype(np.int64)
            G = Q.T @ Q  # int64 matmul: exact
            yield pd.DataFrame(
                {"i": iu[0] + 1, "j": iu[1] + 1, "g": G[iu]}
            )

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    partials = emb.mapInPandas(gram_partials, schema="i int, j int, g long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .orderBy(F.abs("g").desc(), F.col("i").asc(), F.col("j").asc())
        .limit(GRAM_TOP)
    )


EMB_GRAM_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {GRAM_SCALE} + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
g AS (
  SELECT i.range AS i, j.range AS j,
         CAST(SUM(v[CAST(i.range AS INT)] * v[CAST(j.range AS INT)]) AS BIGINT) AS g
  FROM q, range(1, {EMB_DIM} + 1) i, range(1, {EMB_DIM} + 1) j
  WHERE i.range <= j.range
  GROUP BY 1, 2
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, g
FROM g ORDER BY abs(g) DESC, i ASC, j ASC LIMIT {GRAM_TOP}
"""


_POWER_ITERS = 3


def emb_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding Gram matrix by power
    iteration — the PCA primitive, distributed where it matters and exact
    where it's hard: the d x d Gram accumulates EXACTLY (the int64
    fixed-point partial-matmul layout of `emb_gram_topk`, full matrix),
    then ``v <- normalize(G v)`` runs ``_POWER_ITERS`` fixed rounds as
    single-row array algebra — every matvec/norm is the same left-to-right
    fold in both engines, so the iteration is bit-exact and only the
    reported floats round (6 dp). Output: the Rayleigh-quotient eigenvalue
    and the first components of the eigenvector.

    Scale: the corpus only ever feeds the Gram partials (shuffle O(d^2 x
    batches)); the iteration itself is O(d^2) driver-free single-row work
    regardless of row count."""
    import numpy as np
    import pandas as pd

    d = EMB_DIM

    def gram_partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Q = np.floor(E * GRAM_SCALE + 0.5).astype(np.int64)
            G = Q.T @ Q  # int64 matmul: exact
            ii, jj = np.indices((d, d))
            yield pd.DataFrame(
                {"i": ii.ravel() + 1, "j": jj.ravel() + 1, "g": G.ravel()}
            )

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    cells = (
        emb.mapInPandas(gram_partials, schema="i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").cast("double").alias("g"))
    )
    rows = cells.groupBy("i").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "g"))), lambda r: r["g"]
        ).alias("grow")
    )
    gmat = rows.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "grow"))), lambda r: r["grow"]
        ).alias("G")
    )
    df = gmat
    v = F.array(*([F.lit(1.0)] + [F.lit(0.0)] * (d - 1)))
    for t in range(_POWER_ITERS):
        df = df.withColumn(f"w{t}", F.transform("G", lambda row: _dot(row, v)))
        df = df.withColumn(f"n{t}", F.sqrt(_dot(F.col(f"w{t}"), F.col(f"w{t}"))))
        df = df.withColumn(
            f"v{t}",
            F.transform(F.col(f"w{t}"), lambda x: x / F.col(f"n{t}")),
        )
        v = F.col(f"v{t}")
    df = df.withColumn("wf", F.transform("G", lambda row: _dot(row, v)))
    lam = _dot(v, F.col("wf"))
    return df.select(
        F.round(lam, 6).alias("eigenvalue"),
        *[
            F.round(F.element_at(v, k + 1), 6).alias(f"v{k}")
            for k in range(5)
        ],
    )


def _power_sql() -> str:
    d = EMB_DIM
    v0 = "[" + ", ".join(["CAST(1.0 AS DOUBLE)"] + ["CAST(0.0 AS DOUBLE)"] * (d - 1)) + "]"
    steps = []
    vexpr = "v_init"
    pre = f"it_init AS (SELECT G, {v0} AS v_init FROM gmat)"
    prev = "it_init"
    for t in range(_POWER_ITERS):
        steps.append(
            f"""itw{t} AS (
  SELECT *, list_transform(G, row -> list_dot_product(row, {vexpr})) AS w{t}
  FROM {prev}
),
itn{t} AS (SELECT *, sqrt(list_dot_product(w{t}, w{t})) AS n{t} FROM itw{t}),
itv{t} AS (
  SELECT *, list_transform(w{t}, x -> x / n{t}) AS v{t} FROM itn{t}
)"""
        )
        vexpr = f"v{t}"
        prev = f"itv{t}"
    chain = ",\n".join(steps)
    comps = ", ".join(
        f"ROUND({vexpr}[{k + 1}], 6) AS v{k}" for k in range(5)
    )
    return f"""
WITH q AS (
  SELECT list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {GRAM_SCALE} + 0.5) AS BIGINT)) AS vq
  FROM embeddings
),
cells AS (
  SELECT i.range AS i, j.range AS j,
         CAST(SUM(vq[CAST(i.range AS INT)] * vq[CAST(j.range AS INT)]) AS DOUBLE) AS g
  FROM q, range(1, {d} + 1) i, range(1, {d} + 1) j
  GROUP BY 1, 2
),
rows_ AS (
  SELECT i, list_transform(list_sort(list(ROW(j, g))), r -> CAST(r[2] AS DOUBLE)) AS grow
  FROM cells GROUP BY i
),
gmat AS (
  SELECT list_transform(list_sort(list(ROW(i, grow))), r -> r[2]) AS G FROM rows_
),
{pre},
{chain},
fin AS (
  SELECT *, list_transform(G, row -> list_dot_product(row, {vexpr})) AS wf FROM {prev}
)
SELECT ROUND(list_dot_product({vexpr}, wf), 6) AS eigenvalue, {comps}
FROM fin
"""


EMB_POWER_SQL = _power_sql()


def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids —
    the cluster/source drift monitor (are two corpora occupying the same
    region of embedding space?) behind training-mix decisions.

    Float policy: per-(label, dim) centroid components are plain AVG rounded
    9 dp (the emb_norm_stats precedent — sub-ULP partition-order drift
    absorbed by the rounding margin); the cosine then runs on IDENTICAL
    rounded inputs as the same left-to-right dot fold in both engines
    (Spark aggregate vs list_dot_product), rounded 6 dp.

    Scale: one narrow posexplode + (label, dim) aggregate — map-side
    combinable, key space = labels x dims; the pairwise stage is
    label-count-sized (broadcast), never row-sized."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    cent = (
        emb.groupBy("label", "dim")
        .agg(F.round(F.avg("v"), 9).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda r: r["c"]
            ).alias("cv")
        )
    )
    a = cent.select(F.col("label").alias("label_a"), F.col("cv").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("cv").alias("cb"))
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(
                _dot(F.col("ca"), F.col("cb"))
                / (_norm(F.col("ca")) * _norm(F.col("cb"))),
                6,
            ).alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )


EMB_CENTROID_DRIFT_SQL = """
WITH e AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
),
cd AS (
  SELECT label, dim, ROUND(AVG(v), 9) AS c FROM e GROUP BY label, dim
),
cent AS (
  SELECT label,
         list_transform(list_sort(list(ROW(dim, c))), r -> CAST(r[2] AS DOUBLE)) AS cv
  FROM cd GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       ROUND(list_dot_product(a.cv, b.cv)
             / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv))),
             6) AS cosine
FROM cent a JOIN cent b ON a.label < b.label
ORDER BY label_a, label_b
"""


_MMR_LAMBDA = 0.7
_MMR_POOL = 20  # relevance-ranked candidate pool
_MMR_K = 5  # diversified picks


def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: from the top-``_MMR_POOL``
    cosine candidates for a fixed query vector (vec_id = MIN), greedily pick
    ``_MMR_K`` results maximizing ``λ·rel(d) − (1−λ)·max_{s∈picked}
    sim(d,s)`` — the diversity-aware re-rank every RAG retrieval stack runs
    after ANN.

    Determinism: relevance and pairwise similarities round 9 dp BEFORE the
    greedy loop (so both engines compare identical doubles) and every
    argmax ties on vec_id; the fixed pick count unrolls statically, CTE-
    mirrored by the oracle. Scale: the pool is top-k-bounded (the ANN
    stage's job), so the quadratic pairwise stage is k², independent of
    corpus size; the scan feeding it is the brute/ANN ranking already
    audited."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    cos = F.round(
        _dot(F.col("qe"), F.col("e")) / (_norm(F.col("qe")) * _norm(F.col("e"))), 9
    )
    cand = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", "e", cos.alias("rel"))
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(_MMR_POOL)
        .localCheckpoint()
    )
    a = cand.select(F.col("vec_id").alias("ia"), F.col("e").alias("ea"))
    b = cand.select(F.col("vec_id").alias("ib"), F.col("e").alias("eb"))
    sims = (
        a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(
                _dot(F.col("ea"), F.col("eb"))
                / (_norm(F.col("ea")) * _norm(F.col("eb"))),
                9,
            ).alias("sim"),
        )
        .localCheckpoint()
    )
    pool = cand.select("vec_id", "rel")
    picked = pool.orderBy(F.col("rel").desc(), F.col("vec_id").asc()).limit(1).select(
        "vec_id", "rel", F.lit(1).alias("rank")
    )
    for step in range(2, _MMR_K + 1):
        rem = pool.join(picked.select("vec_id"), "vec_id", "left_anti")
        penalty = (
            sims.join(
                picked.select(F.col("vec_id").alias("ib")), "ib"
            )
            .groupBy(F.col("ia").alias("vec_id"))
            .agg(F.max("sim").alias("pen"))
        )
        scored = rem.join(penalty, "vec_id").select(
            "vec_id",
            "rel",
            F.round(
                F.lit(_MMR_LAMBDA) * F.col("rel")
                - F.lit(1.0 - _MMR_LAMBDA) * F.col("pen"),
                9,
            ).alias("mmr"),
        )
        nxt = (
            scored.orderBy(F.col("mmr").desc(), F.col("vec_id").asc())
            .limit(1)
            .select("vec_id", "rel", F.lit(step).alias("rank"))
        )
        picked = picked.unionByName(nxt).localCheckpoint()
    return picked.select("rank", "vec_id", "rel").orderBy("rank")


def _mmr_sql() -> str:
    steps = []
    prev = "p1"
    for step in range(2, _MMR_K + 1):
        steps.append(
            f"""p{step} AS (
  SELECT * FROM {prev}
  UNION ALL
  SELECT vec_id, rel, {step} AS rank FROM (
    SELECT r.vec_id, r.rel,
           ROUND({_MMR_LAMBDA!r} * r.rel - {1.0 - _MMR_LAMBDA!r} * pen.pen, 9) AS mmr
    FROM pool r
    JOIN (
      SELECT s.ia AS vec_id, MAX(s.sim) AS pen
      FROM sims s JOIN {prev} p ON s.ib = p.vec_id
      GROUP BY s.ia
    ) pen ON pen.vec_id = r.vec_id
    WHERE r.vec_id NOT IN (SELECT vec_id FROM {prev})
    ORDER BY mmr DESC, r.vec_id ASC LIMIT 1
  )
)"""
        )
        prev = f"p{step}"
    chain = ",\n".join(steps)
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
q AS (SELECT vec_id AS qid, emb AS qe FROM e ORDER BY vec_id LIMIT 1),
cand AS (
  SELECT e.vec_id, e.emb,
         ROUND(list_dot_product(q.qe, e.emb)
               / (sqrt(list_dot_product(q.qe, q.qe))
                  * sqrt(list_dot_product(e.emb, e.emb))), 9) AS rel
  FROM e CROSS JOIN q WHERE e.vec_id <> q.qid
  ORDER BY rel DESC, e.vec_id ASC LIMIT {_MMR_POOL}
),
sims AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         ROUND(list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))), 9) AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
),
pool AS (SELECT vec_id, rel FROM cand),
p1 AS (
  SELECT vec_id, rel, 1 AS rank FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1
),
{chain}
SELECT CAST(rank AS INT) AS rank, vec_id, rel FROM {prev} ORDER BY rank
"""


SIM_MMR_SQL = _mmr_sql()


TRIPLET_ANCHORS = 8


def emb_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training triplet construction (the data-prep step behind
    embedding-model fine-tuning): for each anchor, the POSITIVE is its
    highest-cosine neighbor INSIDE its k-means cell and the HARD NEGATIVE
    is the highest-cosine vector OUTSIDE the cell — similar enough to be
    confusable, guaranteed cross-cluster. Emits both cosines and the
    triplet margin, the quantity a curriculum filters on.

    Scale shape: cell assignment reuses the cached Lloyd fit
    (`_CENTROID_CACHE`); candidates join the ``TRIPLET_ANCHORS``-row anchor
    broadcast (fenced brute-force, the `sim_cosine_topk` pattern), then two
    per-anchor window top-1s. Anchors whose cell has no other member drop
    out (inner join) — deterministic in both engines. Ranking follows the
    repo float policy: rank on the 6-dp-rounded cosine, ties to vec_id."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    cents = _centroids_cached(spark, sf_dir, emb)
    assigned = _assigned_cached(spark, sf_dir, emb, cents).select(
        "vec_id", "e", "cell"
    )
    anchors = assigned.filter(F.col("vec_id") < TRIPLET_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("e").alias("ae"),
        F.col("cell").alias("acell"),
    )
    scored = assigned.join(
        F.broadcast(anchors), F.col("vec_id") != F.col("anchor_id")
    ).select(
        "anchor_id",
        "vec_id",
        "cell",
        "acell",
        F.round(_dot(F.col("ae"), F.col("e")) / (_norm(F.col("ae")) * _norm(F.col("e"))), 6).alias("cos"),
    )
    # r11 (guide §2.3/§2.4): both top-1s in ONE conditional aggregate over a
    # single pass of `scored`. The previous two-window form consumed `scored`
    # twice — the broadcast join and the anchors x corpus cosine map (the
    # dominant cost) each executed twice — then joined the halves. A struct
    # max over (cos, -vec_id) IS the (cos DESC, vec_id ASC) row_number()=1
    # pick: structs compare lexicographically, so max cos wins and a cos tie
    # resolves to max(-vec_id) = min vec_id. Anchors missing either side
    # (no other in-cell member / no out-of-cell vector) yield a NULL branch
    # and are dropped — exactly the old inner join's semantics.
    top = (
        scored.groupBy("anchor_id")
        .agg(
            F.max(
                F.when(
                    F.col("cell") == F.col("acell"),
                    F.struct(F.col("cos"), (-F.col("vec_id")).alias("nid")),
                )
            ).alias("p"),
            F.max(
                F.when(
                    F.col("cell") != F.col("acell"),
                    F.struct(F.col("cos"), (-F.col("vec_id")).alias("nid")),
                )
            ).alias("ng"),
        )
        .filter(F.col("p").isNotNull() & F.col("ng").isNotNull())
    )
    return top.select(
        "anchor_id",
        (-F.col("p.nid")).alias("pos_id"),
        F.col("p.cos").alias("pos_cos"),
        (-F.col("ng.nid")).alias("neg_id"),
        F.col("ng.cos").alias("neg_cos"),
        F.round(F.col("p.cos") - F.col("ng.cos"), 6).alias("margin"),
    )


EMB_TRIPLET_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
{_kmeans_sql_ctes()},
assigned AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_SQL.format(a="e.emb", b="c.ce")} DESC,
                      c.cent_id ASC) AS rn
    FROM e CROSS JOIN cent{KMEANS_ROUNDS} c
  ) WHERE rn = 1
),
anchors AS (
  SELECT vec_id AS anchor_id, emb AS ae, cell AS acell FROM assigned
  WHERE vec_id < {TRIPLET_ANCHORS}
),
scored AS (
  SELECT a.anchor_id, c.vec_id, c.cell, a.acell,
         ROUND({_COS_SQL.format(a="a.ae", b="c.emb")}, 6) AS cos
  FROM assigned c JOIN anchors a ON c.vec_id <> a.anchor_id
),
pos AS (
  SELECT anchor_id, vec_id AS pos_id, cos AS pos_cos FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY cos DESC, vec_id ASC) AS rn
    FROM scored WHERE cell = acell
  ) WHERE rn = 1
),
neg AS (
  SELECT anchor_id, vec_id AS neg_id, cos AS neg_cos FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY cos DESC, vec_id ASC) AS rn
    FROM scored WHERE cell <> acell
  ) WHERE rn = 1
)
SELECT p.anchor_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
       ROUND(p.pos_cos - n.neg_cos, 6) AS margin
FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
"""


# --- 1-bit binary-sketch ANN (sign quantization + Hamming prefilter) --------

# Hamming candidates per query before the exact rerank. Measured recall@5
# vs brute force at sf0.1 (5k vectors, no planted near-dups — a hard
# instance): M=50 -> 0.45, 100 -> 0.625, 200 -> 0.75, 400 -> 0.925; the
# sim_binary_quality query re-measures at whatever SF it runs on.
_BIN_CAND = 200


_BIN_SIG_CACHE = FitCache()  # keys (appId, sf_dir); scope-LRU bounded


def _binary_sigs_cached(spark: SparkSession, sf_dir: str, emb: DataFrame) -> DataFrame:
    """The 1-bit sign-sketch index — (vec_id, sig_lo, sig_hi) — persisted
    once per (session, dataset). The pack fold (64 conditional shifts per
    vector) is identical to the inline expression it replaces, so Hamming
    distances and everything downstream are bit-unchanged."""

    def build() -> DataFrame:
        return emb.select(
            "vec_id",
            _sig_half(F.col("e"), 0).alias("sig_lo"),
            _sig_half(F.col("e"), 32).alias("sig_hi"),
        ).persist()

    key = (spark.sparkContext.applicationId, sf_dir)
    return _BIN_SIG_CACHE.get_or_build(key, build)


def _sig_half(col: Column, offset: int) -> Column:
    """Pack dims [offset, offset+32) into one bigint: bit i set iff the
    component is positive. Two halves keep every value positive (bit 63 of
    a single 64-bit word would hit the sign bit differently per engine)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at(col, i + F.lit(offset + 1)) > 0,
            F.call_function("shiftleft", F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long")),
    )


def sim_ann_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-sketch ANN: sign-bit quantization (1 bit/dim -> 8 bytes for a
    64-dim vector, 32x smaller than float32) with XOR-popcount Hamming
    distance as the candidate filter, then an exact-cosine rerank of the
    ``_BIN_CAND`` nearest signatures per query.

    The 100 TB shape: the full-corpus stage touches ONLY the two-bigint
    signature column (integer ALU, whole-stage codegen, no float folds), the
    top-M window shuffles skinny (query_id, neighbor_id, hamming) ints, and
    the float-heavy cosine runs on M rows per query after a broadcast join —
    the expensive scan shrinks 32x in bytes and the FLOP stage by n/M. Same
    family as SimHash dedup (``dedup.py``) but for retrieval, with measured
    recall in ``sim_binary_quality``."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    # r11: the packed sign bits are the stored binary index — materialized
    # once per (session, dataset) like the PQ codes (`_pq_codes_cached`);
    # the per-call work is only XOR-popcount probing + the top-M rerank
    sigs = _binary_sigs_cached(spark, sf_dir, emb)
    qsigs = (
        sigs.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("sig_lo").alias("q_lo"),
            F.col("sig_hi").alias("q_hi"),
        )
    )
    hamming = (
        sigs.join(F.broadcast(qsigs), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.col("sig_lo").bitwiseXOR(F.col("q_lo")))
                + F.bit_count(F.col("sig_hi").bitwiseXOR(F.col("q_hi")))
            ).alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    cands = (
        hamming.withColumn("crnk", F.row_number().over(w))
        .filter(F.col("crnk") <= _BIN_CAND)
        .select("query_id", "neighbor_id", "hamming")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        emb.join(F.broadcast(cands), F.col("vec_id") == F.col("neighbor_id"))
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qe"), F.col("e")) / (_norm(F.col("qe")) * _norm(F.col("e"))), 6
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


_SIG_SQL = """
sig AS (
  SELECT vec_id,
    list_sum([CASE WHEN emb[i+1]  > 0 THEN (1::BIGINT << i) ELSE 0 END for i in range(32)]) AS sig_lo,
    list_sum([CASE WHEN emb[33+i] > 0 THEN (1::BIGINT << i) ELSE 0 END for i in range(32)]) AS sig_hi
  FROM e
)
"""

SIM_ANN_BINARY_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
{_SIG_SQL},
q AS (SELECT vec_id AS query_id, sig_lo AS q_lo, sig_hi AS q_hi FROM sig WHERE vec_id < {N_QUERIES}),
hamming AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         bit_count(xor(s.sig_lo, q.q_lo)) + bit_count(xor(s.sig_hi, q.q_hi)) AS hamming,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY bit_count(xor(s.sig_lo, q.q_lo)) + bit_count(xor(s.sig_hi, q.q_hi)) ASC,
                    s.vec_id ASC
         ) AS crnk
  FROM sig s JOIN q ON s.vec_id <> q.query_id
),
scored AS (
  SELECT h.query_id, h.neighbor_id,
         ROUND(list_dot_product(qe.emb, c.emb)
               / (sqrt(list_dot_product(qe.emb, qe.emb)) * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
  FROM hamming h
  JOIN e c  ON c.vec_id = h.neighbor_id
  JOIN e qe ON qe.vec_id = h.query_id
  WHERE h.crnk <= {_BIN_CAND}
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


def sim_binary_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the binary-sketch tier: overlap between the
    sign-bit/Hamming top-k and the exact brute-force cosine top-k over ALL
    ``N_QUERIES`` queries — the readout that decides whether 1 bit/dim is
    enough signal or the candidate pool ``_BIN_CAND`` must grow."""
    exact = cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    binary = sim_ann_binary(spark, sf_dir).select("query_id", "neighbor_id")
    overlap = exact.join(binary, ["query_id", "neighbor_id"]).count()
    total = N_QUERIES * TOP_K
    return spark.createDataFrame(
        [(int(N_QUERIES), int(TOP_K), int(overlap), round(overlap / total, 6))],
        "n_queries int, k int, n_overlap int, recall double",
    )


SIM_BINARY_QUALITY_SQL = f"""
WITH exact AS (SELECT query_id, neighbor_id FROM ({SIM_COSINE_TOPK_SQL}) t),
bin AS (SELECT query_id, neighbor_id FROM ({SIM_ANN_BINARY_SQL}) t)
SELECT {N_QUERIES} AS n_queries, {TOP_K} AS k,
       CAST((SELECT COUNT(*) FROM exact JOIN bin USING (query_id, neighbor_id)) AS INT) AS n_overlap,
       ROUND(CAST((SELECT COUNT(*) FROM exact JOIN bin USING (query_id, neighbor_id)) AS DOUBLE)
             / {N_QUERIES * TOP_K}, 6) AS recall
"""


# --- Johnson-Lindenstrauss random projection ---------------------------------

_JL_K = 16  # target dimensionality (64 -> 16)
_JL_SAMPLE = 20  # vectors in the fenced distortion sample (190 pairs)


def _jl_matrix() -> list[list[int]]:
    """Deterministic +/-1 projection matrix (k rows of EMB_DIM entries):
    sign of bit 0 of md5("jl-<j>-<i>"). Generated ONCE in Python and
    embedded as literals in both engines — the projection matrix is a
    model constant, exactly like k-means centroids or PQ codebooks, so it
    rides as a bounded broadcast, never a per-row hash."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"jl-{j}-{i}".encode()).digest()[0] & 1 else -1
            for i in range(EMB_DIM)
        ]
        for j in range(_JL_K)
    ]


def emb_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketch quality: project every embedding
    64 -> ``_JL_K`` dims with a +/-1 matrix (Achlioptas's database-friendly
    construction) and measure pairwise squared-distance distortion on a
    fenced {_JL_SAMPLE}-vector sample:

        ratio(a, b) = ||Ra - Rb||^2 / (k * ||a - b||^2)   (E[ratio] = 1)

    — the check run before committing an ANN index to a reduced dimension.
    Scale shape: the projection is a narrow map (k dot-folds per row,
    matrix rides as literals/broadcast); the distortion stage is fenced to
    sample^2/2 pairs. Every fold is left-to-right in both engines, so the
    doubles match bit-exactly; only the final stats round."""
    R = _jl_matrix()
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _JL_SAMPLE)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    # r11 (guide §7.3, driver-side cost): build each projection row as ONE
    # SQL string parsed once in the JVM. The previous Column-by-Column form
    # (_JL_K x EMB_DIM F.lit calls wrapped in array/zip_with/aggregate) made
    # ~1k py4j round-trips per query BUILD — 1.2 s of driver time before any
    # task ran. Identical expressions after parsing (`1.0D` literals are the
    # same doubles), so results are bit-identical.
    def _y_expr(row: list[int]) -> str:
        arr = ", ".join(f"{float(v)!r}D" for v in row)
        return (
            f"aggregate(zip_with(e, array({arr}), (x, r) -> x * r),"
            " 0.0D, (acc, x) -> acc + x)"
        )

    ys = [F.expr(_y_expr(R[j])).alias(f"y{j}") for j in range(_JL_K)]
    proj = emb.select("vec_id", "e", F.array(*ys).alias("y"))
    a = proj.select(
        F.col("vec_id").alias("ida"), F.col("e").alias("ea"), F.col("y").alias("ya")
    )
    b = proj.select(
        F.col("vec_id").alias("idb"), F.col("e").alias("eb"), F.col("y").alias("yb")
    )

    def sqdist(u: Column, v: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    pairs = a.join(F.broadcast(b), F.col("ida") < F.col("idb")).select(
        (sqdist(F.col("ya"), F.col("yb")) / (F.lit(float(_JL_K)) * sqdist(F.col("ea"), F.col("eb")))).alias(
            "ratio"
        )
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.round(
            F.sum(F.col("ratio").cast("decimal(28,12)")).cast("double") / F.count("*"), 6
        ).alias("mean_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
        F.round(F.max("ratio"), 6).alias("max_ratio"),
    )


def _jl_sql() -> str:
    R = _jl_matrix()
    y_terms = ", ".join(
        "list_dot_product(emb, [" + ", ".join(f"{float(v)!r}" for v in row) + "])"
        for row in R
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < {_JL_SAMPLE}
),
proj AS (SELECT vec_id, emb, [{y_terms}] AS y FROM e),
pairs AS (
  SELECT list_sum(list_transform(list_zip(a.y, b.y), p -> (p[1] - p[2]) * (p[1] - p[2])))
         / ({float(_JL_K)!r} *
            list_sum(list_transform(list_zip(a.emb, b.emb), p -> (p[1] - p[2]) * (p[1] - p[2]))))
         AS ratio
  FROM proj a JOIN proj b ON a.vec_id < b.vec_id
)
SELECT COUNT(*) AS n_pairs,
       ROUND(CAST(SUM(CAST(ratio AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mean_ratio,
       ROUND(MIN(ratio), 6) AS min_ratio,
       ROUND(MAX(ratio), 6) AS max_ratio
FROM pairs
"""


EMB_JL_SQL = _jl_sql()


QUERIES: dict[str, tuple] = {
    "sim_ann_binary": (sim_ann_binary, SIM_ANN_BINARY_SQL),
    "emb_jl_projection": (emb_jl_projection, EMB_JL_SQL),
    "sim_binary_quality": (sim_binary_quality, SIM_BINARY_QUALITY_SQL),
    "emb_triplet_mining": (emb_triplet_mining, EMB_TRIPLET_SQL),
    "sim_mmr_rerank": (sim_mmr_rerank, SIM_MMR_SQL),
    "sim_ann_pq_adc": (sim_ann_pq_adc, SIM_PQ_ADC_SQL),
    "sim_ann_ivfpq": (sim_ann_ivfpq, SIM_ANN_IVFPQ_SQL),
    "sim_adc_quality": (sim_adc_quality, SIM_ADC_QUALITY_SQL),
    "emb_power_iteration": (emb_power_iteration, EMB_POWER_SQL),
    "emb_centroid_drift": (emb_centroid_drift, EMB_CENTROID_DRIFT_SQL),
    "emb_gram_topk": (emb_gram_topk, EMB_GRAM_SQL),
    "emb_pq_stats": (emb_pq_stats, EMB_PQ_SQL),
    "emb_dim_energy": (emb_dim_energy, EMB_DIM_ENERGY_SQL),
    "sim_knn_classify": (sim_knn_classify, SIM_KNN_CLASSIFY_SQL),
    "emb_quantize_stats": (emb_quantize_stats, EMB_QUANTIZE_SQL),
    "sim_cosine_topk": (sim_cosine_topk, SIM_COSINE_TOPK_SQL),
    "sim_ann_ivf": (sim_ann_ivf, SIM_ANN_IVF_SQL),
    "dedup_semantic": (dedup_semantic, DEDUP_SEMANTIC_SQL),
    "dedup_semantic_prune": (dedup_semantic_prune, DEDUP_SEMANTIC_PRUNE_SQL),
    "emb_norm_stats": (emb_norm_stats, EMB_NORM_STATS_SQL),
}
