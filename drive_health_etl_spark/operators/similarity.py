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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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


def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: assign every vector to its nearest of N_CELLS centroids
    (inverted file), then search only the query's cell. Centroids here are a
    deterministic stand-in (the first N_CELLS vectors) — production would
    k-means; the *plan shape* is the point: assignment is a constant-width
    broadcast scoring pass, search shuffles on cell id, never all-pairs."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
    )
    scored_cells = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "e",
        "cent_id",
        (_dot(F.col("e"), F.col("ce")) / (_norm(F.col("e")) * _norm(F.col("ce")))).alias("ccos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id").asc())
    assigned = (
        scored_cells.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "e", F.col("cent_id").alias("cell"))
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


SIM_ANN_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cents AS (SELECT vec_id AS cent_id, emb AS ce FROM e WHERE vec_id < {N_CELLS}),
assigned AS (
  SELECT vec_id, emb, cell FROM (
    SELECT e.vec_id, e.emb, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.emb, c.ce)
                      / (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.ce, c.ce))) DESC,
                      c.cent_id ASC) AS rn
    FROM e CROSS JOIN cents c
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


QUERIES: dict[str, tuple] = {
    "sim_cosine_topk": (sim_cosine_topk, SIM_COSINE_TOPK_SQL),
    "sim_ann_ivf": (sim_ann_ivf, SIM_ANN_IVF_SQL),
    "emb_norm_stats": (emb_norm_stats, EMB_NORM_STATS_SQL),
}
