"""Generate PLANS.md: annotated physical plans for the flagship queries.

Run: python tools/plan_audit.py  (writes PLANS.md at the repo root)

The annotations state the scale property each plan exhibits; the plan text
is the evidence. Regenerate after any planner-affecting change.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drive_health_etl_spark.plans.registry import REGISTRY
from drive_health_etl_spark.session import get_spark

SF = "/root/testdata/sf0.01"

AUDITS = [
    (
        "dedup_prefix_join",
        "Prefix-filtering similarity join (PPJoin): the shingle-set relation "
        "is a persisted one-pass build (InMemoryRelation in-plan); candidate "
        "generation is an equi-join keyed on RARE prefix shingles (the "
        "frequency ordering is what bounds bucket skew), fenced by "
        "length-ratio + positional filters, then the r6 count-filter "
        "pre-verify (per-doc 64-bucket histograms; pairwise min-sum is an "
        "exact intersection upper bound — 5.54M -> 2.7k pairs at sf1) "
        "before the exact verify join — no all-pairs stage anywhere.",
    ),
    (
        "graph_hits",
        "HITS: per half-iteration ONE equi-join + map-side-combinable integer "
        "sum over a lineage-free (localCheckpointed) bipartite edge list; the "
        "shared a2 frontier is checkpointed so both output branches read it "
        "instead of re-executing the chain (26 -> 8 shuffles).",
    ),
    (
        "sim_ann_binary",
        "Binary-sketch ANN: the corpus-wide stage touches only two bigint "
        "signature columns (integer XOR/popcount inside codegen, no float "
        "folds); the top-M window shuffles skinny int rows; the float cosine "
        "runs on M rows per query after broadcast joins.",
    ),
    (
        "corpus_temperature_mix",
        "Temperature mixing: two corpus scans (counts, then filter) instead "
        "of materializing the corpus — the right trade at 100 TB; the rates "
        "relation is #sources-sized and broadcast; the keep-filter is a "
        "narrow sha256 map.",
    ),
    (
        "q1_pricing_summary",
        "Flagship aggregation: the shipdate predicate is pushed into the "
        "parquet scan (PushedFilters), only the 7 referenced columns are read "
        "(ReadSchema), and aggregation runs partial (map-side) then final — "
        "the shuffle carries per-group partial states, not rows.",
    ),
    (
        "j6_star_join",
        "Star join: nation/region broadcast (BroadcastHashJoin, no shuffle for "
        "dims); the lineitem-orders-customer chain shuffles on join keys with "
        "AQE free to reorder; aggregation again partial+final.",
    ),
    (
        "w1_first_write_wins",
        "First-write-wins dedup: single hash shuffle on the dedup key, then a "
        "sorted window — the canonical exactly-once pattern; no second pass.",
    ),
    (
        "dedup_minhash_pairs",
        "MinHash LSH: tokens explode map-side, signatures form via partial "
        "min-aggregates, candidate pairs come from bucket grouping — shuffle "
        "keys are (band, h1, h2) hashes; no cross join anywhere in the plan.",
    ),
    (
        "sim_ann_lsh",
        "LSH ANN: bucket assignment is a narrow map (hyperplane dot products "
        "against literal weights); candidates join on bucket equality — the "
        "all-pairs comparison never materializes.",
    ),
    (
        "o6_sampling_filter",
        "Deterministic sampling: sha2/conv filter evaluates inside the scan "
        "stage's codegen'd filter; no UDF, no shuffle.",
    ),
    (
        "sim_ann_lsh_multitable",
        "Multi-table LSH (OR-amplification): 8 hash tables explode to "
        "(table, bucket) keys — uniform shuffle keys, candidate pairs "
        "deduped before cosine scoring, probe side broadcast. Recall@3 "
        "0.958 vs brute force at sf0.1 while scanning a bucketed fraction.",
    ),
    (
        "sim_ann_ivf",
        "IVF-flat ANN with a real k-means fit: centroid assignment is a "
        "narrow map over an array-of-structs literal (no join, no shuffle); "
        "the inverted-file search joins on cell id with the query side "
        "broadcast — never all-pairs.",
    ),
    (
        "text_decontaminate",
        "Benchmark decontamination: the corpus side explodes to word "
        "4-grams and broadcast-hash-joins against the distinct-ed benchmark "
        "gram set — the 100 TB corpus is never shuffled; only the (small) "
        "eval-suite gram set moves.",
    ),
    (
        "text_repetition",
        "Repetition metrics: array-native ratio math in one narrow pass; "
        "the top-bigram pass aggregates on (doc_id, bigram) with map-side "
        "partial aggregation — keys are per-document, so no cross-document "
        "skew is possible.",
    ),
    (
        "q19_discounted_revenue",
        "Disjunctive OR-of-ANDs predicate: Catalyst extracts the common "
        "l_quantity bounds and the per-brand size bounds into PushedFilters "
        "on BOTH scans (check the Or(...) entries), evaluates the full "
        "disjunction post-join, and keeps the part side a broadcast "
        "equi-join — the OR never degrades the join strategy.",
    ),
    (
        "q21_waiting_orders",
        "EXISTS + NOT-EXISTS self-join collapsed to one window: both "
        "distinct-supplier sets come from collect_set over the orderkey "
        "partition, so the whole multi-EXISTS costs ONE shuffle and ONE "
        "fact pass (the naive translation scans lineitem four times).",
    ),
    (
        "dedup_semantic",
        "SemDeDup: the k-means cell assignment is a narrow broadcast-scored "
        "map; the near-dup pair join shuffles on cell id only — the "
        "quadratic term is fenced to within-cell pairs (|cell| ~ n/k), "
        "never an all-pairs cross join.",
    ),
    (
        "corpus_prep_pipeline",
        "Composed prep chain: tokenize + quality gate fuse into the scan "
        "stage (no intermediate materialization), the exact-dedup window "
        "on the content hash is the single shuffle, and the final stats "
        "aggregate plans partial+final.",
    ),
    (
        "basket_part_pairs",
        "Market-basket self-join: both sides hash-partition on l_orderkey "
        "(co-located SortMergeJoin after one exchange each), pair expansion "
        "is bounded by items-per-order, the pair aggregate is partial+final "
        "and top-k plans as TakeOrderedAndProject — no global sort.",
    ),
    (
        "graph_pagerank",
        "PageRank iteration body (one round shown): a single equi-join of "
        "the checkpointed degree-weighted edge list against the rank vector "
        "plus one partial+final aggregate on the destination key — the "
        "Pregel-as-MapReduce shape; the teleport term is a narrow map. "
        "The fixed unroll keeps lineage static; edges are localCheckpoint-ed.",
    ),
    (
        "feat_tfidf_top_terms",
        "TF-IDF: Catalyst auto-broadcasts the vocab-sized df table (no "
        "hint — at real scale it would shuffle-join on the term key "
        "instead), corpus size N is a 1-row broadcast, and the per-doc "
        "top-k plans as WindowGroupLimit partial+final — rank-3 rows are "
        "dropped BEFORE the doc-key exchange, not after.",
    ),
    (
        "scd2_order_status",
        "SCD2 gaps-and-islands: all three window passes and the run-level "
        "groupBy share the o_custkey partitioning — Catalyst plans ONE "
        "exchange; the change-flag/cumsum/lead chain is sort-local.",
    ),
    (
        "j5b_binned_range_join",
        "Binned range join: the interval predicate becomes a HASH join on "
        "the 7-day bin key (intervals explode to <=2 bins via sequence, "
        "points map to one) plus a residual range filter — no "
        "BroadcastNestedLoopJoin, and the shape stays shuffle-partitionable "
        "when BOTH sides are fact-sized (here the calendar-bounded window "
        "side broadcasts).",
    ),
    (
        "sketch_distinct_hll",
        "Mergeable-sketch distinct: per-group HLL sketches are partial-"
        "aggregated map-side (ObjectHashAggregate partial+final), and the "
        "global row merges the per-group sketches with hll_union_agg — one "
        "fact scan for the groups, a kilobyte-sized 1-row join for the "
        "total; raw keys shuffle once, never twice.",
    ),
    (
        "layout_zorder_stats",
        "Z-order key math: the Morton interleave is pure shift/mask "
        "arithmetic inside ONE WholeStageCodegen span over the scan — no "
        "UDF, no join, no extra pass; the quadrant aggregate plans "
        "partial+final on the 4-bit key.",
    ),
    (
        "sql_recursive_cte",
        "Recursive CTE (Spark 4 UnionLoop): each iteration joins the "
        "shrinking frontier only — work per round tracks the frontier, "
        "rounds equal hierarchy depth, and the final aggregate is an "
        "ordinary partial+final HashAggregate over the loop output.",
    ),
    (
        "graph_triangles",
        "Triangle census: support-thresholded edges (HAVING on the pair "
        "aggregate) bound the edge list before the two single-key equi-"
        "joins; ID ordering counts each triangle exactly once — no "
        "cartesian anywhere, the only BNLJ is the 1-row x 1-row summary "
        "join.",
    ),
    (
        "corpus_source_overlap",
        "Source overlap matrix: DISTINCT (source, shingle) first (one "
        "shuffle on the shingle), then the per-shingle source pair "
        "expansion is bounded by C(n_sources,2) — corpus size never enters "
        "the join fan-out; per-source totals broadcast back onto the "
        "n_sources^2-row result.",
    ),
    (
        "j7_bloom_prefilter_join",
        "Explicit bloom prefilter: the filter build is one ≤4096-group "
        "aggregate (map-side combined bit_or); the probe side evaluates the "
        "membership test against the broadcast 32 KiB word array INSIDE the "
        "scan stage, so non-candidate rows die before the semi-join "
        "shuffle — the only BroadcastNestedLoopJoin is the 1-row array "
        "attach.",
    ),
    (
        "j8_skew_salted_join",
        "Salted skew join: the join key is the composite (tenant, _salt), "
        "so at scale the hot tenant's rows hash across 16 reducers instead "
        "of one; only the dim side replicates (explode x16 on config-sized "
        "rows). At sf0.01 the planner broadcasts the whole (tiny) fact side "
        "— the plan evidence here is the composite key in the join "
        "condition; the shuffle-spread behavior is size-triggered and "
        "equivalence is pytest-asserted under forced shuffle in "
        "tests/test_skew.py.",
    ),
    (
        "w11_interval_concurrency",
        "Interval concurrency sweep: union of +1/-1 boundary points, ONE "
        "shuffle on event_type, sort-local running sum, partial+final max — "
        "no global sort, no self-join; per-type partitions are the "
        "parallelism unit.",
    ),
    (
        "retrieval_eval_ndcg",
        "Ranking eval: the BM25 ranking (config-sized, 20 rows) broadcasts "
        "onto the corpus relevance scan; DCG/MRR reduce in one aggregate "
        "pass; IDCG is a TakeOrdered top-10. The 1-row metric joins are "
        "the only nested-loop shapes.",
    ),
    (
        "sketch_bitmap_distinct",
        "Bitmap exact-distinct: two-level aggregate — per-(type, bucket) "
        "bitmap_construct_agg with map-side partials (bounded 4 KB state "
        "per bucket regardless of cardinality), then a per-type popcount "
        "sum. No shuffle of raw distinct keys, unlike COUNT DISTINCT's "
        "Expand.",
    ),
    (
        "w12_ewma_smooth",
        "Recursive EWMA: one shuffle on user_id, per-key sorted "
        "collect_list, then the smoother runs as a single higher-order "
        "aggregate() fold inside codegen — the recursion window functions "
        "cannot express, without any Python.",
    ),
    (
        "stat_chi2_independence",
        "Chi-square: ONE map-side-combinable aggregate over the fact scan "
        "builds the enum-sized contingency cells; row/column totals are "
        "broadcast joins over that tiny relation — the fact table is read "
        "exactly once, and nothing downstream scales with rows.",
    ),
    (
        "sketch_cms_estimate",
        "Count-min sketch: the token explode feeds a groupBy keyed on "
        "(hash row, counter) — shuffle key cardinality fixed at 1536 "
        "regardless of corpus size, partial-aggregated map-side; the probe "
        "side joins the exact top-k against the broadcast sketch grid.",
    ),
    (
        "multimodal_phash_neardup",
        "Perceptual-hash near-dup: one Arrow-batched decode pass emits "
        "4 band ints per image (localCheckpoint so candidate and verify "
        "sides reuse it); candidates come from an EQUI join on "
        "(band position, band value) — no cross join — and the hamming "
        "verify joins back on doc id.",
    ),
    (
        "graph_bfs_distances",
        "Bounded-hop BFS: the support-filtered edge list materializes once "
        "(localCheckpoint), then each hop is one equi-join frontier ⋈ edges "
        "plus a MIN-combine on node — the Pregel shape; the statically "
        "unrolled chain never re-scans the fact table.",
    ),
    (
        "lake_merge",
        "MERGE INTO: one full-outer sort-merge join on the key computes "
        "update/delete/insert in a single pass (the Delta/Iceberg MERGE "
        "execution shape); the snapshot commit republishes a manifest, not "
        "a directory listing.",
    ),
    (
        "sess_attribution",
        "Multi-touch attribution: clicks ⋈ purchases is an equi-join on "
        "user_id with a range residual (the as-of family shape), the three "
        "credit models share two windows over the same per-purchase "
        "partitioning, and the rollup is enum-by-calendar sized.",
    ),
    (
        "sim_ann_ivfpq",
        "IVF-PQ: the centroid matrix and the 64-entry ADC lookup table ride "
        "in as 1-row broadcasts (never the expression tree); cell assignment "
        "and PQ encoding are narrow maps over one corpus scan each; the "
        "probe fence and the codes⋈LUT score are equi-joins — candidates "
        "outside the probed cells never reach the scorer's aggregate.",
    ),
    (
        "emb_power_iteration",
        "PCA power iteration: the corpus feeds ONLY the int64 Gram partials "
        "(mapInPandas matmuls, shuffle keyed on d^2 cells); the iteration is "
        "single-row array algebra built as withColumn steps, so each round "
        "references the previous round's COLUMN instead of re-inlining its "
        "expression tree.",
    ),
    (
        "sim_mmr_rerank",
        "MMR re-rank: the candidate pool is top-k-bounded before the "
        "quadratic pairwise stage (k^2, corpus-size-independent); both the "
        "pool and its pairwise similarities localCheckpoint once and every "
        "greedy round reuses them — 5 rounds of tiny argmax plans, no "
        "re-scan.",
    ),
    (
        "dedup_lsh_scurve",
        "LSH S-curve: the quadratic exact-Jaccard term is fenced to the "
        "fixed evaluation subset via a shared-shingle inverted-index join "
        "(pairs sharing zero shingles never materialize); the capture flag "
        "is a left join against the production candidate generator "
        "restricted to the same subset.",
    ),
    (
        "emb_pq_stats",
        "Trained-PQ encode, single pass (r5): subvectors posexplode to "
        "(m, sv) and score against the all-subspace codebook riding as ONE "
        "1-row broadcast — one corpus scan for all PQ_M subspaces (the "
        "round-2 layout scanned per subspace); the argmin is an array_min "
        "fold inside codegen, and the final per-subspace aggregate is "
        "partial+final over PQ_M keys.",
    ),
    (
        "sim_ann_pq_adc",
        "ADC scoring over trained PQ codes: the code table and 64-entry LUT "
        "derive from the same single-pass encode; per-candidate cost is a "
        "broadcast-joined LUT lookup + decimal sum (map-side combinable), "
        "never a float-vector touch — the billion-vector scoring layout.",
    ),
    (
        "quality_lr_eval",
        "Learned-classifier scoring: the trained weight vector rides as "
        "literals in a narrow scoring map (no join), so the plan is scan -> "
        "project -> ONE partial+final aggregate; training (not shown) "
        "collects only the 4-float weight vector per GD round.",
    ),
    (
        "emb_triplet_mining",
        "Contrastive triplet construction: cell assignment reuses the "
        "cached k-means fit (centroid literals, narrow map); candidates "
        "join the 8-row anchor broadcast (fenced brute-force), then two "
        "per-anchor window top-1s on one shuffle each — no all-pairs stage.",
    ),
    (
        "multimodal_jpeg_stats",
        "Compressed-media decode path: explicit repartition spreads the "
        "Python codec across executors (the source parquet is one row "
        "group), then Arrow-batched mapInPandas encode/decode — one Python "
        "round trip per batch of blobs, the only viable shape at 100 TB.",
    ),
    (
        "graph_pagerank",
        "PageRank (r5 partitioning fix): the degree-weighted edge list is "
        "built once at full parallelism and localCheckpointed; each "
        "iteration is one equi-join + partial+final aggregate at the "
        "session's default parallelism with AQE coalescing small shuffles "
        "(the old fixed 8-partition pin under-parallelized sf0.1 4x). The "
        "final plan below is the trivial readout of the checkpointed ranks "
        "— the iterative work happens upstream, bounded per round.",
    ),
    (
        "quality_ft_eval",
        "Hashed-ngram NB classifier (r7): ONE gram-explode scan folded to "
        "map-side-combinable (doc, y, bucket) counts and checkpointed for "
        "its two consumers; the closed-form NBSVM fit is one more "
        "combinable aggregate whose 512-row weight table rides back as a "
        "broadcast — no GD rounds, no driver round-trips, the one-pass "
        "shape a 100 TB fit needs. Scoring is exact decimal sums per doc "
        "plus one confusion aggregate.",
    ),
    (
        "dedup_substring_ladder",
        "Multi-resolution shared-substring profile (r7): the (doc, k, "
        "gram) explode is scan-shaped (|ladder| x corpus chars, never "
        "pairwise), persisted DISK_ONLY (long gram strings must not sit "
        "in executor heap — an eager in-memory checkpoint OOM'd an 8g "
        "driver at sf1); the shared-gram back-join is a PINNED "
        "shuffle-hash join because the shared side grows with the "
        "corpus's true overlap structure and must never be broadcast "
        "(AQE's estimate picked a ~300 MB long-string broadcast at sf1 — "
        "2x slower and a scale hazard).",
    ),
    (
        "corpus_novelty",
        "Per-doc novelty (r7): reuses the dedup family's persisted "
        "shingle-set subtree; one vocab-keyed docs-per-shingle aggregate "
        "(map-side combinable over per-doc-distinct sets), one HINT-FREE "
        "equi-join back (AQE broadcasts at test scale, shuffles at open "
        "vocabulary), one per-doc aggregate. Novelty is an exact integer "
        "ratio — no rounding anywhere in the query.",
    ),
    (
        "quality_ft_histcal",
        "Holdout histogram calibration (r7): the scored relation is "
        "checkpointed once (doc-count-sized); the bin fit and the train "
        "prior are two tiny combinable aggregates broadcast back onto the "
        "test half; the readout is one 8-group aggregate. Deterministic "
        "odd/even doc split, so both engines replay the identical "
        "holdout — a calibration fit whose cost is two passes over "
        "scores at any corpus size.",
    ),
    (
        "text_zipf_fit",
        "Zipf spectrum OLS (r7): the word-frequency spectrum is one "
        "explode + map-side-combinable count; ranks come from a single "
        "window over the VOCABULARY-sized relation (not the corpus); the "
        "OLS moments are one decimal-exact aggregate over that same "
        "vocab-sized input. Corpus-size work is the token explode only.",
    ),
    (
        "dedup_suffix_doubling",
        "KMR prefix doubling (r8): the whole fingerprint chain (k=8 "
        "doubled to 256) is per-row array transforms over overlap-"
        "segmented documents inside ONE narrow scan — no joins, no "
        "iteration state; the plan's only exchanges are the per-(k,doc,id) "
        "distinct, the shared-class count, and the doc back-join over the "
        "persisted distinct relation. Per-row memory is bounded by the "
        "4096-char segment cap for arbitrarily long documents.",
    ),
    (
        "dedup_cdc_chunks",
        "Content-defined chunking (r8): boundary detection and chunk "
        "assembly are per-row array expressions in the scan (window-hash "
        "mod test, Manber/LBFS family) — the ONLY data shuffle is the "
        "chunk-content aggregation; the two scalar folds meet in a "
        "single-row crossJoin. Chunk-store stats at 100 TB cost one "
        "content-keyed exchange.",
    ),
    (
        "dedup_edit_join",
        "Exact edit-distance similarity join, r9 asymmetric chunk-gram "
        "signature (Qin et al. VLDB'11): each doc's K+1 RAREST disjoint "
        "Q-chunks must appear verbatim in any true partner's q-gram set, "
        "so candidate generation is the gram scan hash-probing a "
        "broadcast K+1-rows-per-doc signature — ZERO shuffle (above "
        "500k docs it degrades to one slim int64 equi-join). The only "
        "shuffles left are the gram-df aggregate, the rarest-chunk hash "
        "aggregate (slice(array_sort(collect_list)) — no window, no "
        "partition sort), and the candidate distinct; the verifier is the "
        "threshold-banded O(K*n) levenshtein directly (chunk candidates "
        "are near-true: word-permuted near-dups share gram SETS but not "
        "16-char contiguous runs, so they die at generation — 408k -> "
        "149k candidates at sf1, 18s -> 10s). No cartesian/BNLJ anywhere; "
        "the length-bucketed brute branch covers exactly the docs below "
        "the (K+1)*Q signature-guarantee length and stays banded.",
    ),
    (
        "dedup_exactsubstr_clean",
        "ExactSubstr removal (r9, the transformation half of Lee et al.'s "
        "pipeline): reuses the span subtree (two hash-keyed shuffles + one "
        "doc-key window, never pair-expanding), collapses spans to a "
        "per-doc (s, e) struct array, and the rewrite itself is ONE "
        "higher-order filter over the token array — a full-corpus "
        "scan -> span join -> scan-shaped write, no extra exchanges.",
    ),
    (
        "dedup_suffix_lcs",
        "Longest cross-document repeated substring (r9, unbounded-k suffix "
        "ranks): driver-bounded rank bisection — O(log max_len) rounds, "
        "each ONE action fusing the fingerprint probe (xxhash64 equality "
        "classes, the KMR idea at a single arbitrary length) with the "
        "frontier shrink via an eager localCheckpoint; the frontier only "
        "shrinks, so tail probes touch near-dup cluster positions only. "
        "The pinned plan is the content-grouped readout: checkpoint scan + "
        "broadcast text join + two count-distinct aggregates + scalar "
        "crossJoin — no sort, no window, no pair join anywhere; the DuckDB "
        "oracle is a different algorithm entirely (sorted-adjacency LCP "
        "bisection).",
    ),
    (
        "stat_bh_fdr",
        "Benjamini-Hochberg FDR (r8): ONE conditional map-combinable "
        "aggregate over the fact table produces the hypothesis table; the "
        "single-partition rank/running-min windows that implement the "
        "step-up adjustment sort only the enum-sized test family "
        "(types x weekdays), never data rows — the scale-correct shape "
        "for multiple-testing control over a 100 TB fact scan.",
    ),
    (
        "stat_cuped",
        "CUPED variance reduction (r8): the fact scan collapses to one "
        "(user, period) pivot aggregate with map-side combine; every "
        "moment (Sx, Sy, Sxx, Sxy, Syy, per-arm sums) is an exact integer "
        "in a single 1-row aggregate, and theta/deltas/variance-reduction "
        "are scalar math on that row. Two exchanges total at any volume; "
        "the median-day bound is a 1-row broadcast.",
    ),
    (
        "graph_adamic_adar",
        "Adamic-Adar link prediction (r8): pair expansion is a self-join "
        "on part keys over the persisted weighted bipartite relation, "
        "bounded per key by the declared hub cap (deg <= 64, the standard "
        "AA scale device — hub pairs cost deg^2 for the graph's smallest "
        "weights); per-pair scores sum 12-dp decimal-cast weights "
        "(order-independent) and the readout is a TakeOrdered, not a "
        "global sort.",
    ),
    (
        "ts_sax_motifs",
        "SAX motif mining (r8): the fact scan collapses to per-(type,day) "
        "decimal totals in one aggregate; z-normalization constants ride "
        "back as an enum-sized broadcast; PAA/alphabet/word windows all "
        "key on event_type over calendar-sized rows. Motif counting is "
        "one more enum-bounded aggregate — nothing downstream of the "
        "first exchange scales with data volume.",
    ),
]


def main() -> None:
    spark = get_spark("plan-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# PLANS — physical-plan audit of flagship queries",
           "",
           f"Generated by `tools/plan_audit.py` on sf0.01. Each section: the "
           f"scale property claimed, then the plan as evidence. Plan-shape "
           f"regressions are guarded by `tests/test_plans.py`.",
           ""]
    for name, note in AUDITS:
        df = REGISTRY[name][0](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = re.sub(r"#\d+[L]?", "", plan)  # strip expr ids for readability
        plan = "\n".join(line.rstrip() for line in plan.splitlines() if line.strip())
        out += [f"## {name}", "", note, "", "```", plan[:4000], "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
