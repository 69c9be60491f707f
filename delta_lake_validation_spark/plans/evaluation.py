"""Round-8 pipeline-evaluation, sampling & graph operators.

Engine extensions (the reference has no text/curation surface — its
analytics stop at relational queries, src/benchmarking_suite.py:40-140);
each query carries a DuckDB oracle and a 100 TB scale note.  The families:

* **Gopher-style rule filter** — the classic composite document-quality
  gate (word-count bounds, mean-word-length band, stop-word presence,
  top-word dominance): the rule battery every raw web corpus passes
  through before model-based scoring.  All-integer outputs.
* **Weighted sampling without replacement** — Efraimidis–Spirakis A-ES
  with DETERMINISTIC uniforms derived from md5(doc_id), so the sample is
  reproducible and cross-engine value-gradeable (the split_assign md5
  discipline, extended from bucketing to weighted selection).
* **Dedup-pipeline evaluation** — precision/recall of the approximate
  MinHash-LSH candidate pairs against the exact n-gram-Jaccard truth at
  the same threshold: the measurement that decides band/permutation
  knobs before a 100 TB dedup run (recall_report's batch twin, but
  value-graded end to end via the cross-engine sha256 hash profile).
* **PageRank over the near-dup graph** — three power-iteration steps in
  FIXED-POINT integer arithmetic (scale 10^12, floor division), so the
  result is exact integer math on both engines: no float-summation-order
  hazard.  Centrality over dup clusters ranks the most-connected
  canonical candidates; the same recurrence shape covers any
  fixed-iteration graph propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_validation_spark.functions.aggregates import round_half_up
from delta_lake_validation_spark.plans.registry import TIER_NEWFAM, register
from delta_lake_validation_spark.tables import Tables

# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021 §A1.1, adapted to the
# synthetic corpus's measured distributions so every rule actually splits):
#   R1  30 <= word count <= 80
#   R2  mean word length in [4.30, 4.70]  (stored as floor(chars*100/words))
#   R3  both stop words 'the' AND 'a' present
#   R4  most frequent word <= 12% of tokens (dominance, basis points)
#
# Scale shape: ONE tokenize pass feeds two hash aggregates that meet at doc
# granularity — per-doc moments (count/sum/conditional distinct) and the
# top-word dominance rollup (groupBy (doc, word) partial-agg then max per
# doc).  No windows, no corpus-keyed sort; integer outputs throughout.
# ---------------------------------------------------------------------------
@register(
    "quality_gopher_rules",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                  FROM documents),
    per AS (SELECT doc_id,
                   CAST(len(t) AS BIGINT) AS n_words,
                   CAST(list_sum(list_transform(t, w -> length(w))) * 100
                        // len(t) AS BIGINT) AS mwl_cp,
                   CAST(len(list_distinct(list_filter(t, w -> w IN ('the', 'a'))))
                        AS BIGINT) AS n_stop
            FROM toks),
    dom AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt
            FROM (SELECT doc_id, u.w, count(*) AS c
                  FROM toks, unnest(t) AS u(w) GROUP BY 1, 2)
            GROUP BY doc_id),
    flags AS (SELECT p.doc_id, p.n_words, p.mwl_cp, p.n_stop,
                     CAST(d.top_cnt * 10000 // p.n_words AS BIGINT) AS top_bp,
                     CASE WHEN p.n_words BETWEEN 30 AND 80 THEN 1 ELSE 0 END AS r1,
                     CASE WHEN p.mwl_cp BETWEEN 430 AND 470 THEN 1 ELSE 0 END AS r2,
                     CASE WHEN p.n_stop = 2 THEN 1 ELSE 0 END AS r3,
                     CASE WHEN d.top_cnt * 10000 // p.n_words <= 1200
                          THEN 1 ELSE 0 END AS r4
              FROM per p JOIN dom d USING (doc_id))
    SELECT doc_id, n_words, mwl_cp, top_bp,
           CAST(r1 AS BIGINT) AS r1, CAST(r2 AS BIGINT) AS r2,
           CAST(r3 AS BIGINT) AS r3, CAST(r4 AS BIGINT) AS r4,
           CAST(r1 + r2 + r3 + r4 AS BIGINT) AS n_pass,
           CAST(CASE WHEN r1 + r2 + r3 + r4 = 4 THEN 1 ELSE 0 END AS BIGINT)
             AS pass_all
    FROM flags
    """,
    tags=("text", "llm", "curation", "quality"),
    doc="Gopher-style rule battery (word-count band, mean-word-length band, "
    "stop-word presence, top-word dominance); all-integer per-doc flags",
    priority=TIER_NEWFAM,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    )
    per = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("w")).alias("n_chars"),
        F.countDistinct(
            F.when(F.col("w").isin("the", "a"), F.col("w"))
        ).alias("n_stop"),
    )
    dom = (
        toks.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    f = per.join(dom, "doc_id").select(
        "doc_id",
        "n_words",
        F.expr("n_chars * 100 DIV n_words").alias("mwl_cp"),
        F.expr("top_cnt * 10000 DIV n_words").alias("top_bp"),
        "n_stop",
    )
    r1 = (F.col("n_words") >= 30) & (F.col("n_words") <= 80)
    r2 = (F.col("mwl_cp") >= 430) & (F.col("mwl_cp") <= 470)
    r3 = F.col("n_stop") == 2
    r4 = F.col("top_bp") <= 1200
    out = f.select(
        "doc_id",
        "n_words",
        "mwl_cp",
        "top_bp",
        r1.cast("long").alias("r1"),
        r2.cast("long").alias("r2"),
        r3.cast("long").alias("r3"),
        r4.cast("long").alias("r4"),
    )
    return out.select(
        "*",
        (F.col("r1") + F.col("r2") + F.col("r3") + F.col("r4")).alias(
            "n_pass"
        ),
    ).withColumn(
        "pass_all", (F.col("n_pass") == 4).cast("long")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis & Spirakis 2006): each
# item draws u ~ U(0,1) and keeps key u^(1/w); the n largest keys are an
# exact weighted sample.  Here u is DETERMINISTIC — derived from
# md5(doc_id) (the split_assign discipline) — so the sample is reproducible
# across runs AND engines; we rank on cost = -ln(u)/w >= 0 ascending
# (monotone twin of the key, numerically tame).  Both engines evaluate the
# identical IEEE-double expression tree (ln of a 24-bit-integer ratio,
# one divide), and the output cost is half-up-rounded before grading.
#
# Scale shape: a global top-n with orderBy+limit, which Spark plans as
# TakeOrderedAndProject — every partition pre-selects its local 200, the
# driver merges n_partitions*200 tiny tuples; no global sort, no window.
# ---------------------------------------------------------------------------
_WS_N = 200
_WS_DENOM = float(1 << 24) + 1.0  # u = (h24 + 1) / (2^24 + 1)  in (0,1)


@register(
    "weighted_sample",
    oracle=rf"""
    WITH keyed AS (
      SELECT doc_id, n_chars AS weight,
             -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                       AS BIGINT) + 1) / {_WS_DENOM}) / n_chars AS cost
      FROM documents
    )
    SELECT doc_id, weight,
           CAST(floor(cost * 100000000.0 + 0.5) / 100000000.0 AS DOUBLE)
             AS cost
    FROM keyed
    ORDER BY keyed.cost ASC, doc_id ASC LIMIT {_WS_N}
    """,
    tags=("sampling", "llm", "curation"),
    doc="Efraimidis-Spirakis weighted sample (n=200, weight=n_chars) with "
    "deterministic md5-derived uniforms; TakeOrderedAndProject top-n",
    priority=TIER_NEWFAM,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    cost = -F.log((h + 1) / F.lit(_WS_DENOM)) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            cost.alias("__cost"),
        )
        .orderBy(F.asc("__cost"), F.asc("doc_id"))
        .limit(_WS_N)
        .select(
            "doc_id", "weight", round_half_up(F.col("__cost"), 8).alias("cost")
        )
    )


# ---------------------------------------------------------------------------
# Dedup-pipeline evaluation: precision/recall of the MinHash-LSH candidate
# pairs (sha256 hash profile, threshold tau=0.5) against the EXACT n-gram
# Jaccard >= 0.5 truth set.  This is the measurement a 100 TB dedup run is
# tuned by: bands/permutations are chosen so recall_bp clears the target
# before the full-corpus run is launched.  Both legs are individually
# value-graded queries (dedup_minhash_lsh, ngram_jaccard_pairs); this op
# composes them with a full outer join on the pair key and reduces to ONE
# row of integer counts — precision/recall in basis points via floor
# division (exactly gradeable; no float ratio).
#
# Scale shape: inherits the banded-LSH and PPJoin candidate bounds (both
# sub-quadratic, never all-pairs); the comparison itself is a join keyed by
# (left_doc, right_doc) — pair-set-sized, orders of magnitude smaller than
# the corpus — and a single global aggregate.
# ---------------------------------------------------------------------------
def _truth_pairs_sql(threshold_num: int = 1, threshold_den: int = 2) -> str:
    """Exact-Jaccard pair CTE body at inter/uni >= num/den (DuckDB)."""
    return rf"""
    WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                  FROM documents),
    sh AS (SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(range(1, len(t)-1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS s FROM toks),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    nsz AS (SELECT doc_id, len(s) AS n FROM sh),
    co AS (SELECT a.doc_id AS la, b.doc_id AS rb, count(*) AS inter
           FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
    SELECT co.la AS left_doc, co.rb AS right_doc
    FROM co JOIN nsz sa ON co.la = sa.doc_id
            JOIN nsz sb ON co.rb = sb.doc_id
    WHERE co.inter * {threshold_den}
          >= (sa.n + sb.n - co.inter) * {threshold_num}
    """


def _dedup_eval_oracle() -> str:
    from delta_lake_validation_spark.plans.llm import _minhash_oracle

    return rf"""
    WITH pred AS (SELECT left_doc, right_doc
                  FROM ({_minhash_oracle(threshold=0.5)}) mh),
    truth AS (SELECT left_doc, right_doc FROM ({_truth_pairs_sql(1, 2)}) tj),
    j AS (SELECT coalesce(p.left_doc, t.left_doc) AS l,
                 CASE WHEN p.left_doc IS NOT NULL THEN 1 ELSE 0 END AS in_pred,
                 CASE WHEN t.left_doc IS NOT NULL THEN 1 ELSE 0 END AS in_truth
          FROM pred p FULL OUTER JOIN truth t
            ON p.left_doc = t.left_doc AND p.right_doc = t.right_doc)
    SELECT CAST(sum(in_pred * in_truth) AS BIGINT) AS tp,
           CAST(sum(in_pred * (1 - in_truth)) AS BIGINT) AS fp,
           CAST(sum((1 - in_pred) * in_truth) AS BIGINT) AS fn,
           CAST(sum(in_pred * in_truth) * 10000
                // greatest(sum(in_pred), 1) AS BIGINT) AS precision_bp,
           CAST(sum(in_pred * in_truth) * 10000
                // greatest(sum(in_truth), 1) AS BIGINT) AS recall_bp
    FROM j
    """


@register(
    "dedup_eval_pr",
    oracle=_dedup_eval_oracle(),
    tags=("dedup", "llm", "evaluation"),
    doc="precision/recall of MinHash-LSH candidates vs exact Jaccard>=0.5 "
    "truth (basis points, integer); the knob-tuning measurement for a "
    "100 TB dedup run",
    priority=TIER_NEWFAM,
)
def dedup_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        shingle_gram_arrays,
    )

    docs = Tables(spark, sf_dir).documents
    # ONE tokenize+k-gram pass feeds BOTH legs (r9, VERDICT r8 item 2):
    # the LSH leg consumes the exploded gram stream (sha256 grading hash),
    # the exact leg the distinct xxhash64 sets — previously each leg
    # re-tokenized the corpus from scratch.  Same gram strings, same
    # downstream hashes; the persist lives until the session clearCache()
    # between queries (the bench/driver lifecycle).
    grams = shingle_gram_arrays(docs).persist()
    pred = minhash_lsh_pairs(
        spark, docs, threshold=0.5, hash_mode="sha256", grams=grams
    ).select("left_doc", "right_doc", F.lit(1).alias("in_pred"))
    truth = ngram_jaccard_pairs(
        spark, docs, threshold=0.5, grams=grams
    ).select(
        "left_doc", "right_doc", F.lit(1).alias("in_truth")
    )
    j = pred.join(truth, ["left_doc", "right_doc"], "full_outer").select(
        F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
        F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
    )
    agg = j.agg(
        F.sum(F.col("in_pred") * F.col("in_truth")).alias("tp"),
        F.sum(F.col("in_pred") * (1 - F.col("in_truth"))).alias("fp"),
        F.sum((1 - F.col("in_pred")) * F.col("in_truth")).alias("fn"),
        F.sum("in_pred").alias("__np"),
        F.sum("in_truth").alias("__nt"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.expr("tp * 10000 DIV greatest(__np, 1)").alias("precision_bp"),
        F.expr("tp * 10000 DIV greatest(__nt, 1)").alias("recall_bp"),
    )


# ---------------------------------------------------------------------------
# Classifier-calibration sweep: confusion counts of the hashed linear
# scorer (quality_linear_score) against the Gopher rule battery's pass_all
# label, at 9 per-token-mean thresholds.  This is how a model-based quality
# filter's operating point is picked before a 100 TB filtering run: sweep
# the threshold, read precision/recall, choose the knee.
#
# Integer discipline: the predicate is the CROSS-MULTIPLICATION
# score_raw * 1000 >= t * n_tokens — never a division of the (possibly
# negative) score, because Spark's DIV truncates toward zero while
# DuckDB's // floors, and the two disagree on negative numerators.  All
# outputs are BIGINT counts / basis points (floor division of nonnegative
# values only).
#
# Scale shape: per-doc scores and labels are the two upstream hash-agg
# pipelines (each linear, exchange-reused); the sweep itself broadcasts a
# 9-row threshold frame against the doc-granularity join and reduces to 9
# rows — no window, no extra corpus pass per threshold.
# ---------------------------------------------------------------------------
_SWEEP_THRESHOLDS = "(SELECT CAST(i * 500 - 2000 AS BIGINT) AS t FROM range(9) r(i))"


def _threshold_sweep_oracle() -> str:
    from delta_lake_validation_spark.plans.curation import _QB, _QMIX, _QMOD

    return rf"""
    WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                  FROM documents),
    score AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum((CAST(concat('0x', substr(md5(u.tok), 1, 6)) AS BIGINT)
                       % {_QB} * {_QMIX}) % {_QMOD} - {(_QMOD - 1) // 2})
                  AS BIGINT) AS score_raw
      FROM toks, unnest(t) AS u(tok) GROUP BY doc_id
    ),
    per AS (SELECT doc_id,
                   CAST(len(t) AS BIGINT) AS n_words,
                   CAST(list_sum(list_transform(t, w -> length(w))) * 100
                        // len(t) AS BIGINT) AS mwl_cp,
                   CAST(len(list_distinct(list_filter(t, w -> w IN ('the', 'a'))))
                        AS BIGINT) AS n_stop
            FROM toks),
    dom AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt
            FROM (SELECT doc_id, u.w, count(*) AS c
                  FROM toks, unnest(t) AS u(w) GROUP BY 1, 2)
            GROUP BY doc_id),
    lbl AS (SELECT p.doc_id,
                   CASE WHEN (CASE WHEN p.n_words BETWEEN 30 AND 80 THEN 1 ELSE 0 END)
                           + (CASE WHEN p.mwl_cp BETWEEN 430 AND 470 THEN 1 ELSE 0 END)
                           + (CASE WHEN p.n_stop = 2 THEN 1 ELSE 0 END)
                           + (CASE WHEN d.top_cnt * 10000 // p.n_words <= 1200
                              THEN 1 ELSE 0 END) = 4
                        THEN 1 ELSE 0 END AS pos
            FROM per p JOIN dom d USING (doc_id)),
    j AS (SELECT s.score_raw, s.n_tokens, l.pos
          FROM score s JOIN lbl l USING (doc_id)),
    sweep AS (SELECT th.t,
                     CASE WHEN j.score_raw * 1000 >= th.t * j.n_tokens
                          THEN 1 ELSE 0 END AS pred, j.pos
              FROM j CROSS JOIN {_SWEEP_THRESHOLDS} th)
    SELECT t,
           CAST(sum(pred * pos) AS BIGINT) AS tp,
           CAST(sum(pred * (1 - pos)) AS BIGINT) AS fp,
           CAST(sum((1 - pred) * pos) AS BIGINT) AS fn,
           CAST(sum((1 - pred) * (1 - pos)) AS BIGINT) AS tn,
           CAST(sum(pred * pos) * 10000
                // greatest(sum(pred), 1) AS BIGINT) AS precision_bp,
           CAST(sum(pred * pos) * 10000
                // greatest(sum(pos), 1) AS BIGINT) AS recall_bp
    FROM sweep GROUP BY t
    """


@register(
    "quality_threshold_sweep",
    oracle=_threshold_sweep_oracle(),
    tags=("text", "llm", "curation", "quality", "evaluation"),
    doc="classifier-calibration sweep: confusion counts + precision/recall "
    "of the hashed linear scorer vs the Gopher pass_all label at 9 "
    "per-token thresholds (integer cross-multiplication, no division)",
    priority=TIER_NEWFAM,
)
def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.plans.curation import (
        quality_linear_score,
    )

    score = quality_linear_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "score_raw"
    )
    lbl = quality_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("pass_all").alias("pos")
    )
    thresholds = spark.range(9).select(
        (F.col("id") * 500 - 2000).cast("long").alias("t")
    )
    j = score.join(lbl, "doc_id").crossJoin(F.broadcast(thresholds))
    sweep = j.select(
        "t",
        (
            (F.col("score_raw") * 1000 >= F.col("t") * F.col("n_tokens"))
        ).cast("long").alias("pred"),
        "pos",
    )
    return sweep.groupBy("t").agg(
        F.sum(F.col("pred") * F.col("pos")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("pos"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("pos")).alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("pos"))).alias("tn"),
        F.expr(
            "sum(pred * pos) * 10000 DIV greatest(sum(pred), 1)"
        ).alias("precision_bp"),
        F.expr(
            "sum(pred * pos) * 10000 DIV greatest(sum(pos), 1)"
        ).alias("recall_bp"),
    )


# ---------------------------------------------------------------------------
# PageRank (3 power-iteration steps, d = 0.85) over the undirected exact
# near-dup graph (Jaccard >= 0.8 pairs) — centrality ranks the
# most-connected members of each dup cluster (a canonical-selection signal
# orthogonal to dedup_canonical's argmin rule), and the recurrence is the
# template for ANY fixed-iteration propagation on a document graph.
#
# FIXED-POINT DISCIPLINE: float PageRank is not cross-engine gradeable —
# Σ over neighbors is order-dependent in IEEE doubles and Spark's shuffle
# order is nondeterministic.  So the whole recurrence runs in scaled
# integers (SCALE = 10^12, floor division at every divide):
#     pr0    = SCALE // n
#     share  = pr(u) // deg(u)                 (integer per edge source)
#     pr'(v) = (15*SCALE) // (100*n) + (85 * Σ share) // 100
# Integer sums are associative, so both engines agree bit-for-bit.  Max
# intermediate 85*SCALE < 2^47 — no overflow in BIGINT.
#
# Scale shape: each iteration is one (edges join pr-on-src) + one hash
# aggregate keyed by dst — edge-linear shuffles, three fixed rounds, no
# windows, no driver collect.  Every node of an undirected edge set has
# deg >= 1, so there is no dangling-mass correction.
# ---------------------------------------------------------------------------
_PR_SCALE = 10**12
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    truth = _truth_pairs_sql(4, 5)  # Jaccard >= 0.8
    head = rf"""
    WITH pairs AS (SELECT left_doc, right_doc FROM ({truth}) tj),
    edges AS (SELECT left_doc AS src, right_doc AS dst FROM pairs
              UNION ALL SELECT right_doc, left_doc FROM pairs),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
    n AS (SELECT count(*) AS n_nodes FROM deg),
    pr0 AS (SELECT node, {_PR_SCALE} // (SELECT n_nodes FROM n) AS pr
            FROM deg)
    """
    steps = []
    for i in range(1, _PR_ITERS + 1):
        prev = f"pr{i - 1}"
        steps.append(
            f""",
    s{i} AS (SELECT e.dst AS node, sum(p.pr // d.deg) AS s
             FROM edges e JOIN {prev} p ON e.src = p.node
                          JOIN deg d ON d.node = e.src
             GROUP BY 1),
    pr{i} AS (SELECT node,
                     (15 * {_PR_SCALE}) // (100 * (SELECT n_nodes FROM n))
                     + (85 * s) // 100 AS pr
              FROM s{i})"""
        )
    return (
        head
        + "".join(steps)
        + f"""
    SELECT node AS doc_id, CAST(pr AS BIGINT) AS pr_fp
    FROM pr{_PR_ITERS}
    """
    )


@register(
    "pagerank_neardup",
    oracle=_pagerank_oracle(),
    tags=("graph", "dedup", "llm"),
    doc="3-step fixed-point PageRank (d=0.85, scale 10^12 integer "
    "arithmetic) over the exact near-dup graph; edge-linear iterations",
    priority=TIER_NEWFAM,
)
def pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import ngram_jaccard_pairs

    docs = Tables(spark, sf_dir).documents
    pairs = ngram_jaccard_pairs(spark, docs, threshold=0.8).select(
        "left_doc", "right_doc"
    )
    edges = pairs.select(
        F.col("left_doc").alias("src"), F.col("right_doc").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("right_doc").alias("src"), F.col("left_doc").alias("dst")
        )
    )
    # truncate lineage BEFORE iterating (the dedup_clusters recipe): the
    # edge set is referenced by every iteration level, and without
    # materialization each level re-evaluates the whole PPJoin candidate
    # pipeline — the sf1 probe measured 231 stages / 52s at sf0.1 for the
    # un-checkpointed form vs one PPJoin pass after this line
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    pr = (
        deg.crossJoin(F.broadcast(n))
        .select(
            F.col("src").alias("node"),
            F.expr(f"{_PR_SCALE} DIV n_nodes").alias("pr"),
            "n_nodes",
        )
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(
                pr.withColumnRenamed("node", "src"), "src"
            )
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("pr DIV deg").alias("share"),
                "n_nodes",
            )
        )
        pr = contrib.groupBy("node", "n_nodes").agg(
            F.sum("share").alias("s")
        ).select(
            "node",
            F.expr(
                f"(15 * {_PR_SCALE}) DIV (100 * n_nodes) + (85 * s) DIV 100"
            ).alias("pr"),
            "n_nodes",
        )
    return pr.select(F.col("node").alias("doc_id"), F.col("pr").alias("pr_fp"))
