"""Round-8 corpus-retrieval & split-hygiene operators.

Engine extensions (the reference has no text surface — its analytics stop
at relational queries, src/benchmarking_suite.py:40-140); each query
carries a DuckDB oracle and a 100 TB scale note.  The families:

* **BM25 retrieval** — Okapi BM25 top-k document retrieval against a
  deterministic query set: the scoring primitive of every
  retrieval-augmented pipeline and of quality-classifier training-set
  mining.  Inverted-index equi join; high-df (stop) terms pruned on both
  engines symmetrically.
* **N-gram novelty** — per-document fraction of shingles first seen in
  that document (doc-id order): the classic "how much new text does this
  shard add" curation signal.  Integer outputs — exactly gradeable.
* **Split leakage audit** — near-dup clusters spanning train/val/test
  splits: THE silent eval-contamination bug in LLM training.  Composes
  the exact Jaccard clusters with the hash-based split assignment.
* **BPE pair counts** — one step of byte-pair-encoding TRAINING: adjacent
  symbol-pair frequencies over the corpus vocabulary (the argmax picks
  the next merge).  The merges-table ENCODER lives in operators/text.py;
  this is the learning-side primitive, driver-orchestrated per round like
  k-means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_validation_spark.functions.aggregates import round_half_up
from delta_lake_validation_spark.plans.registry import TIER_NEWFAM, register
from delta_lake_validation_spark.tables import Tables

# ---------------------------------------------------------------------------
# Okapi BM25 top-k retrieval.
#
# Query set: documents with doc_id % 97 == 0 (deterministic, ~1% of the
# corpus — the bounded "query side" of a retrieval run); each query is its
# document's distinct term set, self-matches excluded.
#
# Scale shape: tf/df/dl are hash aggregates (vocabulary- and corpus-
# bounded, map-side combined); candidates come from the (query term) ×
# (postings) EQUI join — never a cross join; corpus-level scalars (N,
# avgdl) ride a broadcast 1-row frame.  Terms with df > 0.9*N are dropped on
# BOTH engines: their idf is near zero while their postings dominate
# candidate volume (a stop word joins every document — the standard
# impact-ordering prune).  Top-k per query is rank()<=k, which Spark
# rewrites to WindowGroupLimit: each map partition pre-selects its local
# top-k BEFORE the shuffle, so a hot query never funnels its full
# candidate list through one sort task.
#
# Floats: BM25 is inherently ln()-valued; both engines evaluate the SAME
# expression tree in IEEE doubles and the score is rounded half-up to 4
# decimals before ranking (the zipf_fit discipline — ranking on the
# ROUNDED score keeps the two engines' orderings identical; ties break by
# doc_id).
# ---------------------------------------------------------------------------
_BM25_QUERY_MOD = 97
_BM25_K = 10
# Impact-ordered postings cap: each term keeps only its top-M
# highest-impact (score, doc) entries as CANDIDATE SOURCES.  Without it,
# candidate volume is |queries| x |postings| — quadratic in corpus size
# whenever the vocabulary is dense (the sf1 probe measured 30x wall at
# 10x input on this corpus's 31-term vocabulary).  With it, a query
# generates at most |query terms| * M candidates — linear in the query
# count, constant per term — which is exactly how production engines ship
# BM25 (impact-ordered / WAND-family indexes).  The cap is part of the
# operator's contract and the oracle mirrors it (rank by identical IEEE
# score, doc_id tie-break), so the result stays exactly value-gradeable;
# M = infinity recovers exhaustive scoring (at sf0.01 every postings list
# is shorter than M, so the capped and exhaustive results coincide).
_BM25_IMPACT_M = 1000

# r9 upper-bound prune (VERDICT r8 item 4 — the WAND/MaxScore family):
# a candidate document's score is a sum of POSITIVE impact entries, so
# tot(d) = Σ s over d's surviving capped entries upper-bounds its score
# for EVERY query.  Phase 1 exactly scores the _BM25_THETA_T highest-tot
# "anchor" docs per query (a tiny, impact-table-sized join) and takes the
# k-th best rounded score as θ_q — a valid LOWER bound on the query's
# true k-th score because those phase-1 scores ARE final scores.  Phase 2
# then drops candidates with tot(d) < θ_q − margin BEFORE the score
# aggregate: a dropped doc's score ≤ tot < θ_q − 1e-3, so after half-up
# rounding to 4 decimals it lands strictly below ≥k docs scoring ≥ θ_q
# and can never enter the top-k under any doc_id tie-break (the margin
# covers the 1e-4 rounding quantum plus float-summation noise ~1e-15;
# all s > 0 since the df ≤ 0.9N prune keeps idf > 0).  Result-identical
# by construction — the oracle is untouched.  sf1 measured 24.2k candidate
# docs/query → ~1-2k survivors/query at median θ.
_BM25_THETA_T = 256
_BM25_PRUNE_MARGIN = 1e-3


def _impact_cap(contrib: DataFrame, m: int) -> DataFrame:
    """Keep each term's top-``m`` postings by (score DESC, doc_id ASC).

    rank<=m gets Spark's WindowGroupLimit rewrite, so each map partition
    pre-selects its local top-m BEFORE the term-keyed shuffle — a hot term
    never funnels its full postings list through one sort task."""
    wcap = Window.partitionBy("term").orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        contrib.withColumn("__r", F.row_number().over(wcap))
        .filter(F.col("__r") <= m)
        .drop("__r")
    )


@register(
    "bm25_topk",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, u.term
      FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS u(term)
      WHERE u.term <> ''
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    ad AS (SELECT CAST(sum(dl) AS DOUBLE) / (SELECT n_docs FROM n) AS avgdl FROM dl),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    qterm AS (
      SELECT DISTINCT doc_id AS query_doc, term FROM toks
      WHERE doc_id % {_BM25_QUERY_MOD} = 0
    ),
    contrib AS (
      SELECT t.term, t.doc_id,
             ln(1 + ((SELECT n_docs FROM n) - f.df + 0.5) / (f.df + 0.5))
             * (t.tf * 2.2)
             / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / (SELECT avgdl FROM ad)))
               AS s
      FROM tf t
      JOIN df f ON f.term = t.term
      JOIN dl d ON d.doc_id = t.doc_id
      WHERE f.df * 10 <= (SELECT n_docs FROM n) * 9
    ),
    capped AS (
      SELECT term, doc_id, s FROM (
        SELECT term, doc_id, s,
               row_number() OVER (
                 PARTITION BY term ORDER BY s DESC, doc_id ASC) AS r
        FROM contrib
      ) WHERE r <= {_BM25_IMPACT_M}
    ),
    cand AS (
      SELECT q.query_doc, c.doc_id, c.s
      FROM qterm q
      JOIN capped c ON c.term = q.term AND c.doc_id <> q.query_doc
    ),
    scored AS (
      SELECT query_doc, doc_id,
             CAST(floor(sum(s) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS score
      FROM cand GROUP BY 1, 2
    )
    SELECT query_doc, doc_id, CAST(rnk AS INTEGER) AS rnk, score FROM (
      SELECT query_doc, doc_id, score,
             row_number() OVER (
               PARTITION BY query_doc ORDER BY score DESC, doc_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {_BM25_K}
    """,
    tags=("retrieval", "llm", "text"),
    doc="Okapi BM25 top-10 retrieval (k1=1.2, b=0.75) for a deterministic "
    "~1% query slice; impact-ordered postings (top-1000 per term), "
    "df>0.9N terms pruned, WindowGroupLimit top-k",
    priority=TIER_NEWFAM,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    # term identity is only ever a grouping/join KEY (scores derive from
    # tf/df/dl counts), so shuffle an 8-byte xxhash64 instead of the term
    # string — hashed vectorized right after the map-side explode
    # (guide §2.3 "shuffle keys instead of payloads")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .select("doc_id", F.xxhash64("term").alias("term"))
    )
    # ONE explode pass: dl, df, and the query term sets all derive from
    # the (doc, term) tf table (dl = Σ tf per doc; tf rows are already
    # distinct per (doc, term)) — the naive form scanned and exploded the
    # corpus three times and was 2× slower at sf0.1
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    ad = dl.crossJoin(F.broadcast(n)).agg(
        (F.sum("dl").cast("double") / F.first("n_docs")).alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterm = tf.filter(F.col("doc_id") % _BM25_QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_doc"), "term"
    )
    # materialize the IMPACT LIST first: s(term, doc) depends only on the
    # candidate document (tf, df, dl), never on the query — so the ln/div
    # arithmetic and the df/dl joins run once at postings granularity
    # (O(corpus tokens) rows), and the query join below carries a single
    # precomputed double per candidate instead of re-deriving the score on
    # the (query x postings) fan-out.  This is exactly how a production
    # engine ships BM25 at scale: impact lists are corpus-side state,
    # queries probe them.  The df>0.9N stop-term prune drops a term's
    # whole postings list here, before any query sees it.
    contrib = (
        tf.join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ad))
        .filter(F.col("df") * 10 <= F.col("n_docs") * 9)
        .select(
            "term",
            "doc_id",
            F.expr(
                "ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2) "
                "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
            ).alias("s"),
        )
    )
    # the impact list feeds phase 1 (θ anchors), the per-doc bound AND the
    # phase-2 candidate join: persist it (≤ |vocab|·M rows — index-sized,
    # never corpus-sized) so the tf/df/dl aggregates and the cap window run
    # once, not three times.  Lifecycle: session clearCache() between
    # queries (the bench/driver contract).
    capped = _impact_cap(contrib, _BM25_IMPACT_M).persist()
    # per-doc score upper bound over the SURVIVING capped entries
    tot = capped.groupBy("doc_id").agg(F.sum("s").alias("__tot"))
    anchors = (
        tot.orderBy(F.desc("__tot"), F.asc("doc_id"))
        .limit(_BM25_THETA_T)
        .select("doc_id")
    )
    # phase 1: EXACT scores of the anchor docs (every capped entry whose
    # term is in the query), k-th best rounded score per query = θ_q
    p1 = (
        qterm.join(
            capped.join(F.broadcast(anchors), "doc_id", "left_semi"), "term"
        )
        .filter(F.col("doc_id") != F.col("query_doc"))
        .groupBy("query_doc", "doc_id")
        .agg(round_half_up(F.sum("s"), 4).alias("score"))
    )
    w_th = Window.partitionBy("query_doc").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    theta = (
        p1.withColumn("__r", F.row_number().over(w_th))
        .filter(F.col("__r") == _BM25_K)
        .select("query_doc", F.col("score").alias("__theta"))
    )
    # phase 2: the candidate fan-out, pruned by the per-doc bound BEFORE
    # the score aggregate (queries with < k anchors keep every candidate —
    # θ row absent ⟹ null ⟹ no prune)
    cand = (
        qterm.select("query_doc", "term")
        .join(capped.join(tot, "doc_id"), "term")
        .filter(F.col("doc_id") != F.col("query_doc"))
        .join(theta, "query_doc", "left")
        .filter(
            F.col("__theta").isNull()
            | (F.col("__tot") >= F.col("__theta") - F.lit(_BM25_PRUNE_MARGIN))
        )
    )
    scored = cand.groupBy("query_doc", "doc_id").agg(
        round_half_up(F.sum("s"), 4).alias("score")
    )
    w = Window.partitionBy("query_doc").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _BM25_K)
        .select("query_doc", "doc_id", "rnk", "score")
    )


# ---------------------------------------------------------------------------
# N-gram novelty: per document, the fraction of its distinct 3-gram
# shingles whose FIRST corpus occurrence (min doc_id) is this document.
#
# Scale shape: novelty NEVER joins back on the exploded shingle stream —
# "is this shingle novel for doc d" aggregates as two independent
# hash-agg rollups that meet at DOC granularity: per-doc shingle counts
# (groupBy doc) and per-doc novel counts (min(doc_id) per shingle —
# vocabulary-bounded, map-side combined — re-grouped by that first doc).
# The only join is per-doc × per-doc (n_docs rows a side), so shuffle
# volume is O(docs + vocabulary), not O(exploded stream).  Shingling runs
# the codegen posexplode+lead path (operators/dedup.shingle-style; the
# interpreted HOF transform was 10× slower and made this the registry's
# most expensive query).  Windows are doc_id-keyed only (bounded by
# document length).  Integer outputs: exactly gradeable.  Documents with
# fewer than 3 tokens have no shingles and are excluded on both engines
# (the containment_pairs precedent).
# ---------------------------------------------------------------------------
@register(
    "ngram_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    firsts AS (SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                 * 10000) // count(*) AS BIGINT) AS novelty_bp
    FROM ex e JOIN firsts f USING (g)
    GROUP BY e.doc_id
    """,
    tags=("text", "llm", "curation"),
    doc="per-doc shingle novelty vs doc-id order (first-occurrence "
    "hash-agg + join-back); novelty in integer basis points",
    priority=TIER_NEWFAM,
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.select(
            "doc_id",
            F.concat_ws(
                " ",
                F.col("tok"),
                F.lead("tok", 1).over(w),
                F.lead("tok", 2).over(w),
            ).alias("g"),
            F.lead("tok", 2).over(w).alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select("doc_id", "g")
        .distinct()
    )
    per_doc = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    novel = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        per_doc.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            (
                (F.coalesce("n_novel", F.lit(0)) * 10000)
                / F.col("n_shingles")
            )
            .cast("long")
            .alias("novelty_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Split-leakage audit: near-duplicate clusters whose members span more
# than one train/val/test split — the silent eval-contamination failure
# mode of every LLM data pipeline (a val document's near-dup sitting in
# train).  Composes the exact-Jaccard connected components
# (operators/dedup.py) with the md5-bucket split rule (split_assign,
# plans/llm.py) and reports per-cluster membership counts.
#
# Scale shape: inherits the PPJoin candidate bounds and the label-prop
# clusters; the audit itself is one hash aggregate keyed by cluster_id
# (integer outputs, exactly gradeable).  The oracle reuses the
# dedup_clusters recursive-CTE closure verbatim.
# ---------------------------------------------------------------------------
@register(
    "split_leakage",
    oracle=r"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
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
           GROUP BY 1, 2),
    pairs AS (SELECT co.la, co.rb
              FROM co JOIN nsz sa ON co.la = sa.doc_id
                      JOIN nsz sb ON co.rb = sb.doc_id
              WHERE co.inter * 5 >= (sa.n + sb.n - co.inter) * 4),
    edges AS (SELECT la AS a, rb AS b FROM pairs
              UNION SELECT rb, la FROM pairs),
    cc AS (SELECT a AS id, a AS lbl FROM edges
           UNION
           SELECT e.a, c.lbl FROM edges e JOIN cc c ON e.b = c.id),
    cl AS (SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id),
    sp AS (SELECT cl.id, cl.cluster_id,
                  CASE WHEN h2 < '03' THEN 'val'
                       WHEN h2 < '06' THEN 'test'
                       ELSE 'train' END AS split
           FROM cl JOIN (SELECT doc_id,
                                substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2
                         FROM documents) d ON d.doc_id = cl.id)
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
           CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_val,
           CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_test
    FROM sp GROUP BY cluster_id
    HAVING count(DISTINCT split) > 1
    """,
    tags=("dedup", "llm", "curation", "split"),
    doc="near-dup clusters spanning train/val/test splits (eval-"
    "contamination audit): exact-Jaccard components x md5-bucket splits",
    priority=TIER_NEWFAM,
)
def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = Tables(spark, sf_dir).documents
    pairs = ngram_jaccard_pairs(spark, docs, threshold=0.8)
    clusters = dedup_clusters(spark, pairs)  # (id, cluster_id)
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "03", "val").when(h2 < "06", "test").otherwise("train")
    )
    members = clusters.join(
        docs.select("doc_id", split.alias("split")),
        clusters["id"] == F.col("doc_id"),
    )
    return (
        members.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
            F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
            F.sum((F.col("split") == "val").cast("long")).alias("n_val"),
            F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
        )
        .filter(F.col("n_splits") > 1)
    )


# ---------------------------------------------------------------------------
# BPE pair counts: one step of byte-pair-encoding TRAINING.  The classic
# tokenizer-learning loop is "count adjacent symbol pairs (weighted by word
# frequency), merge the argmax, repeat"; this query is the count+argmax
# primitive over the INITIAL character alphabet.  The driver re-invokes per
# merge round (like kmeans_clusters) — each round is this same shape over
# the updated symbol sequences.
#
# Scale shape: pair generation runs over the DISTINCT word table
# (vocabulary-bounded — the token_counts_bpe_merges trick: a web corpus
# has ~10^7-10^8 distinct words regardless of token count), weighted by
# the word-frequency hash agg; the pair rollup is another hash agg (pair
# alphabet is tiny), and top-20 is TakeOrderedAndProject — no window, no
# sort of anything corpus-sized.  substr(word, i, 2) is 1-based and
# identical in Spark SQL and DuckDB; integer outputs are exactly
# gradeable, and the (cnt DESC, pair ASC) order makes the top-20 SET
# deterministic.
# ---------------------------------------------------------------------------
@register(
    "bpe_pair_counts",
    oracle=r"""
    WITH words AS (
      SELECT u.w AS word, count(*) AS freq
      FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS u(w)
      WHERE u.w <> '' GROUP BY u.w
    ),
    pairs AS (
      SELECT p.pair, freq FROM words,
        UNNEST(list_transform(range(1, length(word)),
                              i -> substr(word, i, 2))) AS p(pair)
      WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair ASC LIMIT 20
    """,
    tags=("text", "llm", "tokenizer"),
    doc="BPE training step: top-20 adjacent character pairs over the "
    "distinct-word vocabulary, weighted by word frequency",
    priority=TIER_NEWFAM,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # length >= 2 guard on BOTH sides: Spark's sequence(1, 0) DESCENDS
    # ([1, 0]) instead of being empty, so 1-char words would inject bogus
    # "pairs"; DuckDB's range(1, 1) is empty
    pairs = words.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# BPE training LOOP: the full merges-table learner whose single counting
# step is the graded bpe_pair_counts query above.  The loop's driver-side
# state is one argmax row per round; everything else is vocabulary-bounded
# hash aggregates + a map-side merge fold (operators/text.py bpe_train).
# Rows-only: the 8-round loop is not SQL-expressible (each round's lambda
# depends on the previous round's argmax), but the output is DETERMINISTIC
# (tie-break count DESC, pair ASC) and pytest replays it against an
# independent pure-Python reference trainer on the same corpus
# (tests/test_retrieval_ops.py).
# ---------------------------------------------------------------------------
@register(
    "bpe_train_merges",
    oracle=None,
    tags=("text", "llm", "tokenizer"),
    doc="distributed BPE training loop (8 merge rounds over the distinct-"
    "word vocabulary); deterministic merges table, pytest-verified "
    "against a pure-Python reference trainer",
    priority=TIER_NEWFAM,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.text import bpe_train

    docs = Tables(spark, sf_dir).documents
    merges = bpe_train(spark, docs, n_merges=8)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )
