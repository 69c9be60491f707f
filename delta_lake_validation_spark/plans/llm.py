"""North-star LLM-data-pipeline queries (SQL-expressible subset).

These are first-class operators of the engine (dedup, text analysis,
similarity search) over the ``documents`` / ``embeddings`` fixtures, each with
a DuckDB oracle.  Non-SQL-expressible variants (MinHash-LSH, SimHash,
random-hyperplane ANN) live in ``operators/`` and register rows-only checks.

Scale notes are inline: every query is written so the expensive side stays
distributed and the small side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_validation_spark.functions.aggregates import davg, sql_davg

from delta_lake_validation_spark.plans.registry import TIER_NEWFAM, register
from delta_lake_validation_spark.tables import Tables

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")


# ---------------------------------------------------------------------------
# Exact deduplication: hash-groupBy on full text, keep min doc_id.
# At 100 TB: group by a 128-bit digest instead of the raw text so the shuffle
# carries 16 bytes/row, not the document body (same result, same plan shape).
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
    SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    tags=("dedup", "llm"),
    doc="north-star dedup (exact); generalizes A5 src/benchmarking_suite.py:92",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    return (
        docs.groupBy(F.md5("text"))
        .agg(F.min("doc_id").cast("long").alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("canonical_id", "n_dups")
    )


# ---------------------------------------------------------------------------
# Cross-source duplicate leakage: per source, the fraction of documents
# whose exact text also appears under ANOTHER source — the curation
# diagnostic for "is my web scrape recycling my books corpus".
# At 100 TB: the join key and shuffle payload is the 16-byte text digest;
# the per-digest source-count aggregate is duplicate-cluster-sized.
# ---------------------------------------------------------------------------
@register(
    "cross_source_dup",
    oracle="""
    WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
    hs AS (SELECT h, count(DISTINCT source) AS ns FROM d GROUP BY h)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross_dup,
           CAST(floor(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) * 10000.0
                      / count(*) + 0.5) / 10000.0 AS DOUBLE) AS leak_frac
    FROM d JOIN hs USING (h)
    GROUP BY source
    """,
    tags=("dedup", "llm", "curation"),
    doc="cross-source duplicate leakage: per-source fraction of documents "
    "whose exact text also appears under another source (digest join, "
    "16-byte shuffle payloads)",
)
def cross_source_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.functions.aggregates import round_half_up

    docs = Tables(spark, sf_dir).documents.select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    hs = docs.groupBy("h").agg(
        F.countDistinct("source").alias("ns")
    )
    cross = F.sum(F.when(F.col("ns") > 1, 1).otherwise(0)).cast("long")
    return (
        docs.join(hs, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cross.alias("n_cross_dup"),
            round_half_up(cross / F.count(F.lit(1)), 4).alias("leak_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Token counting (whitespace tokenizer) — all JVM-side expressions.
# ---------------------------------------------------------------------------
@register(
    "token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_calc
    FROM documents
    """,
    tags=("text", "llm"),
    doc="north-star text analysis: token counting",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("int").alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_calc"),
    )


# ---------------------------------------------------------------------------
# Quality scoring: length/stopword-ratio heuristics via higher-order functions
# (no Python UDF — stays inside whole-stage codegen).
# ---------------------------------------------------------------------------
@register(
    "text_quality",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks,
               length(regexp_replace(text, '\s+', '', 'g')) AS solid_chars
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(round(CAST(solid_chars AS DOUBLE) / len(toks), 4) AS DOUBLE) AS avg_token_len,
           CAST(round(CAST(len(list_filter(toks, x -> x IN {STOPWORDS})) AS DOUBLE)
                      / len(toks), 4) AS DOUBLE) AS stopword_ratio
    FROM tok
    """,
    tags=("text", "llm"),
    doc="north-star text analysis: quality scoring",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    n_tokens = F.size(toks)
    solid = F.length(F.regexp_replace("text", r"\s+", ""))
    # stopword count as one native regex pass over the normalized text —
    # any higher-order-function form (filter + isin / array_contains)
    # evaluates interpreted per token and measured 10-40× slower
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), F.lit(" ")
    )
    stop_pat = r"(?<= )(?:" + "|".join(STOPWORDS) + r")(?= )"
    n_stop = F.regexp_count(padded, F.lit(stop_pat))
    return docs.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        F.round(solid.cast("double") / n_tokens, 4).cast("double").alias("avg_token_len"),
        F.round(n_stop.cast("double") / n_tokens, 4).cast("double").alias("stopword_ratio"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: normalized-content digest (dedup key at scale).
# ---------------------------------------------------------------------------
@register(
    "doc_fingerprint",
    oracle=r"""
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
    tags=("text", "llm"),
    doc="north-star text analysis: document fingerprint",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    normalized = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Per-language corpus statistics.
# ---------------------------------------------------------------------------
_SQL_NTOKENS = r"len(string_split_regex(trim(text), '\s+'))"


@register(
    "lang_stats",
    oracle=f"""
    SELECT lang, count(*) AS n_docs,
           {sql_davg('n_chars', 0, 4)} AS avg_chars,
           {sql_davg(_SQL_NTOKENS, 0, 4)} AS avg_tokens
    FROM documents GROUP BY lang
    """,
    tags=("text", "llm", "agg"),
    doc="north-star text analysis: per-language stats",
)
def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg(F.col("n_chars"), 0, 4).alias("avg_chars"),
        davg(n_tokens, 0, 4).alias("avg_tokens"),
    )


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k (the exactness baseline; the
# LSH-bucketed scale path lives in operators/similarity.py).
# Queries side is tiny → broadcast; base side stays partitioned → the cross
# product is embarrassingly parallel with no shuffle until the final top-k.
# Cosine runs as an Arrow-batched pandas UDF (functions/vectors.py) — the
# interpreted zip_with/aggregate form measured ~100× slower.
# ---------------------------------------------------------------------------
@register(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               CAST(round(
                   list_dot_product(CAST(qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))), 6)
               AS DOUBLE) AS sim
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim, rnk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rnk
        FROM scored
    ) WHERE rnk <= 10
    """,
    tags=("similarity", "llm"),
    doc="north-star similarity search: brute-force cosine top-k baseline",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import cosine_topk

    emb = Tables(spark, sf_dir).embeddings
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return cosine_topk(spark, emb, q, k=10)


# ---------------------------------------------------------------------------
# Embedding near-duplicate pairs (cosine > threshold), all-pairs form.
# This is the correctness oracle for the LSH variant in operators/.
# ---------------------------------------------------------------------------
@register(
    "embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS left_id, b.vec_id AS right_id,
           CAST(round(
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
               6) AS DOUBLE) AS sim
    FROM embeddings a CROSS JOIN embeddings b
    WHERE a.vec_id < b.vec_id
      AND round(
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
               6) > 0.35
    """,
    tags=("similarity", "dedup", "llm"),
    doc="north-star near-dup: all-pairs cosine threshold (oracle for LSH path)",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import cosine_self_pairs

    emb = Tables(spark, sf_dir).embeddings
    return cosine_self_pairs(spark, emb, threshold=0.35)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs (operators/dedup.py).  The size-ratio
# candidate filter is lossless, so this matches the naive all-pairs oracle.
# ---------------------------------------------------------------------------
@register(
    "ngram_jaccard_pairs",
    # equi-join on exploded shingles (|A∩B| by co-occurrence count,
    # |A∪B| = |A|+|B|-|A∩B|) instead of the all-pairs list_intersect
    # cross join: identical output for every pair sharing ≥1 shingle.
    # Zero-shingle documents (<3 tokens) CANNOT pair here — which is the
    # Spark engine's contract too (ngram_jaccard_pairs derives candidates
    # and sets from exploded shingles, so an empty-set doc contributes
    # zero rows); the old cross-join form instead emitted 0/0-Jaccard
    # pairs for two empty docs and would have MISmatched Spark if such
    # docs ever appeared.  This form is the exact twin by construction,
    # not by data luck.  The quadratic form ran minutes-to-hours at
    # sf0.1; this runs in seconds.
    oracle=r"""
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
    SELECT left_doc, right_doc,
           CAST(floor(CAST(inter AS DOUBLE) / uni * 10000.0 + 0.5) / 10000.0
                AS DOUBLE) AS jaccard
    FROM (SELECT co.la AS left_doc, co.rb AS right_doc, co.inter,
                 sa.n + sb.n - co.inter AS uni
          FROM co JOIN nsz sa ON co.la = sa.doc_id
                  JOIN nsz sb ON co.rb = sb.doc_id)
    WHERE inter * 5 >= uni * 4
    """,
    tags=("dedup", "llm"),
    doc="north-star dedup: exact n-gram Jaccard; operators/dedup.py",
)
def ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import ngram_jaccard_pairs

    docs = Tables(spark, sf_dir).documents
    return ngram_jaccard_pairs(spark, docs, threshold=0.8)


@register(
    "doc_chunks",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    base AS (SELECT doc_id, t, len(t) AS n,
                    CAST(floor((len(t) + 47) / 48) AS INT) AS n_chunks
             FROM toks)
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           CAST(least(64, n - i*48) AS INT) AS n_tokens,
           array_to_string(t[(i*48 + 1):(i*48 + 64)], ' ') AS chunk_text
    FROM base, LATERAL (SELECT unnest(range(0, n_chunks)) AS i)
    """,
    tags=("llm", "chunking"),
    doc="context-window chunking for training-data prep: one doc -> "
    "overlapping 64-token windows every 48 (operators/text.py, pure "
    "Catalyst sequence/explode/slice — zero shuffle); the Python UDTF twin "
    "chunk_documents_udtf demos the §2.11 table-function seam",
)
def doc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.text import chunk_documents

    return chunk_documents(Tables(spark, sf_dir).documents)


@register(
    "incremental_dedup",
    # exploded-shingle co-occurrence join (see ngram_jaccard_pairs):
    # exact twin of the Spark engine's shingle-derived semantics — an
    # empty-shingle doc contributes zero rows on both sides
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                  FROM documents),
    sh AS (SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(range(1, len(t)-1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS s FROM toks),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    nsz AS (SELECT doc_id, len(s) AS n FROM sh),
    co AS (SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc,
                  count(*) AS inter
           FROM ex a JOIN ex b ON a.g = b.g
           WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
           GROUP BY 1, 2)
    SELECT new_doc, corpus_doc,
           CAST(floor(CAST(inter AS DOUBLE) / uni * 10000.0 + 0.5) / 10000.0
                AS DOUBLE) AS jaccard
    FROM (SELECT co.new_doc, co.corpus_doc, co.inter,
                 sa.n + sb.n - co.inter AS uni
          FROM co JOIN nsz sa ON co.new_doc = sa.doc_id
                  JOIN nsz sb ON co.corpus_doc = sb.doc_id)
    WHERE inter * 5 >= uni * 4
    """,
    tags=("dedup", "llm", "incremental"),
    doc="incremental ingestion dedup: EXACT batch-vs-corpus Jaccard via the "
    "frozen corpus shingle index (operators/dedup.py:build_shingle_index) — "
    "O(batch+candidates), corpus text never re-scanned",
)
def incremental_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import (
        build_shingle_index,
        incremental_jaccard_pairs,
    )

    docs = Tables(spark, sf_dir).documents
    corpus = docs.filter("doc_id % 10 != 0")
    batch = docs.filter("doc_id % 10 = 0")
    index = build_shingle_index(corpus)
    return incremental_jaccard_pairs(spark, batch, index, threshold=0.8)


# ---------------------------------------------------------------------------
# MinHash-LSH candidate pairs.  LSH is approximate w.r.t. true Jaccard, but
# the PIPELINE (shingle hash → signature → band join → estimate) is
# deterministic integer arithmetic: with the sha256 hash profile
# (operators/dedup.py:_sha60) DuckDB reproduces every stage bit-for-bit, so
# the driver value-grades the LSH output itself — the oracle below IS banded
# MinHash-LSH in SQL.  The xxhash64 throughput profile stays registered as
# the rows-only dedup_minhash_lsh_fast variant.
# ---------------------------------------------------------------------------
def _minhash_oracle(num_perm: int = 32, bands: int = 8, threshold: float = 0.5) -> str:
    from delta_lake_validation_spark.operators.dedup import _hash_params

    rpb = num_perm // bands
    params = _hash_params(num_perm)
    mins = ",\n           ".join(
        f"list_min(list_transform(hl, h -> (h * {a} + {b}) % 2147483647))"
        for a, b in params
    )
    min_matches = int(-(-threshold * num_perm // 1))  # ceil(t · num_perm)
    return f"""
    WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
                  FROM documents),
    sh AS (SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(range(1, len(t)-1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS s FROM toks),
    hl AS (SELECT doc_id,
           list_transform(s, g -> CAST('0x' || substr(sha256(g), 1, 15) AS BIGINT)
                                  % 2147483647) AS hl
           FROM sh WHERE len(s) > 0),
    sig AS (SELECT doc_id, [{mins}] AS sig FROM hl),
    bands AS (SELECT doc_id, sig, t.b,
              array_to_string(sig[t.b*{rpb}+1 : t.b*{rpb}+{rpb}], ',') AS key
              FROM sig, range({bands}) t(b)),
    cand AS (SELECT DISTINCT x.doc_id AS l, y.doc_id AS r
             FROM bands x JOIN bands y
               ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
    est AS (SELECT l, r,
            len(list_filter(range(1, {num_perm + 1}),
                            i -> sa.sig[i] = sb.sig[i])) AS m
            FROM cand JOIN sig sa ON sa.doc_id = cand.l
                      JOIN sig sb ON sb.doc_id = cand.r)
    SELECT l AS left_doc, r AS right_doc,
           CAST(m / {float(num_perm)} AS DOUBLE) AS est_jaccard
    FROM est WHERE m >= {min_matches}
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    tags=("dedup", "llm", "lsh"),
    doc="north-star dedup: MinHash+banded LSH, value-graded via the "
    "cross-engine sha256 hash profile; operators/dedup.py",
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import minhash_lsh_pairs

    docs = Tables(spark, sf_dir).documents
    return minhash_lsh_pairs(spark, docs, threshold=0.5, hash_mode="sha256")


@register(
    "dedup_minhash_lsh_fast",
    oracle=None,
    tags=("dedup", "llm", "approx"),
    doc="xxhash64 throughput profile of dedup_minhash_lsh (same pipeline, "
    "~10× cheaper hash); rows-only — the sha256 twin is value-graded",
    priority=60,
)
def dedup_minhash_lsh_fast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import minhash_lsh_pairs

    docs = Tables(spark, sf_dir).documents
    return minhash_lsh_pairs(spark, docs, threshold=0.5)


# ---------------------------------------------------------------------------
# SimHash near-dup pairs — same cross-engine contract: sha256 token hashes
# make the 32 bit-votes, the fingerprint, and the Hamming filter exactly
# SQL-expressible, so the driver value-grades the SimHash output.
# ---------------------------------------------------------------------------
def _simhash_oracle(max_hamming: int = 2) -> str:
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(32)
    )
    fingerprint = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32)
    )
    return f"""
    WITH toks AS (SELECT doc_id,
                         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                  FROM documents),
    h AS (SELECT doc_id,
                 CAST('0x' || substr(sha256(tok), 1, 15) AS BIGINT) AS h
          FROM toks),
    v AS (SELECT doc_id,
           {votes}
          FROM h GROUP BY doc_id),
    s AS (SELECT doc_id, CAST({fingerprint} AS BIGINT) AS sim FROM v)
    SELECT a.doc_id AS left_doc, b.doc_id AS right_doc,
           CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
    """


@register(
    "dedup_simhash",
    oracle=_simhash_oracle(),
    tags=("dedup", "llm", "lsh"),
    doc="north-star dedup: 32-bit SimHash, Hamming<=2, value-graded via the "
    "cross-engine sha256 hash profile; operators/dedup.py",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import simhash_pairs

    docs = Tables(spark, sf_dir).documents
    return simhash_pairs(spark, docs, max_hamming=2, hash_mode="sha256")


@register(
    "dedup_simhash_fast",
    oracle=None,
    tags=("dedup", "llm", "approx"),
    doc="xxhash64 throughput profile of dedup_simhash; rows-only — the "
    "sha256 twin is value-graded",
    priority=60,
)
def dedup_simhash_fast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import simhash_pairs

    docs = Tables(spark, sf_dir).documents
    return simhash_pairs(spark, docs, max_hamming=2)


# ---------------------------------------------------------------------------
# Language identification (operators/text.py) — marker-token votes + CJK
# charset, deterministic tie order mirrored exactly in the oracle.
# ---------------------------------------------------------------------------
@register(
    "lang_id_predictions",
    oracle=r"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks,
                      regexp_matches(text, '[一-鿿]') AS has_cjk
               FROM documents),
    c AS (SELECT doc_id, has_cjk,
          len(list_filter(toks, x -> x IN ('the','and','of','is','to'))) AS c_en,
          len(list_filter(toks, x -> x IN ('der','und','die','das','nicht'))) AS c_de,
          len(list_filter(toks, x -> x IN ('le','et','les','des','une'))) AS c_fr,
          len(list_filter(toks, x -> x IN ('el','y','los','las','una'))) AS c_es
          FROM t)
    SELECT doc_id AS id,
           CASE WHEN has_cjk THEN 'zh'
                WHEN c_de > c_en AND c_de >= c_fr AND c_de >= c_es THEN 'de'
                WHEN c_fr > c_en AND c_fr >= c_es THEN 'fr'
                WHEN c_es > c_en THEN 'es'
                ELSE 'en' END AS predicted_lang,
           CAST(c_en AS INTEGER) AS c_en, CAST(c_de AS INTEGER) AS c_de,
           CAST(c_fr AS INTEGER) AS c_fr, CAST(c_es AS INTEGER) AS c_es
    FROM c
    """,
    tags=("text", "llm"),
    doc="north-star text analysis: language-ID heuristic; operators/text.py",
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.text import lang_id

    return lang_id(Tables(spark, sf_dir).documents)


# ---------------------------------------------------------------------------
# Multimodal feature extraction (operators/multimodal.py) — binary-column
# plumbing with a deterministic digest-based encoder stub; rows-only (the
# fake encoder is engine-defined, not SQL-expressible).
# ---------------------------------------------------------------------------
@register(
    "multimodal_features",
    # the digest-fake encoder is deterministic, so DuckDB can recompute the
    # first feature bit-for-bit: first 4 bytes of sha256(utf8) as LE uint32,
    # / 2^32 - 0.5, through float32 — identical doubles, no rounding needed
    oracle="""
    WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
    SELECT doc_id AS id, CAST(16 AS INTEGER) AS dim,
           CAST(CAST(
             ( CAST('0x' || substr(hx, 1, 2) AS BIGINT)
             + CAST('0x' || substr(hx, 3, 2) AS BIGINT) * 256
             + CAST('0x' || substr(hx, 5, 2) AS BIGINT) * 65536
             + CAST('0x' || substr(hx, 7, 2) AS BIGINT) * 16777216
             ) / 4294967296.0 - 0.5 AS FLOAT) AS DOUBLE) AS f0
    FROM h
    """,
    tags=("multimodal", "llm"),
    doc="north-star multimodal: binary payload -> feature vectors; operators/multimodal.py",
)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.multimodal import (
        extract_features,
        with_binary_payload,
    )

    docs = Tables(spark, sf_dir).documents
    feats = extract_features(with_binary_payload(docs), dim=16)
    return feats.select(
        "id",
        F.size("features").cast("int").alias("dim"),
        F.element_at("features", 1).cast("double").alias("f0"),
    )


# ---------------------------------------------------------------------------
# Sub-quadratic ANN paths (operators/similarity.py), value-graded on the
# approx_price_quantiles contract: the query emits the EXACT top-k rows
# (the oracle anchor — same values DuckDB computes) plus one deterministic
# `recall_ok` flag asserting the ANN path recovered ≥ the threshold share
# of those exact neighbors.  Measured recall at the graded thresholds:
# LSH(8 planes, 4 tables, probe radius 3) 0.98 / IVF(16 cells, nprobe 12)
# 0.94 at sf0.01 — thresholds 0.9/0.85 leave margin, so the flag is a
# stable TRUE on both engines.  The raw approximate outputs stay
# registered as *_raw rows-only variants.
# ---------------------------------------------------------------------------
_ANN_ORACLE_WITH_FLAG = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               CAST(round(
                   list_dot_product(CAST(qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))), 6)
               AS DOUBLE) AS sim
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, sim, rnk, TRUE AS recall_ok FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rnk
        FROM scored
    ) WHERE rnk <= 10
    """


def _ann_queries(spark: SparkSession, sf_dir: str):
    # persist the decoded embeddings ONCE per query (r9, VERDICT r8 item 3):
    # every anchored ANN query scans this table 3-5x — exact-anchor
    # mapInPandas, sample collect, index/assign pass, survivor vector
    # join-back, query-side collect — and each scan re-read and re-decoded
    # the parquet floats.  The persist lives until the session clearCache()
    # between queries (the bench/driver lifecycle).
    emb = Tables(spark, sf_dir).embeddings.persist()
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return emb, q


def _anchor_with_recall_flag(
    exact: DataFrame, approx: DataFrame, threshold_pct: int
) -> DataFrame:
    """Exact top-k rows + one constant `recall_ok` column: share of exact
    (query, neighbor) pairs the ANN path recovered, thresholded with integer
    arithmetic (no float compare).  The 1-row aggregate broadcast-joins onto
    the anchor rows — no collect, scales with the exact result size only."""
    hits = exact.select("query_id", "neighbor_id").join(
        approx.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    stats = hits.agg(
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) * F.lit(100)
            >= F.count(F.lit(1)) * F.lit(threshold_pct)
        ).alias("recall_ok")
    )
    return exact.crossJoin(F.broadcast(stats))


@register(
    "ann_lsh_topk",
    oracle=_ANN_ORACLE_WITH_FLAG,
    tags=("similarity", "llm", "approx"),
    doc="north-star ANN: multi-probe hyperplane LSH graded against the "
    "exact top-k anchor (recall>=0.9 flag); operators/similarity.py",
)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import (
        cosine_topk,
        lsh_ann_topk,
    )

    emb, q = _ann_queries(spark, sf_dir)
    exact = cosine_topk(spark, emb, q, k=10)
    approx = lsh_ann_topk(
        spark, emb, q, k=10, n_planes=8, n_tables=4, max_hamming=3
    )
    return _anchor_with_recall_flag(exact, approx, threshold_pct=90)


@register(
    "ann_ivf_topk",
    oracle=_ANN_ORACLE_WITH_FLAG,
    tags=("similarity", "llm", "approx"),
    doc="north-star ANN: learned-cell IVF graded against the exact top-k "
    "anchor (recall>=0.85 flag); operators/similarity.py",
)
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import (
        cosine_topk,
        ivf_kmeans_topk,
    )

    emb, q = _ann_queries(spark, sf_dir)
    exact = cosine_topk(spark, emb, q, k=10)
    approx = ivf_kmeans_topk(spark, emb, q, k=10, n_cells=16, nprobe=12)
    return _anchor_with_recall_flag(exact, approx, threshold_pct=85)


@register(
    "ann_lsh_topk_raw",
    oracle=None,
    tags=("similarity", "llm", "approx"),
    doc="raw multi-probe LSH ANN output (no exact anchor) — the scale path "
    "users run; rows-only, its graded twin is ann_lsh_topk",
    priority=60,
)
def ann_lsh_topk_raw_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import lsh_ann_topk

    emb, q = _ann_queries(spark, sf_dir)
    return lsh_ann_topk(spark, emb, q, k=10, n_planes=8, n_tables=4, max_hamming=3)


@register(
    "ann_ivf_topk_raw",
    oracle=None,
    tags=("similarity", "llm", "approx"),
    doc="raw learned-cell IVF ANN output (no exact anchor); rows-only, its "
    "graded twin is ann_ivf_topk",
    priority=60,
)
def ann_ivf_topk_raw_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import ivf_kmeans_topk

    emb, q = _ann_queries(spark, sf_dir)
    return ivf_kmeans_topk(spark, emb, q, k=10, n_cells=16, nprobe=12)


# ---------------------------------------------------------------------------
# Dedup clustering: connected components over exact near-dup pairs.
# Iterative in Spark (label propagation), but a DuckDB RECURSIVE CTE can
# compute the same min-reachable-id closure — so the driver grades values,
# not just row counts.
# ---------------------------------------------------------------------------
@register(
    "dedup_clusters",
    # pairs via the exploded-shingle co-occurrence join (see
    # ngram_jaccard_pairs — the exact twin of the Spark engine's
    # shingle-derived semantics, seconds instead of the quadratic
    # list_intersect cross join); the recursive closure is unchanged
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
           SELECT e.a, c.lbl FROM edges e JOIN cc c ON e.b = c.id)
    SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id
    """,
    tags=("dedup", "llm", "iterative"),
    doc="north-star dedup: connected-component duplicate clusters; operators/dedup.py",
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = Tables(spark, sf_dir).documents
    pairs = ngram_jaccard_pairs(spark, docs, threshold=0.8)
    return dedup_clusters(spark, pairs)


# ---------------------------------------------------------------------------
# Canonical-representative selection: the step AFTER clustering in every
# near-dup pipeline — each cluster keeps ONE document (the longest; ties to
# the smallest doc_id — the standard "keep the fullest version" rule) and
# the rest are drop candidates.  Output is the per-member verdict table a
# curation run joins against.
# Scale: the representative is a hash-agg argmin of struct(-n_chars, id)
# per cluster (map-side combine — a megacluster of boilerplate docs never
# funnels into one sort task, deliberately NOT a row_number window), joined
# back on cluster_id where the agg side is one row per cluster.
# ---------------------------------------------------------------------------
@register(
    "dedup_canonical",
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
    j AS (SELECT cl.id, cl.cluster_id, d.n_chars
          FROM cl JOIN documents d ON d.doc_id = cl.id)
    SELECT j.id AS doc_id, j.cluster_id,
           CAST(count(*) OVER (PARTITION BY j.cluster_id) AS BIGINT) AS csize,
           CAST(CASE WHEN row_number() OVER (
                    PARTITION BY j.cluster_id
                    ORDER BY j.n_chars DESC, j.id ASC) = 1
                THEN 1 ELSE 0 END AS INTEGER) AS canonical
    FROM j
    """,
    tags=("dedup", "llm", "curation"),
    doc="per-member canonical verdicts over near-dup clusters: each cluster "
    "keeps its longest doc (ties to smallest id) via a skew-safe hash-agg "
    "argmin, never a per-cluster window",
    priority=TIER_NEWFAM,
)
def dedup_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = Tables(spark, sf_dir).documents
    pairs = ngram_jaccard_pairs(spark, docs, threshold=0.8)
    clusters = dedup_clusters(spark, pairs)
    j = clusters.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    rep = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("csize"),
        F.min(
            F.struct(
                (-F.col("n_chars")).alias("neg_len"), F.col("id").alias("rid")
            )
        ).alias("best"),
    )
    return j.join(rep, "cluster_id").select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        "csize",
        (F.col("id") == F.col("best.rid")).cast("int").alias("canonical"),
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline: the composite a training-data run executes —
# exact dedup -> quality gate -> language gate -> near-dup cluster removal.
# Output is the surviving corpus with per-doc provenance flags.
# ---------------------------------------------------------------------------
@register(
    "curation_pipeline",
    oracle=r"""
    WITH RECURSIVE
    canonical AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
    kept AS (SELECT d.doc_id, d.lang,
                    CAST(len(string_split_regex(trim(d.text), '\s+')) AS INTEGER)
                        AS n_tokens,
                    d.text
             FROM documents d JOIN canonical c ON d.doc_id = c.doc_id
             WHERE len(string_split_regex(trim(d.text), '\s+'))
                       BETWEEN 10 AND 10000
               AND d.lang IN ('en', 'de', 'fr', 'es', 'zh')),
    toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
             FROM kept),
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
    losers AS (SELECT id FROM cc GROUP BY id HAVING min(lbl) <> id)
    SELECT doc_id, lang, n_tokens FROM kept
    WHERE doc_id NOT IN (SELECT id FROM losers)
    """,
    tags=("llm", "pipeline"),
    doc="north-star composite: dedup + quality + lang + near-dup removal",
)
def curation_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = Tables(spark, sf_dir).documents
    # 1. exact dedup: keep min doc_id per content digest.  xxhash64 is an
    # IDENTITY digest here (the oracle groups by the text itself) — the
    # 2⁻⁶⁴-collision class SCALE.md documents — so the digest groupBy
    # shuffles 8-byte keys instead of 32-char md5 hex (guide §2.3, r9).
    # The surviving-id set feeds TWO corpus passes (the shingle pipeline
    # and the final anti-join rehydration): persist it once — it is one
    # long per distinct document, never the text (lifecycle: session
    # clearCache() between queries, the bench/driver contract).
    canonical = (
        docs.groupBy(F.xxhash64("text").alias("__fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .persist()
    )
    kept = docs.join(canonical, "doc_id", "left_semi")
    # 2. quality gate: token-count band (JVM expressions only)
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    kept = kept.withColumn("n_tokens", n_tokens).filter(
        (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 10_000)
    )
    # 3. language gate
    kept = kept.filter(F.col("lang").isin("en", "de", "fr", "es", "zh"))
    # 4. near-dup removal: drop every cluster member except the minimum id
    pairs = ngram_jaccard_pairs(spark, kept, threshold=0.8)
    clusters = dedup_clusters(spark, pairs)
    losers = clusters.filter(F.col("cluster_id") != F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    survived = kept.join(losers, "doc_id", "left_anti")
    return survived.select("doc_id", "lang", "n_tokens")


# ---------------------------------------------------------------------------
# Per-user min-max normalization of event values.  The graded form is the
# pure-JVM window plan — min/max over Window.partitionBy stay inside
# whole-stage codegen, no Python worker round-trip (~5× faster than the
# grouped-map UDF at sf0.1 and the plan a 100 TB run should use).  The
# applyInPandas form survives as the per_user_minmax_norm_udf variant:
# it's the §2.11 grouped-map SURFACE demo, not the recommended plan.
# ---------------------------------------------------------------------------
_MINMAX_ORACLE = """
    SELECT event_id, user_id,
           CAST(CASE WHEN mx = mn THEN 0.5
                ELSE floor((value - mn) / (mx - mn) * 1000000.0 + 0.5) / 1000000.0
                END AS DOUBLE) AS v_norm
    FROM (SELECT event_id, user_id, value,
                 min(value) OVER (PARTITION BY user_id) AS mn,
                 max(value) OVER (PARTITION BY user_id) AS mx
          FROM events)
    """


@register(
    "per_user_minmax_norm",
    oracle=_MINMAX_ORACLE,
    tags=("window", "llm"),
    doc="per-user min-max normalization as a pure JVM window plan "
    "(codegen; the applyInPandas twin is per_user_minmax_norm_udf)",
)
def per_user_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events.select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id")
    mn, mx = F.min("value").over(w), F.max("value").over(w)
    # explicit half-up (floor(x·1e6 + 0.5)/1e6) — Spark round() is already
    # half-up but the floor form runs on operands identical to the oracle's
    v = F.when(mx == mn, F.lit(0.5)).otherwise(
        F.floor((F.col("value") - mn) / (mx - mn) * F.lit(1e6) + F.lit(0.5))
        / F.lit(1e6)
    )
    return ev.select("event_id", "user_id", v.cast("double").alias("v_norm"))


@register(
    "per_user_minmax_norm_udf",
    oracle=_MINMAX_ORACLE,
    tags=("udf", "llm"),
    doc="grouped-map applyInPandas surface demo (SURVEY.md §2.11); same "
    "oracle as the graded JVM-window form",
    priority=60,
)
def per_user_minmax_norm_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = Tables(spark, sf_dir).events.select("event_id", "user_id", "value")

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["value"].min(), pdf["value"].max()
        if mx == mn:
            v = pd.Series(0.5, index=pdf.index)
        else:
            # explicit half-up: pandas .round is half-even and diverges from
            # the oracle on exactly-representable ties (e.g. 0.2890625)
            import numpy as np

            v = np.floor((pdf["value"] - mn) / (mx - mn) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "v_norm": v}
        )

    return ev.groupBy("user_id").applyInPandas(
        norm, "event_id long, user_id long, v_norm double"
    )


# ---------------------------------------------------------------------------
# Multimodal → similarity composition: binary payloads → encoder (stub) →
# exact cosine top-k over the produced feature vectors.  The full
# image-search plumbing with only the codec faked.
# ---------------------------------------------------------------------------
@register(
    "embedding_centroids",
    oracle="""
    WITH e AS (SELECT label, unnest(embedding) AS v,
                      unnest(range(len(embedding))) AS pos FROM embeddings),
    per AS (SELECT label, pos, avg(v) AS cv FROM e GROUP BY label, pos),
    agg AS (SELECT label, count(*) AS dim, sqrt(sum(cv*cv)) AS nrm,
                   avg(cv) AS mean_cv
            FROM per GROUP BY label),
    cnt AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
    SELECT a.label, c.n_vecs, CAST(a.dim AS BIGINT) AS dim,
           CAST(floor(a.nrm * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
               AS centroid_norm,
           CAST(floor(a.mean_cv * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
               AS centroid_mean
    FROM agg a JOIN cnt c USING (label)
    """,
    tags=("similarity", "llm", "embedding"),
    doc="per-label embedding centroids (semantic-clustering prep): "
    "posexplode -> per-dimension mean -> norm/mean summary, all JVM "
    "aggregates; the centroid table is what IVF cells / semantic dedup "
    "representatives are built from",
)
def embedding_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.functions.aggregates import round_half_up

    emb = Tables(spark, sf_dir).embeddings
    e = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    per = e.groupBy("label", "pos").agg(F.avg("v").alias("cv"))
    agg = per.groupBy("label").agg(
        F.count(F.lit(1)).alias("dim"),
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("nrm"),
        F.avg("cv").alias("mean_cv"),
    )
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return agg.join(cnt, "label").select(
        "label",
        "n_vecs",
        "dim",
        round_half_up(F.col("nrm"), 6).alias("centroid_norm"),
        round_half_up(F.col("mean_cv"), 6).alias("centroid_mean"),
    )


# shared by semantic_dedup (plain) and semantic_dedup_ann (exact-anchored
# recall-flag grading of the LSH/IVF-blocked scale path)
_SEMANTIC_DEDUP_ORACLE_BODY = """
    WITH RECURSIVE
    pairs AS (
      SELECT a.vec_id AS la, b.vec_id AS rb
      FROM embeddings a CROSS JOIN embeddings b
      WHERE a.vec_id < b.vec_id
        AND round(
            list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
            6) > 0.35),
    edges AS (SELECT la AS a, rb AS b FROM pairs
              UNION SELECT rb, la FROM pairs),
    cc AS (SELECT a AS id, a AS lbl FROM edges
           UNION
           SELECT e.a, c.lbl FROM edges e JOIN cc c ON e.b = c.id),
    lbl AS (SELECT id, min(lbl) AS rep FROM cc GROUP BY id)
    SELECT e.vec_id,
           COALESCE(l.rep, e.vec_id) AS rep_id,
           COALESCE(l.rep, e.vec_id) = e.vec_id AS is_kept{extra_cols}
    FROM embeddings e LEFT JOIN lbl l ON e.vec_id = l.id
    """


@register(
    "semantic_dedup",
    oracle=_SEMANTIC_DEDUP_ORACLE_BODY.format(extra_cols=""),
    tags=("similarity", "dedup", "llm"),
    doc="semantic dedup: cosine near-dup pairs -> connected components -> "
    "keep the minimum vec_id per cluster; singletons keep themselves. The "
    "representative table a semantic-dedup'd training corpus retains "
    "(composes cosine_self_pairs + dedup_clusters, both independently "
    "oracle-graded)",
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import cosine_self_pairs

    emb = Tables(spark, sf_dir).embeddings
    pairs = cosine_self_pairs(spark, emb, threshold=0.35)
    return _semantic_dedup_table(spark, emb, pairs)


def _semantic_dedup_table(spark, emb, pairs) -> DataFrame:
    """pairs -> connected components -> (vec_id, rep_id, is_kept)."""
    from delta_lake_validation_spark.operators.dedup import dedup_clusters

    clusters = dedup_clusters(
        spark,
        pairs.select(
            F.col("left_id").alias("left_doc"),
            F.col("right_id").alias("right_doc"),
        ),
    )
    return (
        emb.select("vec_id")
        .join(clusters, emb.vec_id == clusters.id, "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("rep_id"),
        )
        .withColumn("is_kept", F.col("rep_id") == F.col("vec_id"))
    )


@register(
    "semantic_dedup_ann",
    oracle=_SEMANTIC_DEDUP_ORACLE_BODY.format(
        extra_cols=",\n           TRUE AS recall_ok"
    ),
    tags=("similarity", "dedup", "llm", "approx"),
    doc="VERDICT r3 task 4: ANN-blocked semantic dedup.  Candidate pairs "
    "come from IVF multi-assignment blocking (k-means cells, nprobe=4 — "
    "O(n²·p²/cells) not O(n²)) with exact in-cell cosine verification; "
    "graded against the exact semantic-dedup anchor with a pair-recall "
    ">=0.9 flag, like the other approximate families",
)
def semantic_dedup_ann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import (
        cosine_self_pairs,
        ivf_blocked_self_pairs,
    )

    # one persisted decode feeds the exact leg (count + 2-sided cogroup),
    # the ANN leg (sample collect + assign pass) and the final vec_id join
    # (r9, VERDICT r8 item 3 — same lifecycle note as _ann_queries)
    emb = Tables(spark, sf_dir).embeddings.persist()
    exact_pairs = cosine_self_pairs(spark, emb, threshold=0.35)
    approx_pairs = ivf_blocked_self_pairs(
        spark, emb, threshold=0.35, n_cells=16, nprobe=4
    )
    anchor = _semantic_dedup_table(spark, emb, exact_pairs)
    hits = exact_pairs.select("left_id", "right_id").join(
        approx_pairs.select("left_id", "right_id").withColumn(
            "__hit", F.lit(1)
        ),
        ["left_id", "right_id"],
        "left",
    )
    stats = hits.agg(
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) * F.lit(100)
            >= F.count(F.lit(1)) * F.lit(90)
        ).alias("recall_ok")
    )
    return anchor.crossJoin(F.broadcast(stats))


@register(
    "semantic_dedup_ann_raw",
    oracle=None,
    tags=("similarity", "dedup", "llm", "approx"),
    doc="raw ANN-blocked semantic dedup (no exact anchor) — the pipeline "
    "users run at 100 TB; rows-only, its graded twin is semantic_dedup_ann",
    priority=60,
)
def semantic_dedup_ann_raw_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.similarity import (
        ivf_blocked_self_pairs,
    )

    emb = Tables(spark, sf_dir).embeddings.persist()
    pairs = ivf_blocked_self_pairs(
        spark, emb, threshold=0.35, n_cells=16, nprobe=4
    )
    return _semantic_dedup_table(spark, emb, pairs)


@register(
    "multimodal_ann",
    oracle=None,
    tags=("multimodal", "similarity", "llm"),
    doc="north-star composition: payload -> features -> ANN; operators/multimodal+similarity",
)
def multimodal_ann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.multimodal import (
        extract_features,
        with_binary_payload,
    )
    from delta_lake_validation_spark.operators.similarity import cosine_topk

    docs = Tables(spark, sf_dir).documents
    feats = extract_features(with_binary_payload(docs), dim=16)
    q = feats.filter(F.col("id") % 100 == 0).select(
        F.col("id").alias("query_id"), F.col("features").alias("qe")
    )
    return cosine_topk(
        spark, feats, q, k=5, id_col="id", vec_col="features"
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenizer (word runs + punctuation runs) — the pre-tokenize
# split BPE vocabularies train over, vs token_counts' whitespace tokenizer.
# ---------------------------------------------------------------------------
@register(
    "token_counts_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]+'))
                AS INTEGER) AS n_bpe_tokens
    FROM documents
    """,
    tags=("text", "llm"),
    doc="north-star text analysis: BPE-style regex pre-tokenization count",
)
def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]+"), 0))
        .cast("int")
        .alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# TRUE merges-table BPE token counting — the real token-budget currency
# (token_counts_bpe above is the regex PRE-tokenizer; actual budgets shift
# with the merge table).  Encoder: greedy lowest-rank/leftmost merge loop
# over word-internal characters, 24-merge fixture vocabulary
# (operators/text.py BPE_MERGES), replayed bit-for-bit by a DuckDB
# recursive-CTE oracle.
# At 100 TB: the Python encoder runs over the corpus VOCABULARY (distinct
# words — Zipf-bounded, memoized per worker), NEVER the token stream; the
# per-doc rollup shuffles pre-aggregated (doc_id, word, k) counts and the
# join back on word is count-side-single-row, so AQE skew-splits hot words.
# ---------------------------------------------------------------------------
def _bpe_merges_values() -> str:
    from delta_lake_validation_spark.operators.text import BPE_MERGES

    return ", ".join(
        f"({r}, '{a}', '{b}')"
        for r, (a, b) in enumerate(BPE_MERGES, start=1)
    )


#: Shared DuckDB encoder block (expects a ``vocab(word)`` CTE upstream,
#: yields ``final(word, n_toks)``) — ONE copy of the greedy
#: lowest-rank/leftmost merge loop, so the per-doc and per-lang queries
#: can never diverge on encoder semantics.
_BPE_ENCODER_CTES = r"""
    enc AS (
      SELECT word, string_split(word, '') AS toks FROM vocab
      UNION ALL
      SELECT word,
             list_concat(list_concat(
               toks[1 : CAST(bp.i AS INT)],
               [toks[CAST(bp.i AS INT) + 1] || toks[CAST(bp.i AS INT) + 2]]),
               toks[CAST(bp.i AS INT) + 3 : len(toks)]) AS toks
      FROM (
        SELECT word, toks,
               (SELECT min(struct_pack(r := m.rank, i := u.i))
                FROM merges m, UNNEST(range(len(toks) - 1)) AS u(i)
                WHERE toks[CAST(u.i AS INT) + 1] = m.p1
                  AND toks[CAST(u.i AS INT) + 2] = m.p2) AS bp
        FROM enc) s
      WHERE bp IS NOT NULL
    ),
    final AS (
      SELECT word, len(toks) AS n_toks FROM (
        SELECT word, toks,
               (SELECT min(struct_pack(r := m.rank, i := u.i))
                FROM merges m, UNNEST(range(len(toks) - 1)) AS u(i)
                WHERE toks[CAST(u.i AS INT) + 1] = m.p1
                  AND toks[CAST(u.i AS INT) + 2] = m.p2) AS bp
        FROM enc) WHERE bp IS NULL
    )"""


def _bpe_word_counts(docs: DataFrame, key_col: str) -> DataFrame:
    """Shared Spark half: (key_col, word, k, n_toks) — per-key word
    multiplicities joined to vocabulary-side encoder counts (the encoder
    UDF runs over DISTINCT words only, never the token stream)."""
    from delta_lake_validation_spark.operators.text import bpe_len_udf

    words = docs.select(
        key_col,
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("word"),
    )
    per_key = words.groupBy(key_col, "word").agg(
        F.count(F.lit(1)).alias("k")
    )
    vocab = per_key.select("word").distinct()
    enc = vocab.withColumn("n_toks", bpe_len_udf()(F.col("word")))
    return per_key.join(enc, "word")


@register(
    "token_counts_bpe_merges",
    oracle=r"""
    WITH RECURSIVE merges(rank, p1, p2) AS (
      SELECT * FROM (VALUES """ + _bpe_merges_values() + r""") v
    ),
    words AS (
      SELECT doc_id, u.word
      FROM documents,
           UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS u(word)
    ),
    per_doc_word AS (
      SELECT doc_id, word, count(*) AS k
      FROM words GROUP BY doc_id, word
    ),
    vocab AS (SELECT DISTINCT word FROM per_doc_word),"""
    + _BPE_ENCODER_CTES + r"""
    SELECT d.doc_id,
           CAST(sum(d.k) AS BIGINT) AS n_words,
           CAST(sum(d.k * f.n_toks) AS BIGINT) AS n_bpe_tokens
    FROM per_doc_word d JOIN final f USING (word)
    GROUP BY d.doc_id
    """,
    tags=("text", "llm", "tokenize"),
    doc="true merges-table BPE token counts (greedy lowest-rank/leftmost "
    "encoder over a fixture merge table), encoded over the vocabulary and "
    "joined back — the real token-budget currency vs the regex "
    "pre-tokenizer",
)
def token_counts_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    return (
        _bpe_word_counts(docs, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_words"),
            F.sum(F.col("k") * F.col("n_toks")).alias("n_bpe_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language — the standard multilingual-tokenizer
# health metric (tokens per word; a vocabulary trained on one language
# fragments the others, inflating their training cost).  Same plan shape
# as token_counts_bpe_merges with the rollup keyed by lang; the fertility
# ratio is integer-exact (parts-per-thousand, floor-half-up) so both
# engines agree to the bit.
# ---------------------------------------------------------------------------
@register(
    "bpe_fertility_by_lang",
    oracle=r"""
    WITH RECURSIVE merges(rank, p1, p2) AS (
      SELECT * FROM (VALUES """ + _bpe_merges_values() + r""") v
    ),
    words AS (
      SELECT lang, u.word
      FROM documents,
           UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS u(word)
    ),
    per_lang_word AS (
      SELECT lang, word, count(*) AS k
      FROM words GROUP BY lang, word
    ),
    vocab AS (SELECT DISTINCT word FROM per_lang_word),"""
    + _BPE_ENCODER_CTES + r"""
    SELECT d.lang,
           CAST(sum(d.k) AS BIGINT) AS n_words,
           CAST(sum(d.k * f.n_toks) AS BIGINT) AS n_bpe_tokens,
           CAST((sum(d.k * f.n_toks) * 2000 + sum(d.k))
                // (sum(d.k) * 2) AS BIGINT) AS fertility_permille
    FROM per_lang_word d JOIN final f USING (word)
    GROUP BY d.lang
    """,
    tags=("text", "llm", "tokenize", "multilingual"),
    doc="tokenizer fertility (BPE tokens per word, permille) by language "
    "— the multilingual tokenizer-health metric, over the merges-table "
    "encoder",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    # exact integer half-up (NOTES.md rounding discipline): never a float
    # ratio + 0.5, whose ties drift between engines
    return (
        _bpe_word_counts(docs, "lang")
        .groupBy("lang")
        .agg(
            F.sum("k").alias("n_words"),
            F.sum(F.col("k") * F.col("n_toks")).alias("n_bpe_tokens"),
            F.expr(
                "CAST((sum(k * n_toks) * 2000 + sum(k)) div (sum(k) * 2) "
                "AS BIGINT)"
            ).alias("fertility_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition detection (Gopher-style quality rule): fraction of duplicate
# word trigrams within each document.  Heavily repeated boilerplate scores
# high and gets filtered before training.  Pure Catalyst: posexplode +
# lead window for grams, one aggregate; ratio via exact integer half-up.
# ---------------------------------------------------------------------------
@register(
    "doc_repetition",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
      FROM documents
    ),
    idx AS (
      SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
      FROM toks WHERE len(ts) >= 3
    ),
    grams AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g FROM idx
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(CAST((2 * (count(*) - count(DISTINCT g)) * 10000 + count(*))
                     // (2 * count(*)) AS DOUBLE) / 10000.0 AS DOUBLE)
               AS dup_gram_ratio
    FROM grams GROUP BY doc_id
    """,
    tags=("text", "llm", "quality"),
    doc="duplicate-trigram fraction per doc (repetition quality rule)",
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        F.concat_ws(
            " ", F.col("tok"), F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
        ).alias("g"),
        F.lead("tok", 2).over(w).alias("__last"),
    ).filter(F.col("__last").isNotNull())
    agg = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("g").alias("__d"),
    )
    dup = F.col("n_grams") - F.col("__d")
    scaled = F.floor(
        (2 * dup * 10000 + F.col("n_grams")) / (2 * F.col("n_grams"))
    )
    return agg.select(
        "doc_id",
        "n_grams",
        (scaled.cast("double") / F.lit(10000.0)).cast("double").alias("dup_gram_ratio"),
    )


# ---------------------------------------------------------------------------
# TF-IDF term weighting: the classic corpus-statistics operator an LLM-data
# pipeline uses for keyword extraction / topic labeling.  tf counts pool per
# source; df counts distinct documents containing the term corpus-wide.
#
# Determinism note: Spark's JVM ln() and DuckDB's libm ln() disagree in the
# last ulp on ~4% of inputs (measured), so the idf dampening here is the
# *linear* variant score = tf * N div df — exact BIGINT arithmetic that both
# engines compute bit-identically.  Production swap to log-idf is one line.
#
# Scale: the token explode is the usual corpus-wide shuffle (partial aggs
# apply); df and the 1-row N are broadcast back — no driver collect.
# ---------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        FROM documents
    ),
    t AS (SELECT * FROM tok WHERE term <> ''),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
    tfreq AS (SELECT source, term, count(*) AS tf FROM t GROUP BY source, term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT source, rk, term, tf, df, score FROM (
        SELECT source, term, tf, df, (tf * n_docs) // df AS score,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY (tf * n_docs) // df DESC, term
               ) AS rk
        FROM tfreq JOIN dfreq USING (term) CROSS JOIN n
    ) WHERE rk <= 15
    """,
    tags=("text", "llm", "tfidf"),
    doc="per-source top-15 terms by exact linear TF-IDF",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tfreq = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tfreq.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.expr("(tf * n_docs) div df"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 15)
        .select("source", "rk", "term", "tf", "df", "score")
    )


# ---------------------------------------------------------------------------
# Stratified sampling: deterministic per-stratum subsample (k docs per lang)
# ranked by a portable content-independent hash (md5 of the key) so Spark and
# DuckDB draw the identical "random" sample.  This is the curation primitive
# for balancing language/domain mixes in a training corpus.
#
# Scale: one hash-shuffle on the stratum key; rank+filter prunes to k per
# stratum before anything leaves the exchange.  For heavily skewed strata the
# window sort is the cost — at 100 TB swap row_number for a two-pass
# threshold (approx quantile of the hash, then filter) to avoid sorting whole
# strata; semantics identical because the hash is uniform.
# ---------------------------------------------------------------------------
@register(
    "stratified_sample",
    oracle="""
    SELECT lang, rk, doc_id, source FROM (
        SELECT lang, doc_id, source,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 200
    """,
    tags=("sampling", "llm", "curation"),
    doc="deterministic hash-ranked stratified sample, 200 docs per lang",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 200)
        .select("lang", "rk", "doc_id", "source")
    )


# ---------------------------------------------------------------------------
# Text normalization: the canonicalization step every dedup/quality stage
# runs first (lowercase, strip non-alphanumerics, collapse whitespace).
# Regex classes are kept to the portable subset Java regex and RE2 agree on.
#
# Scale: pure per-row Catalyst expressions — no shuffle at all.
# ---------------------------------------------------------------------------
@register(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text,
           CAST(n_chars - length(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS BIGINT) AS removed_chars
    FROM documents
    """,
    tags=("text", "llm", "curation"),
    doc="canonicalize text (lower, strip punct, collapse ws) + removal count",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        (F.col("n_chars") - F.length(norm)).cast("long").alias("removed_chars"),
    )


# ---------------------------------------------------------------------------
# Train/eval decontamination: flag training documents sharing any word
# trigram with a held-out eval set — the containment-join every LLM data
# pipeline runs before training.  The eval set here is a deterministic
# slice of the corpus (doc_id % 97 == 0) standing in for an external
# benchmark suite; grams compare as exact strings, so both engines agree
# bit-for-bit.
#
# Scale: gram explode → semi-ish inner join on the gram string → count
# distinct per doc.  The eval gram set is tiny relative to the corpus
# (benchmarks are MBs, corpora are TBs) — at scale broadcast it; here the
# optimizer chooses.  No driver collect.
# ---------------------------------------------------------------------------
@register(
    "decontaminate_trigrams",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
      FROM documents
    ),
    idx AS (
      SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
      FROM toks WHERE len(ts) >= 3
    ),
    grams AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g FROM idx
    ),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
    )
    SELECT g.doc_id, count(DISTINCT g.g) AS n_shared_grams
    FROM grams g JOIN eval_grams e USING (g)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    """,
    tags=("text", "llm", "dedup", "decontamination"),
    doc="training docs sharing a word trigram with the held-out eval slice",
)
def decontaminate_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        F.concat_ws(
            " ", F.col("tok"), F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
        ).alias("g"),
        F.lead("tok", 2).over(w).alias("__last"),
    ).filter(F.col("__last").isNotNull())
    eval_grams = (
        grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(eval_grams, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )


# ---------------------------------------------------------------------------
# PII redaction: scrub emails / phone numbers / IPv4 addresses before
# training — a standard curation stage every large-scale text pipeline runs
# (engine extension; the reference has no text surface at all).  The
# synthetic corpus contains no PII, so the query first injects
# deterministic doc_id-derived PII into every row IN BOTH ENGINES, then
# grades the redaction itself: the scrubbed text plus per-class match
# counts.  Regexes stay in the subset Java regex and RE2 interpret
# identically (char classes, \d, \b, bounded repeats, escaped dots).
#
# Scale: pure per-row Catalyst regexp expressions — zero shuffle; only
# doc_id and text are read from the scan.
# ---------------------------------------------------------------------------
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "pii_redact",
    oracle=rf"""
    WITH raw AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com call 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST(doc_id % 199 AS VARCHAR)
                  || '.' || CAST(doc_id % 97 AS VARCHAR) AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS clean,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ips
    FROM raw
    """,
    tags=("text", "llm", "curation", "pii"),
    doc="inject deterministic PII, then redact emails/phones/IPs + count each",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    d = F.col("doc_id")

    def s(e):
        return e.cast("string")

    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        s(d),
        F.lit("@mail"),
        s(d % 7),
        F.lit(".com call 555-"),
        F.lpad(s(d % 1000), 3, "0"),
        F.lit("-"),
        F.lpad(s(d % 10000), 4, "0"),
        F.lit(" from 10."),
        s(d % 256),
        F.lit("."),
        s(d % 199),
        F.lit("."),
        s(d % 97),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, _PII_EMAIL, "<EMAIL>"), _PII_IP, "<IP>"
        ),
        _PII_PHONE,
        "<PHONE>",
    )

    def n(pat):
        return F.size(F.regexp_extract_all(raw, F.lit(pat), 0)).cast("long")

    return docs.select(
        "doc_id",
        clean.alias("clean"),
        n(_PII_EMAIL).alias("n_emails"),
        n(_PII_PHONE).alias("n_phones"),
        n(_PII_IP).alias("n_ips"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: every training pipeline's last step
# before writing shards.  Assignment hashes the stable document id (md5,
# identical lowercase hex in both engines) so membership is reproducible
# across runs, engines, and cluster sizes — never random().  The first two
# hex chars give 256 buckets: 3 → val, 3 → test, 250 → train (~1.2% each).
#
# Scale: one partial-agg shuffle on (split, lang); scan prunes to three
# columns.  Adding a corpus 100× larger changes nothing — no sort, no
# window, no driver state.
# ---------------------------------------------------------------------------
@register(
    "split_assign",
    oracle="""
    SELECT CASE WHEN h2 < '03' THEN 'val'
                WHEN h2 < '06' THEN 'test'
                ELSE 'train' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT lang, n_chars,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2
          FROM documents)
    GROUP BY 1, 2
    """,
    tags=("text", "llm", "curation", "split"),
    doc="reproducible hash-based train/val/test assignment + per-split stats",
)
def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "03", "val").when(h2 < "06", "test").otherwise("train")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-level token document-frequency statistics.
# The classic two-pass "how common is this document's vocabulary" signal
# (hapax/rare-token rate is a strong noise indicator in web corpora).
# Plan shape at 100 TB: explode -> distinct tokens per doc -> document
# frequency as a pre-aggregated hash-agg table (partial map-side combine —
# a stop word never funnels into one task) joined back on tok, where AQE
# splits hot probe keys; exchange reuse keeps it one corpus scan on the
# sort-merge path -> hash-agg per doc.  All integer outputs, so the oracle
# comparison is exact.
# ---------------------------------------------------------------------------
@register(
    "token_df_stats",
    oracle=r"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        FROM documents
    ),
    df AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok)
    SELECT toks.doc_id,
           CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(df.df) AS BIGINT) AS sum_df,
           CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
    FROM toks JOIN df USING (tok)
    GROUP BY toks.doc_id
    """,
    tags=("text", "llm", "corpus"),
    doc="per-doc corpus doc-frequency stats (unique/sum-df/hapax counts)",
)
def token_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
        ).alias("tok"),
    )
    # document frequency as a pre-aggregated hash-agg table joined back on
    # tok, never count().over(Window.partitionBy("tok")): a stop word
    # ("the") appears in essentially every document, and a window would
    # serialize all ~n_docs of its rows into one sort task with no partial
    # aggregation (the bigram_lm_score hazard).  The hash agg combines
    # map-side; the join keys on tok where the count side is one row per
    # key, so AQE skew-join splits any hot probe key.  The tok-keyed
    # exchange under both join inputs is identical, so Spark's exchange
    # reuse scans and explodes the corpus once on the sort-merge path.
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_unique"),
            F.sum("df").cast("long").alias("sum_df"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: assign documents to fixed token-budget chunks for
# context-window training, sharded by source.  The distributed-friendly
# contract is prefix-sum packing: within each shard order docs
# deterministically, bin = floor(running-token-count-before / budget) — no
# sequential bin-capacity state.  Source cardinality is tiny (a handful of
# corpora), so a cumsum window partitioned by source would sort a constant
# fraction of the corpus in ONE task; the prefix sum instead runs the
# two-pass distributed recipe (functions/prefix.py): range-partition by
# (source, doc_id), per-slice local sums, broadcast the per-slice offsets,
# add.  Identical semantics (doc_id is a total order per source), bounded
# tasks at any corpus size.
# ---------------------------------------------------------------------------
_PACK_BUDGET = 512  # tokens per chunk


@register(
    "sequence_pack",
    oracle=rf"""
    WITH t AS (
        SELECT source, doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT source, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                   AS before
        FROM t
    )
    SELECT source,
           CAST(before // {_PACK_BUDGET} AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM c
    GROUP BY 1, 2
    """,
    tags=("text", "llm", "packing"),
    doc="token-budget sequence packing into training chunks, sharded by source",
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.functions.prefix import (
        distributed_prefix_sum,
    )

    docs = Tables(spark, sf_dir).documents
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    t = docs.select("source", "doc_id", n_tokens.alias("n_tokens"))
    c = distributed_prefix_sum(
        t,
        F.col("n_tokens"),
        order_by=["doc_id"],
        partition_by=["source"],
        out="__cum",
    ).withColumn("before", F.col("__cum") - F.col("n_tokens"))
    return (
        c.groupBy(
            "source",
            (F.col("before") / F.lit(_PACK_BUDGET))
            .cast("long")
            .alias("chunk_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("chunk_tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Video-shaped frame sampling, value-graded: the mapInPandas plumbing emits
# one row per sampled frame (byte-stride stand-in for a real decoder); its
# arithmetic — frame count, total sampled bytes, first-frame digest — is
# exactly replicable in SQL, so the oracle grades the 1→N row expansion,
# ordering, and slicing, not just row counts.
# ---------------------------------------------------------------------------
_FRAME_STRIDE = 64  # small enough that testdata docs (~100-600 bytes)
#                     genuinely expand to multiple frames and hit the
#                     max_frames cap — with a larger stride every doc would
#                     emit one frame and the expansion/slicing arms of both
#                     sides would be dead code that an oracle sweep can't see


@register(
    "multimodal_frames",
    # frame counts/bytes use octet_length, so they are byte-true for any
    # input; the digest column slices VARCHAR (DuckDB cannot slice BLOBs),
    # which only equals byte slicing for ASCII — the guard makes a
    # non-ASCII fixture FAIL the comparison loudly instead of silently
    # passing with character semantics
    oracle=f"""
    SELECT doc_id AS id,
           CAST(least(8, greatest(1, octet_length(encode(text)) // {_FRAME_STRIDE}))
                AS INTEGER) AS n_frames,
           CAST(CASE WHEN octet_length(encode(text)) < {_FRAME_STRIDE}
                     THEN octet_length(encode(text))
                     ELSE least(8, octet_length(encode(text)) // {_FRAME_STRIDE})
                          * {_FRAME_STRIDE} END AS BIGINT) AS frame_bytes,
           CASE WHEN octet_length(encode(text)) = length(text)
                THEN md5(substr(text, 1, {_FRAME_STRIDE}))
                ELSE 'NON_ASCII_FIXTURE_UNSUPPORTED' END AS first_frame_md5
    FROM documents
    """,
    tags=("multimodal", "llm"),
    doc="byte-stride frame sampling (operators/multimodal.py frame_sample) "
    "graded on frame count, sampled bytes, and first-frame digest",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.multimodal import (
        frame_sample,
        with_binary_payload,
    )

    docs = Tables(spark, sf_dir).documents
    media = with_binary_payload(docs)
    frames = frame_sample(media, stride=_FRAME_STRIDE, max_frames=8)
    return frames.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.sum(F.length("frame")).cast("long").alias("frame_bytes"),
        F.max(F.when(F.col("frame_no") == 0, F.md5("frame"))).alias(
            "first_frame_md5"
        ),
    )


# ---------------------------------------------------------------------------
# Quantile binning: length deciles within each language — the binning step
# behind curriculum bucketing / stratified mixing.  NTILE(10) OVER
# (PARTITION BY lang ...) would sort each language in ONE task (English is
# ~half a web corpus), so the engine computes the identical result from a
# two-pass distributed rank (functions/prefix.py) + per-lang counts:
# NTILE's exact bucket rule from (rank, n) — the first (n mod 10) buckets
# take ceil(n/10) rows, the rest floor(n/10).  Fully deterministic: the
# ordering is total (n_chars, doc_id).
# ---------------------------------------------------------------------------
@register(
    "chars_decile",
    oracle="""
    SELECT doc_id, lang,
           CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
                AS INTEGER) AS decile
    FROM documents
    """,
    tags=("window", "ntile", "llm"),
    doc="per-language length deciles (exact NTILE semantics via two-pass "
    "distributed rank — no single-task per-language sort)",
)
def chars_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.functions.prefix import distributed_rank

    docs = Tables(spark, sf_dir).documents
    ranked = distributed_rank(
        docs.select("doc_id", "lang", "n_chars"),
        order_by=["n_chars", "doc_id"],
        partition_by=["lang"],
        out="__r",
    )
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("__n"))
    # exact NTILE(10) from (rank, group size): q = n div 10, rem = n mod 10;
    # ranks 1..(q+1)*rem fill the first rem buckets of q+1 rows, the rest
    # fill buckets of q rows.  Integer-exact, so the oracle hash matches.
    return (
        ranked.join(F.broadcast(counts), "lang")
        .withColumn(
            "decile",
            F.expr(
                "CAST(CASE WHEN __r <= (__n div 10 + 1) * (__n % 10) "
                "THEN (__r + __n div 10) div (__n div 10 + 1) "
                "ELSE __n % 10 + (__r - (__n div 10 + 1) * (__n % 10) "
                "+ __n div 10 - 1) div (__n div 10) END AS INT)"
            ),
        )
        .select("doc_id", "lang", "decile")
    )


# ---------------------------------------------------------------------------
# Boilerplate-span scrubbing (CCNet/RefinedWeb-style): find word 3-grams that
# recur across many documents (site chrome, license blurbs, templates) and
# score each document by the share of its distinct spans that are corpus
# boilerplate.  The downstream filter drops high-ratio docs or strips the
# spans; the graded output is the per-doc profile.
#
# Scale: spans are deduped per doc BEFORE the corpus shuffle; df is a
# pre-aggregated hash-agg table joined back on the span — never a
# count-window over the span shuffle, because a boilerplate 3-gram ("all
# rights reserved") recurs 1e7-1e8 times in a crawl and a window would
# serialize every occurrence into one sort task (the chunk_dedup hazard).
# The hash agg partial-combines map-side; AQE skew-splits hot probe keys in
# the join back; the doc-level rollup is one more keyed shuffle.  No driver
# state, no all-pairs anything; span cardinality ~ tokens, so this is the
# same cost envelope as the dedup shingle pipeline at any SF.
# ---------------------------------------------------------------------------
@register(
    "boilerplate_spans",
    oracle=r"""
    WITH toks AS (SELECT doc_id,
                         string_split_regex(lower(trim(text)), '\s+') AS t
                  FROM documents),
    spans AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM toks WHERE len(t) >= 3
      )
    ),
    withdf AS (SELECT doc_id, s,
                      count(*) OVER (PARTITION BY s) AS df
               FROM spans)
    SELECT doc_id,
           count(*) AS n_spans,
           count(*) FILTER (WHERE df >= 3) AS boiler_spans,
           (count(*) FILTER (WHERE df >= 3)) * 1000 // count(*) AS boiler_permille
    FROM withdf GROUP BY doc_id
    """,
    tags=("text", "llm", "curation", "boilerplate"),
    doc="per-doc boilerplate profile: distinct word-3-gram spans vs spans "
    "shared by >= 3 docs (exact corpus df via a hash-agg span-frequency "
    "table joined back — skew-safe on hot boilerplate spans)",
)
def boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.operators.dedup import shingle_hash_arrays

    docs = Tables(spark, sf_dir).documents
    # the 3-gram span set per doc IS the k=3 shingle set (same lower/trim/
    # split tokenization), and the span text is only ever a grouping/join
    # KEY — so reuse the map-side shingle pipeline: per-doc distinct
    # happens inside the scan task (no corpus-wide distinct shuffle),
    # every downstream shuffle/join carries an 8-byte hash instead of the
    # span string (guide §2.3/§2.4), n_spans is just the array size, and
    # only the hot (df>=3) digest set joins back — a semi join that drops
    # non-boilerplate rows instead of carrying df through the doc rollup.
    # Output counts are unchanged.
    arr = shingle_hash_arrays(docs, "doc_id", "text", k=3).filter(
        F.size("hs") >= 1
    ).persist()
    spans = arr.select("id", F.explode("hs").alias("h"))
    hot = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 3)
        .select("h")
    )
    boiler = (
        spans.join(hot, "h", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("boiler_spans"))
    )
    return (
        arr.select("id", F.size("hs").cast("long").alias("n_spans"))
        .join(boiler, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "n_spans",
            F.coalesce("boiler_spans", F.lit(0)).cast("long").alias(
                "boiler_spans"
            ),
            F.expr(
                "(coalesce(boiler_spans, 0) * 1000) div n_spans"
            ).alias("boiler_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram language-model quality score: the classic perplexity-proxy filter
# (KenLM-style) reduced to an exact, engine-portable integer form.  The
# corpus itself is the LM: p(w2|w1) = c(w1 w2)/c(w1 *), expressed in parts
# per million with integer floor-division so Spark and DuckDB agree to the
# bit (float log-prob was measured to drift in the last ulp between JVM and
# libm ln() — see tfidf_top_terms' linear-idf note).  Low avg_ppm = unusual
# word transitions = likely garbage; min_ppm flags the single rarest
# transition (OCR junk detector).
#
# Scale: bigrams never leave the row (built by transform/slice on the token
# array); the LM counts are pre-aggregated hash-agg tables (partial
# map-side combine — a stop-unigram like "the" never funnels into one
# task) joined back on (w1,w2)/(w1), where AQE's skew-join splits hot
# probe keys; the doc rollup is a third keyed shuffle.
# ---------------------------------------------------------------------------
@register(
    "bigram_lm_score",
    oracle=r"""
    WITH toks AS (SELECT doc_id,
                         string_split_regex(lower(trim(text)), '\s+') AS t
                  FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks WHERE len(t) >= 2
    ),
    scored AS (
      SELECT doc_id,
             (count(*) OVER (PARTITION BY bigram)) * 1000000
             // (count(*) OVER (PARTITION BY split_part(bigram, ' ', 1)))
             AS ppm
      FROM bg
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(ppm) // count(*) AS BIGINT) AS avg_ppm,
           min(ppm) AS min_ppm
    FROM scored GROUP BY doc_id
    """,
    tags=("text", "llm", "quality", "lm"),
    doc="per-doc corpus-bigram-LM quality: integer-exact p(w2|w1) in ppm, "
    "averaged per doc, plus the rarest transition",
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    # bigram identity shuffles as an 8-byte xxhash64, never the strings:
    # the word pair is needed only as a grouping/join KEY (output is integer
    # ppm stats), so hashing right after the map-side explode cuts every
    # downstream shuffle/join key from tens of bytes to 8 (guide §2.3
    # "shuffle keys instead of payloads"); hashes are computed vectorized
    # on the exploded column, not inside the transform lambda.
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> struct(t[i] AS w1, t[i+1] AS w2))"
            )
        ).alias("b"),
    ).select(
        "doc_id",
        F.xxhash64("b.w1").alias("h1"),
        F.xxhash64("b.w1", "b.w2").alias("h2"),
    )
    # LM counts as pre-aggregated hash-agg tables joined back, never
    # count().over(Window.partitionBy(...)): a stop-bigram ("of the") or
    # stop-unigram ("the") occurs in a constant fraction of all rows, and a
    # window would serialize every occurrence into one task.  Hash
    # aggregates partial-combine map-side; the joins key on (h1,h2)/(h1)
    # where the count side is one row per key, so AQE skew-join splits any
    # hot probe key.  Per-doc bigram multiplicity k folds occurrence-level
    # sums into k-weighted sums — bit-identical to the per-occurrence form.
    dbg = bg.groupBy("doc_id", "h1", "h2").agg(
        F.count(F.lit(1)).alias("k")
    )
    # c2/c1 ROLL UP from dbg (counts are additive) instead of
    # re-aggregating the raw bigram stream: one corpus scan + explode
    # feeds all three count tables, not three
    c2 = dbg.groupBy("h1", "h2").agg(F.sum("k").alias("c2"))
    c1 = c2.groupBy("h1").agg(F.sum("c2").alias("c1"))
    scored = (
        dbg.join(c2, ["h1", "h2"])
        .join(c1, "h1")
        .withColumn("ppm", F.expr("(c2 * 1000000) div c1"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_bigrams"),
        F.expr("sum(k * ppm) div sum(k)").alias("avg_ppm"),
        F.min("ppm").alias("min_ppm"),
    )


# ---------------------------------------------------------------------------
# Passage-level exact dedup (CCNet-style): split each document into
# fixed-size token chunks, hash each chunk, mark every non-first global
# occurrence as duplicated, report the per-doc duplicated-chunk fraction.
# At 100 TB: the shuffle key is the 128-bit chunk digest (16 bytes), the
# chunk text itself never shuffles (first-occurrence choice needs only
# (digest, doc_id, chunk_idx)).  Per-digest groups are NOT tiny in real
# crawls — a boilerplate chunk (license header, cookie banner) can recur
# 10^7+ times — so first-occurrence marking must be a hash aggregate
# (partial map-side combine flattens hot digests), never a window over the
# digest: windows have no partial aggregation and funnel every occurrence
# of one hot key into a single sort task.
# ---------------------------------------------------------------------------
@register(
    "chunk_dedup",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             md5(list_aggregate(list_slice(t, i * 10 + 1, i * 10 + 10),
                                'string_agg', ' ')) AS h
      FROM toks, UNNEST(range(CAST(ceil(len(t) / 10.0) AS BIGINT))) AS u(i)
    ),
    marked AS (
      SELECT doc_id, chunk_idx,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx)
               AS rn
      FROM chunks
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(floor(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 10000.0
                      / count(*) + 0.5) / 10000.0 AS DOUBLE) AS dup_frac
    FROM marked GROUP BY doc_id
    """,
    tags=("dedup", "text", "llm"),
    doc="passage-level exact dedup: 10-token chunks, global first-occurrence "
    "wins, per-doc duplicated-chunk fraction (CCNet paragraph-dedup shape)",
)
def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.functions.aggregates import round_half_up

    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    )
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(ceil(size(t) / 10.0) AS INT) - 1), "
                "i -> struct(i AS chunk_idx, "
                # digest is INTERNAL (output is per-doc fractions): the
                # native array hash skips the concat string build and the
                # md5 rounds the oracle mirror still pays — r8 optimization
                "xxhash64(slice(t, i * 10 + 1, 10)) AS h))"
            )
        ).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.h")
    # Global first-occurrence marking as a HASH AGGREGATE, not a window:
    # a per-digest window (count/row_number OVER h) funnels every occurrence
    # of one hot boilerplate chunk into a single sort task with no partial
    # aggregation — a 10^7-occurrence license header serializes the stage at
    # 100 TB.  min(struct(doc_id, chunk_idx)) is order-equivalent to
    # row_number()=1 under (doc_id, chunk_idx) ordering, and hash aggregates
    # partial-combine map-side, so hot digests reduce before the shuffle.
    # Better still, no join back on h is needed here: a doc's non-duplicate
    # chunk count IS the number of digests whose global first occurrence
    # falls in that doc, so both reductions are plain groupBys.
    firsts_per_doc = (
        chunks.groupBy("h")
        .agg(F.min(F.struct("doc_id", "chunk_idx")).alias("first"))
        .groupBy(F.col("first.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    totals = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    dup = (
        F.col("n_chunks") - F.coalesce(F.col("n_first"), F.lit(0))
    ).cast("long")
    return totals.join(firsts_per_doc, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        dup.alias("n_dup_chunks"),
        round_half_up(dup / F.col("n_chunks"), 4).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# Duplicate n-gram SPAN detection (the exact-substring-dedup primitive of
# "Deduplicating Training Data Makes Language Models Better", Lee et al.
# 2022 — their suffix-array pass finds repeated ≥k-token substrings; over
# whitespace tokens the same spans fall out of sliding k-gram hashing):
# every k-token window that occurs anywhere else in the corpus marks its
# token range, all-but-the-first global occurrence counts as removable,
# and overlapping marked windows merge into maximal per-doc spans.
# At 100 TB: the shuffle key is the 16-byte window digest and the carried
# payload is (digest, doc_id, pos) — window TEXT never shuffles.  Hot
# digests (a boilerplate 20-gram recurring 10^7+ times) are handled by
# doing first-occurrence marking as a hash aggregate (partial map-side
# combine) plus a join back on the digest, where AQE's skew-join can split
# the hot key — NOT as a window over the digest, which would serialize
# every occurrence into one sort task.  The interval merge is two windows
# partitioned BY DOCUMENT (never global): lag() finds gap starts, a
# running sum numbers the islands — O(dup windows per doc) rows each.
# ---------------------------------------------------------------------------
@register(
    "dup_ngram_spans",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS pos,
             md5(list_aggregate(list_slice(t, i + 1, i + 20),
                                'string_agg', ' ')) AS h
      FROM toks, UNNEST(range(len(t) - 19)) AS u(i)
      WHERE len(t) >= 20
    ),
    marked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY h) AS n_occ,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM wins
    ),
    dup AS (SELECT doc_id, pos FROM marked WHERE n_occ > 1 AND rn > 1),
    islands AS (
      SELECT doc_id, pos,
             CASE WHEN pos > lag(pos, 1, -100) OVER w + 19 + 1
                  THEN 1 ELSE 0 END AS newgrp
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    grouped AS (
      SELECT doc_id, pos,
             sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM islands
    )
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 20 AS BIGINT) AS span_end
    FROM grouped GROUP BY doc_id, grp
    """,
    tags=("dedup", "text", "llm", "spans"),
    doc="duplicate n-gram span detection (exact-substring dedup primitive, "
    "Lee et al. 2022): sliding 20-token windows hashed corpus-wide, "
    "non-first global occurrences marked, overlapping marks merged into "
    "maximal per-doc [start, end) token spans ready for removal",
)
def dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    K = 20
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= K)
    # sliding windows: one row per position, 16-byte digest only
    wins = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {K}), "
                f"i -> struct(i AS pos, "
                # digest is INTERNAL (output is merged spans): xxhash64
                # over the token slice — no concat string, no md5 rounds;
                # the oracle's md5 marks the identical duplicate set
                f"xxhash64(slice(t, i + 1, {K})) AS h))"
            )
        ).alias("w"),
    ).select("doc_id", "w.pos", "w.h")
    # Global first-occurrence marking as a hash aggregate + join back on h,
    # never a window over h: one hot boilerplate 20-gram can recur 10^7+
    # times in a crawl, and a window funnels all of them into a single sort
    # task (no partial aggregation).  The aggregate partial-combines
    # map-side, the filter keeps only genuinely duplicated digests on the
    # build side, and AQE's skew-join splits any remaining hot digest on
    # the probe side — which it cannot do for a window.
    # min(struct(doc_id, pos)) is order-equivalent to row_number()=1 under
    # (doc_id, pos) ordering.
    dup_digests = (
        wins.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("first"),
        )
        .filter(F.col("n_occ") > 1)
        .select("h", "first")
    )
    dup = (
        wins.join(dup_digests, "h")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos")
    )
    # merge overlapping/adjacent windows into maximal spans, per document
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup.withColumn(
        "newgrp",
        F.when(
            F.col("pos") > F.lag("pos", 1, -100).over(by_doc) + K,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "grp",
        F.sum("newgrp").over(
            by_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return islands.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + K).cast("long").alias("span_end"),
    ).drop("grp")


# ---------------------------------------------------------------------------
# Span REMOVAL — the consumer half of dup_ngram_spans: cut the duplicated
# token ranges out of each affected document and report before/after token
# counts.  At 100 TB the spans side is a per-doc aggregate of the (already
# duplicate-sized) span rows; the join is broadcast-or-shuffle on doc_id
# and the cut itself is a narrow lambda over the token array — no second
# corpus-wide hashing pass.
# ---------------------------------------------------------------------------
@register(
    "dup_span_removal",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS pos,
             md5(list_aggregate(list_slice(t, i + 1, i + 20),
                                'string_agg', ' ')) AS h
      FROM toks, UNNEST(range(len(t) - 19)) AS u(i)
      WHERE len(t) >= 20
    ),
    marked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY h) AS n_occ,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM wins
    ),
    dup AS (SELECT doc_id, pos FROM marked WHERE n_occ > 1 AND rn > 1),
    islands AS (
      SELECT doc_id, pos,
             CASE WHEN pos > lag(pos, 1, -100) OVER w + 20
                  THEN 1 ELSE 0 END AS newgrp
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    grouped AS (
      SELECT doc_id, pos,
             sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM islands
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 20 AS e
      FROM grouped GROUP BY doc_id, grp
    ),
    per_doc AS (
      SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(range(len(t.t)),
                i -> len(list_filter(p.sp,
                     s -> i >= s.s AND i < s.e)) = 0)) AS BIGINT)
             AS n_tokens_clean
    FROM toks t JOIN per_doc p USING (doc_id)
    """,
    tags=("dedup", "text", "llm", "spans"),
    doc="span removal (consumer of dup_ngram_spans): cut each affected "
    "document's duplicated token ranges, report before/after token counts",
)
def dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = dup_ngram_spans(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("sp")
    )
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    )
    # Spans arrive merged and disjoint (dup_ngram_spans guarantees maximal
    # non-overlapping [start, end) ranges), so the clean count is
    # n_tokens - sum(span lengths) — an O(spans) aggregate expression, not
    # the O(tokens x spans) nested per-token filter it replaces (a
    # 100k-token doc with 1k spans would evaluate 10^8 interpreted lambda
    # calls in one row).
    return toks.join(per_doc, "doc_id").select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.expr(
            "CAST(size(t) - aggregate(sp, 0L, "
            "(acc, s) -> acc + least(s.e, CAST(size(t) AS BIGINT)) - s.s) "
            "AS BIGINT)"
        ).alias("n_tokens_clean"),
    )


# Shared kept-token expression for the cleaned-corpus pair below: spans are
# sorted + disjoint, so the kept tokens are the complement intervals
# [0,s1) U [e1,s2) U ... U [ek,n), built with one zip_with over k+1 interval
# pairs and k+1 slices — O(tokens + spans) per doc, no per-token lambda.
_KEPT_TOKENS_EXPR = (
    "flatten(zip_with("
    "concat(array(0L), transform(sp, x -> x.e)), "
    "concat(transform(sp, x -> x.s), array(CAST(size(t) AS BIGINT))), "
    "(a, b) -> slice(t, CAST(a + 1 AS INT), CAST(b - a AS INT))))"
)


def _spans_and_toks(spark: SparkSession, sf_dir: str):
    """Shared input pair for the cleaned-corpus builders: per-doc SORTED
    duplicate spans (``sp`` struct array) and the span pass's exact
    tokenization (``t``)."""
    spans = dup_ngram_spans(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            )
        ).alias("sp")
    )
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    )
    return per_doc, toks


# ---------------------------------------------------------------------------
# Cleaned-corpus materialization — the production half of span removal:
# actually cut the duplicated token ranges and emit the cleaned text (here
# graded by its digest; cleaned_documents() below materializes the full
# column for write-back).  At 100 TB the cut is O(tokens + spans) per doc
# via complement-interval slicing; everything upstream shares
# dup_ngram_spans' skew-proofed plan.
# ---------------------------------------------------------------------------
@register(
    "dup_span_cleaned",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS pos,
             md5(list_aggregate(list_slice(t, i + 1, i + 20),
                                'string_agg', ' ')) AS h
      FROM toks, UNNEST(range(len(t) - 19)) AS u(i)
      WHERE len(t) >= 20
    ),
    marked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY h) AS n_occ,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM wins
    ),
    dup AS (SELECT doc_id, pos FROM marked WHERE n_occ > 1 AND rn > 1),
    islands AS (
      SELECT doc_id, pos,
             CASE WHEN pos > lag(pos, 1, -100) OVER w + 20
                  THEN 1 ELSE 0 END AS newgrp
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    grouped AS (
      SELECT doc_id, pos,
             sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM islands
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 20 AS e
      FROM grouped GROUP BY doc_id, grp
    ),
    per_doc AS (
      SELECT doc_id, list(struct_pack(s := s, e := e) ORDER BY s) AS sp
      FROM spans GROUP BY doc_id
    ),
    cut AS (
      SELECT t.doc_id,
             flatten(list_transform(range(1, len(p.sp) + 2), i ->
               list_slice(t.t,
                 list_prepend(0, list_transform(p.sp, x -> x.e))[i] + 1,
                 list_append(list_transform(p.sp, x -> x.s), len(t.t))[i])))
               AS kept
      FROM toks t JOIN per_doc p USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(kept) AS BIGINT) AS n_tokens_clean,
           md5(coalesce(list_aggregate(kept, 'string_agg', ' '), ''))
             AS clean_digest
    FROM cut
    """,
    tags=("dedup", "text", "llm", "spans"),
    doc="cleaned-corpus materialization: cut duplicated token spans via "
    "complement-interval slicing (O(tokens+spans) per doc) and grade the "
    "cleaned text by digest",
)
def dup_span_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc, toks = _spans_and_toks(spark, sf_dir)
    return (
        toks.join(per_doc, "doc_id")
        .withColumn("kept", F.expr(_KEPT_TOKENS_EXPR))
        .select(
            "doc_id",
            F.expr("CAST(size(kept) AS BIGINT)").alias("n_tokens_clean"),
            F.expr("md5(concat_ws(' ', kept))").alias("clean_digest"),
        )
    )


def cleaned_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cleaned corpus for write-back: every document row, with
    duplicated n-gram spans cut out of ``text_clean`` (docs with no
    duplicate spans keep their text verbatim, lowercased/trimmed like the
    span pass tokenizes).  This is the DataFrame a pipeline writes back to
    its ACID table; tests/test_dedup_ops.py round-trips it through a
    table write.
    """
    per_doc, toks = _spans_and_toks(spark, sf_dir)
    return (
        toks.join(per_doc, "doc_id", "left")
        .withColumn(
            "kept",
            F.when(F.col("sp").isNull(), F.col("t")).otherwise(
                F.expr(_KEPT_TOKENS_EXPR)
            ),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("kept")).alias("text_clean"),
            F.expr("CAST(size(kept) AS BIGINT)").alias("n_tokens_clean"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps' law curve): cumulative distinct vocabulary vs
# cumulative token volume over the corpus in doc-id order, bucketed.
# At 100 TB: first-occurrence per type is a min() hash-agg keyed by the
# token (bounded by vocabulary size, not corpus size); bucket totals are a
# hash-agg keyed by bucket; the two cumulative sums run on the two-pass
# distributed prefix (functions/prefix.py, ONE shared range shuffle) —
# the bucket table is n_docs/100 rows, which at 10^10 docs is 10^8 rows:
# far too many for the single sort task a global Window.orderBy would use
# (VERDICT r7 finding 1).
# ---------------------------------------------------------------------------
@register(
    "vocab_growth",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, doc_id // 100 AS bucket, u.tok
      FROM documents,
           UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS u(tok)
    ),
    firsts AS (
      SELECT tok, min(doc_id) // 100 AS first_bucket
      FROM toks GROUP BY tok
    ),
    per_bucket AS (
      SELECT bucket, count(*) AS n_tokens FROM toks GROUP BY bucket
    ),
    new_types AS (
      SELECT first_bucket AS bucket, count(*) AS n_new
      FROM firsts GROUP BY first_bucket
    )
    SELECT p.bucket,
           CAST(sum(p.n_tokens) OVER (ORDER BY p.bucket) AS BIGINT)
             AS cum_tokens,
           CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY p.bucket) AS BIGINT)
             AS cum_types
    FROM per_bucket p LEFT JOIN new_types n ON p.bucket = n.bucket
    """,
    tags=("text", "llm", "stats"),
    doc="Heaps'-law vocabulary growth: cumulative distinct types vs "
    "cumulative tokens per 100-doc bucket in doc-id order",
)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    toks = docs.select(
        (F.col("doc_id") / 100).cast("long").alias("bucket"),
        F.col("doc_id"),
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    )
    firsts = toks.groupBy("tok").agg(
        (F.min("doc_id") / 100).cast("long").alias("bucket")
    )
    per_bucket = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    new_types = firsts.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_new"))
    joined = per_bucket.join(new_types, "bucket", "left").select(
        "bucket",
        "n_tokens",
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    from delta_lake_validation_spark.functions.prefix import (
        distributed_prefix_sums,
    )

    cum = distributed_prefix_sums(
        joined,
        {"cum_tokens": F.col("n_tokens"), "cum_types": F.col("n_new")},
        order_by=[F.asc("bucket")],
    )
    return cum.select(
        "bucket",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_types").cast("long").alias("cum_types"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit: slope/intercept of ln(freq) ~ ln(rank) over the
# term frequency table (the standard corpus-health diagnostic: natural text
# sits near slope -1; synthetic or templated corpora flatten).
# At 100 TB: term frequencies are a vocabulary-bounded hash-agg, but a web
# crawl's distinct-token table (typos, URLs, hashes) can still hit 1e8-1e9
# rows — a global row_number() window would pull all of it through one sort
# task.  Ranking instead runs the two-pass distributed rank
# (functions/prefix.py): range-partition by (freq DESC, tok), local
# row_number per slice, broadcast per-slice offsets.  The regression is a
# single scalar aggregate.
# ---------------------------------------------------------------------------
@register(
    "zipf_fit",
    oracle=r"""
    WITH tf AS (
      SELECT u.tok, count(*) AS freq
      FROM documents,
           UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS u(tok)
      GROUP BY u.tok
    ),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
      FROM tf
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST(floor(regr_slope(ln(freq), ln(rank)) * 10000.0 + 0.5)
                / 10000.0 AS DOUBLE) AS zipf_slope,
           CAST(floor(regr_intercept(ln(freq), ln(rank)) * 10000.0 + 0.5)
                / 10000.0 AS DOUBLE) AS zipf_intercept
    FROM ranked
    """,
    tags=("text", "llm", "stats"),
    doc="Zipf rank-frequency regression over the corpus term table "
    "(regr_slope/regr_intercept of ln freq ~ ln rank)",
)
def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_validation_spark.functions.aggregates import round_half_up
    from delta_lake_validation_spark.functions.prefix import distributed_rank

    docs = Tables(spark, sf_dir).documents
    tf = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = distributed_rank(
        tf, order_by=[F.desc("freq"), F.asc("tok")], out="rank"
    ).select("freq", "rank")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        round_half_up(
            F.expr("regr_slope(ln(freq), ln(rank))"), 4
        ).alias("zipf_slope"),
        round_half_up(
            F.expr("regr_intercept(ln(freq), ln(rank))"), 4
        ).alias("zipf_intercept"),
    )


# ---------------------------------------------------------------------------
# Embedding k-means (Lloyd's algorithm, fixed 2 iterations, deterministic):
# the clustering member of the similarity family.  All distance/centroid
# math runs in SHIFTED INTEGER MICRO-SPACE (floor(x·1e6 + 0.5) + 1e6 ≥ 0):
# integer sums are associative, so assignments and updated centroids are
# bit-identical on any engine and any partitioning — which is what lets a
# genuinely iterative algorithm be value-hash graded against DuckDB.
# At 100 TB: assignment is a broadcast-k flat map (no shuffle); the update
# is one partial-aggregated shuffle keyed by (cluster, dim) — k·64 cells
# regardless of corpus size; two bounded centroid collects (k rows each).
# ---------------------------------------------------------------------------
@register(
    "kmeans_clusters",
    oracle=r"""
    WITH emb AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                    + 1000000) AS iv
      FROM embeddings
    ),
    seeds AS (SELECT vec_id AS cid, iv AS c FROM emb WHERE vec_id < 8),
    -- list_sum accumulates through floating point; the per-dim UNNEST sum
    -- stays integer-exact end to end
    d1 AS (
      SELECT e.vec_id, s.cid,
             CAST(sum((e.iv[u.i] - s.c[u.i]) * (e.iv[u.i] - s.c[u.i]))
                  AS BIGINT) AS dist
      FROM emb e CROSS JOIN seeds s, UNNEST(range(1, 65)) u(i)
      GROUP BY e.vec_id, s.cid
    ),
    a1 AS (
      SELECT vec_id, cid, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn FROM d1
      ) WHERE rn = 1
    ),
    cells AS (
      SELECT a1.cid, u.i AS dim, e.iv[u.i] AS val
      FROM a1 JOIN emb e USING (vec_id), UNNEST(range(1, 65)) u(i)
    ),
    upd AS (
      SELECT cid, list((2 * s + n) // (2 * n) ORDER BY dim) AS c
      FROM (SELECT cid, dim, sum(val) AS s, count(*) AS n
            FROM cells GROUP BY cid, dim)
      GROUP BY cid
    ),
    c1 AS (
      SELECT s.cid, coalesce(u.c, s.c) AS c
      FROM seeds s LEFT JOIN upd u ON s.cid = u.cid
    ),
    d2 AS (
      SELECT e.vec_id, c1.cid,
             CAST(sum((e.iv[u.i] - c1.c[u.i]) * (e.iv[u.i] - c1.c[u.i]))
                  AS BIGINT) AS dist
      FROM emb e CROSS JOIN c1, UNNEST(range(1, 65)) u(i)
      GROUP BY e.vec_id, c1.cid
    )
    SELECT vec_id, cid AS cluster, dist AS dist_micro FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cid) AS rn FROM d2
    ) WHERE rn = 1
    """,
    tags=("similarity", "clustering", "llm"),
    doc="k-means over embeddings (k=8, 2 Lloyd iterations, seeds = vec_id "
    "< 8): broadcast-centroid integer-exact assignment, (cluster, dim) "
    "partial-agg centroid update, empty clusters keep their seed",
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Tables(spark, sf_dir).embeddings.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
            "* 1000000 + 0.5) AS BIGINT) + 1000000)"
        ).alias("iv"),
    )
    seeds = emb.filter("vec_id < 8").select(
        F.col("vec_id").alias("cid"), F.col("iv").alias("c")
    )

    def assign(cents: DataFrame) -> DataFrame:
        dist = F.expr(
            "aggregate(zip_with(iv, c, (a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        scored = emb.crossJoin(F.broadcast(cents)).withColumn("dist", dist)
        best = scored.groupBy("vec_id").agg(
            F.min(F.struct("dist", "cid")).alias("b")
        )
        return best.select(
            "vec_id", F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist")
        )

    a1 = assign(seeds)
    cells = (
        a1.join(emb, "vec_id")
        .select("cid", F.posexplode("iv").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    upd = (
        cells.select(
            "cid", "dim", F.expr("(2 * s + n) div (2 * n)").alias("m")
        )
        .groupBy("cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), "
                "x -> x.m)"
            ).alias("c")
        )
    )
    c1 = seeds.select("cid", F.col("c").alias("c0")).join(
        upd, "cid", "left"
    ).select("cid", F.coalesce("c", "c0").alias("c"))
    return assign(c1).select(
        "vec_id", F.col("cid").alias("cluster"), F.col("dist").alias("dist_micro")
    )


@register(
    "mixture_weights",
    oracle="""
    WITH by_lang AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             CAST(sum(CAST(floor(sqrt(n_docs)) AS BIGINT)) AS BIGINT) AS sq
      FROM by_lang
    )
    SELECT b.lang,
           b.n_docs,
           (1000000 * CAST(floor(sqrt(b.n_docs)) AS BIGINT)) // t.sq
             AS w_ppm,
           (1000000 * b.n_docs) // t.total AS natural_ppm,
           (1000 * ((1000000 * CAST(floor(sqrt(b.n_docs)) AS BIGINT)) // t.sq))
             // ((1000000 * b.n_docs) // t.total) AS boost_milli
    FROM by_lang b CROSS JOIN tot t
    ORDER BY b.lang
    """,
    tags=("llm", "curation", "sampling"),
    doc="Temperature-based corpus mixture weights (alpha=0.5, the "
    "multilingual rebalancing recipe: sampling weight proportional to "
    "count^alpha, so rare languages upsample and dominant ones damp).  "
    "Integer-exact: isqrt via correctly-rounded IEEE sqrt (exact for "
    "counts < 2^52), ppm shares by integer division — deterministic "
    "across engines per the repo's rounding discipline.  One tiny "
    "aggregate (|langs| rows) broadcast back over the group row set; at "
    "100 TB the shuffle is the lang-count partial agg only.",
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents
    by_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    isq = F.floor(F.sqrt(F.col("n_docs"))).cast("long")
    tot = by_lang.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.sum(isq).cast("long").alias("sq"),
    )
    w_ppm = F.expr("(1000000 * CAST(floor(sqrt(n_docs)) AS BIGINT)) div sq")
    natural_ppm = F.expr("(1000000 * n_docs) div total")
    return (
        by_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            w_ppm.alias("w_ppm"),
            natural_ppm.alias("natural_ppm"),
            (
                F.expr(
                    "(1000 * ((1000000 * CAST(floor(sqrt(n_docs)) AS BIGINT))"
                    " div sq)) div ((1000000 * n_docs) div total)"
                )
            ).alias("boost_milli"),
        )
        .orderBy("lang")
    )
