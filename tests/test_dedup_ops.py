"""Operator-level properties of the dedup family (operators/dedup.py), beyond
the registry's oracle parity: the approximate paths must agree with the exact
path where their guarantees say they must."""

from __future__ import annotations

import pytest

from delta_lake_validation_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from delta_lake_validation_spark.tables import Tables

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return Tables(spark, SF_DIR).documents


def test_lsh_recall_on_strong_pairs(spark, docs):
    """Pairs with true J >= 0.9 are caught by 8x4 banding with
    probability 1-(1-0.9^4)^8 ~ 0.9998 each; on this corpus all must hit."""
    exact = {
        (r.left_doc, r.right_doc)
        for r in ngram_jaccard_pairs(spark, docs, threshold=0.9).collect()
    }
    assert exact  # corpus contains planted near-dups
    lsh = {
        (r.left_doc, r.right_doc)
        for r in minhash_lsh_pairs(spark, docs, threshold=0.5).collect()
    }
    missed = exact - lsh
    assert not missed, f"LSH missed strong pairs: {missed}"


def test_lsh_estimates_track_truth(spark, docs):
    truth = {
        (r.left_doc, r.right_doc): r.jaccard
        for r in ngram_jaccard_pairs(spark, docs, threshold=0.8).collect()
    }
    est = {
        (r.left_doc, r.right_doc): r.est_jaccard
        for r in minhash_lsh_pairs(spark, docs, threshold=0.5).collect()
    }
    for pair, j in truth.items():
        if pair in est:
            assert abs(est[pair] - j) < 0.35  # 32-perm estimator tolerance


def test_simhash_finds_near_identical_docs(spark, docs):
    exact = {
        (r.left_doc, r.right_doc)
        for r in ngram_jaccard_pairs(spark, docs, threshold=0.95).collect()
    }
    sh = {
        (r.left_doc, r.right_doc)
        for r in simhash_pairs(spark, docs, max_hamming=2).collect()
    }
    # near-identical token multisets hash to near-identical simhashes
    overlap = exact & sh
    assert len(overlap) >= len(exact) * 0.5


def test_dedup_clusters_paths_agree(spark, docs):
    from delta_lake_validation_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(spark, docs, threshold=0.8)
    fast = {(r.id, r.cluster_id) for r in dedup_clusters(spark, pairs).collect()}
    dist = {
        (r.id, r.cluster_id)
        for r in dedup_clusters(spark, pairs, driver_threshold=0).collect()
    }
    assert fast == dist and fast
    # every cluster_id is the minimum member of its cluster
    by_cluster = {}
    for node, c in fast:
        by_cluster.setdefault(c, []).append(node)
    for c, members in by_cluster.items():
        assert c == min(members + [c])


def test_asof_join_strict_and_inclusive(spark):
    from delta_lake_validation_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")], "k INT, t INT, name STRING"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 19, 190.0), (2, 16, 160.0)], "k INT, t INT, px DOUBLE"
    )
    incl = {
        r.name: r.px
        for r in asof_join(left, right, ["k"], "t", ["px"]).collect()
    }
    # inclusive: t=10 matches the t=10 tick; t=20 takes latest (t=19);
    # k=2 at t=15 has no tick at-or-before -> null
    assert incl == {"a": 100.0, "b": 190.0, "c": None}
    strict = {
        r.name: r.px
        for r in asof_join(left, right, ["k"], "t", ["px"], strict=True).collect()
    }
    assert strict == {"a": None, "b": 190.0, "c": None}


def test_vector_udfs_match_hof_expressions(spark):
    """functions/vectors pandas UDFs agree with the interpreted HOF forms
    (zip_with+aggregate) they replace on the hot path."""
    from pyspark.sql import functions as F

    from delta_lake_validation_spark.functions.vectors import cosine_sim, dot_product

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]), ([0.5, 0.0, -1.0], [1.0, 1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    hof_dot = F.aggregate(
        F.zip_with("a", "b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    rows = df.select(
        dot_product("a", "b").alias("d"),
        hof_dot.alias("d_hof"),
        cosine_sim("a", "b").alias("c"),
        F.round(
            hof_dot
            / (
                F.sqrt(F.aggregate(F.zip_with("a", "a", lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v))
                * F.sqrt(F.aggregate(F.zip_with("b", "b", lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v))
            ),
            6,
        ).alias("c_hof"),
    ).collect()
    for r in rows:
        assert abs(r.d - r.d_hof) < 1e-9
        assert abs(r.c - r.c_hof) < 1e-9


def test_incremental_matches_batch_cross_pairs(spark, docs, tmp_path):
    """Index-backed incremental dedup equals the direct cross-set answer:
    persist the corpus index to parquet (round-trip, as a real ingestion
    pipeline would), then dedup the batch against the reloaded index and
    compare with ngram_jaccard_pairs restricted to cross-split pairs."""
    from delta_lake_validation_spark.operators.dedup import (
        build_shingle_index,
        incremental_jaccard_pairs,
    )

    corpus = docs.filter("doc_id % 10 != 0")
    batch = docs.filter("doc_id % 10 = 0")
    idx = build_shingle_index(corpus)
    for name in ("dfreq", "pos", "sets"):
        idx[name].write.mode("overwrite").parquet(str(tmp_path / name))
    reloaded = {
        name: spark.read.parquet(str(tmp_path / name))
        for name in ("dfreq", "pos", "sets")
    }
    got = {
        (r.new_doc, r.corpus_doc, r.jaccard)
        for r in incremental_jaccard_pairs(
            spark, batch, reloaded, threshold=0.8
        ).collect()
    }
    # direct answer: full self-join pairs, keep only cross-split ones
    full = ngram_jaccard_pairs(spark, docs, threshold=0.8).collect()
    want = set()
    for r in full:
        l_new, r_new = r.left_doc % 10 == 0, r.right_doc % 10 == 0
        if l_new and not r_new:
            want.add((r.left_doc, r.right_doc, r.jaccard))
        elif r_new and not l_new:
            want.add((r.right_doc, r.left_doc, r.jaccard))
    assert got == want and got  # non-empty on this corpus


def test_incremental_handles_unseen_shingles(spark):
    """Batch docs whose shingles are absent from the corpus (df=0 ranks)
    must not break losslessness: an identical pair is still found and an
    unrelated doc produces nothing."""
    from delta_lake_validation_spark.operators.dedup import (
        build_shingle_index,
        incremental_jaccard_pairs,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (11, "totally novel words never indexed anywhere here"),
        ],
        "doc_id long, text string",
    )
    idx = build_shingle_index(corpus)
    rows = incremental_jaccard_pairs(spark, batch, idx, threshold=0.8).collect()
    assert {(r.new_doc, r.corpus_doc) for r in rows} == {(10, 1)}
    assert rows[0].jaccard == 1.0


def test_chunking_udtf_matches_catalyst(spark, docs):
    """The Python UDTF chunker and the Catalyst sequence/explode/slice form
    produce identical rows (SURVEY 2.11 demo contract)."""
    from delta_lake_validation_spark.operators.text import (
        chunk_documents,
        chunk_documents_udtf,
    )

    sample = docs.limit(50)
    jvm = {
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_documents(sample).collect()
    }
    py = {
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_documents_udtf(spark, sample).collect()
    }
    assert jvm == py and jvm
    # overlap invariant: consecutive chunks share size-stride tokens
    one = [r for r in jvm if r[1] in (0, 1)]
    by_doc = {}
    for doc, cid, n, txt in one:
        by_doc.setdefault(doc, {})[cid] = txt.split()
    multi = [v for v in by_doc.values() if len(v) == 2]
    assert multi
    for v in multi:
        assert v[0][48:] == v[1][: len(v[0][48:])]
