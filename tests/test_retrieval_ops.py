"""Unit-level invariants for the round-8 retrieval family
(plans/retrieval.py) — oracle parity covers value equality; these pin the
impact-cap contract that parity at small SF can't distinguish (every
postings list at test scale sits under the shipped cap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_validation_spark.plans.retrieval import (
    _BM25_IMPACT_M,
    _impact_cap,
    bm25_topk,
)

from .conftest import SF_DIR


def test_impact_cap_prunes_and_keeps_highest(spark):
    # one hot term (12 postings), one cold term (2 postings), m=5
    rows = [("hot", i, float(100 - i)) for i in range(12)] + [
        ("cold", 1, 1.0),
        ("cold", 2, 0.5),
    ]
    contrib = spark.createDataFrame(rows, ["term", "doc_id", "s"])
    out = _impact_cap(contrib, 5).toPandas()
    hot = out[out.term == "hot"]
    assert len(hot) == 5
    # highest-impact entries survive (s = 100-i, so doc_ids 0..4)
    assert sorted(hot.doc_id.tolist()) == [0, 1, 2, 3, 4]
    assert len(out[out.term == "cold"]) == 2  # under the cap: untouched


def test_impact_cap_tie_break_is_doc_id(spark):
    rows = [("t", i, 1.0) for i in range(10)]  # all scores tied
    contrib = spark.createDataFrame(rows, ["term", "doc_id", "s"])
    out = _impact_cap(contrib, 3).toPandas()
    assert sorted(out.doc_id.tolist()) == [0, 1, 2]


def test_bm25_cap_is_noop_at_test_scale(spark):
    # at sf0.001 every postings list is far below _BM25_IMPACT_M, so the
    # capped operator must equal exhaustive scoring — verified by comparing
    # against the same pipeline with the cap effectively removed
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    max_df = (
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
            "doc_id",
        )
        .filter(F.col("term") != "")
        .distinct()
        .groupBy("term")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_df < _BM25_IMPACT_M
    out = bm25_topk(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # rank is dense 1..k per query
    for _, g in out.groupby("query_doc"):
        assert sorted(g.rnk.tolist()) == list(range(1, len(g) + 1))


# ---------------------------------------------------------------------------
# bpe_train: the distributed loop must reproduce an independent pure-Python
# reference trainer exactly (same corpus, same tie-break)
# ---------------------------------------------------------------------------
def _py_bpe_train(word_freqs, n_merges):
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    import re

    from delta_lake_validation_spark.operators.text import bpe_train

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    freqs = {}
    for r in docs.select("text").collect():
        for w in re.split("[^a-z]+", r.text.lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    expect = _py_bpe_train(freqs, 8)
    got = bpe_train(spark, docs, n_merges=8)
    assert got == expect


def test_bpe_train_first_merge_is_pair_counts_argmax(spark):
    from delta_lake_validation_spark.operators.text import bpe_train
    from delta_lake_validation_spark.plans.retrieval import bpe_pair_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    top = bpe_pair_counts(spark, SF_DIR).first()
    (first, *_rest) = bpe_train(spark, docs, n_merges=1)
    assert first[0] + first[1] == top.pair


def test_bpe_train_merges_well_formed(spark):
    # a learned table only ranks a pair after both halves exist (single
    # chars or products of earlier merges) — the property BPE_MERGES
    # documents and the encoder's equivalence argument relies on
    from delta_lake_validation_spark.operators.text import bpe_train

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = bpe_train(spark, docs, n_merges=8)
    assert len(merges) == 8
    known = set()
    for a, b in merges:
        for half in (a, b):
            assert len(half) == 1 or half in known, (a, b)
        known.add(a + b)


# ---------------------------------------------------------------------------
# r9: bpe_train applies BATCHES of provably-safe merges per round.  The
# reference-equality test above pins end-to-end correctness; these pin the
# batching itself — that multi-merge batches really fire (the optimization
# is live, not dead code) and that the selection rules stop where the
# sequential-argmax argument stops holding.
# ---------------------------------------------------------------------------
def _row(l, r, cnt):
    from pyspark.sql import Row

    return Row(l=l, r=r, cnt=cnt)


def test_select_merge_batch_rules():
    from delta_lake_validation_spark.operators.text import _select_merge_batch

    # disjoint pairs with strictly separated counts: all taken (the bound
    # for (a,b) is max over existing (x,a)/(b,y) pairs — absent here, so 0)
    tbl = [_row("a", "b", 100), _row("c", "d", 50), _row("e", "f", 25)]
    assert _select_merge_batch(tbl, 10) == [("a", "b"), ("c", "d"), ("e", "f")]
    # max_n truncates the prefix
    assert _select_merge_batch(tbl, 2) == [("a", "b"), ("c", "d")]
    # symbol overlap stops the batch (second pair's count changed by the
    # first merge — the next round must re-count)
    tbl = [_row("a", "b", 100), _row("b", "c", 50), _row("e", "f", 25)]
    assert _select_merge_batch(tbl, 10) == [("a", "b")]
    # created-pair bound: (x,a)=(q,a,cnt 60) means merging (a,b) can mint a
    # (q,ab) pair with count up to 60 > 50, which would outrank (c,d) in the
    # sequential order — batch must stop before (c,d).  (q,a) itself ranks
    # below (a,b) only via the count, keep it third.
    tbl = [_row("a", "b", 100), _row("c", "d", 50), _row("q", "a", 60)]
    # table must be count-sorted: (a,b) 100, (q,a) 60, (c,d) 50
    tbl = [_row("a", "b", 100), _row("q", "a", 60), _row("c", "d", 50)]
    assert _select_merge_batch(tbl, 10) == [("a", "b")]
    # existing-symbol collision: if the token "ab" already exists as a
    # symbol (appears as l or r), counts of existing (x,'ab') pairs could
    # INCREASE after the merge — bound is +inf, batch stops after it
    tbl = [_row("a", "b", 100), _row("ab", "z", 1), _row("c", "d", 50)]
    tbl = sorted(tbl, key=lambda r: (-r.cnt, r.l, r.r))
    assert _select_merge_batch(tbl, 10) == [("a", "b")]


def test_bpe_train_batching_fires_and_matches_reference(spark, monkeypatch):
    import re

    from delta_lake_validation_spark.operators import text as text_mod

    # corpus engineered so several disjoint high-gap pairs coexist:
    # batches >1 must fire, AND chained merges (ab+c) must still happen in
    # the right sequential order across rounds
    words = (
        ["abab"] * 64 + ["cdcd"] * 32 + ["efef"] * 16 + ["abcd"] * 8 + ["gg"] * 4
    )
    docs = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "doc_id long, text string")
    freqs = {}
    for w in words:
        for t in re.split("[^a-z]+", w.lower()):
            if t:
                freqs[t] = freqs.get(t, 0) + 1
    expect = _py_bpe_train(freqs, 10)

    calls = []
    real = text_mod._select_merge_batch

    def spy(tbl, max_n):
        batch = real(tbl, max_n)
        calls.append(len(batch))
        return batch

    monkeypatch.setattr(text_mod, "_select_merge_batch", spy)
    got = text_mod.bpe_train(spark, docs, n_merges=10)
    assert got == expect
    assert max(calls) > 1, f"batching never fired: batch sizes {calls}"
    assert sum(calls) == len(got) and len(calls) < len(got)
