"""Property tests: incremental index dedup equals the direct cross-set
answer on random corpora, and chunking invariants hold for random size/
stride — the SURVEY §5 randomized-evidence style applied to the round-3
operators.  Small example counts: each example runs Spark jobs."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from delta_lake_validation_spark.operators.dedup import (
    build_shingle_index,
    incremental_jaccard_pairs,
    ngram_jaccard_pairs,
)
from delta_lake_validation_spark.operators.text import chunk_documents

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _random_docs(seed: int, n: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        if docs and rng.random() < 0.4:
            # near-dup of an earlier doc: copy + small mutation
            base = rng.choice(docs)[1].split()
            if rng.random() < 0.5 and len(base) > 4:
                base[rng.randrange(len(base))] = rng.choice(_WORDS)
            docs.append((i, " ".join(base)))
        else:
            docs.append(
                (i, " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 12))))
            )
    return docs


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_incremental_equals_direct_cross_pairs(spark, seed):
    docs = _random_docs(seed, 14)
    rng = random.Random(seed + 1)
    batch_ids = {i for i, _ in docs if rng.random() < 0.4}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    corpus = df.filter(~df.doc_id.isin(list(batch_ids) or [-1]))
    batch = df.filter(df.doc_id.isin(list(batch_ids) or [-1]))
    idx = build_shingle_index(corpus)
    got = {
        (r.new_doc, r.corpus_doc, r.jaccard)
        for r in incremental_jaccard_pairs(spark, batch, idx, threshold=0.6).collect()
    }
    want = set()
    for r in ngram_jaccard_pairs(spark, df, threshold=0.6).collect():
        l_b, r_b = r.left_doc in batch_ids, r.right_doc in batch_ids
        if l_b and not r_b:
            want.add((r.left_doc, r.right_doc, r.jaccard))
        elif r_b and not l_b:
            want.add((r.right_doc, r.left_doc, r.jaccard))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    size=st.integers(2, 9),
    overlap=st.integers(0, 5),
)
def test_chunking_invariants(spark, seed, size, overlap):
    stride = max(1, size - overlap)
    docs = spark.createDataFrame(
        _random_docs(seed, 6), "doc_id long, text string"
    )
    rows = chunk_documents(docs, size=size, stride=stride).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        toks = texts[doc_id].strip().split()
        chunks.sort(key=lambda r: r.chunk_id)
        # chunk ids dense from 0; every token covered; stride positions hold
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert (len(chunks) - 1) * stride < len(toks) <= len(chunks) * stride \
            or len(chunks) * stride >= len(toks)
        for c in chunks:
            start = c.chunk_id * stride
            expect = toks[start : start + size]
            assert c.chunk_text.split() == expect
            assert c.n_tokens == len(expect)
