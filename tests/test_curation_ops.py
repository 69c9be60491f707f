"""Round-7 curation batch 2 (plans/curation.py): Bloom-prefiltered
decontamination, URL canonicalization dedup, balanced resampling, shard
manifest.  Value semantics are pinned against in-test brute forces and the
Bloom prefilter against its defining guarantees (superset of true matches,
never a false negative; exact result after the confirm join).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_validation_spark.plans.curation import (
    _BLOOM_EVAL_MOD,
    _N_SHARDS,
    _QB,
    _QMIX,
    _QMOD,
    _grams4,
    balanced_resample,
    bloom_decontaminate,
    bloom_prefilter,
    build_bloom_bitmap,
    canonicalize_url,
    quality_linear_score,
    shard_manifest,
    url_canonical_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "webA", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


# ---------------------------------------------------------------------------
# Bloom prefilter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_exact_after_confirm(spark):
    # eval doc 0 shares a 4-gram with docs 1 and 3; doc 2 shares nothing
    shared = "the quick brown fox jumps"
    rows = [
        (0, shared + " over benchmarks"),
        (1, "intro " + shared + " outro words"),
        (2, "completely disjoint vocabulary here now"),
        (3, shared),
    ]
    docs = _docs(spark, rows)
    grams = _grams4(docs)
    eval_grams = grams.filter(F.col("doc_id") == 0).select("g").distinct()
    corpus = grams.filter(F.col("doc_id") != 0)

    bitmap = build_bloom_bitmap(eval_grams)
    survivors = bloom_prefilter(corpus, bitmap)

    truth = corpus.join(eval_grams, "g").select("doc_id", "g").collect()
    got = survivors.join(eval_grams, "g").select("doc_id", "g").collect()
    # no false negative: the confirm join over survivors sees every true pair
    assert sorted((r.doc_id, r.g) for r in got) == sorted(
        (r.doc_id, r.g) for r in truth
    )
    assert {r.doc_id for r in truth} == {1, 3}
    # prefilter passes true matches and (at m=2^20/k=5 over a handful of
    # grams) essentially nothing else
    n_true = len({(r.doc_id, r.g) for r in truth})
    assert survivors.count() >= n_true


def test_bloom_hot_gram_every_doc(spark):
    # adversarial: ONE 4-gram present in every document including the eval
    # slice — every corpus doc must be flagged exactly once for it
    hot = "all rights reserved worldwide"
    rows = [(i, f"doc {i} body {hot}") for i in range(20)]
    docs = _docs(spark, rows)
    grams = _grams4(docs)
    eval_grams = (
        grams.filter(F.col("doc_id") % 5 == 0).select("g").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % 5 != 0)
    bitmap = build_bloom_bitmap(eval_grams)
    out = (
        bloom_prefilter(corpus, bitmap)
        .join(eval_grams, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n"))
        .collect()
    )
    by_doc = {r.doc_id: r.n for r in out}
    assert set(by_doc) == {i for i in range(20) if i % 5 != 0}
    assert all(n >= 1 for n in by_doc.values())


def test_bloom_empty_eval_set(spark):
    docs = _docs(spark, [(1, "some words in a document body here")])
    grams = _grams4(docs)
    empty = grams.filter(F.lit(False)).select("g").distinct()
    bitmap = build_bloom_bitmap(empty)
    assert bloom_prefilter(grams, bitmap).count() == 0


def test_bloom_registered_query_matches_plain_join(spark):
    got = bloom_decontaminate(spark, SF_DIR).collect()
    from delta_lake_validation_spark.tables import Tables

    grams = _grams4(Tables(spark, SF_DIR).documents)
    ev = (
        grams.filter(F.col("doc_id") % _BLOOM_EVAL_MOD == 0)
        .select("g")
        .distinct()
    )
    want = (
        grams.filter(F.col("doc_id") % _BLOOM_EVAL_MOD != 0)
        .join(ev, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
        .collect()
    )
    assert sorted((r.doc_id, r.n_shared_grams) for r in got) == sorted(
        (r.doc_id, r.n_shared_grams) for r in want
    )


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("https://www.site1.example.com/p/9/", "site1.example.com/p/9"),
        ("http://site1.example.com/p/9", "site1.example.com/p/9"),
        (
            "https://site1.example.com/p/9?utm_source=feed&ref=2",
            "site1.example.com/p/9?ref=2",
        ),
        ("http://www.site1.example.com/p/9?utm_campaign=x", "site1.example.com/p/9"),
        ("https://site1.example.com/p/9#sec", "site1.example.com/p/9"),
        (
            "http://site1.example.com/p/9/?ref=2#frag",
            "site1.example.com/p/9/?ref=2",
        ),
        # ADVICE r7 boundary cases: the utm strip is anchored to [?&], so a
        # non-tracking param whose NAME merely contains 'utm_' survives...
        (
            "http://site1.example.com/p/9?gutm_x=1",
            "site1.example.com/p/9?gutm_x=1",
        ),
        # ...as does a VALUE containing 'utm_src='
        (
            "http://site1.example.com/p/9?a=xutm_src=y",
            "site1.example.com/p/9?a=xutm_src=y",
        ),
        # consecutive utm params all stripped, later real param kept
        (
            "http://site1.example.com/p/9?utm_a=1&utm_b=2&ref=3",
            "site1.example.com/p/9?ref=3",
        ),
        (
            "http://site1.example.com/p/9?utm_a=1&utm_b=2",
            "site1.example.com/p/9",
        ),
    ],
)
def test_canonicalize_url_cases(spark, raw, canon):
    row = (
        spark.range(1)
        .select(canonicalize_url(F.lit(raw)).alias("c"))
        .first()
    )
    assert row.c == canon


def test_canonicalize_url_idempotent(spark):
    raws = [
        "https://www.site1.example.com/p/9/?utm_source=a&ref=2#x",
        "http://site2.example.com/p/0",
        "https://www.site3.example.com/p/7?utm_campaign=x",
    ]
    df = spark.createDataFrame([(r,) for r in raws], "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(
        F.col("c"), canonicalize_url(F.col("c")).alias("c2")
    ).collect()
    for r in twice:
        assert r.c == r.c2


def test_url_dedup_groups_noise_variants(spark, tmp_path):
    import pandas as pd

    # doc_ids 3 and 614 share (id % 13, id % 47) and both fall in the
    # no-query class (% 11 in 3..10), so their canonical URLs collide while
    # the raw forms differ (3 gets www., 614 does not) — a guaranteed
    # multi-form group regardless of corpus size
    ids = [3, 614, 10, 20]
    pd.DataFrame(
        [(i, f"text {i}", "en", "webA", 7) for i in ids],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")
    rows = url_canonical_dedup(spark, str(tmp_path)).collect()
    assert rows
    collided = [r for r in rows if r.n_docs > 1]
    assert len(collided) == 1
    assert collided[0].n_docs == 2
    assert collided[0].n_raw_forms == 2  # www. + scheme noise differs
    assert collided[0].keep_doc_id == 3
    # canonical forms carry no noise
    for r in rows:
        assert not r.canon_url.startswith("http")
        assert "utm_" not in r.canon_url and "#" not in r.canon_url
        assert not r.canon_url.endswith(("?", "&"))


def test_canonicalize_url_randomized_properties(spark):
    import random

    rng = random.Random(42)
    urls = []
    for _ in range(200):
        u = rng.choice(["http://", "https://", ""])
        u += rng.choice(["www.", ""])
        u += f"h{rng.randrange(20)}.example.com/p/{rng.randrange(50)}"
        u += rng.choice(["/", ""])
        q = rng.choice(
            ["", "?ref=1", "?utm_source=a", "?utm_source=a&ref=2",
             "?ref=2&utm_medium=b", "?utm_a=1&utm_b=2"]
        )
        u += q + rng.choice(["", "#frag"])
        urls.append(u)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        "u",
        canonicalize_url(F.col("u")).alias("c"),
        canonicalize_url(canonicalize_url(F.col("u"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c == r.c2, (r.u, r.c, r.c2)  # idempotent
        assert not r.c.startswith(("http", "www."))
        assert "#" not in r.c and "utm_" not in r.c
        assert not r.c.endswith(("?", "&"))
        # non-tracking params survive
        if "ref=" in r.u.split("#")[0]:
            assert "ref=" in r.c, (r.u, r.c)


def test_containment_ignores_docs_without_shingles(spark):
    from delta_lake_validation_spark.operators.dedup import containment_pairs

    docs = _docs(
        spark,
        [
            (1, "one two"),  # < 3 tokens: no 3-gram shingles
            (2, "one two three four five"),
            (3, "one two three four five six"),
        ],
    )
    rows = containment_pairs(spark, docs, threshold=0.8, k=3).collect()
    # doc 1 has an empty shingle set: it must appear on NEITHER side
    # (containment over an empty set is undefined, not vacuously true)
    assert all(r.a_doc != 1 and r.b_doc != 1 for r in rows)
    # doc 2's 3 shingles are all inside doc 3
    assert any((r.a_doc, r.b_doc) == (2, 3) and r.n_shared == r.sz_a for r in rows)


# ---------------------------------------------------------------------------
# Balanced resample
# ---------------------------------------------------------------------------


def test_balanced_resample_keeps_min_source_and_bounds(spark, tmp_path):
    import pandas as pd

    # 3 sources with 5 / 50 / 500 docs
    rows = []
    i = 0
    for src, n in (("tiny", 5), ("mid", 50), ("big", 500)):
        for _ in range(n):
            rows.append((i, f"text {i}", "en", src, 7))
            i += 1
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = {r.source: r for r in balanced_resample(spark, str(tmp_path)).collect()}
    assert out["tiny"].thr == 1048576 and out["tiny"].n_kept == 5
    assert out["mid"].thr == 1048576 * 5 // 50
    assert out["big"].thr == 1048576 * 5 // 500
    # md5 draws are uniform-ish: kept counts land near n_min with slack
    assert 0 <= out["mid"].n_kept <= 50
    assert 0 <= out["big"].n_kept <= 500
    # determinism: identical on re-run
    again = {r.source: r for r in balanced_resample(spark, str(tmp_path)).collect()}
    assert {k: (v.n_kept, v.thr) for k, v in out.items()} == {
        k: (v.n_kept, v.thr) for k, v in again.items()
    }


# ---------------------------------------------------------------------------
# Content-defined chunking
# ---------------------------------------------------------------------------


def _cdc_digests(spark, texts):
    from delta_lake_validation_spark.plans.curation import cdc_chunks

    docs = _docs(spark, list(enumerate(texts)))
    rows = cdc_chunks(docs).collect()
    out = {}
    for r in rows:
        out.setdefault(r.doc_id, []).append((r.chunk_id, r.digest, r.n_tokens))
    return {k: sorted(v) for k, v in out.items()}


def test_cdc_chunks_cover_document(spark):
    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(50)}" for _ in range(300)]
    text = " ".join(words)
    chunks = _cdc_digests(spark, [text])[0]
    # chunk ids contiguous from 0, token counts sum to the document
    ids = [c[0] for c in chunks]
    assert ids == list(range(len(ids)))
    assert sum(c[2] for c in chunks) == len(words)


def test_cdc_resynchronizes_after_edit(spark):
    import random

    rng = random.Random(11)
    words = [f"t{rng.randrange(80)}" for _ in range(400)]
    base = " ".join(words)
    edited = " ".join(words[:5] + ["INSERTED"] + words[5:])
    d = _cdc_digests(spark, [base, edited])
    base_digests = {c[1] for c in d[0]}
    edited_digests = [c[1] for c in d[1]]
    # the defining CDC property: one early insertion perturbs only the
    # chunks around the edit — boundaries re-synchronize and the long
    # shared tail still produces identical digests (a fixed-stride chunker
    # would shift EVERY downstream boundary and share ~nothing)
    shared = sum(1 for g in edited_digests if g in base_digests)
    assert shared >= len(edited_digests) - 3, (
        shared,
        len(edited_digests),
    )
    # and the perturbed region does differ
    assert set(edited_digests) != base_digests


def test_cdc_duplicate_counts(spark, tmp_path):
    import pandas as pd

    from delta_lake_validation_spark.plans.curation import cdc_chunk_dedup

    body = "alpha beta gamma delta epsilon zeta eta theta " * 6
    texts = [body, body, "unique words only here nothing shared at all"]
    pd.DataFrame(
        [(i, t, "en", "webA", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")
    got = {r.doc_id: r for r in cdc_chunk_dedup(spark, str(tmp_path)).collect()}
    # identical docs: every chunk duplicated
    assert got[0].n_dup_chunks == got[0].n_chunks
    assert got[1].n_dup_chunks == got[1].n_chunks
    # disjoint doc: nothing duplicated
    assert got[2].n_dup_chunks == 0


# ---------------------------------------------------------------------------
# Hashed linear quality scorer
# ---------------------------------------------------------------------------


def test_quality_linear_score_matches_python_brute_force(spark, tmp_path):
    import hashlib

    import pandas as pd

    texts = [
        "the quick brown fox",
        "lorem ipsum dolor sit amet",
        "the the the the",
        "one",
    ]
    pd.DataFrame(
        [(i, t, "en", "webA", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")

    def score(text):
        s = 0
        toks = text.lower().strip().split()
        for tok in toks:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % _QB
            s += (b * _QMIX) % _QMOD - (_QMOD - 1) // 2
        return len(toks), s

    got = {
        r.doc_id: (r.n_tokens, r.score_raw, r.label)
        for r in quality_linear_score(spark, str(tmp_path)).collect()
    }
    for i, t in enumerate(texts):
        n, s = score(t)
        assert got[i] == (n, s, "keep" if s >= 0 else "drop"), (i, t)


# ---------------------------------------------------------------------------
# Containment join
# ---------------------------------------------------------------------------


def test_containment_catches_inclusion_jaccard_misses(spark):
    from delta_lake_validation_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the five boxing wizards jump quickly tonight"
    long_body = " ".join(f"w{i} w{i+1} filler{i}" for i in range(60))
    docs = _docs(
        spark,
        [
            (1, quote),  # short doc
            (2, long_body + " " + quote + " " + long_body),  # contains it
            (3, "completely unrelated text with different words entirely"),
        ],
    )
    cont = containment_pairs(spark, docs, threshold=0.8, k=3).collect()
    pairs = {(r.a_doc, r.b_doc) for r in cont}
    # doc 1's trigrams all occur inside doc 2 -> containment 1.0
    assert (1, 2) in pairs
    # asymmetry: doc 2 is NOT contained in doc 1
    assert (2, 1) not in pairs
    # the symmetric Jaccard join cannot see this pair at the same threshold
    jac = ngram_jaccard_pairs(spark, docs, threshold=0.8, k=3).collect()
    assert not any(
        {r.left_doc, r.right_doc} == {1, 2} for r in jac
    )
    # exact counts: every shared gram of doc 1 is reported
    r12 = next(r for r in cont if (r.a_doc, r.b_doc) == (1, 2))
    assert r12.n_shared == r12.sz_a


def test_containment_prefix_filter_is_lossless_on_brute_force(spark):
    import itertools
    import random

    from delta_lake_validation_spark.operators.dedup import containment_pairs

    rng = random.Random(13)
    vocab = [f"v{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(6, 30)))
        for _ in range(18)
    ]
    docs = _docs(spark, list(enumerate(texts)))
    got = {
        (r.a_doc, r.b_doc): (r.n_shared, r.sz_a)
        for r in containment_pairs(spark, docs, threshold=0.8, k=3).collect()
    }

    def grams(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    gs = {i: grams(t) for i, t in enumerate(texts)}
    want = {}
    for a, b in itertools.permutations(range(len(texts)), 2):
        shared = len(gs[a] & gs[b])
        if gs[a] and shared * 5 >= 4 * len(gs[a]):
            want[(a, b)] = (shared, len(gs[a]))
    assert got == want


# ---------------------------------------------------------------------------
# Count-min heavy hitters
# ---------------------------------------------------------------------------


def test_cms_overestimates_never_underestimates(spark, tmp_path):
    import pandas as pd

    from delta_lake_validation_spark.plans.curation import heavy_hitters_cms

    # skewed corpus: 'hot' dominates, long tail of singletons
    texts = ["hot " * 30 + f"tail{i} rare{i}" for i in range(25)]
    pd.DataFrame(
        [(i, t.strip(), "en", "webA", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")
    rows = heavy_hitters_cms(spark, str(tmp_path)).collect()
    assert rows[0].tok == "hot" and rows[0].n_exact == 750
    for r in rows:
        # the CMS guarantee: estimate >= true count, always
        assert r.n_est >= r.n_exact, (r.tok, r.n_exact, r.n_est)


# ---------------------------------------------------------------------------
# Int8-quantized ANN
# ---------------------------------------------------------------------------


def test_quantized_topk_recall_vs_float_anchor(spark):
    from pyspark.sql import functions as SF

    from delta_lake_validation_spark.operators.similarity import (
        cosine_topk,
        quantized_topk,
    )
    from delta_lake_validation_spark.tables import Tables

    emb = Tables(spark, SF_DIR).embeddings
    q = emb.filter(SF.col("vec_id") % 100 == 0).select(
        SF.col("vec_id").alias("query_id"), SF.col("embedding").alias("qe")
    )
    exact = cosine_topk(spark, emb, q, k=10).collect()
    quant = quantized_topk(spark, emb, q, k=10).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    e, qn = by_query(exact), by_query(quant)
    assert set(e) == set(qn)
    recalls = [len(e[k_] & qn[k_]) / len(e[k_]) for k_ in e]
    # int8 at scale 256 on these +-0.37 vectors keeps ~94 levels — note
    # the float anchor ranks by COSINE (normalized) while the quantized
    # path ranks by raw dot product, so recall measures both quantization
    # loss and the norm term; random 64-d vectors are the worst case
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_quantized_topk_deterministic_and_exact_scores(spark):
    import numpy as np

    from delta_lake_validation_spark.operators.similarity import (
        quantized_topk,
    )

    rows = []
    rng = np.random.default_rng(3)
    for i in range(40):
        rows.append((i, [float(x) for x in rng.uniform(-0.4, 0.4, 16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS qe"
    )
    got = quantized_topk(spark, emb, q, k=5).collect()
    # brute force in numpy with the same quantizer (float32 path, proving
    # precision-independence of the power-of-two scale)
    mats = {i: np.asarray(v, dtype=np.float32) for i, v in rows}
    z = {
        i: np.clip(np.floor(m * 256), -128, 127).astype(np.int64)
        for i, m in mats.items()
    }
    for r in got:
        want = int(z[r.query_id] @ z[r.neighbor_id])
        assert r.score_q == want
    again = quantized_topk(spark, emb, q, k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# Shard manifest
# ---------------------------------------------------------------------------


def test_shard_manifest_contiguous_and_complete(spark):
    from delta_lake_validation_spark.tables import Tables

    docs = Tables(spark, SF_DIR).documents
    n_docs = docs.count()
    total = docs.agg(F.sum("n_chars")).first()[0]
    max_chars = docs.agg(F.max("n_chars")).first()[0]
    target = (total + _N_SHARDS - 1) // _N_SHARDS

    rows = sorted(shard_manifest(spark, SF_DIR).collect(), key=lambda r: r.shard_id)
    assert rows[0].shard_id == 0 and rows[-1].shard_id <= _N_SHARDS - 1
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.shard_chars for r in rows) == total
    # contiguity in doc_id order
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc < b.first_doc
        assert b.shard_id == a.shard_id + 1
    # balance: a shard holds at most target + one straddling document
    for r in rows:
        assert r.shard_chars <= target + max_chars
