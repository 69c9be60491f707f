"""Round-7 regression pins (VERDICT.md r6 "What's wrong" findings 1-5).

The five text/curation queries that still computed corpus statistics with
hot-key windows now use hash-agg join-backs (token_df_stats,
boilerplate_spans) or the two-pass distributed prefix/rank recipe
(sequence_pack, chars_decile, zipf_fit — functions/prefix.py).  These tests
pin value-identical semantics on an adversarial hot-key fixture (a stop
word in EVERY doc, a boilerplate 3-gram in most docs, one language and one
source owning most rows) against independent Python brute forces, and the
helper itself against Spark's own single-window form across partition
counts.
"""

from __future__ import annotations

import math
import os
import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from delta_lake_validation_spark.functions.prefix import (
    distributed_prefix_sum,
    distributed_rank,
)
from delta_lake_validation_spark.plans.llm import (
    boilerplate_spans,
    chars_decile,
    sequence_pack,
    token_df_stats,
    zipf_fit,
)

HOT3 = "all rights reserved"


def _mk_corpus():
    """~420 docs: 'the' in every doc (hot token: df == n_docs), the HOT3
    3-gram in 400 of them (hot span), 'en' owning ~90% of rows (hot NTILE
    stratum), one source owning ~95% (hot cumsum shard)."""
    rng = random.Random(7)
    docs = []
    for d in range(420):
        lang = "en" if d % 10 else "fr"
        source = "web" if d % 20 else "books"
        words = [f"u{d}w{i}" for i in range(rng.randint(3, 12))]
        body = f"the {' '.join(words)}"
        if d < 400:
            body += f" {HOT3} the end{d}"
        docs.append((d, body, lang, source))
    return docs


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("hotkeys")
    rows = [
        Row(doc_id=d, text=t, lang=lang, source=source, n_chars=len(t))
        for d, t, lang, source in _mk_corpus()
    ]
    spark.createDataFrame(rows).coalesce(3).write.parquet(
        os.path.join(str(base), "documents.parquet")
    )
    return str(base)


def test_token_df_stats_hot_token(spark, hot_dir):
    docs = _mk_corpus()
    toks = {d: set(t.strip().lower().split()) for d, t, _, _ in docs}
    df = Counter(tok for s in toks.values() for tok in s)
    assert df["the"] == len(docs)  # the fixture really is hot
    want = {
        d: (
            len(s),
            sum(df[tok] for tok in s),
            sum(1 for tok in s if df[tok] == 1),
        )
        for d, s in toks.items()
    }
    got = {
        r.doc_id: (r.n_unique, r.sum_df, r.n_hapax)
        for r in token_df_stats(spark, hot_dir).collect()
    }
    assert got == want


def test_boilerplate_spans_hot_span(spark, hot_dir):
    docs = _mk_corpus()
    spans = {}
    for d, t, _, _ in docs:
        w = t.strip().lower().split()
        spans[d] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    df = Counter(s for ss in spans.values() for s in ss)
    assert df[HOT3] == 400
    want = {}
    for d, ss in spans.items():
        boiler = sum(1 for s in ss if df[s] >= 3)
        want[d] = (len(ss), boiler, boiler * 1000 // len(ss))
    got = {
        r.doc_id: (r.n_spans, r.boiler_spans, r.boiler_permille)
        for r in boilerplate_spans(spark, hot_dir).collect()
    }
    assert got == want


def test_sequence_pack_hot_source(spark, hot_dir):
    budget = 512
    per_source = defaultdict(list)
    for d, t, _, source in _mk_corpus():
        per_source[source].append((d, len(t.strip().split())))
    want = defaultdict(lambda: [0, 0, None, None])
    for source, rows in per_source.items():
        before = 0
        for d, n in sorted(rows):
            cid = before // budget
            agg = want[(source, cid)]
            agg[0] += 1
            agg[1] += n
            agg[2] = d if agg[2] is None else min(agg[2], d)
            agg[3] = d if agg[3] is None else max(agg[3], d)
            before += n
    got = {
        (r.source, r.chunk_id): [r.n_docs, r.chunk_tokens, r.first_doc, r.last_doc]
        for r in sequence_pack(spark, hot_dir).collect()
    }
    assert got == {k: list(v) for k, v in want.items()}


def _ntile(rank: int, n: int, k: int = 10) -> int:
    q, rem = divmod(n, k)
    if rank <= (q + 1) * rem:
        return (rank + q) // (q + 1)
    return rem + (rank - (q + 1) * rem + q - 1) // q


def test_chars_decile_hot_lang(spark, hot_dir):
    per_lang = defaultdict(list)
    for d, t, lang, _ in _mk_corpus():
        per_lang[lang].append((len(t), d))
    want = {}
    for lang, rows in per_lang.items():
        for rank, (_, d) in enumerate(sorted(rows), start=1):
            want[d] = _ntile(rank, len(rows))
    got = {r.doc_id: r.decile for r in chars_decile(spark, hot_dir).collect()}
    assert got == want


def test_zipf_fit_matches_brute_force(spark, hot_dir):
    freqs = Counter(
        tok for _, t, _, _ in _mk_corpus() for tok in t.strip().lower().split()
    )
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(r) for r in range(1, len(ranked) + 1)]
    ys = [math.log(f) for _, f in ranked]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    intercept = my - slope * mx
    row = zipf_fit(spark, hot_dir).collect()[0]
    assert row.n_terms == n
    assert row.zipf_slope == pytest.approx(slope, abs=2e-4)
    assert row.zipf_intercept == pytest.approx(intercept, abs=2e-4)


@pytest.mark.parametrize("parts", [2, 7, 32])
def test_distributed_prefix_sum_equals_window(spark, parts):
    rng = random.Random(parts)
    rows = [
        Row(k="hot" if i % 4 else f"k{i % 5}", i=i, v=rng.randint(-50, 50))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows)
    w = (
        Window.partitionBy("k")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.k, r.i): r.c
        for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }
    got = {
        (r.k, r.i): r.c
        for r in distributed_prefix_sum(
            df, F.col("v"), order_by=["i"], partition_by=["k"], out="c",
            num_partitions=parts,
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("parts", [2, 32])
def test_distributed_rank_global_order(spark, parts):
    rng = random.Random(99)
    # heavy ties on freq force the tok tiebreaker across range boundaries
    rows = [Row(tok=f"t{i:05d}", freq=rng.randint(1, 8)) for i in range(2500)]
    df = spark.createDataFrame(rows)
    want = {
        r.tok: r.rank
        for r in df.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("tok"))),
        ).collect()
    }
    got = {
        r.tok: r.rank
        for r in distributed_rank(
            df,
            order_by=[F.desc("freq"), F.asc("tok")],
            num_partitions=parts,
        ).collect()
    }
    assert got == want
