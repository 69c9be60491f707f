"""Round-6 regression pins (VERDICT.md r5 "Next round" items 1-2).

1. Skew-proofed first-occurrence marking in the span/chunk dedup family:
   an adversarial hot-digest fixture (one boilerplate 20-gram recurring
   across hundreds of docs — the corpus shape a per-digest window would
   serialize on) checked against an independent Python brute force.
2. O(spans) span cut + cleaned-corpus materialization (dup_span_cleaned /
   cleaned_documents) including the write-back round trip.
"""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict

import pytest
from pyspark.sql import Row

from delta_lake_validation_spark.plans.llm import (
    chunk_dedup,
    cleaned_documents,
    dup_ngram_spans,
    dup_span_cleaned,
    dup_span_removal,
)

K = 20

BOILER = " ".join(f"boiler{i}" for i in range(K))
# a 25-token shared run -> produces windows at 6 consecutive positions that
# must merge into ONE maximal span in every non-first doc carrying it
LONGRUN = " ".join(f"longrun{i}" for i in range(K + 5))


def _mk_corpus():
    """~320 docs; one hot 20-gram in 300 of them (hot digest: 300
    occurrences of a single window hash), a 25-token run shared by 3 docs,
    short docs below the window size, and unique filler everywhere."""
    docs = []
    for d in range(300):
        filler_a = " ".join(f"w{d}a{i}" for i in range(7))
        filler_b = " ".join(f"w{d}b{i}" for i in range(9))
        docs.append((d, f"{filler_a} {BOILER} {filler_b}"))
    for d in range(300, 303):
        docs.append((d, f"head{d} {LONGRUN} tail{d}0 tail{d}1"))
    for d in range(303, 310):
        docs.append((d, " ".join(f"s{d}t{i}" for i in range(K - 1))))
    for d in range(310, 320):
        docs.append((d, " ".join(f"u{d}t{i}" for i in range(35))))
    return docs


def _brute_spans(docs, k=K):
    """Independent reference: sliding k-gram marking, global first
    occurrence by (doc_id, pos), merge while pos <= prev_pos + k."""
    wins = []
    for doc_id, text in docs:
        t = text.strip().lower().split()
        for i in range(len(t) - k + 1):
            wins.append((" ".join(t[i : i + k]), doc_id, i))
    occ: dict[str, int] = defaultdict(int)
    first: dict[str, tuple[int, int]] = {}
    for h, d, p in wins:
        occ[h] += 1
        if h not in first or (d, p) < first[h]:
            first[h] = (d, p)
    by_doc = defaultdict(list)
    for h, d, p in wins:
        if occ[h] > 1 and (d, p) != first[h]:
            by_doc[d].append(p)
    out = set()
    for d, ps in by_doc.items():
        ps.sort()
        cur_s, prev = ps[0], ps[0]
        for p in ps[1:]:
            if p > prev + k:
                out.add((d, cur_s, prev + k))
                cur_s = p
            prev = p
        out.add((d, cur_s, prev + k))
    return out


def _brute_chunk_dup(docs, width=10):
    """chunk_dedup reference: 10-token chunks (no lowercasing), global
    first occurrence by (doc_id, chunk_idx)."""
    chunks = []
    for doc_id, text in docs:
        t = text.strip().split()
        n = (len(t) + width - 1) // width
        for i in range(n):
            chunks.append((" ".join(t[i * width : (i + 1) * width]), doc_id, i))
    first: dict[str, tuple[int, int]] = {}
    for h, d, i in chunks:
        if h not in first or (d, i) < first[h]:
            first[h] = (d, i)
    per_doc = defaultdict(lambda: [0, 0])  # n_chunks, n_dup
    for h, d, i in chunks:
        per_doc[d][0] += 1
        if (d, i) != first[h]:
            per_doc[d][1] += 1
    return {d: tuple(v) for d, v in per_doc.items()}


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("hotdigest")
    rows = [
        Row(
            doc_id=d,
            text=text,
            lang="en",
            source="fixture",
            n_chars=len(text),
        )
        for d, text in _mk_corpus()
    ]
    spark.createDataFrame(rows).coalesce(2).write.parquet(
        os.path.join(str(base), "documents.parquet")
    )
    return str(base)


def test_hot_digest_spans_match_brute_force(spark, hot_dir):
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_ngram_spans(spark, hot_dir).collect()
    }
    want = _brute_spans(_mk_corpus())
    assert got == want
    # the hot digest really was hot: 299 non-first boiler occurrences
    assert sum(1 for d, s, e in got if d < 300) == 299
    # the 25-token shared run merged into ONE maximal 25-token span in each
    # of the two non-first carriers
    long_spans = sorted((d, s, e) for d, s, e in got if 300 <= d < 303)
    assert long_spans == [(301, 1, 1 + K + 5), (302, 1, 1 + K + 5)]


def test_hot_digest_chunk_dedup_matches_brute_force(spark, hot_dir):
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks)
        for r in chunk_dedup(spark, hot_dir).collect()
    }
    want = _brute_chunk_dup(_mk_corpus())
    assert got == want
    # sanity: duplicated chunks exist (the fixture aligns BOILER at chunk
    # boundary only when filler length allows; assert via brute force)
    assert sum(v[1] for v in got.values()) == sum(v[1] for v in want.values())


def test_span_removal_counts_consistent(spark, hot_dir):
    corpus = dict(_mk_corpus())
    spans = _brute_spans(_mk_corpus())
    cut_by_doc = defaultdict(int)
    for d, s, e in spans:
        cut_by_doc[d] += e - s
    removal = {
        r.doc_id: (r.n_tokens, r.n_tokens_clean)
        for r in dup_span_removal(spark, hot_dir).collect()
    }
    assert set(removal) == set(cut_by_doc)
    for d, (n, n_clean) in removal.items():
        assert n == len(corpus[d].split())
        assert n_clean == n - cut_by_doc[d]


def test_cleaned_digest_matches_python_cut(spark, hot_dir):
    corpus = dict(_mk_corpus())
    spans_by_doc = defaultdict(list)
    for d, s, e in _brute_spans(_mk_corpus()):
        spans_by_doc[d].append((s, e))
    got = {
        r.doc_id: (r.n_tokens_clean, r.clean_digest)
        for r in dup_span_cleaned(spark, hot_dir).collect()
    }
    assert set(got) == set(spans_by_doc)
    for d, sp in spans_by_doc.items():
        t = corpus[d].strip().lower().split()
        drop = {i for s, e in sp for i in range(s, e)}
        kept = [tok for i, tok in enumerate(t) if i not in drop]
        digest = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert got[d] == (len(kept), digest), f"doc {d}"


def test_cleaned_documents_roundtrip_write(spark, hot_dir, tmp_path):
    """The production write-back: every doc present, unaffected docs keep
    their (lowercased/trimmed) text verbatim, and the cleaned corpus
    survives an ACID-table write + read."""
    from delta_lake_validation_spark.sources.acid import AcidTable

    cleaned = cleaned_documents(spark, hot_dir)
    rows = {r.doc_id: r for r in cleaned.collect()}
    corpus = dict(_mk_corpus())
    assert set(rows) == set(corpus)
    affected = {d for d, _, _ in _brute_spans(_mk_corpus())}
    for d, text in corpus.items():
        if d not in affected:
            assert rows[d].text_clean == " ".join(text.strip().lower().split())
            assert rows[d].n_tokens_clean == len(text.split())

    loc = os.path.join(str(tmp_path), "cleaned_corpus")
    t = AcidTable.create(
        spark, loc, "doc_id LONG, text_clean STRING, n_tokens_clean LONG"
    )
    t.append(cleaned)
    back = {r.doc_id: r for r in t.read().collect()}
    assert len(back) == len(rows)
    assert all(back[d].text_clean == rows[d].text_clean for d in rows)


# ---------------------------------------------------------------------------
# ADVICE.md r5: restart-with-caps must never re-serve delivered versions.
# After a checkpoint restart Spark calls latestOffset() BEFORE partitions(),
# so a rate-capped reader pacing from its option-derived cursor used to
# return an offset BELOW the checkpointed end; Spark would record the lower
# offset and later triggers re-served already-delivered versions.
# ---------------------------------------------------------------------------


def _drive(reader, n_batches):
    """Run n micro-batches; returns (last_offset, [served file path sets])."""
    served = []
    cur = reader.initialOffset()
    for _ in range(n_batches):
        nxt = reader.latestOffset()
        if nxt["version"] == cur["version"]:
            break
        parts = reader.partitions(cur, nxt)
        served.append({f.path for p in parts for f in p.files})
        reader.commit(nxt)
        cur = nxt
    return cur, served


def test_acidpy_restart_with_caps_never_replays(spark, tmp_path):
    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.sources.acid.pystream import (
        AcidPyStreamReader,
    )

    loc = os.path.join(str(tmp_path), "restarts")
    t = AcidTable.create(spark, loc, "id INT, v INT")
    for i in range(5):  # versions 1..5, one file each
        t.append(
            spark.createDataFrame([(i, i)], "id INT, v INT").coalesce(1)
        )

    opts = {"path": loc, "maxfilespertrigger": "1"}
    r1 = AcidPyStreamReader(dict(opts))
    cur, served1 = _drive(r1, 3)
    assert cur["version"] == 3 and all(len(s) == 1 for s in served1)

    # restart: Spark's first call on the fresh reader is latestOffset().
    r2 = AcidPyStreamReader(dict(opts))
    stale = r2.latestOffset()  # paces from the option cursor: may be stale
    # Spark would plan (checkpointed end, stale] — even if stale is behind,
    # the batch must serve NOTHING already delivered
    parts = r2.partitions(cur, stale)
    assert {f.path for p in parts for f in p.files} == set()
    # and pacing must now resume at-or-after the checkpointed end
    nxt = r2.latestOffset()
    assert nxt["version"] == 4
    _, served2 = _drive_from(r2, cur, 4)
    all_served = [s for s in served1 + served2 if s]
    flat = [p for s in all_served for p in s]
    assert len(flat) == len(set(flat)) == 5  # every file exactly once


def _drive_from(reader, cur, n_batches):
    served = []
    for _ in range(n_batches):
        nxt = reader.latestOffset()
        if nxt["version"] == cur["version"]:
            break
        parts = reader.partitions(cur, nxt)
        served.append({f.path for p in parts for f in p.files})
        reader.commit(nxt)
        cur = nxt
    return cur, served


def test_deltapy_restart_with_caps_never_replays(spark, tmp_path):
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
    )
    from delta_lake_validation_spark.sources.pydatasource import (
        DeltaPyStreamReader,
    )

    loc = os.path.join(str(tmp_path), "drestarts")
    create_delta(spark, loc, "id bigint, v bigint")
    for i in range(5):  # versions 1..5
        DeltaTable(spark, loc).append(
            spark.createDataFrame([(i, i)], "id bigint, v bigint").coalesce(1)
        )

    opts = {"path": loc, "maxfilespertrigger": "1"}
    r1 = DeltaPyStreamReader(dict(opts))
    cur, served1 = _drive(r1, 3)
    assert cur["version"] == 3 and all(len(s) == 1 for s in served1)

    r2 = DeltaPyStreamReader(dict(opts))
    stale = r2.latestOffset()
    parts = r2.partitions(cur, stale)
    assert {f.path for p in parts for f in p.files} == set()
    nxt = r2.latestOffset()
    assert nxt["version"] == 4
    _, served2 = _drive_from(r2, cur, 4)
    all_served = [s for s in served1 + served2 if s]
    flat = [p for s in all_served for p in s]
    assert len(flat) == len(set(flat)) == 5
