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
import json
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


# ---------------------------------------------------------------------------
# Row tracking preservation (VERDICT.md r5 items 3+5, ADVICE.md r5 #2):
# rewrites preserve surviving rows' ids via materialized columns; enabling
# the property on a non-empty table backfills ids atomically; stats-less
# adds never get colliding baseRowIds.
# ---------------------------------------------------------------------------


def _rt_rows(spark, loc):
    from delta_lake_validation_spark.sources.delta_log import DeltaTable

    return {
        r._row_id: (r.id, r.v, r._row_commit_version)
        for r in DeltaTable(spark, loc).read_row_ids().collect()
    }


def test_row_tracking_cow_rewrites_preserve_ids(spark, tmp_path):
    """Copy-on-write path (no deletionVectors): UPDATE, partial-file
    DELETE, MERGE and OPTIMIZE all keep surviving rows' ids stable."""
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
    )

    loc = str(tmp_path / "rtcow")
    create_delta(
        spark,
        loc,
        "id bigint, v bigint",
        properties={"delta.enableRowTracking": "true"},
    )
    DeltaTable(spark, loc).append(
        spark.range(20).selectExpr("id", "id AS v").coalesce(2)
    )
    base = _rt_rows(spark, loc)
    assert len(base) == 20 and sorted(base) == list(range(20))

    vu = DeltaTable(spark, loc).update({"v": "v + 100"}, "id < 5")
    after_u = _rt_rows(spark, loc)
    assert {rid: t[0] for rid, t in after_u.items()} == {
        rid: t[0] for rid, t in base.items()
    }
    for rid, (i, v_, rcv) in after_u.items():
        if i < 5:
            assert v_ == base[rid][1] + 100 and rcv == vu
        else:
            assert (v_, rcv) == (base[rid][1], base[rid][2])

    DeltaTable(spark, loc).delete("id = 7")  # copy-on-write now allowed
    after_d = _rt_rows(spark, loc)
    assert {rid: t[0] for rid, t in after_d.items()} == {
        rid: t[0] for rid, t in after_u.items() if t[0] != 7
    }
    # kept rows in the rewritten file keep their pre-delete commit version
    assert all(
        after_d[rid][2] == after_u[rid][2] for rid in after_d
    )

    src = spark.createDataFrame(
        [(3, 999), (50, 500)], "id bigint, v bigint"
    )
    vm = DeltaTable(spark, loc).merge_upsert(src, ["id"])
    after_m = _rt_rows(spark, loc)
    rid3 = next(r for r, t in after_d.items() if t[0] == 3)
    assert after_m[rid3] == (3, 999, vm)  # id preserved, rcv bumped
    rid50 = next(r for r, t in after_m.items() if t[0] == 50)
    assert rid50 > max(after_d)  # inserted row: fresh id above watermark
    for rid, t in after_d.items():
        if t[0] != 3:
            assert after_m[rid] == t  # untouched + kept rows unchanged

    DeltaTable(spark, loc).optimize()
    assert _rt_rows(spark, loc) == after_m  # compaction changes nothing


def test_row_tracking_replace_where_preserves_kept_ids(spark, tmp_path):
    """replaceWhere on a row-tracking table: kept rows of touched files
    are SURVIVING rows — their ids persist through the rewrite (this
    path crashed on the internal rt-columns guard before the r6
    self-review fix)."""
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
    )

    loc = str(tmp_path / "rtrw")
    create_delta(
        spark,
        loc,
        "id bigint, grp bigint, v bigint",
        properties={"delta.enableRowTracking": "true"},
    )
    DeltaTable(spark, loc).append(
        spark.range(10)
        .selectExpr("id", "id % 2 AS grp", "id AS v")
        .coalesce(1)  # one file mixing grp 0 and 1 -> forces the rewrite
    )
    before = {
        r._row_id: (r.id, r.grp, r.v)
        for r in DeltaTable(spark, loc).read_row_ids().collect()
    }
    repl = spark.createDataFrame(
        [(100, 1, 111), (101, 1, 222)], "id bigint, grp bigint, v bigint"
    )
    DeltaTable(spark, loc).overwrite(repl, replace_where="grp = 1")
    after = {
        r._row_id: (r.id, r.grp, r.v)
        for r in DeltaTable(spark, loc).read_row_ids().collect()
    }
    kept_before = {r: t for r, t in before.items() if t[1] == 0}
    assert {r: t for r, t in after.items() if t[1] == 0} == kept_before
    new_rows = {t for r, t in after.items() if t[1] == 1}
    assert new_rows == {(100, 1, 111), (101, 1, 222)}


def test_alter_enable_row_tracking_backfills(spark, tmp_path):
    """ALTER SET delta.enableRowTracking=true on a non-empty table must
    not leave pre-existing files id-less: the enable commit re-adds every
    live file with stamped ids (atomic with the property flip)."""
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
    )

    loc = str(tmp_path / "rtalter")
    create_delta(spark, loc, "id bigint, v bigint")
    DeltaTable(spark, loc).append(
        spark.range(8).selectExpr("id", "id AS v").coalesce(2)
    )
    DeltaTable(spark, loc).alter_properties(
        {"delta.enableRowTracking": "true"}
    )
    snap = DeltaTable(spark, loc).snapshot()
    assert all(
        a.get("baseRowId") is not None for a in snap.files.values()
    ), "backfill must stamp every pre-existing file"
    assert json.loads(snap.domains["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ] == 7
    rows = _rt_rows(spark, loc)
    assert sorted(rows) == list(range(8))  # unique, contiguous


def test_alter_backfill_counts_stats_less_adds(spark, tmp_path):
    """An add with no numRecords stats (CONVERT/import shape) is counted
    from its parquet footer during stamping — never treated as n=0, which
    would hand the next add the same baseRowId."""
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaProtocolError,
        DeltaTable,
        create_delta,
    )

    loc = str(tmp_path / "rtstatless")
    create_delta(spark, loc, "id bigint, v bigint")
    DeltaTable(spark, loc).append(
        spark.range(6).selectExpr("id", "id AS v").coalesce(2)
    )
    # strip stats from every add in the log (simulate a foreign writer)
    log = os.path.join(loc, "_delta_log")
    for fn in sorted(os.listdir(log)):
        if not fn.endswith(".json"):
            continue
        path = os.path.join(log, fn)
        lines = []
        with open(path) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    a["add"].pop("stats", None)
                lines.append(json.dumps(a))
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    DeltaTable(spark, loc).alter_properties(
        {"delta.enableRowTracking": "true"}
    )
    snap = DeltaTable(spark, loc).snapshot()
    bases = sorted(
        (a["baseRowId"], json.loads(a["stats"])["numRecords"])
        for a in snap.files.values()
    )
    # footer-counted: contiguous non-overlapping ranges, no collisions
    assert bases[0][0] == 0 and bases[1][0] == bases[0][1]
    assert sorted(_rt_rows(spark, loc)) == list(range(6))

    # unreadable stats-less add -> typed refusal, not a silent collision
    t = DeltaTable(spark, loc)
    with pytest.raises(DeltaProtocolError, match="numRecords"):
        t._try_commit(
            snap.version + 1,
            [
                {"add": {"path": "nope-not-there.parquet",
                         "partitionValues": {}, "size": 1,
                         "dataChange": True}},
            ],
        )


def test_rt_mat_cols_merge_into_riding_metadata(spark, tmp_path):
    """When a commit already carries a metaData action (identity
    high-water-mark bump), minting materialized row-id columns must merge
    the configs INTO it — log replay is last-metaData-wins, so a second
    action built from the stale snapshot would revert the bump."""
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
    )

    loc = str(tmp_path / "rtmeta")
    create_delta(
        spark,
        loc,
        "id bigint, v bigint",
        properties={"delta.enableRowTracking": "true"},
    )
    t = DeltaTable(spark, loc)
    snap = t.snapshot()
    riding = {
        "id": snap.metadata_id,
        "name": snap.name,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(snap.schema.jsonValue()),
        "partitionColumns": [],
        "configuration": {
            **snap.properties,
            "delta.identity.fake": "99",  # the bump that must survive
        },
    }
    rid_c, rcv_c, extra = t._rt_ensure_mat_cols(snap, base_meta=riding)
    assert extra == []  # merged, not a second action
    cfg = riding["configuration"]
    assert cfg[t._RT_RID_KEY] == rid_c and cfg[t._RT_RCV_KEY] == rcv_c
    assert cfg["delta.identity.fake"] == "99"
    # without a riding metaData the standalone action still works
    rid2, rcv2, extra2 = t._rt_ensure_mat_cols(snap)
    assert extra2 and extra2[0]["metaData"]["configuration"][
        t._RT_RID_KEY
    ] == rid2


def test_bpe_encoder_matches_merge_all_loop():
    """The one-occurrence-at-a-time greedy encoder must equal GPT-2's
    merge-ALL-occurrences-of-min-rank loop on every input (the
    equivalence the oracle relies on)."""
    import itertools
    import random

    from delta_lake_validation_spark.operators.text import (
        _BPE_RANK,
        bpe_encode_len,
    )

    def gpt2_style_len(word):
        toks = list(word)
        while True:
            ranks = {
                _BPE_RANK[(a, b)]
                for a, b in zip(toks, toks[1:])
                if (a, b) in _BPE_RANK
            }
            if not ranks:
                return len(toks)
            r = min(ranks)
            pair = next(p for p, pr in _BPE_RANK.items() if pr == r)
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and (toks[i], toks[i + 1]) == pair
                ):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out

    rng = random.Random(42)
    words = [
        "the", "thing", "tint", "and", "another", "interesting",
        "thththe", "ananand", "inginging", "x", "", "stst",
    ] + [
        "".join(rng.choice("theandorigs") for _ in range(rng.randint(1, 14)))
        for _ in range(300)
    ]
    for w in words:
        assert bpe_encode_len(w) == gpt2_style_len(w), w
    # overlap semantics: leftmost-first ("ththe": t+h->th, th+? ...)
    assert bpe_encode_len("hh") == 2  # no (h,h) merge
    for a, b in itertools.islice(_BPE_RANK, 5):
        assert bpe_encode_len(a + b) == 1


def test_deltapy_variant_scan_unannotated(spark, tmp_path):
    """VERDICT r5 #4: deltapy carries variant columns through arrow (the
    value/metadata binary pair, matched BY NAME — this file deliberately
    stores metadata first).  Files without the parquet VARIANT
    LogicalType annotation (Spark 4.0-era writers) are the case the
    container's pyarrow can open; annotated files refuse at plan time
    with a typed diagnosis (pinned in test_delta_features_r5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_lake_validation_spark.sources import pydatasource
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
    )
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        VariantType,
    )

    loc = str(tmp_path / "varplain")
    sch = StructType(
        [StructField("id", LongType()), StructField("v", VariantType())]
    )
    create_delta(spark, loc, sch)

    # real variant binaries, harvested from Spark's own encoder
    src = spark.sql(
        "SELECT id, parse_json(concat('{\"x\": ', id, '}')) AS v "
        "FROM range(5)"
    ).collect()
    ids = [r.id for r in src]
    vals = [r.v for r in src]
    fname = "part-unannotated.parquet"
    tbl = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            # metadata FIRST: name-based assembly must not care
            "v": pa.StructArray.from_arrays(
                [
                    pa.array([v.metadata for v in vals], pa.binary()),
                    pa.array([v.value for v in vals], pa.binary()),
                ],
                names=["metadata", "value"],
            ),
        }
    )
    pq.write_table(tbl, os.path.join(loc, fname))
    size = os.path.getsize(os.path.join(loc, fname))
    with open(
        os.path.join(loc, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": fname,
                        "partitionValues": {},
                        "size": size,
                        "modificationTime": 0,
                        "dataChange": True,
                        "stats": json.dumps({"numRecords": len(ids)}),
                    }
                }
            )
            + "\n"
        )

    via_jvm = sorted(
        (r.id, r.j)
        for r in DeltaTable(spark, loc)
        .read()
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    assert via_jvm == [(i, '{"x":%d}' % i) for i in range(5)]
    pydatasource.register(spark)
    via_pyds = sorted(
        (r.id, r.j)
        for r in spark.read.format("deltapy")
        .load(loc)
        .selectExpr("id", "to_json(v) AS j")
        .collect()
    )
    assert via_pyds == via_jvm


def test_add_columns_field_id_recurses_nested(spark, tmp_path):
    """ADVICE r5 #3: the next column-mapping field id must account for
    ids carried by NESTED struct/array/map fields — a stale maxColumnId
    plus top-level-only scanning would mint a duplicate id, and in 'id'
    mode parquet field-id resolution would then serve the wrong column."""
    from delta_lake_validation_spark.sources.delta_log import DeltaTable

    loc = tmp_path / "nestedids"
    log = loc / "_delta_log"
    log.mkdir(parents=True)
    fields = [
        {
            "name": "a",
            "type": "integer",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-a",
            },
        },
        {
            "name": "s",
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "name": "inner",
                        "type": {
                            "type": "array",
                            "elementType": {
                                "type": "struct",
                                "fields": [
                                    {
                                        "name": "deep",
                                        "type": "long",
                                        "nullable": True,
                                        "metadata": {
                                            "delta.columnMapping.id": 7,
                                            "delta.columnMapping.physicalName": "col-deep",
                                        },
                                    }
                                ],
                            },
                            "containsNull": True,
                        },
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 5,
                            "delta.columnMapping.physicalName": "col-inner",
                        },
                    }
                ],
            },
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-s",
            },
        },
    ]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "nested",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": fields}
                ),
                "partitionColumns": [],
                # stale: the nested 'deep' field carries id 7
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "2",
                },
            }
        },
    ]
    with open(log / f"{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")

    DeltaTable(spark, str(loc)).add_columns("extra string")
    snap = DeltaTable(spark, str(loc)).snapshot()
    new_meta = snap.schema["extra"].metadata
    assert new_meta["delta.columnMapping.id"] == 8  # > nested max 7
    assert snap.properties["delta.columnMapping.maxColumnId"] == "8"


def test_shipping_zip_in_private_dir():
    """ADVICE r5 #4: the worker-code zip must live in a per-user 0700
    directory, never at a predictable name in shared world-writable tmp."""
    import stat

    from delta_lake_validation_spark import shipping

    z = shipping._build_zip()
    d = os.path.dirname(z)
    st = os.stat(d)
    assert st.st_uid == os.getuid()
    assert not (st.st_mode & 0o022), "cache dir must not be group/world-writable"
    assert stat.S_ISDIR(st.st_mode)


def test_row_tracking_rewrite_checkpoint_deltapy_restore(spark, tmp_path):
    """Preserved ids survive the full surface: UPDATE rewrite -> classic
    checkpoint (materialized-column configs + stamped adds replayed
    sparkless) -> deltapy scan ignores the extra physical columns ->
    RESTORE returns the pre-update ids verbatim."""
    from delta_lake_validation_spark.sources import pydatasource
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
        write_delta_checkpoint,
    )

    loc = str(tmp_path / "rtfull")
    create_delta(
        spark,
        loc,
        "id bigint, v bigint",
        properties={"delta.enableRowTracking": "true"},
    )
    DeltaTable(spark, loc).append(
        spark.range(10).selectExpr("id", "id AS v").coalesce(2)
    )
    before = _rt_rows(spark, loc)
    pre_update_version = DeltaTable(spark, loc).snapshot().version
    vu = DeltaTable(spark, loc).update({"v": "v + 5"}, "id >= 5")
    after = _rt_rows(spark, loc)
    assert {r: t[0] for r, t in after.items()} == {
        r: t[0] for r, t in before.items()
    }

    # checkpoint: mat-col configs live in properties, stamped adds in the
    # checkpoint rows — a sparkless handle must replay both
    write_delta_checkpoint(spark, loc)
    snap = DeltaTable(None, loc).snapshot()
    assert snap.properties.get(
        "delta.rowTracking.materializedRowIdColumnName"
    )
    assert all(a.get("baseRowId") is not None for a in snap.files.values())

    # deltapy scan: the extra physical columns never leak into results
    pydatasource.register(spark)
    got = sorted(
        (r.id, r.v)
        for r in spark.read.format("deltapy").load(loc).collect()
    )
    assert got == sorted((t[0], t[1]) for t in after.values())
    assert set(
        spark.read.format("deltapy").load(loc).columns
    ) == {"id", "v"}

    # RESTORE: the pre-update files come back with their original ids
    DeltaTable(spark, loc).restore(pre_update_version)
    assert _rt_rows(spark, loc) == before
    assert vu > pre_update_version  # sanity: restore really went back


def test_row_tracking_unstamped_foreign_table_refuses(spark, tmp_path):
    """A foreign writer that flipped enableRowTracking without stamping
    left a broken invariant: row-id reads and rewrites must refuse typed
    rather than serve null ids or silently re-assign them."""
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaProtocolError,
        DeltaTable,
        create_delta,
    )

    loc = str(tmp_path / "rtforeign")
    create_delta(spark, loc, "id bigint, v bigint")
    DeltaTable(spark, loc).append(
        spark.range(4).selectExpr("id", "id AS v").coalesce(1)
    )
    # foreign-style enable: property + protocol flipped by hand, no
    # backfill, existing add left unstamped
    log = os.path.join(loc, "_delta_log")
    snap = DeltaTable(spark, loc).snapshot()
    with open(os.path.join(log, f"{snap.version + 1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": [
                            "domainMetadata",
                            "rowTracking",
                        ],
                    }
                }
            )
            + "\n"
            + json.dumps(
                {
                    "metaData": {
                        "id": snap.metadata_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": json.dumps(
                            snap.schema.jsonValue()
                        ),
                        "partitionColumns": [],
                        "configuration": {
                            "delta.enableRowTracking": "true"
                        },
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError, match="lack baseRowId"):
        DeltaTable(spark, loc).read_row_ids().collect()
    with pytest.raises(DeltaProtocolError, match="lack baseRowId"):
        DeltaTable(spark, loc).update({"v": "v + 1"}, "id = 1")
    # plain reads (no row-id semantics) still work
    assert DeltaTable(spark, loc).read().count() == 4


def test_acidpy_latest_start_restart_loses_nothing(spark, tmp_path):
    """startingVersion='latest' re-resolves LIVE at restart: a fresh
    reader's floor must NOT be seeded from it, or the replayed range
    below the new 'latest' would be silently skipped (data loss)."""
    from delta_lake_validation_spark.sources.acid import AcidTable
    from delta_lake_validation_spark.sources.acid.pystream import (
        AcidPyStreamReader,
    )

    loc = os.path.join(str(tmp_path), "lateststart")
    t = AcidTable.create(spark, loc, "id INT, v INT")
    for i in range(3):  # versions 1..3
        t.append(spark.createDataFrame([(i, i)], "id INT, v INT").coalesce(1))

    opts = {"path": loc, "startingversion": "latest",
            "maxfilespertrigger": "1"}
    r1 = AcidPyStreamReader(dict(opts))
    assert r1.initialOffset() == {"version": 3}
    for i in range(3, 8):  # versions 4..8 arrive while subscribed
        t.append(spark.createDataFrame([(i, i)], "id INT, v INT").coalesce(1))
    cur, served1 = _drive(r1, 1)  # one batch: version 4
    assert cur["version"] == 4 and len(served1) == 1

    # crash + restart: 'latest' now resolves to 8, but the checkpointed
    # start is 4 — the replanned range (4, x] must serve 5..x in full
    r2 = AcidPyStreamReader(dict(opts))
    nxt = r2.latestOffset()
    parts = r2.partitions(cur, nxt)
    served = {f.path for p in parts for f in p.files}
    lo, hi = cur["version"], nxt["version"]
    assert hi > lo and len(served) == hi - lo, (
        f"restart range ({lo},{hi}] must serve every version in it"
    )
    r2.commit(nxt)
    # drive to the end: everything after version 4 arrives exactly once
    _, served2 = _drive_from(r2, nxt, 10)
    all_paths = [p for s in [served] + served2 for p in s]
    assert len(all_paths) == len(set(all_paths)) == 4  # versions 5..8


def test_deltapy_latest_start_restart_loses_nothing(spark, tmp_path):
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        create_delta,
    )
    from delta_lake_validation_spark.sources.pydatasource import (
        DeltaPyStreamReader,
    )

    loc = os.path.join(str(tmp_path), "dlateststart")
    create_delta(spark, loc, "id bigint, v bigint")
    for i in range(3):  # versions 1..3
        DeltaTable(spark, loc).append(
            spark.createDataFrame([(i, i)], "id bigint, v bigint").coalesce(1)
        )
    opts = {"path": loc, "startingversion": "latest",
            "maxfilespertrigger": "1"}
    r1 = DeltaPyStreamReader(dict(opts))
    assert r1.initialOffset() == {"version": 3}
    for i in range(3, 8):  # versions 4..8
        DeltaTable(spark, loc).append(
            spark.createDataFrame([(i, i)], "id bigint, v bigint").coalesce(1)
        )
    cur, served1 = _drive(r1, 1)
    assert cur["version"] == 4 and len(served1) == 1

    r2 = DeltaPyStreamReader(dict(opts))
    nxt = r2.latestOffset()
    parts = r2.partitions(cur, nxt)
    served = {f.path for p in parts for f in p.files}
    lo, hi = cur["version"], nxt["version"]
    assert hi > lo and len(served) == hi - lo
    r2.commit(nxt)
    _, served2 = _drive_from(r2, nxt, 10)
    all_paths = [p for s in [served] + served2 for p in s]
    assert len(all_paths) == len(set(all_paths)) == 4


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

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
