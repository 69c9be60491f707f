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


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_delta_log_replay_matches_simulation(spark, tmp_path_factory, seed):
    """Random commit sequences (append / overwrite / delete-file /
    checkpoint) replayed through DeltaTable equal a pure-Python simulation
    of the protocol state at EVERY version."""
    import json as _json

    from tests.test_delta_log import (
        PROTOCOL,
        _add,
        _commit_info,
        _meta,
        _remove,
        _write_commit,
        _write_parquet,
    )
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        write_delta_checkpoint,
    )
    from pyspark.sql import Row

    rng = random.Random(seed)
    tmp_path = tmp_path_factory.mktemp(f"fuzz{seed}")
    loc = tmp_path / "t"
    log = loc / "_delta_log"
    live: dict[str, set] = {}   # file rel path -> set of ids
    history: list[set] = []     # per-version expected id multiset union
    next_id = 0
    fidx = 0

    def _new_file(n):
        nonlocal next_id, fidx
        ids = list(range(next_id, next_id + n))
        next_id += n
        fidx += 1
        rel = _write_parquet(
            spark, [Row(id=i) for i in ids], "id int", loc / f"f{fidx}"
        )
        return rel, set(ids)

    rel, ids = _new_file(rng.randint(1, 3))
    live[rel] = ids
    _write_commit(
        log, 0,
        [_commit_info(1700000000000), PROTOCOL, _meta([("id", "integer")]),
         _add(rel)],
    )
    history.append(set.union(*live.values()))
    n_commits = rng.randint(2, 5)
    for v in range(1, n_commits + 1):
        op = rng.choice(["append", "overwrite", "delete_file"])
        actions = [_commit_info(1700000000000 + v * 1000)]
        if op == "append" or not live:
            rel, ids = _new_file(rng.randint(1, 3))
            live[rel] = ids
            actions.append(_add(rel))
        elif op == "overwrite":
            for p in list(live):
                actions.append(_remove(p))
            live.clear()
            rel, ids = _new_file(rng.randint(1, 3))
            live[rel] = ids
            actions.append(_add(rel))
        else:
            p = rng.choice(list(live))
            del live[p]
            actions.append(_remove(p))
        _write_commit(log, v, actions)
        history.append(set.union(*live.values()) if live else set())
        if rng.random() < 0.3:
            write_delta_checkpoint(spark, str(loc))

    t = DeltaTable(spark, str(loc))
    for v, expect in enumerate(history):
        got = {r.id for r in t.read(version=v).collect()}
        assert got == expect, f"v{v} seed{seed}: {got} != {expect}"


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_delta_import_dml_export_roundtrip(spark, tmp_path_factory, seed):
    """Cross-feature fuzz: random Delta log -> zero-copy import -> random
    ACID DML -> export back to a Delta log -> Delta read equals a Python
    simulation, and the source Delta table is untouched throughout."""
    from tests.test_delta_log import (
        PROTOCOL,
        _add,
        _commit_info,
        _meta,
        _write_commit,
        _write_parquet,
    )
    from delta_lake_validation_spark.sources.delta_log import (
        DeltaTable,
        export_delta,
        import_delta,
        read_delta,
    )
    from pyspark.sql import Row

    rng = random.Random(seed)
    tmp_path = tmp_path_factory.mktemp(f"rt{seed}")
    src = tmp_path / "src"
    log = src / "_delta_log"
    ids = sorted(rng.sample(range(100), rng.randint(3, 8)))
    rel = _write_parquet(spark, [Row(id=i) for i in ids], "id int", src / "d")
    _write_commit(
        log, 0,
        [_commit_info(1700000000000), PROTOCOL, _meta([("id", "integer")]),
         _add(rel)],
    )
    state = set(ids)
    src_bytes = {p: p.stat().st_size for p in src.rglob("*.parquet")}

    t = import_delta(spark, str(src), str(tmp_path / "imp"))
    for _ in range(rng.randint(1, 3)):
        op = rng.choice(["append", "delete", "update"])
        if op == "append":
            new = [rng.randrange(1000, 2000) for _ in range(rng.randint(1, 3))]
            t.append(spark.createDataFrame([(i,) for i in new], "id int"))
            state |= set(new)
        elif op == "delete" and state:
            cut = rng.choice(sorted(state))
            t.delete(f"id = {cut}")
            state.discard(cut)
        elif op == "update" and state:
            lo = rng.choice(sorted(state))
            t.update({"id": "id + 10000"}, f"id = {lo}")
            state.discard(lo)
            state.add(lo + 10000)
    export_delta(t)
    got = {r.id for r in read_delta(spark, str(tmp_path / "imp")).collect()}
    assert got == state, f"seed {seed}"
    # the source Delta table never changes
    assert {p: p.stat().st_size for p in src.rglob("*.parquet")} == src_bytes
    assert {r.id for r in DeltaTable(spark, str(src)).read().collect()} == set(ids)

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
