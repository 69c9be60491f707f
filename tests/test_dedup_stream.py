"""Streaming incremental dedup: corpus index as ACID tables, per-batch
foreachBatch verdicts, index growth across batches, exactly-once replay,
and crash-between-commits recovery (index folded, results not)."""

from __future__ import annotations

from delta_lake_validation_spark.sources.acid.table import AcidTable
from delta_lake_validation_spark.streaming.incremental_dedup import (
    DedupIndex,
    dedup_stream_sink,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely different corpus content about spark engines here"),
]
SCHEMA = "doc_id long, text string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _results(spark, loc):
    return {
        (r.new_doc, r.match_doc, r.within_batch, r.batch_id)
        for r in AcidTable(spark, loc).read().collect()
    }


def test_stream_dedup_lifecycle(spark, tmp_path):
    root = str(tmp_path / "idx")
    res = str(tmp_path / "res")
    index = DedupIndex.create(spark, root, _mk(spark, CORPUS))
    sink = dedup_stream_sink(spark, index, res, threshold=0.8, query_id="q1")

    # batch 0: one dup-of-corpus, one novel, one within-batch dup pair
    b0 = _mk(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            (11, "a totally novel document with fresh unseen words inside"),
            (12, "identical within batch pair of documents right here now"),
            (13, "identical within batch pair of documents right here now"),
        ],
    )
    sink(b0, 0)
    got0 = _results(spark, res)
    assert got0 == {
        (10, 1, False, 0),  # matched the corpus through the index
        (12, 13, True, 0),  # batch-internal duplicate
    }

    # batch 1: duplicates batch 0's NOVEL doc — only findable if batch 0
    # was folded into the index
    b1 = _mk(
        spark, [(20, "a totally novel document with fresh unseen words inside")]
    )
    sink(b1, 1)
    assert _results(spark, res) == got0 | {(20, 11, False, 1)}

    # replay of batch 1 (restart semantics): nothing duplicates
    sink(b1, 1)
    assert _results(spark, res) == got0 | {(20, 11, False, 1)}
    pos_rows = AcidTable(spark, f"{root}/pos").read().count()

    # crash between index and results commits: fold batch 2 into the index
    # first (simulating the crash point), then replay the full sink — the
    # verdicts must come out as if computed against the pre-batch index
    b2 = _mk(
        spark,
        [(30, "completely different corpus content about spark engines here")],
    )
    index.append_batch(b2, 2, "q1")
    sink(b2, 2)
    assert _results(spark, res) == got0 | {
        (20, 11, False, 1),
        (30, 2, False, 2),  # matches corpus doc 2, NOT its own index copy
    }
    # index folded exactly once despite append_batch + sink both running
    b2_pos = (
        AcidTable(spark, f"{root}/pos").read().filter("id = 30").count()
    )
    sets_30 = AcidTable(spark, f"{root}/sets").read().filter("id = 30").count()
    assert sets_30 == 1 and b2_pos > 0
    assert AcidTable(spark, f"{root}/pos").read().count() > pos_rows


def test_frozen_order_still_lossless_after_growth(spark, tmp_path):
    """After several folds, a new batch's duplicates of ANY generation are
    still found exactly (the frozen rarity order keeps the prefix filter
    lossless regardless of drift)."""
    root = str(tmp_path / "idx2")
    res = str(tmp_path / "res2")
    index = DedupIndex.create(spark, root, _mk(spark, CORPUS))
    sink = dedup_stream_sink(spark, index, res, threshold=0.8, query_id="q2")
    texts = [
        "wave one brings entirely new vocabulary alpha beta gamma delta",
        "wave two keeps adding more fresh terms epsilon zeta eta theta",
    ]
    sink(_mk(spark, [(100, texts[0])]), 0)
    sink(_mk(spark, [(200, texts[1])]), 1)
    # batch 2 duplicates one doc from each earlier generation + the corpus
    sink(
        _mk(
            spark,
            [
                (300, texts[0]),
                (301, texts[1]),
                (302, CORPUS[0][1]),
            ],
        ),
        2,
    )
    got = {
        (r.new_doc, r.match_doc)
        for r in AcidTable(spark, res).read().filter("batch_id = 2").collect()
    }
    assert got == {(300, 100), (301, 200), (302, 1)}


def test_index_compaction_preserves_answers(spark, tmp_path):
    """OPTIMIZE on the index tables shrinks file counts without changing
    any verdict: a post-compaction batch still matches every generation."""
    root = str(tmp_path / "idx3")
    res = str(tmp_path / "res3")
    index = DedupIndex.create(spark, root, _mk(spark, CORPUS))
    sink = dedup_stream_sink(spark, index, res, threshold=0.8, query_id="q3")
    for b in range(4):
        sink(_mk(spark, [(100 + b, f"filler batch {b} unique words here now")]), b)
    pos_t = AcidTable(spark, f"{root}/pos")
    files_before = pos_t.snapshot().num_files
    versions = index.compact(target_files=1)
    assert set(versions) == {"dfreq", "pos", "sets"}
    assert AcidTable(spark, f"{root}/pos").snapshot().num_files < files_before
    sink(_mk(spark, [(500, CORPUS[1][1])]), 4)
    got = {
        (r.new_doc, r.match_doc)
        for r in AcidTable(spark, res).read().filter("batch_id = 4").collect()
    }
    assert got == {(500, 2)}


def test_resent_id_still_matches_old_copy_and_k_pinned(spark, tmp_path):
    """A re-sent doc_id is not re-folded (write-once), but the stored copy
    stays visible to lookups: a new doc near-dupping the OLD text is
    matched, and the re-sent id itself gets a same-id verdict.  A k
    mismatch at sink time fails fast."""
    import pytest

    from delta_lake_validation_spark.sources.acid.errors import AcidTableError

    root = str(tmp_path / "idx4")
    res = str(tmp_path / "res4")
    index = DedupIndex.create(spark, root, _mk(spark, CORPUS))
    sink = dedup_stream_sink(spark, index, res, threshold=0.8, query_id="q4")
    old_text = "original generation one text with unique vocabulary inside"
    sink(_mk(spark, [(7, old_text)]), 0)
    # batch 1 re-sends id 7 with NEW text, plus doc 10 matching 7's OLD text
    sink(
        _mk(
            spark,
            [
                (7, "completely rewritten text sharing nothing with before"),
                (10, old_text),
            ],
        ),
        1,
    )
    got = {
        (r.new_doc, r.match_doc, r.within_batch)
        for r in AcidTable(spark, res).read().filter("batch_id = 1").collect()
    }
    # 10 matches the stored copy of 7; the rewritten 7 shares nothing so its
    # only signal is absent (no same-id pair: texts differ below threshold)
    assert (10, 7, False) in got
    # id 7 was not re-folded: one sets row, the original text's shingles
    assert AcidTable(spark, f"{root}/sets").read().filter("id = 7").count() == 1
    # identical re-send -> same-id verdict
    sink(_mk(spark, [(7, old_text)]), 2)
    got2 = {
        (r.new_doc, r.match_doc)
        for r in AcidTable(spark, res).read().filter("batch_id = 2").collect()
    }
    assert (7, 7) in got2

    with pytest.raises(AcidTableError, match="k="):
        dedup_stream_sink(spark, index, res, threshold=0.8, query_id="q5", k=5)(
            _mk(spark, [(99, "anything at all here")]), 0
        )


def test_partial_index_commit_retry_keeps_pos_rows(spark, tmp_path, monkeypatch):
    """Ordering invariant under partial failure: if the pos append fails,
    sets must NOT have committed (it is the write-once marker), and an
    in-process retry folds the batch completely — pos rows survive."""
    import delta_lake_validation_spark.sources.acid.table as table_mod

    root = str(tmp_path / "idx")
    res = str(tmp_path / "res")
    index = DedupIndex.create(spark, root, _mk(spark, CORPUS))
    sink = dedup_stream_sink(spark, index, res, threshold=0.8, query_id="qf")

    real_append = table_mod.AcidTable.append
    state = {"fail": True}

    def flaky_append(self, df, **kw):
        if state["fail"] and self.location.endswith("/pos"):
            state["fail"] = False
            raise RuntimeError("injected pos write failure")
        return real_append(self, df, **kw)

    monkeypatch.setattr(table_mod.AcidTable, "append", flaky_append)
    b0 = _mk(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            (11, "a totally novel document with fresh unseen words inside"),
        ],
    )
    try:
        sink(b0, 0)
        raise AssertionError("expected injected failure to propagate")
    except RuntimeError:
        pass
    # sets must not contain the batch (pos failed; sets commits last)
    assert AcidTable(spark, f"{root}/sets").read().filter("id >= 10").count() == 0
    # retry the same batch: full fold + verdicts land
    sink(b0, 0)
    assert AcidTable(spark, f"{root}/pos").read().filter("id = 10").count() > 0
    assert AcidTable(spark, f"{root}/sets").read().filter("id >= 10").count() == 2
    assert _results(spark, res) == {(10, 1, False, 0)}
    # and a later batch still finds batch 0's novel doc through the index
    sink(_mk(spark, [(20, "a totally novel document with fresh unseen words inside")]), 1)
    assert (20, 11, False, 1) in _results(spark, res)

# r9 (VERDICT r8 item 1): heavy end-to-end tier — excluded from the
# driver's default run (pytest.ini addopts) so the suite fits its time
# budget; the builder runs the FULL suite (`pytest -m ""`) every round
# and commits the transcript.  The driver's quick tier still covers this
# layer via tests/test_oracle_parity.py's dml_*/delta_* scenario queries.
import pytest as _pytest_r9

pytestmark = _pytest_r9.mark.heavy
