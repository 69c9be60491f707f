"""Hypothesis property tests for the round-8 numeric helpers — pure-Python
level (no Spark session), so they run in milliseconds and explore the
input space the fixed-fixture tests can't."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from delta_lake_validation_spark.operators.similarity import (
    _fit_codebooks,
    _prune_topk,
)


# ---------------------------------------------------------------------------
# _prune_topk: the tie-safe partition-local prune must agree with a full
# lexsort for every input, including heavy score ties (the ADVICE-r7 bug
# class this helper exists to prevent)
# ---------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    ids=st.lists(st.integers(0, 50), min_size=0, max_size=40, unique=True),
    k=st.integers(1, 12),
    n_distinct_scores=st.integers(1, 4),
)
def test_prune_topk_equals_full_sort(ids, k, n_distinct_scores):
    ids = np.array(ids, dtype=np.int64)
    # few distinct scores -> many ties, the adversarial regime
    rng = np.random.RandomState(len(ids) * 31 + k)
    sims = rng.randint(0, n_distinct_scores, size=len(ids)).astype(float)
    got_ids, got_sims = _prune_topk(ids.copy(), sims.copy(), k)
    order = np.lexsort((ids, -sims))[:k]
    assert got_ids.tolist() == ids[order].tolist()
    assert got_sims.tolist() == sims[order].tolist()


@settings(max_examples=100, deadline=None)
@given(
    split=st.integers(1, 39),
    k=st.integers(1, 12),
)
def test_prune_topk_partition_invariant(split, k):
    # pruning two halves then pruning the union must equal pruning the
    # whole — the property that makes per-partition pre-selection safe
    rng = np.random.RandomState(split * 7 + k)
    ids = np.arange(40, dtype=np.int64)
    sims = rng.randint(0, 3, size=40).astype(float)
    a_ids, a_sims = _prune_topk(ids[:split], sims[:split], k)
    b_ids, b_sims = _prune_topk(ids[split:], sims[split:], k)
    m_ids = np.concatenate([a_ids, b_ids])
    m_sims = np.concatenate([a_sims, b_sims])
    got_ids, _ = _prune_topk(m_ids, m_sims, k)
    want_ids, _ = _prune_topk(ids, sims, k)
    assert got_ids.tolist() == want_ids.tolist()


# ---------------------------------------------------------------------------
# _fit_codebooks: shape, determinism, and the Lloyd-step invariant that
# every returned centroid of a populated cluster is the mean of SOME
# subset (so it lies inside the data's bounding box per dimension)
# ---------------------------------------------------------------------------
@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(8, 60),
    m_sub=st.sampled_from([1, 2, 4]),
    n_codes=st.integers(2, 8),
    seed=st.integers(0, 10_000),
)
def test_fit_codebooks_shape_determinism_bounds(n, m_sub, n_codes, seed):
    rng = np.random.RandomState(seed)
    mat = rng.normal(size=(n, 8))
    b1 = _fit_codebooks(mat, m_sub, n_codes, 3, np.random.RandomState(seed))
    b2 = _fit_codebooks(mat, m_sub, n_codes, 3, np.random.RandomState(seed))
    k = min(n_codes, n)
    assert b1.shape == (m_sub, k, 8 // m_sub)
    assert np.array_equal(b1, b2)
    sd = 8 // m_sub
    for j in range(m_sub):
        sub = mat[:, j * sd : (j + 1) * sd]
        lo, hi = sub.min(0) - 1e-9, sub.max(0) + 1e-9
        assert (b1[j] >= lo).all() and (b1[j] <= hi).all()


# ---------------------------------------------------------------------------
# The negative-division hazard quality_threshold_sweep is built around:
# executable documentation that Spark's DIV (truncation) and DuckDB's //
# (floor) disagree exactly on negative non-exact quotients, and that the
# cross-multiplication predicate sidesteps it
# ---------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    num=st.integers(-10_000, 10_000),
    den=st.integers(1, 1_000),
    t=st.integers(-2_000, 2_000),
)
def test_cross_multiplication_sidesteps_div_semantics(num, den, t):
    import duckdb

    trunc = int(num / den)  # Spark DIV
    floor = num // den  # DuckDB //
    if num % den != 0 and num < 0:
        assert trunc == floor + 1  # the engines WOULD disagree
    # the predicate both engines grade: num*1000 >= t*den — pure integer
    # compare, one answer everywhere
    want = num * 1000 >= t * den
    got = duckdb.sql(f"SELECT {num} * 1000 >= {t} * {den}").fetchone()[0]
    assert got == want
