"""Near-duplicate detection operators — the dedup family a training-data
pipeline needs (generalizing the reference's only similarity primitive, the
rounded band join at src/benchmarking_suite.py:156-163):

- ``shingles``             word k-gram set per document (pure Catalyst exprs)
- ``ngram_jaccard_pairs``  EXACT set-similarity self-join at threshold t.
  Uses the size-ratio bound (J(A,B) ≥ t ⟹ t ≤ |A|/|B| ≤ 1/t) as a provably
  lossless candidate filter, then verifies with true Jaccard — so its output
  is byte-identical to the naive all-pairs oracle while doing a fraction of
  the comparisons.  Pair verification runs vectorized in mapInPandas over a
  broadcast of (id → shingle-hash set); at cluster scale the broadcast side
  swaps for a prefix-filter join (PPJoin) with the same contract.
- ``minhash_lsh_pairs``    approximate candidate pairs via MinHash + banded
  LSH — the sub-quadratic scale path.  Signatures are computed entirely
  JVM-side: one xxhash64 per shingle, then ``num_perm`` universal-hash mins
  ((a·h + b) mod p, p = 2³¹−1) in a single hash aggregate; banding is a
  self-join on (band, band-hash).  Emits the signature-estimated Jaccard.
- ``simhash_pairs``        32-bit SimHash near-dups at Hamming distance ≤ d,
  candidates via chunk pigeonhole (d+1 chunks: any pair within distance d
  agrees on ≥1 chunk), verified with bit_count(xor).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_P31 = (1 << 31) - 1  # universal-hash modulus


def shingles(text_col: F.Column | str, k: int = 3) -> F.Column:
    """Distinct word k-gram set of a text column, as array<string>."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard self-join
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    spark: SparkSession,
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    scale: int = 4,
) -> DataFrame:
    """All pairs (left < right) with k-gram Jaccard ≥ threshold — exact."""
    sh = docs.select(F.col(id_col).alias("id"), shingles(text_col, k).alias("s"))
    rows = sh.select("id", F.transform("s", lambda x: F.xxhash64(x)).alias("h")).collect()
    if not rows:
        return spark.createDataFrame([], "left_doc long, right_doc long, jaccard double")
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    sets = [frozenset(r["h"]) for r in rows]
    sizes = np.array([len(s) for s in sets], dtype=np.int64)
    bc = spark.sparkContext.broadcast((ids, sets, sizes))

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r_ids, r_sets, r_sizes = bc.value
        order = {int(v): i for i, v in enumerate(r_ids)}
        for pdf in batches:
            out_l, out_r, out_j = [], [], []
            for lid in pdf["id"]:
                li = order[int(lid)]
                a, na = r_sets[li], r_sizes[li]
                if na == 0:
                    continue
                # size-ratio bound: lossless pruning for J >= threshold
                cand = np.nonzero(
                    (r_ids > lid)
                    & (r_sizes * threshold <= na)
                    & (na * threshold <= r_sizes)
                )[0]
                for ri in cand:
                    b = r_sets[ri]
                    inter = len(a & b)
                    union = na + r_sizes[ri] - inter
                    j = round(inter / union, scale) if union else 0.0
                    if j >= threshold:
                        out_l.append(lid)
                        out_r.append(r_ids[ri])
                        out_j.append(j)
            if out_l:
                yield pd.DataFrame(
                    {"left_doc": out_l, "right_doc": out_r, "jaccard": out_j}
                )

    return sh.select("id").mapInPandas(
        block, "left_doc long, right_doc long, jaccard double"
    )


# ---------------------------------------------------------------------------
# MinHash signatures + banded LSH (sub-quadratic scale path)
# ---------------------------------------------------------------------------
def _hash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, _P31)), int(rng.randint(0, _P31)))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    k: int = 3,
) -> DataFrame:
    """(id, sig array<long>) — one shingle explode + one hash aggregate, all
    JVM-side codegen; scales linearly in corpus size."""
    sh = docs.select(F.col(id_col).alias("id"), shingles(text_col, k).alias("s"))
    exploded = sh.select("id", F.explode("s").alias("g"))
    base = exploded.select("id", F.pmod(F.xxhash64("g"), F.lit(_P31)).alias("h"))
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_P31)).alias(f"m{i}")
        for i, (a, b) in enumerate(_hash_params(num_perm))
    ]
    agg = base.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"))


def minhash_lsh_pairs(
    spark: SparkSession,
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, with the signature
    Jaccard estimate.  Approximate by construction (recall
    1-(1-t^r)^bands for rows-per-band r) — the oracle-exact counterpart is
    ngram_jaccard_pairs."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, id_col, text_col, num_perm, k)
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", "sig", *band_cols)
    bands_long = banded.select(
        "id",
        "sig",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("v")) for b in range(bands)])
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.b").alias("b"), F.col("bk.v").alias("v"))
    a = bands_long.alias("a")
    bb = bands_long.alias("b")
    cand = (
        a.join(bb, (F.col("a.b") == F.col("b.b")) & (F.col("a.v") == F.col("b.v")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("left_doc"),
            F.col("b.id").alias("right_doc"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["left_doc", "right_doc"])
    )
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e))
        / F.lit(float(num_perm)),
        4,
    )
    return cand.select("left_doc", "right_doc", est.cast("double").alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs
# ---------------------------------------------------------------------------
def simhash32(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash long) — 32-bit SimHash over whitespace tokens, computed
    as 32 signed bit-vote aggregates (pure hash-agg, scales linearly)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("tok"),
    )
    h = toks.select("id", F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{bit}")
        for bit in range(32)
    ]
    agg = h.groupBy("id").agg(*votes)
    sim = None
    for bit in range(32):
        term = F.when(F.col(f"v{bit}") > 0, F.lit(1 << bit)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("id", sim.cast("long").alias("simhash"))


def simhash_pairs(
    spark: SparkSession,
    docs: DataFrame,
    max_hamming: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs at Hamming distance ≤ max_hamming between 32-bit SimHashes.
    Candidates via the pigeonhole chunk trick (max_hamming+1 chunks: any
    qualifying pair agrees exactly on at least one chunk), verified with
    bit_count(xor) — exact w.r.t. the SimHash values themselves."""
    chunks = max_hamming + 1
    width = 32 // chunks
    sim = simhash32(docs, id_col, text_col)
    chunk_cols = [
        (F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << width) - 1))).alias(
            f"c{i}"
        )
        for i in range(chunks)
    ]
    s = sim.select("id", "simhash", *chunk_cols)
    pieces = []
    for i in range(chunks):
        a = s.alias("a")
        b = s.alias("b")
        pieces.append(
            a.join(b, F.col(f"a.c{i}") == F.col(f"b.c{i}"))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("left_doc"),
                F.col("b.id").alias("right_doc"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"),
            )
        )
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.unionByName(p)
    cand = cand.dropDuplicates(["left_doc", "right_doc"])
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("left_doc", "right_doc", "hamming")
    )
