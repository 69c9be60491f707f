"""Near-duplicate detection operators — the dedup family a training-data
pipeline needs (generalizing the reference's only similarity primitive, the
rounded band join at src/benchmarking_suite.py:156-163):

- ``shingles``             word k-gram set per document (pure Catalyst exprs)
- ``ngram_jaccard_pairs``  EXACT set-similarity self-join at threshold t via
  distributed prefix filtering (PPJoin family): rare-first prefix shingles as
  join keys + the size-ratio bound (J ≥ t ⟹ t ≤ |A|/|B| ≤ 1/t), both
  provably lossless, then JVM-side array_intersect verification — output is
  byte-identical to the naive all-pairs oracle with no driver collect or
  corpus broadcast anywhere.
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

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_P31 = (1 << 31) - 1  # universal-hash modulus


def _sha60(col: F.Column) -> F.Column:
    """60-bit positive hash from the sha256 hex prefix.

    The cross-engine grading profile: Spark's ``sha2(s, 256)`` and DuckDB's
    ``sha256(s)`` emit the same hex, and both engines cast a 15-hex-char
    prefix to the same BIGINT — so every hash-derived operator output
    (MinHash signatures, SimHash bits, LSH bands) becomes exactly
    SQL-mirrorable and the driver can value-grade the whole pipeline.
    ~10× slower per call than xxhash64 but still JVM-side and vectorized;
    the default profile stays xxhash64 for throughput-critical use."""
    return F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 15), 16, 10).cast(
        "long"
    )


def _hash_col(col: F.Column, hash_mode: str) -> F.Column:
    if hash_mode == "xxhash64":
        return F.xxhash64(col)
    if hash_mode == "sha256":
        return _sha60(col)
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def shingles(text_col: F.Column | str, k: int = 3) -> F.Column:
    """Distinct word k-gram set of a text column, as array<string>.

    Expression form (higher-order functions) — convenient for small inputs,
    but HOF lambdas evaluate interpreted.  The hot paths below use
    :func:`shingle_hashes` instead, which stays in whole-stage codegen."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def shingle_gram_arrays(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, gs array<string>): every k-gram occurrence per doc (NOT deduped),
    assembled map-side with the aligned-slice zip.  This is the ONE
    tokenize+assemble pass every shingle consumer derives from —
    :func:`shingle_hash_arrays` (distinct hash sets) and the exploded gram
    stream (MinHash) are both cheap projections of it, so a query that
    needs several shingle views (dedup_eval_pr: LSH + exact legs) can
    persist this frame once instead of re-tokenizing the corpus per leg
    (guide §1.2 — remove whole passes)."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    d = docs.select(F.col(id_col).alias("id"), toks.alias("__t"))
    n = F.size(F.col("__t"))
    m = (n - F.lit(k - 1)).cast("int")
    parts = [F.slice(F.col("__t"), j + 1, m).alias(f"w{j}") for j in range(k)]
    zipped = F.arrays_zip(*parts)
    gs = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(k)])
    )
    gs = F.when(n >= k, gs).otherwise(F.array().cast("array<string>"))
    return d.select("id", gs.alias("gs"))


def shingle_hash_arrays(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    hash_mode: str = "xxhash64",
    grams: DataFrame | None = None,
) -> DataFrame:
    """(id, hs array<long>): each doc's DISTINCT shingle-hash set, computed
    entirely map-side — zero shuffles (r8 optimization; guide §2.4).

    The k-gram assembly is k aligned native ``slice``s zipped together
    (``arrays_zip``), so the only interpreted piece is one ``transform``
    lambda doing concat_ws + hash per gram; everything else (split, slice,
    zip, array_distinct) is native.  Hash values are bit-identical to the
    old posexplode→window path (same gram string, same hash fn), but the
    two token-level shuffles that path paid (window partitionBy id, then
    distinct) are gone: tokens never leave their scan task.  Measured 1.6×
    faster at sf0.1 even before the downstream wins (``sets`` and ``sz``
    now derive from the array for free — no groupBy/window).

    ``grams``: an optional precomputed :func:`shingle_gram_arrays` frame
    (id, gs) — callers that feed several shingle consumers pass the one
    (usually persisted) gram frame so the corpus is tokenized once.
    array_distinct over the hashes equals hashing the distinct grams
    (same-gram ⟹ same-hash; distinct collapses by value either way).
    Default-path callers (grams=None) get the hash FUSED into the gram
    lambda — one transform, no intermediate string array per row (the r8
    single-pass shape); the two-step form runs only when a shared gram
    frame actually exists."""
    if hash_mode not in ("xxhash64", "sha256"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")

    def gram_hash(g: F.Column) -> F.Column:
        return F.xxhash64(g) if hash_mode == "xxhash64" else _sha60(g)

    if grams is not None:
        hs = F.array_distinct(F.transform("gs", gram_hash))
        return grams.select("id", hs.alias("hs"))
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    d = docs.select(F.col(id_col).alias("id"), toks.alias("__t"))
    n = F.size(F.col("__t"))
    m = (n - F.lit(k - 1)).cast("int")
    parts = [F.slice(F.col("__t"), j + 1, m).alias(f"w{j}") for j in range(k)]
    zipped = F.arrays_zip(*parts)
    hs = F.transform(
        zipped,
        lambda s: gram_hash(F.concat_ws(" ", *[s[f"w{j}"] for j in range(k)])),
    )
    hs = F.when(n >= k, F.array_distinct(hs)).otherwise(
        F.array().cast("array<long>")
    )
    return d.select("id", hs.alias("hs"))


def shingle_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Exploded distinct (id, shingle-hash) rows — explode of
    :func:`shingle_hash_arrays` (same contract as the historical
    window+distinct implementation, same hash values, no shuffle)."""
    return shingle_hash_arrays(docs, id_col, text_col, k, hash_mode).select(
        "id", F.explode("hs").alias("h")
    )


def _shingle_grams_exploded(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    grams: DataFrame | None = None,
) -> DataFrame:
    """(id, g): every k-gram occurrence (NOT deduped), assembled map-side
    with the aligned-slice zip — for consumers whose aggregate is
    duplicate-insensitive (MinHash min, SimHash votes).  Keeping the hash
    OUT of the per-element lambda lets an expensive hash (sha256 grading
    mode) run vectorized on the exploded column instead.  ``grams``: an
    optional precomputed :func:`shingle_gram_arrays` frame shared with
    other shingle consumers of the same query."""
    if grams is None:
        grams = shingle_gram_arrays(docs, id_col, text_col, k)
    return grams.select("id", F.explode("gs").alias("g"))



def _rank_positions(
    sh: DataFrame, dfreq: DataFrame, outer: bool = False, has_sz: bool = True
) -> DataFrame:
    """(id, h, pos, sz): each doc's shingles ranked rare-first by (df, h)
    with the doc's shingle count — the ONE implementation of the PPJoin
    ordering shared by the self-join, the index build, and the incremental
    lookup (a bound-math fix must land once, not four times).  ``outer``
    ranks shingles absent from ``dfreq`` as df=0 (rarest) — the incremental
    contract for unseen batch shingles.  ``has_sz``: the caller precomputed
    the doc's shingle count as a ``sz`` column (free when sh derives from
    shingle_hash_arrays) — an EXPLICIT declaration (ADVICE r8: the old
    column-name sniff would silently misread an unrelated 'sz' column),
    validated against the frame."""
    from pyspark.sql import Window

    if has_sz != ("sz" in sh.columns):
        raise ValueError(
            f"has_sz={has_sz} but input columns are {sh.columns}: pass the "
            "precomputed per-doc shingle count as 'sz' (or drop/rename an "
            "unrelated 'sz' column) — guessing from column names silently "
            "uses wrong doc sizes"
        )
    ranked = sh.join(dfreq, "h", "left" if outer else "inner")
    if outer:
        ranked = ranked.fillna(0, subset=["df"])
    w = Window.partitionBy("id").orderBy("df", "h")
    if has_sz:
        # precomputed size: skip the whole-partition count window
        return ranked.select("id", "h", F.row_number().over(w).alias("pos"), "sz")
    wall = Window.partitionBy("id")
    return ranked.select(
        "id",
        "h",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wall).alias("sz"),
    )


def _prefix_filter(pos_df: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """Keep each doc's first sz - ceil(t*sz) + 1 ranked shingles (integer
    ceil: float thresholds broke losslessness exactly at J == t)."""
    ceil_t_sz = (F.col("sz") * t_num + F.lit(t_den - 1)).cast("long") / F.lit(t_den)
    return pos_df.filter(F.col("pos") <= F.col("sz") - F.floor(ceil_t_sz) + 1)


def _ppjoin_candidates(
    a_pref: DataFrame,
    b_pref: DataFrame,
    t_num: int,
    t_den: int,
    left: str,
    right: str,
    require_lt: bool = False,
) -> DataFrame:
    """The ONE implementation of the lossless PPJoin candidate join between
    two prefix frames (each (id, h, pos, sz)): shared-prefix-shingle equality
    + the size-ratio bound (J ≥ t ⟹ t·|A| ≤ |B| ∧ t·|B| ≤ |A|) + the
    positional overlap upper bound (at shared shingle positions (pa, pb),
    overlap ≤ min(|A|−pa, |B|−pb)+1, and J ≥ t ⟺ overlap ≥
    ceil(t·(|A|+|B|)/(1+t)); integer form of x ≥ ceil(y/d): x·d ≥ y).
    ``require_lt`` adds a.id < b.id for self-joins.  A bound-math fix lands
    here once, for every PPJoin-family operator."""
    overlap_ub = (
        F.least(F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos"))
        + 1
    )
    cond = (
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.sz") * t_num <= F.col("b.sz") * t_den)
        & (F.col("b.sz") * t_num <= F.col("a.sz") * t_den)
        & (
            overlap_ub * F.lit(t_den + t_num)
            >= F.lit(t_num) * (F.col("a.sz") + F.col("b.sz"))
        )
    )
    if require_lt:
        cond = cond & (F.col("a.id") < F.col("b.id"))
    return (
        a_pref.alias("a")
        .join(b_pref.alias("b"), cond)
        .select(F.col("a.id").alias(left), F.col("b.id").alias(right))
        .distinct()
    )


def _verify_pairs(
    cand: DataFrame,
    sets_a: DataFrame,
    sets_b: DataFrame,
    t_num: int,
    t_den: int,
    scale: int,
    left: str,
    right: str,
) -> DataFrame:
    """The ONE exact-Jaccard verification: join candidates to both (id, hs)
    sorted-set frames, intersect JVM-side, threshold on the unrounded ratio
    via exact cross-multiplication (float-rounded thresholds and engine
    round() ties both produced off-by-one row counts at sf0.1), display
    value in explicit half-up rounding."""
    from delta_lake_validation_spark.functions.aggregates import round_half_up

    return (
        cand.join(
            sets_a.withColumnRenamed("id", left).withColumnRenamed("hs", "hs_a"),
            left,
        )
        .join(
            sets_b.withColumnRenamed("id", right).withColumnRenamed("hs", "hs_b"),
            right,
        )
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn("uni", F.size("hs_a") + F.size("hs_b") - F.col("inter"))
        .filter(F.col("inter") * t_den >= F.col("uni") * t_num)
        .withColumn("jaccard", round_half_up(F.col("inter") / F.col("uni"), scale))
        .select(left, right, "jaccard")
    )


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
    grams: DataFrame | None = None,
) -> DataFrame:
    """All pairs (left < right) with k-gram Jaccard ≥ threshold — EXACT, via
    distributed prefix filtering (PPJoin family).

    Two provably lossless candidate filters compose (both live in
    :func:`_ppjoin_candidates`):

    1. *Prefix filter*: order each document's shingles by global rarity
       (document frequency, tie-broken by hash — a total order).  For
       J(A,B) ≥ t, A and B must share at least one shingle among each
       other's first ⌊(1−t)·|X|⌋+1 shingles in that order; rare-first
       ordering makes those prefix shingles poor join keys for false pairs,
       so candidate groups stay small and skew-free.
    2. *Size-ratio filter*: J ≥ t ⟹ t ≤ |A|/|B| ≤ 1/t, applied inside the
       join condition.

    Verification (:func:`_verify_pairs`) computes true Jaccard with native
    array_intersect on the (sorted) hash sets — JVM-side, only for surviving
    candidates.  Every stage is a DataFrame op: no driver collect, no
    broadcast of the corpus; shuffles are by shingle hash (candidates) and
    doc id (sets) — the shape that scales to billions of documents.
    """
    from fractions import Fraction

    # exact rational threshold: float 0.8 is 0.8000000000000000444…, which
    # silently breaks the "lossless" bounds exactly at J == t (a 35/28-sized
    # pair was pruned at sf0.1).  All bound math is integer.
    frac = Fraction(threshold).limit_denominator(1_000_000)
    t_num, t_den = frac.numerator, frac.denominator

    # the shingle-array pipeline (tokenize → k-gram hash sets, all map-side)
    # feeds BOTH the prefix path and the verification sets — cache the
    # per-doc arrays (one row per doc, the smallest representation) so the
    # text is tokenized once.  Lifecycle note: the cache entry lives until
    # the session clears it (bench.py and the grading driver clearCache()
    # between queries); a long-lived interactive session should
    # clearCache() periodically.
    arr = shingle_hash_arrays(docs, id_col, text_col, k, grams=grams).persist()
    sh = arr.select("id", F.size("hs").cast("long").alias("sz"), F.explode("hs").alias("h"))
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    prefix = _prefix_filter(_rank_positions(sh, dfreq), t_num, t_den)
    cand = _ppjoin_candidates(
        prefix, prefix, t_num, t_den, "left_doc", "right_doc", require_lt=True
    )
    # sorted verification sets come straight from the cached arrays — the
    # groupBy(id)/collect_list shuffle the exploded form needed is gone
    sets = arr.select("id", F.array_sort("hs").alias("hs"))
    out = _verify_pairs(
        cand, sets, sets, t_num, t_den, scale, "left_doc", "right_doc"
    )
    out._graft_caches = [arr]  # released by streaming callers after materializing
    return out


# ---------------------------------------------------------------------------
# Exact containment join (asymmetric near-dup: A's shingles inside B)
# ---------------------------------------------------------------------------
def containment_pairs(
    spark: SparkSession,
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """All ordered pairs (a, b), a != b, with containment
    C(a,b) = |S_a ∩ S_b| / |S_a| ≥ threshold — EXACT, via the one-sided
    PPJoin prefix filter.  Containment is the quote/inclusion-detection
    primitive (a short doc pasted inside a long one scores C≈1 while its
    Jaccard vanishes), so it catches what the symmetric join cannot.

    Lossless candidate filters (one-sided versions of ngram_jaccard_pairs'
    bounds — the asymmetry changes the math):

    1. *A-side prefix*: if B misses ALL of A's first |A| − ⌈t·|A|⌉ + 1
       rare-first shingles, then |A∩B| ≤ ⌈t·|A|⌉ − 1 < t·|A| — so only A's
       prefix generates candidates.  B has no prefix (B may be arbitrarily
       larger than A and still contain it), so B posts every shingle; the
       rare-first order keeps hot shingles out of A-prefixes, which is what
       bounds a hot posting list's fan-out.
    2. *One-sided size bound*: |A∩B| ≥ t·|A| ⟹ |B| ≥ t·|A| (lower bound
       only — no upper bound exists for containment).
    3. *Positional bound*: at a shared shingle with ranks (pa, pb),
       |A∩B| ≤ min(|A|−pa, |B|−pb) + 1; require that ≥ ⌈t·|A|⌉.

    All bound math is integer (Fraction threshold — float 0.8 breaks
    losslessness exactly at C == t, the ngram_jaccard lesson).
    Verification intersects the sorted hash sets JVM-side for surviving
    candidates only.  Returns (a_doc, b_doc, n_shared, sz_a) — all
    integers, so the result value-hashes exactly.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    t_num, t_den = frac.numerator, frac.denominator

    arr = shingle_hash_arrays(docs, id_col, text_col, k).persist()
    sh = arr.select("id", F.size("hs").cast("long").alias("sz"), F.explode("hs").alias("h"))
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    pos = _rank_positions(sh, dfreq)
    a_pref = _prefix_filter(pos, t_num, t_den)

    a = a_pref.alias("a")
    b = pos.alias("b")
    overlap_ub = (
        F.least(F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos"))
        + 1
    )
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") != F.col("b.id"))
            & (F.col("b.sz") * t_den >= F.col("a.sz") * t_num)
            & (overlap_ub * t_den >= F.col("a.sz") * t_num),
        )
        .select(F.col("a.id").alias("a_doc"), F.col("b.id").alias("b_doc"))
        .distinct()
    )
    sets = arr.select("id", F.array_sort("hs").alias("hs"))
    out = (
        cand.join(
            sets.withColumnRenamed("id", "a_doc").withColumnRenamed("hs", "hs_a"),
            "a_doc",
        )
        .join(
            sets.withColumnRenamed("id", "b_doc").withColumnRenamed("hs", "hs_b"),
            "b_doc",
        )
        .withColumn("n_shared", F.size(F.array_intersect("hs_a", "hs_b")).cast("long"))
        .withColumn("sz_a", F.size("hs_a").cast("long"))
        .filter(F.col("n_shared") * t_den >= F.col("sz_a") * t_num)
        .select("a_doc", "b_doc", "n_shared", "sz_a")
    )
    out._graft_caches = [arr]
    return out


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
    hash_mode: str = "xxhash64",
    grams: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>) — one shingle explode + one hash aggregate, all
    JVM-side codegen; scales linearly in corpus size.

    Uses the NON-deduped gram stream (min is duplicate-insensitive, so the
    signature is identical to the distinct-set form) with the hash applied
    vectorized after the explode — no shuffle before the one hash
    aggregate, and the sha256 grading mode stays out of interpreted
    lambdas.  ``grams``: optional shared :func:`shingle_gram_arrays`
    frame."""
    base = _shingle_grams_exploded(docs, id_col, text_col, k, grams=grams).select(
        "id", F.pmod(_hash_col(F.col("g"), hash_mode), F.lit(_P31)).alias("h")
    )
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
    hash_mode: str = "xxhash64",
    grams: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, with the signature
    Jaccard estimate.  Approximate by construction (recall
    1-(1-t^r)^bands for rows-per-band r) — the oracle-exact counterpart is
    ngram_jaccard_pairs.

    With ``hash_mode="sha256"`` the whole pipeline (shingle hash →
    signature → band keys → estimate) is deterministic integer/dyadic
    arithmetic that DuckDB reproduces bit-for-bit, so the LSH output itself
    is value-gradeable; band keys are then the plain signature-slice
    strings instead of an xxhash64 (bigger shuffle key, same semantics)."""
    if bands <= 0 or num_perm % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm}: a zero "
            "rows-per-band degenerates the band join to a full cross join, "
            "and a remainder silently discards permutations (recall would "
            "no longer match the documented 1-(1-t^r)^b)"
        )
    rows_per_band = num_perm // bands
    sig = minhash_signatures(
        docs, id_col, text_col, num_perm, k, hash_mode, grams=grams
    )

    def band_key(b: int) -> F.Column:
        elems = [
            F.element_at("sig", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        if hash_mode == "sha256":
            return F.concat_ws(",", *[e.cast("string") for e in elems])
        return F.xxhash64(F.lit(b), *elems)

    band_cols = [band_key(b).alias(f"band{b}") for b in range(bands)]
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
    # exact dyadic ratio (matches / 2^5): no rounding, so the value is
    # bit-identical across engines — a round() here would reintroduce
    # HALF_UP-vs-HALF_EVEN drift against the SQL mirror
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e))
        / F.lit(float(num_perm))
    )
    return cand.select("left_doc", "right_doc", est.cast("double").alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs
# ---------------------------------------------------------------------------
def simhash32(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, simhash long) — 32-bit SimHash over whitespace tokens, computed
    as 32 signed bit-vote aggregates (pure hash-agg, scales linearly)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("tok"),
    )
    h = toks.select("id", _hash_col(F.col("tok"), hash_mode).alias("h"))
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
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Pairs at Hamming distance ≤ max_hamming between 32-bit SimHashes.
    Candidates via the pigeonhole chunk trick (max_hamming+1 chunks: any
    qualifying pair agrees exactly on at least one chunk), verified with
    bit_count(xor) — exact w.r.t. the SimHash values themselves (and with
    ``hash_mode="sha256"`` exactly SQL-mirrorable, see :func:`_sha60`)."""
    chunks = max_hamming + 1
    width = 32 // chunks
    sim = simhash32(docs, id_col, text_col, hash_mode)
    # ONE join keyed by (chunk index, chunk value) over the exploded chunk
    # rows replaces the former union of `chunks` separate self-joins — the
    # same candidate set (a pair surfaces once per agreeing chunk either
    # way; dropDuplicates collapses it) through a single exchange instead
    # of `chunks` exchanges per side (guide §2.4).
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("cv"),
            )
            for i in range(chunks)
        ]
    )
    s = sim.select(
        "id", "simhash", F.explode(chunk_structs).alias("ch")
    ).select("id", "simhash", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    a, b = s.alias("a"), s.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("left_doc"),
            F.col("b.id").alias("right_doc"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["left_doc", "right_doc"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("left_doc", "right_doc", "hamming")
    )


# ---------------------------------------------------------------------------
# Duplicate clustering: connected components over the near-dup pair graph
# ---------------------------------------------------------------------------
def dedup_clusters(
    spark: SparkSession,
    pairs: DataFrame,
    left_col: str = "left_doc",
    right_col: str = "right_doc",
    max_iterations: int = 20,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Group near-duplicate pairs into clusters: (id, cluster_id) where
    cluster_id is the minimum member id — i.e. connected components by
    iterative label propagation (large-star/small-star style).

    Each iteration joins every node's current label against its neighbors'
    and keeps the minimum; converges in O(diameter) rounds (dup clusters
    are near-cliques, so 2-3 in practice; ``max_iterations`` bounds
    pathological chains).  All DataFrame joins — no driver graph, so the
    edge list can be billions of pairs.  This is the "keep one per
    cluster" step after ngram_jaccard_pairs / minhash_lsh_pairs /
    cosine_self_pairs.
    """
    edges = (
        pairs.select(F.col(left_col).alias("a"), F.col(right_col).alias("b"))
        .unionByName(
            pairs.select(F.col(right_col).alias("a"), F.col(left_col).alias("b"))
        )
        .distinct()
    )
    # small edge sets: a driver union-find beats 2-3 rounds of shuffle jobs
    # by ~30×; the distributed loop below is the identical-contract scale
    # path (tested equal in tests/test_dedup_ops.py).  Persist BEFORE the
    # probe so the (often expensive PPJoin) pipeline the probe executes is
    # cached for the distributed loop instead of recomputed from scratch.
    edges = edges.persist()
    probe = edges.take(driver_threshold + 1)
    if len(probe) <= driver_threshold:
        try:
            parent: dict = {}

            def find(x):
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in probe:
                ra, rb = find(r["a"]), find(r["b"])
                if ra != rb:
                    hi, lo = max(ra, rb), min(ra, rb)
                    parent[hi] = lo
            rows = [(node, find(node)) for node in sorted(parent)]
            # id type follows the input (string entity keys work the same
            # as numeric doc ids; both paths share this contract)
            id_type = pairs.schema[left_col].dataType
            from pyspark.sql.types import StructField, StructType as _ST

            schema = _ST(
                [StructField("id", id_type), StructField("cluster_id", id_type)]
            )
            return spark.createDataFrame(rows, schema)
        finally:
            edges.unpersist()

    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        # checkpoint FIRST (one evaluation of the round's joins), then run
        # the convergence probe on the two materialized label sets — the
        # previous order evaluated the uncached `updated` plan twice
        new_labels = updated.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iterations} rounds "
            "(component diameter exceeds the bound) — raise max_iterations; "
            "silently returning partial labels would split real clusters"
        )
    edges.unpersist()
    return labels


# ---------------------------------------------------------------------------
# Incremental exact dedup: new batch vs. an indexed corpus
# ---------------------------------------------------------------------------
def build_shingle_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    hash_mode: str = "xxhash64",
) -> dict[str, DataFrame]:
    """Corpus-side index for :func:`incremental_jaccard_pairs`: three
    DataFrames the caller persists once (parquet or an ACID table) —

    - ``dfreq``  (h, df): corpus document frequency per shingle hash, the
      frozen global rarity order every later batch ranks against;
    - ``pos``    (id, h, pos, sz): each corpus doc's shingles with their
      rank in (df, h) order and the doc's shingle count — the prefix-filter
      side.  Threshold-independent: a query at threshold t keeps
      ``pos <= sz - ceil(t*sz) + 1``, so one index serves any t;
    - ``sets``   (id, hs): sorted shingle-hash set per doc, the exact-
      verification side.

    At 100 TB the index is written bucketed by ``h`` (pos/dfreq) and ``id``
    (sets); each incoming batch then joins without reshuffling the corpus —
    the whole point: ingestion cost is O(batch + candidates), never
    O(corpus).
    """
    # one shingle scan feeds all three outputs (dfreq, pos, sets): without
    # the persist, materializing the index re-tokenizes the corpus 3×
    arr = shingle_hash_arrays(docs, id_col, text_col, k, hash_mode).persist()
    sh = arr.select("id", F.size("hs").cast("long").alias("sz"), F.explode("hs").alias("h"))
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    pos = _rank_positions(sh, dfreq)
    sets = arr.select("id", F.array_sort("hs").alias("hs"))
    return {"dfreq": dfreq, "pos": pos, "sets": sets}


def incremental_jaccard_pairs(
    spark: SparkSession,
    batch: DataFrame,
    index: dict[str, DataFrame],
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    scale: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """EXACT k-gram Jaccard pairs between a new batch and an indexed corpus
    (batch × corpus only — the incremental-ingestion shape): same lossless
    bounds as :func:`ngram_jaccard_pairs` (shared :func:`_ppjoin_candidates`
    / :func:`_verify_pairs`), but the corpus side comes entirely from the
    prebuilt index — corpus text is never re-shingled or re-scanned.

    Ordering consistency: BOTH sides rank shingles by the *corpus* document
    frequency (batch shingles unseen in the corpus get df=0, i.e. rarest).
    The prefix theorem only needs one shared total order, so freezing the
    corpus's order keeps the filter lossless for every future batch without
    index rebuilds; (df, h) ties are broken by hash, a total order.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    t_num, t_den = frac.numerator, frac.denominator

    arr_b = shingle_hash_arrays(batch, id_col, text_col, k, hash_mode).persist()
    sh_b = arr_b.select("id", F.size("hs").cast("long").alias("sz"), F.explode("hs").alias("h"))
    pos_b = _rank_positions(sh_b, index["dfreq"].select("h", "df"), outer=True)
    pref_b = _prefix_filter(pos_b, t_num, t_den)  # batch
    pref_c = _prefix_filter(index["pos"], t_num, t_den)  # corpus
    cand = _ppjoin_candidates(
        pref_b, pref_c, t_num, t_den, "new_doc", "corpus_doc"
    )
    sets_b = arr_b.select("id", F.array_sort("hs").alias("hs"))
    out = _verify_pairs(
        cand, sets_b, index["sets"], t_num, t_den, scale, "new_doc", "corpus_doc"
    )
    out._graft_caches = [arr_b]  # released by streaming callers after materializing
    return out


def batch_dedup_pairs(
    spark: SparkSession,
    batch: DataFrame,
    index: dict[str, DataFrame],
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    scale: int = 4,
    hash_mode: str = "xxhash64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Batch-vs-index AND within-batch exact Jaccard pairs in ONE plan:
    the streaming sink needs both verdicts per micro-batch, and running
    :func:`incremental_jaccard_pairs` + :func:`ngram_jaccard_pairs`
    separately re-ranks and re-aggregates the same batch shingles twice.
    Here a single corpus-frozen rank/prefix frame feeds both candidate
    joins (the prefix theorem needs only *a* shared total order, so the
    within-batch pairs rank by the corpus dfreq too — candidates differ,
    the verified exact pairs do not), and one sorted-set aggregate serves
    all verifications.  ``shingles`` (the batch's :func:`shingle_hash_arrays`
    frame — (id, hs), cache owned by the caller) skips re-tokenizing the
    batch.

    Returns (new_doc, match_doc, jaccard, within_batch): index matches have
    within_batch=false; batch-internal pairs (new_doc < match_doc) true.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    t_num, t_den = frac.numerator, frac.denominator

    own_sh = shingles is None
    arr_b = (
        shingle_hash_arrays(batch, id_col, text_col, k, hash_mode).persist()
        if own_sh
        else shingles
    )
    sh_b = arr_b.select("id", F.size("hs").cast("long").alias("sz"), F.explode("hs").alias("h"))
    pos_b = _rank_positions(sh_b, index["dfreq"].select("h", "df"), outer=True)
    # the batch prefix frame feeds three joins (vs-corpus + both sides of
    # within-batch): persist it, sized O(batch shingles)
    pref_b = _prefix_filter(pos_b, t_num, t_den).persist()
    pref_c = _prefix_filter(index["pos"], t_num, t_den)
    sets_b = arr_b.select("id", F.array_sort("hs").alias("hs"))

    vs_index = _verify_pairs(
        _ppjoin_candidates(pref_b, pref_c, t_num, t_den, "new_doc", "match_doc"),
        sets_b,
        index["sets"],
        t_num,
        t_den,
        scale,
        "new_doc",
        "match_doc",
    ).withColumn("within_batch", F.lit(False))
    within = _verify_pairs(
        _ppjoin_candidates(
            pref_b, pref_b, t_num, t_den, "new_doc", "match_doc", require_lt=True
        ),
        sets_b,
        sets_b,
        t_num,
        t_den,
        scale,
        "new_doc",
        "match_doc",
    ).withColumn("within_batch", F.lit(True))
    out = vs_index.unionByName(within)
    out._graft_caches = ([arr_b] if own_sh else []) + [pref_b]
    return out
