"""Streaming heavy hitters via space-saving (Misra-Gries family) state.

The batch CMS operator (plans/curation.py heavy_hitters_cms) answers "how
often did X occur"; this answers the streaming question "which tokens are
trending RIGHT NOW" with bounded state — the canonical custom stateful
operator the declarative windowed aggregations cannot express (candidate
eviction is a per-key state machine, not an aggregate).

Sharding design (the part that makes it scale): state is keyed by
``pmod(xxhash64(token), n_shards)``, so

* every occurrence of a token lands in the SAME state group — the
  space-saving guarantee (any token with count > N_shard / capacity is
  tracked, and est - err <= true <= est) holds per shard exactly as in the
  single-node algorithm;
* the n_shards groups spread across executors, and total state is bounded
  at n_shards x capacity (token, count, err) triples REGARDLESS of stream
  length — never a per-token state row (a web stream has 10^9+ distinct
  tokens) and never a single global state task.

State lives in Spark's checkpointed state store; totals survive restarts
(verified by the cross-run checkpoint pytest).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "shard long, tok string, est long, err long"
# arrays, one slot per tracked candidate (parallel lists)
STATE_SCHEMA = "toks array<string>, ests array<long>, errs array<long>"

DEFAULT_CAPACITY = 16
DEFAULT_SHARDS = 32


def _space_saving_update(capacity: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            toks, ests, errs = state.get
            cand = {t: [e, r] for t, e, r in zip(toks, ests, errs)}
        else:
            cand = {}
        for pdf in pdfs:
            # batch-local exact counts first: one dict op per DISTINCT
            # token per micro-batch, not per occurrence.  Iteration and
            # eviction both tie-break on the token string so the surviving
            # candidate set is deterministic across runs even when counts
            # tie (pandas value_counts order and dict insertion order are
            # otherwise run-dependent) — ADVICE r7.
            counts = pdf["tok"].value_counts()
            for tok in sorted(counts.index):
                n = int(counts[tok])
                if tok in cand:
                    cand[tok][0] += n
                elif len(cand) < capacity:
                    cand[tok] = [n, 0]
                else:
                    # space-saving eviction: replace the minimum candidate
                    # (ties broken by token ASC); the newcomer inherits its
                    # count as overestimate error
                    victim = min(cand.items(), key=lambda kv: (kv[1][0], kv[0]))[0]
                    vest = cand[victim][0]
                    del cand[victim]
                    cand[tok] = [vest + n, vest]
        toks = list(cand)
        ests = [cand[t][0] for t in toks]
        errs = [cand[t][1] for t in toks]
        state.update((toks, ests, errs))
        yield pd.DataFrame(
            {"shard": shard, "tok": toks, "est": ests, "err": errs}
        )

    return update


def streaming_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    capacity: int = DEFAULT_CAPACITY,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Per-shard space-saving candidates over the token stream of a
    streaming DataFrame.  Update output mode: each micro-batch re-emits
    the candidate set of every shard it touched.  Consumers take the
    global top-k by est (err column bounds the overestimate:
    est - err <= true count <= est)."""
    toks = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("tok")
    ).withColumn(
        "shard", F.pmod(F.xxhash64("tok"), F.lit(n_shards).cast("long"))
    )
    return toks.groupBy("shard").applyInPandasWithState(
        _space_saving_update(capacity),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
