"""Custom mergeable-sketch operators: Misra-Gries heavy hitters.

The custom-operator escape hatch in action (SURVEY §2.2: compose built-ins
where possible, Arrow-batched Python where not): Misra-Gries summaries are
per-partition stream state — not expressible as DataFrame built-ins — so
phase 1 runs as ``mapInPandas``; everything else stays declarative.

Two-phase exact heavy hitters, the shape that works at 100 TB:

1. **Candidates** (one map pass): each partition runs a Misra-Gries
   summary with ``k`` counters over its tokens.  MG guarantees any item
   with local share > 1/k survives; an item with *global* share ≥ θ must
   have local share ≥ θ in at least one partition (averaging argument), so
   with k > 1/θ the union of partition summaries is a guaranteed superset
   of the true heavy hitters — ≤ k·partitions candidates total.
2. **Exact verify** (one shuffle of candidate tokens only): semi-join the
   token stream against the broadcast candidate set, count exactly, keep
   counts > θ·n.  The final output is *exact* and partition-order
   independent even though MG internals are not — the sketch only bounds
   the candidate set, it never decides the answer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import prepare
from ..sources.registry import load_table
from .text import TOKENS_SQL, tokens

HH_THETA = 0.005  # heavy hitter = token with > 0.5% of all token occurrences
MG_K = 2 * round(1 / HH_THETA)  # 2× safety margin over the 1/θ guarantee


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    counters: dict[str, int] = {}
    for pdf in batches:
        for toks in pdf["tok"]:
            for t in toks:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < MG_K:
                    counters[t] = 1
                else:  # decrement-all step (evictions amortize O(1))
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
    yield pd.DataFrame({"token": pd.Series(list(counters), dtype="str")})


def heavy_hitters(docs: DataFrame, theta: float = HH_THETA) -> DataFrame:
    """Exact tokens with share > ``theta``, via MG candidates + verify."""
    tok_arrays = docs.select(tokens().alias("tok"))
    candidates = tok_arrays.mapInPandas(_mg_candidates, "token string").distinct()
    stream = tok_arrays.select(F.explode("tok").alias("token"))
    total = stream.agg(F.count(F.lit(1)).alias("_n"))
    counted = (
        stream.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.join(F.broadcast(total))
        .where(F.col("cnt") > F.col("_n") * theta)
        .select("token", "cnt", (F.col("cnt") / F.col("_n")).alias("share"))
        .orderBy("token")
    )


@query(
    "q_heavy_hitters",
    oracle=f"""
WITH tok AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents),
tot AS (SELECT COUNT(*) AS n FROM tok)
SELECT token, COUNT(*) AS cnt,
       CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
FROM tok
GROUP BY token
HAVING COUNT(*) > (SELECT n FROM tot) * {HH_THETA}
ORDER BY token
""",
    group="llm-text",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (> {HH_THETA:.1%} of token occurrences)
    via per-partition Misra-Gries candidate sketches + one exact verify
    pass — the vocabulary/boilerplate detector that runs where a full
    token groupBy would shuffle the entire corpus; here only candidate
    tokens (≤ k·partitions) shuffle."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    return heavy_hitters(d)


# ---------------------------------------------------------------------------
# mergeable HLL sketch rollup (DataSketches)
# ---------------------------------------------------------------------------


@query(
    "q_sketch_rollup",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_ok
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    group="llm-text",
)
def q_sketch_rollup(spark, sf_dir):
    """Mergeable-sketch pre-aggregation — the OLAP-cube pattern at 100 TB:
    per-(day, type) HLL sketches built in one combinable pass (what you
    would *materialize* daily), then rolled up across days per type with
    ``hll_union_agg`` — distinct users per type WITHOUT re-touching the
    raw events.  The re-aggregation cost is #sketches, not #rows; the
    oracle checks the sketch contract (estimate within 5% of exact —
    DataSketches HLL at default lgK=12 has rsd ~1.6%, and the sketch is a
    pure function of the data, so the flag is deterministic).

    This is the capability approx_count_distinct alone lacks: its
    estimate cannot be re-aggregated to coarser groupings later, while a
    stored sketch column can (union is lossless for HLL).
    """
    from ..session import prepare
    from ..sources.registry import load_table

    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = per_day.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )
