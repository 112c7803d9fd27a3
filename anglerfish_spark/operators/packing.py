"""Training-batch assembly operators: sequence packing, corpus mixture
rebalancing, and unigram-LM perplexity scoring.

These are the operators that sit between a curated corpus and the
training loop — the reference has no analogue (it stops at codec/query
surface), but a 100 TB pipeline needs them as first-class, so they follow
the same contract as every other operator here: pure built-in expressions,
DuckDB-checkable, shuffle-light.

Determinism: everything is integer or fixed-expression-tree double
arithmetic.  Perplexity deliberately avoids ``ln`` (transcendental libm
results differ across engines — see q_math_funcs) by quantizing token
surprisal to whole bits via exact integer ``floor(log2(T div c))``
computed as ``length(bin(T div c)) - 1`` — both engines implement ``bin``
(big-endian binary string of a bigint) identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..localdata import local_df
from ..registry import query
from ..session import prepare
from ..sources.registry import load_table
from .text import TOKENS_SQL, tokens

#: tokens per packed training sequence (context-window budget)
PACK_BUDGET = 2048
#: parallel packing groups — each packs independently, so the window sort
#: is per-group, never global
PACK_GROUPS = 8

#: corpus-wide sampling budget for mixture rebalancing (fraction of docs)
MIX_BUDGET = 0.5
#: target mixture shares per language (must sum to 1)
MIX_TARGETS = {"en": 0.35, "zh": 0.25, "de": 0.15, "es": 0.15, "fr": 0.10}


@query(
    "q_pack_sequences",
    oracle=f"""
WITH sized AS (
  SELECT doc_id,
         doc_id % {PACK_GROUPS} AS pack_group,
         CAST(len({TOKENS_SQL}) AS BIGINT) AS n_tok
  FROM documents
),
packed AS (
  SELECT doc_id, pack_group, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY pack_group ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM sized
)
SELECT doc_id, pack_group, CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS shard,
       n_tok
FROM packed
ORDER BY doc_id
""",
    group="llm-text",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign each document to a training shard of
    ~{PACK_BUDGET} tokens, filling shards in doc_id order within
    {PACK_GROUPS} independent pack groups (doc_id mod groups).

    The scale shape: packing needs a running token total, which is a sort —
    but only *within a pack group*, so the window partitions by group and
    the sort is per-group, never global.  At 100 TB the group count scales
    with the cluster (groups ≈ executors) and each group's window state is
    one running sum; no stage sees more than corpus/groups rows.  Exact
    integer arithmetic throughout."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_GROUPS)).cast("bigint").alias("pack_group"),
        F.size(tokens()).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return sized.select(
        "doc_id",
        "pack_group",
        cum_before.alias("cum_before"),
        "n_tok",
    ).select(
        "doc_id",
        "pack_group",
        F.expr(f"cum_before div {PACK_BUDGET}").cast("bigint").alias("shard"),
        "n_tok",
    ).orderBy("doc_id")


@query(
    "q_mix_weights",
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts),
targets(lang, target_share) AS (VALUES {", ".join(
    f"('{lang}', CAST({share} AS DOUBLE))" for lang, share in sorted(MIX_TARGETS.items())
)})
SELECT c.lang,
       c.n AS n_docs,
       t.target_share,
       least(CAST(1.0 AS DOUBLE), t.target_share * ({MIX_BUDGET} * total) / c.n)
         AS sample_rate,
       least(CAST(1.0 AS DOUBLE), t.target_share * ({MIX_BUDGET} * total) / c.n) * c.n
         AS expected_docs
FROM counts c JOIN targets t USING (lang), tot
ORDER BY c.lang
""",
    group="llm-text",
)
def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture rebalancing: per-language sampling rates that reshape
    the corpus toward a target language mixture under a global document
    budget ({MIX_BUDGET} of the corpus), capping any rate at 1.0
    (upsampling is left to the loader).

    This is the data-mixing step every multi-source training run needs
    (per-domain weights à la DoReMi / The Pile).  Costs one combinable
    count per group plus literal-table arithmetic — the per-group count is
    metadata-scale no matter the corpus size, and the rates drive a later
    hash-gated sample (q_sample_stratified) so the selection itself stays
    a map stage."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    targets = local_df(
        spark, sorted(MIX_TARGETS.items()), "lang string, target_share double"
    )
    rate = F.least(
        F.lit(1.0),
        F.col("target_share") * (F.lit(MIX_BUDGET) * F.col("total")) / F.col("n"),
    )
    return (
        counts.join(F.broadcast(targets), "lang")
        .join(F.broadcast(total))
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            "target_share",
            rate.alias("sample_rate"),
            (rate * F.col("n")).alias("expected_docs"),
        )
        .orderBy("lang")
    )


@query(
    "q_perplexity",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS t FROM documents
),
freq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM freq),
surp AS (
  SELECT t, CAST(length(bin(total // c)) - 1 AS BIGINT) AS bits
  FROM freq, tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS bits_per_token
FROM tok JOIN surp USING (t)
GROUP BY doc_id
ORDER BY doc_id
""",
    group="llm-text",
)
def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity scoring (quantized): train a unigram language
    model on the corpus itself (token frequencies), then score every
    document by its total and per-token surprisal in whole bits —
    ``floor(log2(total/c))`` per token, the integer-exact quantization of
    ``-log2 p(t)``.  High bits-per-token ⇒ improbable under the corpus
    model — the CCNet-style perplexity filter signal, computed without a
    trained LM dependency.

    Transcendental-free on purpose: ``ln`` differs across libms (see
    q_math_funcs), so surprisal is quantized via exact integer ops —
    ``length(bin(total div c)) - 1`` — identical in both engines.

    Scale shape: the vocabulary table is the classic two-pass — one
    combinable count by token (vocab-sized output, zipf-bounded), then a
    broadcast join back to the exploded corpus and one combinable sum by
    doc.  The corpus shuffles once (doc_id rollup); token-less docs drop
    out (no tokens ⇒ no model evidence)."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents", fanout=True)
    tok = d.select("doc_id", F.explode(tokens()).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    total = freq.agg(F.sum("c").cast("bigint").alias("total"))
    surp = (
        freq.join(F.broadcast(total))
        .select("t", (F.length(F.bin(F.expr("total div c"))) - 1).cast("bigint").alias("bits"))
    )
    return (
        tok.join(F.broadcast(surp), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("bits").cast("bigint").alias("total_bits"),
            (F.sum("bits").cast("double") / F.count(F.lit(1))).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# overlapping document chunking (RAG / context-window preprocessing)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@query(
    "q_chunk_documents",
    oracle=f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS tok FROM documents),
chunks AS (
  SELECT doc_id, unnest([
      {{'chunk_idx': i,
        'ctok': list_slice(tok, i * {CHUNK_STRIDE} + 1,
                           i * {CHUNK_STRIDE} + {CHUNK_SIZE})}}
      for i in generate_series(0,
        greatest(len(tok) - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1, 0) // {CHUNK_STRIDE})
    ]) AS c
  FROM t WHERE len(tok) > 0
)
SELECT doc_id, CAST(c.chunk_idx AS INT) AS chunk_idx,
       CAST(len(c.ctok) AS BIGINT) AS n_tok,
       md5(array_to_string(c.ctok, ' ')) AS chunk_fp
FROM chunks
ORDER BY doc_id, chunk_idx
""",
    group="llm-text",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunking — the RAG / embedding-pipeline
    preprocessing step: each document fans out to ⌈(n−overlap)/stride⌉
    windows of {CHUNK_SIZE} tokens every {CHUNK_STRIDE} (16-token overlap
    preserves context across boundaries); each chunk carries its md5
    fingerprint (the key a downstream embedding table / dedup pass joins
    on).  The final chunk is the short tail; empty docs produce no
    chunks.

    Scale shape: a pure 1→N map (``transform`` over a chunk-index
    ``sequence``, then one explode) — no shuffle at all until a consumer
    aggregates; chunk count scales with corpus tokens / stride.
    """
    prepare(spark)
    d = load_table(spark, sf_dir, "documents", fanout=True)
    tok = tokens()
    n_chunks = F.floor(
        (F.greatest(F.size(tok) - CHUNK_SIZE + CHUNK_STRIDE - 1, F.lit(0)))
        / F.lit(CHUNK_STRIDE)
    ).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(tok, i * CHUNK_STRIDE + 1, CHUNK_SIZE).alias("ctok"),
        ),
    )
    return (
        d.where(F.size(tok) > 0)
        .select("doc_id", F.explode(chunk).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c.ctok").cast("bigint").alias("n_tok"),
            F.md5(F.concat_ws(" ", F.col("c.ctok")).cast("binary")).alias("chunk_fp"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "q_dedup_chunks",
    oracle=f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS tok FROM documents),
chunks AS (
  SELECT doc_id, unnest([
      md5(array_to_string(
        list_slice(tok, i * {CHUNK_STRIDE} + 1,
                   i * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' '))
      for i in generate_series(0,
        greatest(len(tok) - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1, 0) // {CHUNK_STRIDE})
    ]) AS chunk_fp
  FROM t WHERE len(tok) > 0
),
per_doc AS (SELECT DISTINCT doc_id, chunk_fp FROM chunks)
SELECT chunk_fp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keeper
FROM per_doc
GROUP BY chunk_fp
HAVING COUNT(*) > 1
ORDER BY chunk_fp
""",
    group="llm-dedup",
)
def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granular dedup (C4-style paragraph dedup): the chunking
    fan-out keyed by chunk fingerprint finds token windows repeated
    ACROSS documents — boilerplate headers, license blocks, templated
    paragraphs — that document-level dedup can never see (the documents
    differ, the paragraphs don't).  Keep the smallest doc_id per repeated
    chunk; a curation pass would null out the chunk elsewhere.

    Scale shape: the 1→N chunk map (no shuffle) then ONE combinable hash
    agg keyed by the fingerprint — the same profile as exact dedup, at
    chunk cardinality (tokens/stride per doc).
    """
    prepare(spark)
    d = load_table(spark, sf_dir, "documents", fanout=True)
    tok = tokens()
    n_chunks = F.floor(
        (F.greatest(F.size(tok) - CHUNK_SIZE + CHUNK_STRIDE - 1, F.lit(0)))
        / F.lit(CHUNK_STRIDE)
    ).cast("int")
    fps = F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(tok, i * CHUNK_STRIDE + 1, CHUNK_SIZE)).cast("binary")
        ),
    )
    return (
        d.where(F.size(tok) > 0)
        .select("doc_id", F.explode(F.array_distinct(fps)).alias("chunk_fp"))
        .groupBy("chunk_fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .where(F.col("n_docs") > 1)
        .orderBy("chunk_fp")
    )
