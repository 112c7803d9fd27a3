"""Corpus language-model statistics: bigram perplexity and TF-IDF.

Companions to the unigram perplexity filter (packing.py q_perplexity) on
the LLM-pipeline surface: the bigram model scores *local coherence*
(word-salad documents pass a unigram filter but light up under a bigram
one), TF-IDF surfaces each document's characteristic terms (topic
clustering / dedup-explanation / retrieval features).

Determinism contract: both avoid transcendentals (libm ``ln`` differs
across engines) by quantizing to whole bits with exact integer
``floor(log2(x)) = length(bin(x)) - 1`` — the convention established by
q_perplexity.

Scale shapes (the part that must survive 100 TB):

* model tables (bigram counts, document frequencies) are vocabulary-sized
  — zipf-bounded, orders smaller than the corpus — and built with one
  map-side-combinable count each;
* the corpus is re-joined to the model by key (term/bigram); Spark picks
  broadcast vs shuffle join by actual model size (AQE) — never a
  cartesian;
* per-document rollups are combinable hash aggregates keyed by doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import prepare
from ..sources.registry import load_table
from .text import TOKENS_SQL, tokens

#: characteristic terms reported per document
TFIDF_TOP_K = 3


def _bits(n: Column) -> Column:
    """Exact integer floor(log2(n)) for n >= 1 (see module docstring)."""
    return (F.length(F.bin(n)) - 1).cast("bigint")


def bigrams(tok: Column) -> Column:
    """``array<string>`` of space-joined adjacent token pairs."""
    return F.transform(
        F.sequence(F.lit(1), F.size(tok) - 1),
        lambda i: F.concat_ws(" ", F.element_at(tok, i), F.element_at(tok, i + 1)),
    )


@query(
    "q_bigram_perplexity",
    oracle=f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS tok FROM documents),
bg AS (
  SELECT doc_id, unnest([tok[i] || ' ' || tok[i+1]
                         for i in generate_series(1, len(tok) - 1)]) AS bg
  FROM t WHERE len(tok) >= 2
),
bgc AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY bg),
ctx AS (
  SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(c) AS BIGINT) AS cc
  FROM bgc GROUP BY 1
),
surp AS (
  SELECT bg, CAST(length(bin(cc // c)) - 1 AS BIGINT) AS bits
  FROM bgc JOIN ctx ON string_split(bg, ' ')[1] = w1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS bits_per_bigram
FROM bg JOIN surp USING (bg)
GROUP BY doc_id
ORDER BY doc_id
""",
    group="llm-text",
)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal per document, quantized to whole bits.

    Model: ``p(w2|w1) = c(w1 w2) / c(w1·)`` with the context count summed
    over bigram positions (so the model is self-normalizing over observed
    continuations); surprisal per position is the exact integer
    ``floor(log2(c(w1·)/c(w1 w2)))``.  Documents shorter than 2 tokens
    carry no bigram evidence and drop out — same rule as the unigram
    filter's token-less docs.

    Shuffles: bigram count (combinable), context rollup over the *model*
    (vocab-sized), model join back to the corpus, doc rollup.  The two
    model-side steps never touch corpus-scale data.
    """
    prepare(spark)
    d = load_table(spark, sf_dir, "documents", fanout=True)
    bg = (
        d.select("doc_id", tokens().alias("tok"))
        .where(F.size("tok") >= 2)
        .select("doc_id", F.explode(bigrams(F.col("tok"))).alias("bg"))
    )
    bgc = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ctx = (
        bgc.groupBy(F.split(F.col("bg"), " ").getItem(0).alias("w1"))
        .agg(F.sum("c").cast("bigint").alias("cc"))
    )
    surp = (
        bgc.join(ctx, F.split(F.col("bg"), " ").getItem(0) == F.col("w1"))
        .select("bg", _bits(F.expr("cc div c")).alias("bits"))
    )
    return (
        bg.join(surp, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("bits").cast("bigint").alias("total_bits"),
            (F.sum("bits").cast("double") / F.count(F.lit(1))).alias("bits_per_bigram"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_tfidf",
    oracle=f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS tok FROM documents),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
tf AS (
  SELECT doc_id, unnest(tok) AS term FROM t
),
tfc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tf GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfc GROUP BY term),
scored AS (
  SELECT doc_id, term, tf,
         tf * CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS score
  FROM tfc JOIN df USING (term), n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rn
  FROM scored
)
SELECT doc_id, CAST(rn AS INT) AS rank, term, tf, score
FROM ranked WHERE rn <= {TFIDF_TOP_K}
ORDER BY doc_id, rank
""",
    group="llm-text",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k characteristic terms per document by quantized TF-IDF:
    ``tf * floor(log2(N/df))`` — the idf factor in whole bits, so both
    engines agree exactly (a term in every document scores 0 bits and can
    never be characteristic, the classic idf behavior).

    Shuffles: (doc, term) count (combinable, corpus-scale once), then df
    as a WINDOW count over the tf relation itself partitioned by term —
    df(term) is by construction the number of tf rows per term, so no
    separate vocab rollup, no join back, and (decisively) no second
    evaluation of the tokenize+explode lineage: the df-as-aggregate
    formulation built tfc on two plan branches that Catalyst did not
    reuse (0 ReusedExchange, 2 Generate explodes, 4 exchanges; measured
    1.71 s at sf0.1 — this shape: 1 explode, 3 exchanges, 1.35 s).
    Term-skew exposure is unchanged: the old shape repartitioned tfc by
    term for the df join; the window partitions by the same key.
    Finally the per-doc top-k window (partitioned by doc_id — no global
    sort).
    """
    prepare(spark)
    d = load_table(spark, sf_dir, "documents", fanout=True)
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tfc = (
        d.select("doc_id", F.explode(tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    w_term = Window.partitionBy("term")
    scored = (
        tfc.withColumn("df", F.count(F.lit(1)).over(w_term).cast("bigint"))
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            (F.col("tf") * _bits(F.expr("n_docs div df"))).cast("bigint").alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "term", "tf", "score")
        .orderBy("doc_id", "rank")
    )
