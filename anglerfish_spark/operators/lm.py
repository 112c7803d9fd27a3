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

import pandas as pd

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


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling")
# ---------------------------------------------------------------------------

#: hashed-feature space size for the bucket n-gram model
DSIR_BUCKETS = 256
#: target domain stand-in: English documents
DSIR_TARGET_LANG = "en"
#: selection threshold on the mean per-token log-ratio, in half-bits:
#: selected  ⇔  avg_bits >= -DSIR_THRESHOLD_HALFBITS / 2
DSIR_THRESHOLD_HALFBITS = 5

_DSIR_BUCKET_SQL = (
    "CAST(('0x' || substring(md5('ir|' || tok), 1, 4)) AS INT) % " + str(DSIR_BUCKETS)
)


@query(
    "q_importance_resampling",
    oracle=f"""
WITH occ AS (
  SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS bucket
  FROM (SELECT doc_id, lang, unnest({TOKENS_SQL}) AS tok FROM documents)
),
model AS (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS cr,
         CAST(COUNT(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS BIGINT) AS ct
  FROM occ GROUP BY bucket
),
scored AS (
  SELECT occ.doc_id,
         CAST(length(bin(ct + 1)) - 1 AS BIGINT)
           - CAST(length(bin(cr + 1)) - 1 AS BIGINT) AS bits
  FROM occ JOIN model USING (bucket)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(SUM(bits) AS BIGINT) AS weight_bits,
       CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS avg_bits,
       2 * SUM(bits) >= -{DSIR_THRESHOLD_HALFBITS} * COUNT(*) AS selected
FROM scored
GROUP BY doc_id
ORDER BY doc_id
""",
    group="llm-text",
)
def q_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: score every document by the importance
    ratio of a hashed-unigram bucket model fit on a target domain
    (English docs stand in for the "high-quality target") against the raw
    corpus, then select documents whose mean per-token ratio clears a
    threshold.

    Model: token -> md5 bucket (``DSIR_BUCKETS``-way hashed features, the
    paper's hashed n-gram reduction); bucket weight is the whole-bit
    log-ratio ``floor(log2(ct+1)) - floor(log2(cr+1))`` (add-one
    smoothed, quantized to integers so both engines agree exactly — the
    module's transcendental-free convention).  A document's weight is the
    sum over its token occurrences; selection compares the mean
    per-token weight against -2.5 bits in pure integer arithmetic
    (``2*sum >= -5*n``), so the verdict is engine-exact too.

    Scale shape: the model is a {DSIR_BUCKETS}-row aggregate (one
    combinable shuffle over bucket ids); it joins back to the occurrence
    relation by broadcast, and the per-doc rollup is the only
    corpus-scale shuffle.  The tokenize+explode lineage feeds both the
    model branch and the probe branch — Catalyst re-executes it (no
    subtree reuse), which at 100 TB is the RIGHT trade: the re-execution
    is a map-only CPU pass, while the alternatives either window-by-bucket
    ({DSIR_BUCKETS} groups -> catastrophic reducer skew) or persist a
    corpus-scale intermediate.  In production the model table would be
    computed once and reused across selection runs (it is domain-level,
    not corpus-run-level).
    """
    prepare(spark)
    d = load_table(spark, sf_dir, "documents", fanout=True)
    occ = d.select("doc_id", "lang", F.explode(tokens()).alias("tok")).select(
        "doc_id",
        "lang",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ir|"), F.col("tok")).cast("binary")), 1, 4
                ),
                16,
                10,
            ).cast("int")
            % DSIR_BUCKETS
        ).alias("bucket"),
    )
    model = occ.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cr"),
        F.count_if(F.col("lang") == DSIR_TARGET_LANG).cast("bigint").alias("ct"),
    )
    scored = occ.join(F.broadcast(model), "bucket").select(
        "doc_id", (_bits(F.col("ct") + 1) - _bits(F.col("cr") + 1)).alias("bits")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("bits").cast("bigint").alias("weight_bits"),
            (F.sum("bits").cast("double") / F.count(F.lit(1))).alias("avg_bits"),
            (2 * F.sum("bits") >= -DSIR_THRESHOLD_HALFBITS * F.count(F.lit(1))).alias(
                "selected"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training: one merge round over the word-frequency table
# ---------------------------------------------------------------------------

#: merge candidates reported per round
BPE_TOP_MERGES = 20


@query(
    "q_bpe_merge_step",
    oracle=f"""
WITH wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest({TOKENS_SQL}) AS tok FROM documents)
  GROUP BY tok
),
pc AS (
  SELECT pair, CAST(SUM(c) AS BIGINT) AS merge_count
  FROM (
    SELECT unnest([substring(word, i, 2)
                   for i in generate_series(1, length(word) - 1)]) AS pair, c
    FROM wc WHERE length(word) >= 2
  )
  GROUP BY pair
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY merge_count DESC, pair) AS INT) AS rank,
       pair, merge_count
FROM pc
ORDER BY merge_count DESC, pair
LIMIT {BPE_TOP_MERGES}
""",
    group="llm-text",
)
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training round (Sennrich et al. 2016): count adjacent
    symbol pairs over the word-frequency table from the initial
    character-level state and report the top merge candidates.

    This is the tokenizer-trainer's core loop body in its scale-correct
    shape: the corpus is touched ONCE (word counting, a combinable hash
    aggregate); every subsequent round operates on the vocab-sized
    word-frequency table only — pair extraction is
    ``substring(word, i, 2)`` over an index sequence (adjacent pairs ARE
    2-char substrings in the initial state), and the pair rollup is
    bounded by |alphabet|^2, so the final rank window runs over a
    constant-bounded relation, not corpus data.  Ties break on the pair
    string for a total order (the oracle-determinism house rule).
    """
    prepare(spark)
    d = load_table(spark, sf_dir, "documents", fanout=True)
    wc = (
        d.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pairs = (
        wc.where(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.substring(F.col("word"), i, F.lit(2)),
                )
            ).alias("pair"),
            "c",
        )
        .groupBy("pair")
        .agg(F.sum("c").cast("bigint").alias("merge_count"))
    )
    w = Window.orderBy(F.col("merge_count").desc(), "pair")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= BPE_TOP_MERGES)
        .select("rank", "pair", "merge_count")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# BPE encode — the APPLY half of the tokenizer (q_bpe_merge_step trains)
# ---------------------------------------------------------------------------

#: merge-table size for q_bpe_encode (vocabulary-scale by construction)
BPE_MERGES = 12


def bpe_encode_len(word: str, rank_of: dict) -> int:
    """Token count of one word under leftmost-min-rank merge application:
    repeatedly find the adjacent symbol pair with the LOWEST merge rank
    (leftmost occurrence on ties) and merge it, until no pair is in the
    table.  Deterministic and shared verbatim by the Spark UDF and the
    pattern the oracle's recursive CTE spells out."""
    syms = list(word)
    while len(syms) > 1:
        best, bi = None, None
        for i in range(len(syms) - 1):
            r = rank_of.get(syms[i] + syms[i + 1])
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
    return len(syms)


@query(
    "q_bpe_encode",
    oracle=f"""
WITH RECURSIVE
toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS w FROM documents
),
prs AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i:i+1])) AS pair FROM toks
),
merges AS (
  SELECT pair, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair) AS rank
  FROM prs GROUP BY pair
  ORDER BY COUNT(*) DESC, pair LIMIT {BPE_MERGES}
),
mm AS (SELECT map(list(pair), list(rank)) AS m FROM merges),
dwords AS (SELECT DISTINCT w FROM toks),
enc AS (
  SELECT w, list_transform(range(1, len(w) + 1), i -> w[i:i]) AS syms, 0 AS step
  FROM dwords
  UNION ALL
  SELECT w,
         syms[1:i-1] || [syms[i] || syms[i+1]] || syms[i+2:],
         step + 1
  FROM (
    SELECT w, syms, step,
           list_position(ranks, list_min(ranks)) AS i,
           list_min(ranks) AS rmin
    FROM (
      SELECT w, syms, step,
             list_transform(range(1, len(syms)), i ->
               coalesce(list_extract(map_extract(m, syms[i] || syms[i+1]), 1),
                        999999)) AS ranks
      FROM enc, mm
    )
  ) WHERE rmin < 999999
),
final AS (
  SELECT w, len(syms) AS n_tok FROM enc e
  WHERE step = (SELECT MAX(step) FROM enc e2 WHERE e2.w = e.w)
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(t.w)) AS BIGINT) AS n_chars,
       CAST(SUM(f.n_tok) AS BIGINT) AS n_bpe_tokens
FROM toks t JOIN final f ON f.w = t.w
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
    group="llm-text",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization APPLIED — the other half of q_bpe_merge_step:
    derive a {BPE_MERGES}-entry merge table from corpus pair frequencies
    (count DESC, pair ASC — deterministic), then encode every word by
    leftmost-min-rank merge application and report per-document word /
    character / BPE-token counts (the compression a tokenizer actually
    buys).

    Scale shape: the merge table is one map-side-combinable pair rollup
    collected at vocabulary scale ({BPE_MERGES} rows — never corpus
    rows); encoding runs over DISTINCT words only (Zipf: the vocabulary
    is orders smaller than the corpus) as an Arrow-batched UDF whose
    per-word loop is O(len^2) on <=word-length symbols; the corpus then
    re-joins the encoded vocabulary by word (AQE picks broadcast for the
    vocab side) and rolls up per doc_id — one shuffle each for the pair
    rollup, the distinct, and the final aggregation.  At 100 TB the
    vocab table persists bucketed by word and the probe join stays
    exchange-free on the vocab side, the q_dedup_incremental pattern.

    The oracle spells the SAME leftmost-min-rank loop as a recursive CTE
    (symbols list per word, min-rank pair index via list_position, one
    merge per recursion step) — both engines must agree on every merge
    decision, table tie-break, and termination for the per-doc BIGINT
    sums to hash-match.
    """
    prepare(spark)
    d = load_table(spark, sf_dir, "documents", fanout=True)
    toks = d.select("doc_id", F.explode(tokens()).alias("w"))
    pair_arr = F.expr(
        "CASE WHEN length(w) < 2 THEN array() "
        "ELSE transform(sequence(1, length(w) - 1), i -> substring(w, i, 2)) END"
    )
    merge_rows = (
        toks.select(F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_MERGES)
        .collect()  # merge table: BPE_MERGES rows — vocabulary-scale
    )
    rank_of = {r["pair"]: i + 1 for i, r in enumerate(merge_rows)}

    @F.pandas_udf("int")
    def bpe_len(ws: pd.Series) -> pd.Series:
        return pd.Series([bpe_encode_len(w, rank_of) for w in ws], dtype="int32")

    vocab = toks.select("w").distinct().withColumn("n_tok", bpe_len(F.col("w")))
    return (
        toks.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
            F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )
