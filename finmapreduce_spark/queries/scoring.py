"""U6 — embedding/metric scorers (reference scores/text_evaluation_metrics.py).

The reference scores candidate/reference sentence pairs three ways:
BERTScore P/R/F1 (:20-69), FinBERT embedding + cosine similarity
(:71-189), and BARTScore NLL (:191-283) — all torch models looping
over pairs on one GPU. The Spark-first shape is batch inference: pair
construction is a join, the model is a broadcast-loaded executor-local
resource inside an Arrow-batched pandas UDF, and the similarity math
is native column algebra (model plumbing: functions/scoring.py).

For the deterministic catalog the model is replaced by structure:

- ``u6_pair_cosine`` — the FinBERT-cosine path with the synthetic
  ``embeddings`` table standing in for model output: candidate row
  2k scored against reference row 2k+1, cosine fully native
  (zip_with fold / list_inner_product — no UDF, no shuffle beyond
  the pair join, which is an equi-join on vec_id arithmetic).
- ``u6_bertscore_prf`` — BERTScore's greedy-max token matching with
  an exact-match kernel: precision = fraction of candidate tokens
  with a match in the reference, recall symmetric, F1 harmonic.
  With a hard kernel greedy-max degenerates to membership tests, so
  the whole metric is array algebra (filter + array_contains) that
  whole-stage-codegen executes JVM-side.

Scale: both are narrow maps after one equi-join on a derived key —
no skew (pair ids are unique), no window, linear in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finmapreduce_spark.queries import QuerySpec
from finmapreduce_spark.queries.dedup import EMB_SQL, _dot, emb_table
from finmapreduce_spark.session import read_table


def u6_pair_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate embedding 2k vs reference embedding 2k+1, cosine
    similarity + same-cluster flag (text_evaluation_metrics.py:71-189).

    Vector validity is dedup.emb_table's ONE shared rule (non-NULL,
    no NULL elements, finite positive norm): a pair with an invalid
    side drops at the inner join — cosine is undefined for it, the
    zero-norm division throws under ANSI, DuckDB's
    list_inner_product throws on NULL elements, and a NaN side would
    emit cosine=NaN."""
    emb = emb_table(spark, sf_dir)
    cand = emb.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") / 2).cast("long").alias("pair_id"),
        F.col("v").alias("c_v"),
        F.col("label").alias("c_label"),
        F.col("norm").alias("c_norm"),
    )
    ref = emb.filter(F.col("vec_id") % 2 == 1).select(
        ((F.col("vec_id") - 1) / 2).cast("long").alias("pair_id"),
        F.col("v").alias("r_v"),
        F.col("label").alias("r_label"),
        F.col("norm").alias("r_norm"),
    )
    pairs = cand.join(ref, "pair_id")
    cos = _dot(F.col("c_v"), F.col("r_v")) / (
        F.col("c_norm") * F.col("r_norm")
    )
    return pairs.select(
        "pair_id",
        F.round(cos, 6).alias("cosine"),
        (F.col("c_label") == F.col("r_label")).alias("same_cluster"),
    )


U6_COSINE_ORACLE = f"""
WITH v AS ({EMB_SQL}),
cand AS (
  SELECT vec_id // 2 AS pair_id, v AS c_v, label AS c_label, norm AS c_norm
  FROM v WHERE vec_id % 2 = 0
),
ref AS (
  SELECT (vec_id - 1) // 2 AS pair_id, v AS r_v, label AS r_label,
         norm AS r_norm
  FROM v WHERE vec_id % 2 = 1
)
SELECT pair_id,
       round(list_inner_product(c_v, r_v) / (c_norm * r_norm), 6) AS cosine,
       c_label = r_label AS same_cluster
FROM cand JOIN ref USING (pair_id)
"""


def u6_bertscore_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BERTScore-structured P/R/F1 with an exact-match kernel:
    candidate doc d vs reference doc d+1 (text_evaluation_metrics.py:20-69).

    Duplicate tokens count (the metric is over token positions, not
    the vocabulary): matched_c = |{i : c[i] ∈ set(r)}|, P = matched_c/|c|.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
    )
    cand = docs.select(
        F.col("doc_id").alias("pair_id"), F.col("toks").alias("c_toks")
    )
    ref = docs.select(
        (F.col("doc_id") - 1).alias("pair_id"), F.col("toks").alias("r_toks")
    )
    pairs = cand.join(ref, "pair_id")
    matched_c = F.size(
        F.filter(F.col("c_toks"), lambda t: F.array_contains(F.col("r_toks"), t))
    )
    matched_r = F.size(
        F.filter(F.col("r_toks"), lambda t: F.array_contains(F.col("c_toks"), t))
    )
    p = matched_c / F.size("c_toks")
    r = matched_r / F.size("r_toks")
    f1 = F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return pairs.select(
        "pair_id",
        F.round(p, 6).alias("bs_precision"),
        F.round(r, 6).alias("bs_recall"),
        F.round(f1, 6).alias("bs_f1"),
    )


U6_BERTSCORE_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
  FROM documents
),
pairs AS (
  SELECT c.doc_id AS pair_id, c.t AS c_toks, r.t AS r_toks
  FROM toks c JOIN toks r ON r.doc_id = c.doc_id + 1
),
m AS (
  SELECT pair_id,
         len(list_filter(c_toks, x -> list_contains(r_toks, x))) / len(c_toks) AS p,
         len(list_filter(r_toks, x -> list_contains(c_toks, x))) / len(r_toks) AS r
  FROM pairs
)
SELECT pair_id,
       round(p, 6) AS bs_precision,
       round(r, 6) AS bs_recall,
       round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END, 6) AS bs_f1
FROM m
"""


def u6_hashing_bow_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL model-inference path, value-checked end-to-end: doc d
    embedded by the feature-hashing BoW model inside the Arrow
    pandas_udf (functions/scoring.py — executor-local model handle,
    the exact plumbing a torch model rides), then cosine against doc
    d+1 in native column algebra. The embedder's components are
    signed integer token counts, so every downstream dot product is
    FP-exact and the DuckDB oracle can reconstruct the identical
    embedding relationally (md5 hex arithmetic for bucket and sign) —
    the one catalog query whose oracle certifies a model UDF's actual
    output, not a fake's.

    Scale: embedding is a narrow Arrow map; the pair join is an
    equi-join on derived ids; cosine is a 64-element fold. Linear,
    shuffle only for the join."""
    from finmapreduce_spark.functions.scoring import embed_text_udf

    # NULL-text docs don't embed — a pair with a missing side drops
    # at the join (the oracle's unnest does the same implicitly)
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    emb = docs.withColumn("e", embed_text_udf("hashing-bow")(F.col("text")))
    cand = emb.select(F.col("doc_id").alias("pair_id"), F.col("e").alias("c_e"))
    ref = emb.select((F.col("doc_id") - 1).alias("pair_id"), F.col("e").alias("r_e"))
    pairs = cand.join(ref, "pair_id")
    na = F.sqrt(_dot(F.col("c_e"), F.col("c_e")))
    nb = F.sqrt(_dot(F.col("r_e"), F.col("r_e")))
    cos = F.round(
        F.when(na * nb > 0, _dot(F.col("c_e"), F.col("r_e")) / (na * nb))
        .otherwise(F.lit(0.0)),
        6,
    )
    return pairs.select("pair_id", cos.alias("cosine"))


# Bucket index = int(md5[:4 bytes]) % 64 — only the 4th byte's low 6
# bits survive the modulus (256 ≡ 0 mod 64), i.e. hex chars 7-8; the
# sign bit is the low bit of byte 4 (hex char 10).
U6_HASHING_BOW_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
), hx AS (
  SELECT doc_id, md5(w) AS h FROM toks
), feat AS (
  SELECT doc_id,
         ((strpos('0123456789abcdef', substring(h, 7, 1)) - 1) * 16
          + strpos('0123456789abcdef', substring(h, 8, 1)) - 1) % 64 AS idx,
         CAST(sum(CASE WHEN (strpos('0123456789abcdef', substring(h, 10, 1)) - 1) % 2 = 1
                       THEN 1 ELSE -1 END) AS DOUBLE) AS wgt
  FROM hx GROUP BY 1, 2
), nrm AS (
  SELECT doc_id, sqrt(sum(wgt * wgt)) AS nm FROM feat GROUP BY 1
), dots AS (
  SELECT c.doc_id AS pair_id, sum(c.wgt * r.wgt) AS dp
  FROM feat c JOIN feat r ON r.doc_id = c.doc_id + 1 AND r.idx = c.idx
  GROUP BY 1
)
SELECT c.doc_id AS pair_id,
       round(CASE WHEN nc.nm * nr.nm > 0
                  THEN coalesce(d.dp, 0) / (nc.nm * nr.nm)
                  ELSE 0.0 END, 6) AS cosine
FROM documents c
JOIN documents r ON r.doc_id = c.doc_id + 1
JOIN nrm nc ON nc.doc_id = c.doc_id
JOIN nrm nr ON nr.doc_id = r.doc_id
LEFT JOIN dots d ON d.pair_id = c.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "u6_pair_cosine": QuerySpec(u6_pair_cosine, U6_COSINE_ORACLE),
    "u6_bertscore_prf": QuerySpec(u6_bertscore_prf, U6_BERTSCORE_ORACLE),
    "u6_hashing_bow_cosine": QuerySpec(
        u6_hashing_bow_cosine, U6_HASHING_BOW_ORACLE
    ),
}


def u6_s2s_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seq2seq-NLL scorer path (BARTScore shape, reference
    scores/text_evaluation_metrics.py:191-283), value-checked
    end-to-end through the REAL pair-scorer harness: candidate doc d
    scored against reference doc d+1 by -mean token NLL inside the
    Arrow pandas_udf (functions/scoring.py::s2s_score_udf — the exact
    plumbing the gated ``s2s:<model>`` conditional-generation arm
    rides; the hermetic model is the reference-side add-one-smoothed
    unigram LM over the pair vocabulary, so DuckDB reconstructs the
    identical score relationally). Higher = candidate better
    predicted by the reference, the reference repo's -loss sign.

    Scale: scoring is a narrow Arrow map over joined pairs; the pair
    join is an equi-join on derived ids. Linear, shuffle only for the
    join."""
    from finmapreduce_spark.functions.scoring import s2s_score_udf

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    cand = docs.select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("c_text")
    )
    ref = docs.select(
        (F.col("doc_id") - 1).alias("pair_id"), F.col("text").alias("r_text")
    )
    pairs = cand.join(ref, "pair_id")
    score = s2s_score_udf("unigram-lm")(F.col("r_text"), F.col("c_text"))
    return pairs.select(
        "pair_id", F.round(score, 6).alias("s2s_score")
    )


# The oracle rebuilds the smoothed unigram conditional LM in SQL:
# counts from the REFERENCE side, vocabulary = distinct tokens of the
# pair, p(w|ref) = (cnt_ref(w)+1)/(n_ref + V), score = -avg(-log2 p)
# over CANDIDATE token positions (duplicates count).
U6_S2S_NLL_ORACLE = """
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
pairs AS (
  SELECT c.doc_id AS pair_id, c.toks AS c_toks, r.toks AS r_toks
  FROM docs c JOIN docs r ON r.doc_id = c.doc_id + 1
),
stats AS (
  SELECT pair_id,
         len(r_toks) + len(list_distinct(list_concat(r_toks, c_toks)))
           AS denom
  FROM pairs
),
rc AS (
  SELECT pair_id, w, count(*) AS c
  FROM (SELECT pair_id, unnest(r_toks) AS w FROM pairs)
  GROUP BY 1, 2
),
ct AS (
  SELECT pair_id, unnest(c_toks) AS w FROM pairs
)
SELECT ct.pair_id,
       round(-avg(-log2((coalesce(rc.c, 0) + 1.0) / s.denom)), 6)
         AS s2s_score
FROM ct
JOIN stats s ON s.pair_id = ct.pair_id
LEFT JOIN rc ON rc.pair_id = ct.pair_id AND rc.w = ct.w
GROUP BY ct.pair_id
"""

QUERIES["u6_s2s_unigram_nll"] = QuerySpec(
    u6_s2s_unigram_nll, U6_S2S_NLL_ORACLE
)
