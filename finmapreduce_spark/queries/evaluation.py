"""Judge-validation metrics (SURVEY §2.4 A12/A13; reference
scripts/llm_judge_evaluation.py:153-252).

The labeled set is (true_lang, pred_lang) from the language-ID
heuristic — a real classifier output with a real gold column, giving
non-trivial confusion structure. Metrics are pure SQL aggregations:
per-class precision/recall/F1 with guarded division, grouped accuracy,
and the macro averages the reference computes via sklearn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finmapreduce_spark.queries import QuerySpec
from finmapreduce_spark.queries.textops import LANGID_ORACLE, text_langid


def _labeled(spark, sf_dir):
    return text_langid(spark, sf_dir).select("true_lang", "pred_lang")


_LABELED_SQL = f"(SELECT true_lang, pred_lang FROM ({LANGID_ORACLE}))"


def a13_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: per-label correct/total/accuracy (llm_judge_evaluation.py:153-177)."""
    lab = _labeled(spark, sf_dir)
    return lab.groupBy(F.col("true_lang").alias("label")).agg(
        F.count("*").alias("total"),
        F.count_if(F.col("true_lang") == F.col("pred_lang")).alias("correct"),
        F.round(
            F.count_if(F.col("true_lang") == F.col("pred_lang")) / F.count("*"), 6
        ).alias("accuracy"),
    )


A13_ORACLE = f"""
SELECT true_lang AS label, count(*) AS total,
       count(*) FILTER (true_lang = pred_lang) AS correct,
       round(count(*) FILTER (true_lang = pred_lang) / count(*), 6) AS accuracy
FROM {_LABELED_SQL} GROUP BY 1
"""


def a12_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: per-class precision/recall/F1 from the confusion counts
    (llm_judge_evaluation.py:179-252), guarded division throughout."""
    lab = _labeled(spark, sf_dir)
    classes = lab.select(F.col("true_lang").alias("cls")).union(
        lab.select(F.col("pred_lang").alias("cls"))
    ).distinct()
    per_true = lab.groupBy(F.col("true_lang").alias("cls")).agg(
        F.count("*").alias("support"),
        F.count_if(F.col("true_lang") == F.col("pred_lang")).alias("tp"),
    )
    per_pred = lab.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.count("*").alias("predicted")
    )
    joined = (
        classes.join(per_true, "cls", "left")
        .join(per_pred, "cls", "left")
        .select(
            "cls",
            F.coalesce("support", F.lit(0)).alias("support"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("predicted", F.lit(0)).alias("predicted"),
        )
    )
    precision = F.when(
        F.col("predicted") > 0, F.col("tp") / F.col("predicted")
    ).otherwise(F.lit(0.0))
    recall = F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(
        F.lit(0.0)
    )
    f1 = F.when(
        (precision + recall) > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return joined.select(
        "cls",
        "support",
        "tp",
        "predicted",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


A12_PRF1_ORACLE = f"""
WITH lab AS (SELECT * FROM {_LABELED_SQL}),
classes AS (
  SELECT true_lang AS cls FROM lab UNION SELECT pred_lang FROM lab
),
per_true AS (
  SELECT true_lang AS cls, count(*) AS support,
         count(*) FILTER (true_lang = pred_lang) AS tp
  FROM lab GROUP BY 1
),
per_pred AS (
  SELECT pred_lang AS cls, count(*) AS predicted FROM lab GROUP BY 1
),
j AS (
  SELECT c.cls,
         coalesce(support, 0) AS support,
         coalesce(tp, 0) AS tp,
         coalesce(predicted, 0) AS predicted
  FROM classes c
  LEFT JOIN per_true USING (cls)
  LEFT JOIN per_pred USING (cls)
),
m AS (
  SELECT *,
         CASE WHEN predicted > 0 THEN tp / predicted ELSE 0.0 END AS p,
         CASE WHEN support > 0 THEN tp / support ELSE 0.0 END AS r
  FROM j
)
SELECT cls, support, tp, predicted,
       round(p, 6) AS precision,
       round(r, 6) AS recall,
       round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END, 6) AS f1
FROM m
"""


def a10_accuracy_by_reasoning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: accuracy pivoted by a nullable grouping column with the
    reference's null→'null' coalesce (document_processing.py:511-559).

    judgment: langid correct → 'Correct', zero-signal → 'No answer',
    else 'Incorrect' (the reference's 5-way rubric collapsed to the 3
    classes its validation set uses). question_reasoning: derived
    nullable bucket (doc_id % 7 == 0 → NULL) so the coalesce path is
    actually exercised. Pivot over the FIXED judgment domain — at
    scale an unpinned pivot means an extra pass to collect values.
    """
    base = text_langid(spark, sf_dir)
    judged = base.select(
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .when(F.col("doc_id") % 2 == 0, F.lit("metrics-generated"))
        .otherwise(F.lit("domain-relevant"))
        .alias("question_reasoning"),
        F.when(F.col("best_score") <= 0, F.lit("No answer"))
        .when(F.col("true_lang") == F.col("pred_lang"), F.lit("Correct"))
        .otherwise(F.lit("Incorrect"))
        .alias("judgment"),
    )
    pivoted = (
        judged.groupBy(
            F.coalesce("question_reasoning", F.lit("null")).alias("reasoning")
        )
        .pivot("judgment", ["Correct", "Incorrect", "No answer"])
        .count()
        .na.fill(0, ["Correct", "Incorrect", "No answer"])
    )
    total = F.col("Correct") + F.col("Incorrect") + F.col("`No answer`")
    return pivoted.select(
        "reasoning",
        F.col("Correct").alias("n_correct"),
        F.col("Incorrect").alias("n_incorrect"),
        F.col("`No answer`").alias("n_no_answer"),
        F.round(F.col("Correct") / total, 6).alias("accuracy"),
    )


A10_ORACLE = f"""
WITH base AS (SELECT * FROM ({LANGID_ORACLE})),
judged AS (
  SELECT CASE WHEN doc_id % 7 = 0 THEN NULL
              WHEN doc_id % 2 = 0 THEN 'metrics-generated'
              ELSE 'domain-relevant' END AS question_reasoning,
         CASE WHEN best_score <= 0 THEN 'No answer'
              WHEN true_lang = pred_lang THEN 'Correct'
              ELSE 'Incorrect' END AS judgment
  FROM base
)
SELECT coalesce(question_reasoning, 'null') AS reasoning,
       count(*) FILTER (judgment = 'Correct') AS n_correct,
       count(*) FILTER (judgment = 'Incorrect') AS n_incorrect,
       count(*) FILTER (judgment = 'No answer') AS n_no_answer,
       round(count(*) FILTER (judgment = 'Correct') / count(*), 6) AS accuracy
FROM judged GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "a13_label_accuracy": QuerySpec(a13_label_accuracy, A13_ORACLE),
    "a12_prf1": QuerySpec(a12_prf1, A12_PRF1_ORACLE),
    "a10_accuracy_by_reasoning": QuerySpec(a10_accuracy_by_reasoning, A10_ORACLE),
}
