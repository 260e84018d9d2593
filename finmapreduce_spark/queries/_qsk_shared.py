"""Quantile-sketch constants + oracle CTE builder, split into a leaf
module so BOTH queries/sketches.py and queries/training.py (whose
curation-capstone oracle embeds the cutoff chain) can import them
without a cycle: sketches.py imports training.py at module level for
the Bloom oracle's shingle SQL, so training.py must never import back
into sketches.py at module level.

The sketch itself (reference has no equivalent; this is the
training-pipeline extension surface): a deterministic adaptive
hash-level sampler — every row computes a level from the md5 tail of
its doc_id, a capacity threshold L picks the shallowest level set
that fits QSK_CAP rows, and percentiles read from the retained
sample. Retention is a PER-ROW predicate, so map-side combine is the
merge and the result is recompute-stable across jobs, engines, and
partitionings (percentile_approx is none of those).
"""

QSK_CAP = 256  # sample capacity; ~1/sqrt(CAP) ≈ 6% rank error
QSK_GROUP_CAP = 64  # per-group sample capacity (grouped variants)
QSK_PCTS = [0.5, 0.9, 0.95, 0.99]
QSK_OUTLIER_PCT = 0.99

# 48-bit integer tail of md5('q:' || doc_id) — DuckDB twin of the
# Spark-side conv(substring(md5, 1, 12), 16, 10) level hash.
_QSK_TAIL_SQL = (
    "list_reduce(list_transform(range(1, 13), i -> "
    "CAST(strpos('0123456789abcdef', substring("
    "md5('q:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 "
    "AS BIGINT)), (a, d) -> a * 16 + d)"
)


def qsk_lvl_col():
    """Spark Column: the deterministic hash level of ``doc_id``
    (leading-zero bits of the 48-bit md5 tail of 'q:'+doc_id) — the
    Spark twin of _QSK_TAIL_SQL's level arithmetic, importable by any
    query that levels a per-doc value for the adaptive sampler
    (sketches._qsk_base uses it for doc length; the CCNet bucketer
    levels per-doc cross-entropy)."""
    from pyspark.sql import functions as F

    h = F.md5(F.concat(F.lit("q:"), F.col("doc_id")))
    tail = (
        F.conv(F.substring(h, 1, 12), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
    )
    return (
        F.when(tail == 0, F.lit(48))
        .otherwise(F.lit(48) - F.length(F.bin(tail)))
        .cast("long")
    )


def qsk_cutoff_sql_ctes(prefix: str = "") -> str:
    """CTE chain ``{prefix}base .. {prefix}cutoff`` computing the
    deterministic-sketch length cutoff — the SQL twin of
    sketches.qsk_length_cutoff, importable so composed oracles (the
    curation capstone) rebuild the exact same threshold."""
    p = prefix
    return f"""{p}base AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
              AS BIGINT) AS val,
         CAST(CASE WHEN tail = 0 THEN 48
                   ELSE 48 - length(bin(tail)) END AS BIGINT) AS lvl
  FROM (SELECT doc_id, text, {_QSK_TAIL_SQL} AS tail
        FROM documents WHERE text IS NOT NULL)
), {p}lv AS (
  SELECT lvl, sum(c) OVER (ORDER BY lvl DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cge
  FROM (SELECT lvl, count(*) AS c FROM {p}base GROUP BY 1)
), {p}thr AS (
  SELECT min(CASE WHEN cge <= {QSK_CAP} THEN lvl END) AS L FROM {p}lv
), {p}samp AS (
  SELECT b.doc_id, b.val FROM {p}base b, {p}thr WHERE b.lvl >= {p}thr.L
), {p}s AS (
  SELECT val, row_number() OVER (ORDER BY val, doc_id) AS rn,
         count(*) OVER () AS n_s
  FROM {p}samp
), {p}cutoff AS (
  SELECT val AS cutoff FROM {p}s
  WHERE rn = CAST(ceil({QSK_OUTLIER_PCT} * n_s) AS BIGINT)
)"""
