"""finmapreduce_spark — a PySpark-native analytics engine.

From-scratch rebuild of the capabilities of chengandre/finMapReduce
(an async LLM-MapReduce dataflow engine for QA over long financial
documents) on idiomatic PySpark: DataFrame/SQL plans optimized by
Catalyst, Pandas-UDF / mapInPandas only where built-ins cannot
express the semantics (the LLM call boundary, tokenizer-exact
chunking), Structured Streaming for the serving surface.

Layout
------
- ``session``    SparkSession factory tuned for local[32] and cluster.
- ``schemas``    Fixed StructType per pipeline stage (SURVEY §1).
- ``sources``    Readers/sinks (SURVEY §2.1 S1–S13).
- ``functions``  Scalar/text functions (SURVEY §2.7 F1–F18).
- ``operators``  Relational + data-pipeline operators (P/J/A/W ids,
                 dedup, similarity search, text analysis, multimodal).
- ``llm``        LLM client protocol, deterministic mock, async
                 mapInPandas runner with rate limiting (U1–U7).
- ``plans``      End-to-end DAGs: mapreduce, truncation, judge.
- ``streaming``  Structured Streaming serving mode (SURVEY §2.9).
"""

from finmapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
