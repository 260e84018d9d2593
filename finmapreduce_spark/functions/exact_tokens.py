"""Tokenizer-exact chunking + truncation (F1/F2/F3-F5 exact variants).

The reference counts cl100k_base tokens via tiktoken
(/root/reference/src/utils/document_processing.py:19-23) and defines
its chunk defaults (32768/4096) in tiktoken tokens; the engine's
default whitespace/character model (functions/chunking.py,
functions/truncation.py) is self-consistent but its budgets DRIFT
from the reference's — a 32768-token chunk is ~4× more characters
than a 32768-character chunk, so chunk counts and truncation
retention differ from the published sweep. When tiktoken is
installed, the variants here reproduce the reference's boundaries
exactly behind the same output contracts.

tiktoken is not in this image, so the encoder is INJECTABLE: every
builder takes ``encoder_factory`` (a zero-arg callable returning an
object with ``encode(str) -> list[int]`` / ``decode(list[int]) ->
str``). Production resolves tiktoken lazily per executor; tests
inject a deterministic fake to pin the boundary arithmetic, which is
identical whatever the encoder vocabulary is.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tiktoken_available() -> bool:
    try:
        import tiktoken  # noqa: F401

        return True
    except ImportError:
        return False


def tiktoken_encoder_factory(encoding: str = "cl100k_base") -> Callable:
    """Zero-arg factory resolving tiktoken ON THE EXECUTOR (the
    encoding object is not shipped in the closure — each Python worker
    builds its own once per UDF instantiation)."""

    def factory():
        try:
            import tiktoken
        except ImportError as e:
            raise ImportError(
                "tokenizer-exact variants need tiktoken; install it or "
                "use the whitespace/character defaults in "
                "functions/chunking.py and functions/truncation.py"
            ) from e
        return tiktoken.get_encoding(encoding)

    return factory


def exact_chunk_udf(
    chunk_size: int,
    chunk_overlap: int,
    encoder_factory: Callable | None = None,
):
    """pandas_udf: text → array of token-exact chunk strings.

    Boundary arithmetic mirrors functions/chunking.py::chunk_plan
    exactly, in token space: step = size - overlap; n_chunks = 1 if
    n_tokens <= size else ceil((n_tokens - size)/step) + 1; chunk i
    decodes tokens [i*step, i*step + size).
    """
    if chunk_overlap >= chunk_size:
        raise ValueError("chunk_overlap must be < chunk_size")
    factory = encoder_factory or tiktoken_encoder_factory()
    step = chunk_size - chunk_overlap

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _chunks(texts: pd.Series) -> pd.Series:
        enc = factory()

        def split(s: str) -> list[str]:
            toks = enc.encode(s or "")
            n = len(toks)
            if n <= chunk_size:
                n_chunks = 1
            else:
                n_chunks = -(-(n - chunk_size) // step) + 1
            return [
                enc.decode(toks[i * step : i * step + chunk_size])
                for i in range(n_chunks)
            ]

        return texts.map(split)

    return _chunks


def explode_chunks_exact(
    df: DataFrame,
    text_col: str = "content",
    key_cols: tuple[str, ...] = ("doc_name",),
    chunk_size: int = 32768,
    chunk_overlap: int = 4096,
    encoder_factory: Callable | None = None,
) -> DataFrame:
    """Token-exact twin of chunking.explode_chunks — same output
    contract (key..., chunk_index, chunk_text), Arrow-batched UDF for
    the tokenize/decode, posexplode stays JVM-side."""
    chunks = exact_chunk_udf(chunk_size, chunk_overlap, encoder_factory)(
        F.col(text_col)
    )
    return df.select(
        *[F.col(c) for c in key_cols],
        F.posexplode(chunks).alias("chunk_index", "chunk_text"),
    )


def truncate_words_exact(
    df: DataFrame,
    text_col: str,
    max_tokens: int,
    strategy: str = "start",
    out_prefix: str = "trunc",
    encoder_factory: Callable | None = None,
) -> DataFrame:
    """Token-exact twin of truncation.truncate_words — identical
    output columns ({p}_text/_tokens/_original/_applied/_retention).
    With tiktoken there is no binary search (the reference needed one
    over words): encode once, slice the token ids, decode."""
    if strategy not in ("start", "end", "smart"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if max_tokens <= 0:
        # toks[-0:] would keep EVERY token while reporting kept=0 —
        # an inconsistent row, so a non-positive budget is an error.
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    effective = "start" if strategy == "smart" else strategy
    factory = encoder_factory or tiktoken_encoder_factory()

    out_schema = T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("kept", T.LongType()),
            T.StructField("original", T.LongType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def _trunc(texts: pd.Series) -> pd.DataFrame:
        enc = factory()
        rows = []
        for s in texts.fillna(""):
            toks = enc.encode(s)
            n = len(toks)
            kept = toks[:max_tokens] if effective == "start" else toks[-max_tokens:]
            rows.append((enc.decode(kept) if n > max_tokens else s, min(n, max_tokens), n))
        return pd.DataFrame(rows, columns=["text", "kept", "original"])

    p = out_prefix
    struct = _trunc(F.col(text_col))
    return (
        df.withColumn("__t", struct)
        .withColumn(f"{p}_text", F.col("__t.text"))
        .withColumn(f"{p}_tokens", F.col("__t.kept"))
        .withColumn(f"{p}_original", F.col("__t.original"))
        .withColumn(f"{p}_applied", F.col("__t.original") > F.lit(max_tokens))
        .withColumn(
            f"{p}_retention",
            F.when(
                F.col("__t.original") > 0,
                F.col("__t.kept") / F.col("__t.original"),
            ).otherwise(F.lit(1.0)),
        )
        .drop("__t")
    )
