"""Corpus token-count CLI — parity with the reference's
scripts/count_tokens.py (per-file token counts over markdown
directories, per-directory and grand totals, histogram-ready
distribution), re-expressed as ONE Spark aggregation over the
whole-file corpus scan instead of a sequential file loop.

Token models (the reference hard-codes tiktoken cl100k_base via
utils.num_tokens_from_string):
  --model merges   tokenizer-exact via a merge table (DEFAULT since
                   round 15 — the engine's vendored 4,096-merge table
                   unless --merges_file overrides)
  --model tiktoken tokenizer-exact via tiktoken, when installed
  --model ws       whitespace model (legacy; functions/text.py F1)
                   (--merges_file, the bpe_train_merges format /
                   functions/mini_bpe.py)

Usage:
  python -m finmapreduce_spark.count_tokens --docs_glob 'corpus/*.md'
  python -m finmapreduce_spark.count_tokens --docs_glob 'a/*.md' 'b/*.md' \
      --model merges --merges_file merges.txt --per_file

Prints one JSON document: per-directory rows, the grand total, and a
log2-bucket histogram (the reference collects the same per-file list
for its matplotlib histograms).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _counted(spark, glob_path: str, model: str, merges_file: str | None):
    from finmapreduce_spark.functions.text import token_count
    from finmapreduce_spark.sources.readers import load_markdown_documents

    docs = load_markdown_documents(spark, glob_path)
    if model == "ws":
        return docs.withColumn("n_tokens", token_count(F.col("content")))
    if model == "tiktoken":
        from finmapreduce_spark.functions.exact_tokens import (
            tiktoken_encoder_factory,
        )

        factory = tiktoken_encoder_factory()
    elif model == "merges":
        from finmapreduce_spark.functions.mini_bpe import MergesBPE
        from finmapreduce_spark.functions.token_model import (
            vocab_merges_path,
        )

        factory = MergesBPE.factory(
            list(
                MergesBPE.from_merges_file(
                    merges_file or vocab_merges_path()
                ).ranks
            )
        )
    else:
        raise SystemExit(f"unknown --model {model!r}")

    @F.pandas_udf(T.LongType())
    def _n(texts: pd.Series) -> pd.Series:
        enc = factory()
        return texts.fillna("").map(lambda s: len(enc.encode(s)))

    return docs.withColumn("n_tokens", _n(F.col("content")))


def run(
    spark,
    docs_globs: list[str],
    model: str = "ws",
    merges_file: str | None = None,
    per_file: bool = False,
) -> dict:
    """One summary dict over all globs; Spark-side aggregation — the
    per-file list never lands on the driver unless --per_file."""
    import glob as _pyglob
    import os as _os

    def _bucketed(frame):
        return (
            frame.withColumn(
                "bucket",
                F.when(F.col("n_tokens") <= 0, F.lit(0)).otherwise(
                    F.floor(F.log2(F.col("n_tokens"))) + 1
                ),
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias("files"),
                F.sum("n_tokens").alias("tokens"),
                F.min("n_tokens").alias("min"),
                F.max("n_tokens").alias("max"),
            )
            .collect()
        )

    def _expand_braces(pattern: str) -> list[str]:
        # Hadoop globs (what spark.read.text uses) support {a,b}
        # alternation; Python glob does not — expand before globbing
        # so brace-expressed overlaps are detected (round-10 review).
        i = pattern.find("{")
        if i < 0:
            return [pattern]
        depth, j = 0, i
        for j in range(i, len(pattern)):
            depth += pattern[j] == "{"
            depth -= pattern[j] == "}"
            if depth == 0:
                break
        else:
            return [pattern]  # unbalanced: leave as-is
        # split the body on DEPTH-0 commas only: '{a,b{c,d}}' must
        # yield alternatives ['a', 'b{c,d}'], not the garbage
        # ['a', 'b{c', 'd}'] a naive split produces (round-10 advice —
        # nested alternations then recurse correctly and overlap
        # detection sees the real file set)
        alts, buf, d = [], [], 0
        for ch in pattern[i + 1 : j]:
            if ch == "," and d == 0:
                alts.append("".join(buf))
                buf = []
                continue
            d += ch == "{"
            d -= ch == "}"
            buf.append(ch)
        alts.append("".join(buf))
        out = []
        for alt in alts:
            out.extend(_expand_braces(pattern[:i] + alt + pattern[j + 1 :]))
        return out

    dirs = []
    hist: dict[str, int] = {}
    grand = {"files": 0, "tokens": 0}
    # Grand-total dedup across globs: detection keys on realpath (so
    # symlink-aliased overlaps are seen), but the Spark-side filter
    # matches input_file_name, which is URL-encoded and NOT
    # symlink-resolved — so track every literal form too and filter
    # on the decoded normalized source against all of them.
    seen_real: set[str] = set()
    raw_by_real: dict[str, set[str]] = {}
    for glob_path in docs_globs:
        # Per-glob entries intentionally count every matched file (the
        # reference's per-directory semantics), but a file matched by
        # MORE THAN ONE --docs_glob must hit the grand total/histogram
        # once (round-9 advice #3). Overlap is detected driver-side
        # with Python glob — free, no Spark job, no second encode in
        # the disjoint (normal) case.
        matched: dict[str, set[str]] = {}  # realpath -> literal paths

        def _note(p):
            ap = _os.path.abspath(p)
            matched.setdefault(_os.path.realpath(p), set()).add(ap)

        for pat in _expand_braces(glob_path):
            for p in _pyglob.glob(pat):
                if _os.path.isdir(p):  # spark.read.text(dir) = within
                    for f in _os.listdir(p):
                        fp = _os.path.join(p, f)
                        if _os.path.isfile(fp):
                            _note(fp)
                else:
                    _note(p)
        dup_real = set(matched) & seen_real
        # every literal form any glob used for the duplicated files
        dup = set()
        for rp in dup_real:
            dup |= matched[rp] | raw_by_real.get(rp, set()) | {rp}
        seen_real |= set(matched)
        for rp, raws in matched.items():
            raw_by_real.setdefault(rp, set()).update(raws)
        df = _counted(spark, glob_path, model, merges_file).select(
            "doc_name", "n_tokens", "source"
        )
        # ONE Spark job per glob: aggregate per log2 bucket, then
        # derive the summary from the <=64 bucket rows on the driver.
        # A corpus-wide encode is expensive under --model
        # tiktoken/merges, so it must not run once per statistic
        # (round-9 review finding #6). --per_file adds the only other
        # pass, over a persisted frame so the encode still runs once.
        if per_file or dup:
            df = df.persist()
        buckets = _bucketed(df)
        if dup:
            # second (persisted — no re-encode) agg excluding the
            # files an earlier glob already fed into the grand total;
            # url_decode undoes input_file_name's percent-encoding
            # (spaces etc.) so the path-string compare is faithful
            norm = F.url_decode(
                F.regexp_replace(F.col("source"), "^file:/*", "/")
            )
            gbuckets = _bucketed(df.filter(~norm.isin(sorted(dup))))
        else:
            gbuckets = buckets
        files = sum(int(b["files"]) for b in buckets)
        tokens = sum(int(b["tokens"] or 0) for b in buckets)
        entry = {
            "glob": glob_path,
            "files": files,
            "tokens": tokens,
            "avg": round(tokens / files, 2) if files else 0.0,
            "min": min((int(b["min"]) for b in buckets), default=0),
            "max": max((int(b["max"]) for b in buckets), default=0),
        }
        if per_file:
            entry["per_file"] = {
                r["doc_name"]: int(r["n_tokens"])
                for r in df.orderBy("doc_name").collect()
            }
        if per_file or dup:
            df.unpersist()
        dirs.append(entry)
        grand["files"] += sum(int(b["files"]) for b in gbuckets)
        grand["tokens"] += sum(int(b["tokens"] or 0) for b in gbuckets)
        for b in gbuckets:
            if b["bucket"]:
                lo = 2 ** (int(b["bucket"]) - 1)
                key = f"{lo}-{2 ** int(b['bucket']) - 1}"
            else:
                key = "0"
            hist[key] = hist.get(key, 0) + int(b["files"])
    return {"model": model, "dirs": dirs, "total": grand, "histogram": hist}


def main(argv=None, spark=None) -> dict:
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m finmapreduce_spark.count_tokens", description=__doc__
    )
    ap.add_argument("--docs_glob", nargs="+", required=True)
    ap.add_argument("--model", choices=("ws", "tiktoken", "merges"),
                    default="merges")
    ap.add_argument("--merges_file", default=None,
                    help="merge table for --model merges; defaults to the "
                         "engine's vendored 4,096-merge table (the round-15 "
                         "default budget model)")
    ap.add_argument("--per_file", action="store_true")
    args = ap.parse_args(argv)

    if spark is None:
        from finmapreduce_spark.session import get_spark

        spark = get_spark("count_tokens")
    out = run(spark, args.docs_glob, args.model, args.merges_file,
              args.per_file)
    print(json.dumps(out, indent=2, sort_keys=True))
    return out


if __name__ == "__main__":
    main()
