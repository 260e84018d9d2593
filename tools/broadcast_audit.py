"""Audit: find BroadcastExchange nodes whose subtree contains a
Generate (explode/posexplode) in the dedup-lane plans.

Why: Catalyst's sizeInBytes estimate for Generate output equals its
INPUT size, so explode-heavy corpus pipelines are underestimated by
the explode factor (~1000x for shingles/grams).  At 50x corpus scale
that planned one lane's join as a STATIC BroadcastExchange whose real
build was 12.9 GiB ("Cannot broadcast the table that is larger than
8.0 GiB" — SCALE.md round-14 ledger).  Anything corpus-derived grows
linearly with the corpus, so at 100 TB *no* explode output is ever
broadcastable: every hit this audit reports is a latent scale-killer
regardless of how small it looks at test SF.

Usage: python tools/broadcast_audit.py [sf_dir] [query_prefix ...]
Walks queryExecution().sparkPlan() (the static pre-AQE physical plan,
where the broadcast decision is made) via py4j and prints one line
per offending exchange.  Exit code 1 if any hit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finmapreduce_spark.queries import all_queries  # noqa: E402
from finmapreduce_spark.session import get_spark  # noqa: E402


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def _subtree_has(node, cls_fragment: str) -> bool:
    if cls_fragment in node.getClass().getSimpleName():
        return True
    return any(_subtree_has(c, cls_fragment) for c in _children(node))


def broadcast_over_generate(df) -> list[str]:
    """Simple-string descriptions of every BroadcastExchange in the
    static physical plan whose subtree contains a Generate."""
    hits: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name.startswith("BroadcastExchange") and any(
            _subtree_has(c, "Generate") for c in _children(node)
        ):
            hits.append(node.simpleString(120))
        for c in _children(node):
            walk(c)

    walk(df._jdf.queryExecution().sparkPlan())
    return hits


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:]) or ("dedup_",)
    spark = get_spark("broadcast_audit")
    qs = all_queries()
    bad = 0
    for name in sorted(qs):
        if not name.startswith(prefixes):
            continue
        try:
            df = qs[name].spark(spark, sf_dir)
            hits = broadcast_over_generate(df)
        except Exception as e:  # lane needs unavailable deps etc.
            print(f"{name}: SKIP ({type(e).__name__}: {e})")
            continue
        finally:
            spark.catalog.clearCache()
        if hits:
            bad += 1
            for h in hits:
                print(f"{name}: BROADCAST-OVER-GENERATE {h}")
        else:
            print(f"{name}: clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
