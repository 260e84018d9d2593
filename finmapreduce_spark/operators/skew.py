"""Skew-mitigation joins (SURVEY §7 M5 — "salting for hot documents").

The doc×qa join J1 is the engine's canonical skew case: one 10-K can
serve thousands of questions, so its doc_name key overwhelms one task
in a shuffled join. Two mitigations, in preference order:

1. **Broadcast** the dim side (join_documents already does) — no
   shuffle at all. Works while the dim fits in executor memory.
2. **Salting** (here) when both sides are too big to broadcast: the
   fact side appends a deterministic salt in [0, n); the dim side
   replicates each row n times, one per salt; the join key becomes
   (key, salt) so one hot key spreads over n tasks. AQE's skew-join
   splitting does this adaptively for sort-merge joins; explicit
   salting is for when you need it on hash joins / older planners or
   want deterministic layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_from: Column | None = None,
) -> DataFrame:
    """Equi-join ``facts`` (big, skewed) with ``dim`` (big, keyed once
    per ``on``) spreading each hot key over ``n_salts`` tasks.

    ``salt_from`` picks the fact-side expression hashed into the salt
    (default: the whole row via xxhash64 of all columns) — it must
    vary WITHIN a key for salting to help. Deterministic (no rand()),
    so retried tasks produce identical rows — required for the paid
    LLM stages downstream (SURVEY §4: no re-fired calls).

    Result == ``facts.join(dim, on, how)`` for how in inner/left —
    dim rows are replicated, not multiplied per fact row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    src = salt_from if salt_from is not None else F.xxhash64(*facts.columns)
    salted_facts = facts.withColumn(SALT_COL, F.pmod(src, F.lit(n_salts)))
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(salted_dim, [on, SALT_COL], how)
    return out.drop(SALT_COL)
