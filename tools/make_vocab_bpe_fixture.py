"""Regenerate finmapreduce_spark/resources/vocab_bpe_merges.txt — the
vendored vocab-scale BPE merge table (4,096 merges since round 12 —
REAL-vocabulary scale, matching the 4,079-merge Spark↔Python parity
certification of tools/bpe_batch_study.py; previously 523) that
certifies the Arrow-batched MergesBPE production path end-to-end.

Trainer: a sequential pure-Python twin of the engine's BATCHED
distributed trainer (queries/training.py::_bpe_train_batched) with
EXACTLY its semantics — words are lowercase ``[a-z]+`` runs of length
<= 16 weighted by occurrence count; each round counts adjacent token
pairs, ranks by (count desc, "left right" asc), scans the top
CAND_WINDOW candidates, and greedily accepts up to BATCH_M pairs
under FULL-CLOSURE disjointness ({left, right, merged} disjoint from
every earlier pick's closure) so in-batch application commutes;
accepted merges apply everywhere before the next round; the emitted
table is the first N_MERGES merges (a prefix of a trainer run is
itself a valid trained table — the standard vocabulary-size cap).
BATCH_M/CAND_WINDOW match the bpe_batch_study certification config
(M=16, W=128). tests/test_exact_tokens.py pins (a) that this script
regenerates the file byte-identically and (b) that the Spark trainer
reproduces a prefix of it over the same corpus (the trainer's round k
depends only on rounds < k, so any round-count run is a prefix of a
longer one), so regenerating must be a no-op unless this script
changes.

The corpus is EMBEDDED (prose + a deterministically GENERATED
morpheme-compound vocabulary — plain nested loops over fixed word
lists, no RNG — sized so pair exhaustion sits above N_MERGES) so the
fixture is deterministic across rounds and machines — never train
the fixture on driver-generated testdata.

Run: python tools/make_vocab_bpe_fixture.py
"""

from __future__ import annotations

import collections
import os
import re

N_MERGES = 4096   # vocabulary-size cap (the emitted prefix)
TRAIN_ROUNDS = 3000  # past exhaustion; the cap sets the table size
BATCH_M = 16      # the bpe_batch_study certification config
CAND_WINDOW = 128
MAX_WORD_LEN = 16

CORPUS = """
The quarterly report shows that total revenue increased while the
operating expenses decreased over the period. The company reported
strong earnings growth and the management expects further revenue
expansion next quarter. Interest expense on the outstanding debt
declined because the company repaid a portion of the principal.
The balance sheet remains healthy with increasing cash reserves and
decreasing liabilities. Shareholders approved the proposed dividend
and the board authorized an additional share repurchase program.
Operating margins improved as the cost of goods sold decreased
relative to total revenue. The auditors confirmed that the financial
statements present fairly the financial position of the company.
Analysts expect the earnings per share to increase again next year
while the revenue growth rate stabilizes around historical averages.
The effective tax rate decreased slightly because of the research
credits recognized during the reporting period under review.
Capital expenditure guidance anticipates measured investment across
manufacturing facilities, logistics infrastructure, and software
platforms supporting digital transformation initiatives worldwide.
Inventory turnover accelerated through disciplined procurement while
receivables collection improved following renegotiated payment terms
with several strategic distribution partners in emerging markets.
Currency fluctuations produced unfavorable translation adjustments,
partially offset by commodity hedging contracts maturing quarterly.
Segment disclosures highlight robust subscription momentum, modest
hardware softness, and resilient professional services demand among
enterprise customers renewing multiyear maintenance agreements.
Litigation reserves reflect probable settlements concerning patent
disputes, employment claims, and environmental remediation matters
inherited through historical acquisitions awaiting final approval.
Pension obligations benefited from higher discount assumptions while
actuarial losses diminished alongside favorable mortality updates.
Goodwill impairment testing incorporated conservative terminal value
estimates, elevated weighted average capital costs, and compressed
peer multiples observed throughout volatile public equity markets.
Liquidity remains ample given undrawn revolving credit facilities,
staggered bond maturities, and substantial unrestricted deposits
held across diversified global banking counterparties with strong
ratings. Regulatory developments introduce compliance obligations
surrounding data privacy, carbon disclosure, and supplier auditing
which management addresses through expanded governance frameworks.
Research productivity strengthened as laboratory automation reduced
experiment cycle times and computational screening prioritized the
most promising candidate formulations for clinical advancement.
"""

# Deterministic vocabulary expansion (round 12): morpheme-compound
# words generated by plain nested loops over fixed lists — no RNG,
# embedded forever. The prose block alone exhausts at ~840 unique
# merges; real vocabularies run to thousands, and the compounds give
# the trainer enough DISTINCT boundary material (forward, reversed,
# and suffixed combinations) that exhaustion sits above N_MERGES.
PREFIXES = [
    "fiscal", "audit", "credit", "debit", "margin", "equity", "asset",
    "bond", "yield", "hedge", "tariff", "ledger", "broker", "market",
    "capital", "dividend", "invoice", "payroll", "pension", "revenue",
    "escrow", "futures", "option", "surplus", "deficit", "treasury",
    "venture", "warrant", "billing", "clearing",
]
STEMS = [
    "flow", "rate", "risk", "gain", "loss", "cost", "fund", "note",
    "pool", "band", "curve", "index", "ratio", "share", "stake",
    "trust", "value", "yield", "swap", "draft", "quota", "scale",
    "spread", "tranche", "buffer",
]
SUFFIXES = [
    "ing", "ed", "er", "ize", "al", "ic", "ous", "ary", "ment",
    "tion", "ity", "ship",
]
EXTRA = [
    "quantum", "syntax", "vector", "matrix", "kernel", "buffer",
    "cipher", "packet", "socket", "thread", "branch", "commit",
    "lambda", "object", "parser", "schema", "tensor", "tuple",
    "vertex", "widget", "zephyr", "oxide", "prism", "quartz",
    "fjord", "glyph", "nymph", "sphinx", "vortex", "waltz",
    "jigsaw", "kayak", "llama", "mosaic", "nectar", "onyx",
    "plasma", "quiver", "rhythm", "saffron", "tundra", "umber",
    "velvet", "wicker", "xenon", "yonder", "zircon", "amber",
    "bramble", "cobalt", "dapple", "ember", "fathom", "gossamer",
    "harbor", "indigo", "jasper", "krypton", "lagoon", "meadow",
]


def _generated_vocab() -> str:
    words = []
    for i, p in enumerate(PREFIXES):
        for j, s in enumerate(STEMS):
            words.append(p + s)
            words.append(p + s + SUFFIXES[(i + j) % len(SUFFIXES)])
            words.append(s + p)  # reversed boundary material
    for i, a in enumerate(EXTRA):
        for j, b in enumerate(EXTRA):
            if i != j and (i + j) % 4 == 0:
                words.append(a + b)
        for sfx in SUFFIXES:
            words.append(a + sfx)
    return " ".join(words)


FULL_CORPUS = CORPUS + "\n" + _generated_vocab() + "\n"


def train_batched(corpus: str, n_rounds: int) -> list[tuple[str, str]]:
    """Round-for-round twin of _bpe_train_batched: exactly n_rounds
    rounds, each accepting UP TO BATCH_M pairs (a round can come up
    short when the top-CAND_WINDOW candidates exhaust under closure
    disjointness — same as the distributed trainer), so the emitted
    list is the Spark trainer's verbatim output for (rounds, batch).
    The trainer body lives in functions/mini_bpe.py::py_train_batched
    (round 11: factored out so the vocab-scale parity study can run
    the same twin over real corpus word tables); this wrapper only
    applies the fixture's pre-tokenization and constants."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from finmapreduce_spark.functions.mini_bpe import py_train_batched

    words = collections.Counter(
        w
        for w in re.findall(r"[a-z]+", corpus.lower())
        if len(w) <= MAX_WORD_LEN
    )
    return py_train_batched(
        dict(words), rounds=n_rounds, batch=BATCH_M, cand_window=CAND_WINDOW
    )


def main() -> str:
    merges = train_batched(FULL_CORPUS, TRAIN_ROUNDS)[:N_MERGES]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "finmapreduce_spark",
        "resources",
        "vocab_bpe_merges.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        f.write(
            "# vocab-scale BPE merge table — regenerate with "
            "tools/make_vocab_bpe_fixture.py (do not hand-edit)\n"
        )
        for left, right in merges:
            f.write(f"{left} {right}\n")
    print(f"wrote {out}: {len(merges)} merges")
    return out


if __name__ == "__main__":
    main()
