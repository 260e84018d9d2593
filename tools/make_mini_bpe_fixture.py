"""Regenerate tests/fixtures/mini_bpe_merges.txt (vendored ~200-merge
BPE model for the tokenizer-exact value tests).

Sequential reference trainer with EXACTLY the semantics of the
engine's distributed one (queries/training.py::bpe_train_merges):
words are lowercase ``[a-z]+`` runs, each merge round counts adjacent
token pairs weighted by word frequency, picks max count with ties
broken by lexicographically smallest ``"left right"`` pair string,
and merges every occurrence. The corpus is EMBEDDED (original text,
fixed forever) so the fixture is deterministic across rounds and
machines — never train the fixture on driver-generated testdata.

Run: python tools/make_mini_bpe_fixture.py   (rewrites the fixture
in place; the value test pins goldens against the committed file, so
regenerating must be a no-op unless this script changes).
"""

from __future__ import annotations

import collections
import os
import re

N_MERGES = 200

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
"""


def train(corpus: str, n_merges: int) -> list[tuple[str, str]]:
    words = collections.Counter(re.findall(r"[a-z]+", corpus.lower()))
    # word -> current token tuple
    toks: dict[str, list[str]] = {w: list(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for w, freq in words.items():
            t = toks[w]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] += freq
        if not counts:
            break
        # max count, tie -> lexicographically smallest "left right"
        # (training.py orderBy desc cnt, asc pair)
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        pair = best[0]
        merges.append(pair)
        for w in toks:
            t = toks[w]
            out: list[str] = []
            i = 0
            while i < len(t):
                if i < len(t) - 1 and (t[i], t[i + 1]) == pair:
                    out.append(t[i] + t[i + 1])
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    return merges


def main() -> str:
    merges = train(CORPUS, N_MERGES)
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "mini_bpe_merges.txt",
    )
    out = os.path.normpath(out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        f.write("# vendored mini-BPE merge list — regenerate with\n")
        f.write("# python tools/make_mini_bpe_fixture.py (deterministic)\n")
        for left, right in merges:
            f.write(f"{left} {right}\n")
    print(f"wrote {len(merges)} merges to {out}")
    return out


if __name__ == "__main__":
    main()
