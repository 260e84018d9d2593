"""Pure-Python merges-list BPE encoder for the tokenizer-exact lane.

The reference counts cl100k_base tokens via tiktoken
(/root/reference/src/utils/document_processing.py:19-23); tiktoken is
an optional dependency here, so the tokenizer-exact chunk/truncate
variants (functions/exact_tokens.py) take any injectable encoder.
This module supplies a REAL subword BPE encoder with zero
dependencies: load an ordered merge list — the exact ``"a b" → "ab"``
pair format the engine's own distributed trainer emits
(queries/training.py::bpe_train_merges) — and encode with the
classic rank-greedy BPE loop (Sennrich et al. 2016; the same
algorithm tiktoken's BPE runs, over a trained instead of a published
vocabulary). A user can therefore train a tokenizer on their corpus
IN THIS ENGINE and chunk/truncate token-exactly with it, with no
external tokenizer installed.

Losslessness contract (what token-exact chunk boundaries rely on):
text splits into maximal runs of lowercase letters vs everything
else; merges — learned on ``[a-z]+`` words, mirroring the trainer's
pre-tokenization (training.py::_bpe_words) — apply within letter
runs, and every non-lowercase character is its own single-char
token. Tokens partition the input, so ``decode(encode(s)) == s``
and the decode of ANY token slice is the corresponding contiguous
substring.

Spark posture: an encoder instance is per-worker state. Build it
inside the UDF via ``MergesBPE.factory(merges)`` — the merge list
(a few KB) ships in the closure, so executors never need a
driver-local file path.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

_RUNS = re.compile(r"[a-z]+|[^a-z]+")


class MergesBPE:
    """encode(str) -> list[int] / decode(list[int]) -> str over an
    ordered merge-pair list. Ids are interned per instance; only
    their slicing/length semantics matter to the exact-token lane,
    and encode/decode of one text always happens within one
    instance (one UDF worker)."""

    def __init__(self, merges: Iterable[tuple[str, str]]):
        self.ranks: dict[tuple[str, str], int] = {
            tuple(pair): i for i, pair in enumerate(merges)
        }
        self._id: dict[str, int] = {}
        self._tok: list[str] = []
        self._word_cache: dict[str, tuple[str, ...]] = {}

    # -- vocabulary interning ------------------------------------------
    def _intern(self, tok: str) -> int:
        i = self._id.get(tok)
        if i is None:
            i = len(self._tok)
            self._id[tok] = i
            self._tok.append(tok)
        return i

    # -- the classic rank-greedy merge loop ----------------------------
    def _merge_word(self, word: str) -> tuple[str, ...]:
        cached = self._word_cache.get(word)
        if cached is not None:
            return cached
        toks = list(word)
        while len(toks) >= 2:
            best_pair = None
            best_rank = None
            for i in range(len(toks) - 1):
                r = self.ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_pair, best_rank = (toks[i], toks[i + 1]), r
            if best_pair is None:
                break
            out: list[str] = []
            i = 0
            while i < len(toks):
                if (
                    i < len(toks) - 1
                    and (toks[i], toks[i + 1]) == best_pair
                ):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        result = tuple(toks)
        self._word_cache[word] = result
        return result

    # -- public contract (matches tiktoken's Encoding surface) ---------
    def encode(self, s: str) -> list[int]:
        ids: list[int] = []
        for run in _RUNS.findall(s or ""):
            if "a" <= run[0] <= "z":
                for tok in self._merge_word(run):
                    ids.append(self._intern(tok))
            else:
                for ch in run:  # non-letter chars: one token each
                    ids.append(self._intern(ch))
        return ids

    def decode(self, ids: list[int]) -> str:
        return "".join(self._tok[i] for i in ids)

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_merges_lines(cls, lines: Iterable[str]) -> "MergesBPE":
        """Each non-empty, non-comment line is one ``left right`` pair,
        rank = line order — the format tools/make_mini_bpe_fixture.py
        writes and bpe_train_merges' ``pair`` column uses."""
        merges = []
        for lineno, line in enumerate(lines, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"merges line {lineno}: expected exactly 'left right', "
                    f"got {line!r}"
                )
            merges.append((parts[0], parts[1]))
        return cls(merges)

    @classmethod
    def from_merges_file(cls, path: str) -> "MergesBPE":
        with open(path, encoding="utf-8") as f:
            return cls.from_merges_lines(f)

    @staticmethod
    def factory(merges: list[tuple[str, str]]):
        """Zero-arg encoder_factory for exact_tokens builders. Takes
        the MATERIALIZED merge list (not a path) so the model ships in
        the UDF closure and works on any executor."""
        merges = [tuple(p) for p in merges]
        return lambda: MergesBPE(merges)


def py_train_batched(
    words: dict[str, int],
    rounds: int,
    batch: int,
    cand_window: int,
) -> list[tuple[str, str]]:
    """Pure-Python round-for-round twin of the engine's batched
    distributed BPE trainer (queries/training.py::_bpe_train_batched):
    each round counts adjacent token pairs over the weighted
    distinct-word table, ranks by (count desc, "left right" asc),
    scans the top ``cand_window`` candidates, and greedily accepts up
    to ``batch`` pairs under FULL-CLOSURE disjointness ({left, right,
    merged} disjoint from every earlier pick's closure) so in-batch
    application commutes; accepted merges apply everywhere before the
    next round; an empty round terminates. Byte-identical output is
    the parity contract — pinned on the embedded fixture corpus by
    tests/test_exact_tokens.py and on real corpus word tables by
    tests/test_training.py / the vocab-scale study
    (tools/bpe_batch_study.py --twin-parity).

    ``words``: {word: weight} with the trainer's pre-tokenization
    already applied (lowercase [a-z]+ runs, length cap)."""
    import collections

    toks: dict[str, list[str]] = {w: list(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _round in range(rounds):
        counts: collections.Counter = collections.Counter()
        for w, freq in words.items():
            t = toks[w]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] += freq
        if not counts:
            break
        cand = sorted(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )[:cand_window]
        chosen: list[tuple[str, str]] = []
        used: set[str] = set()
        for (a, b), _cnt in cand:
            if {a, b, a + b} & used:
                continue
            chosen.append((a, b))
            used |= {a, b, a + b}
            if len(chosen) == batch:
                break
        if not chosen:
            break
        merges.extend(chosen)
        chosen_set = set(chosen)
        for w in toks:
            t = toks[w]
            out: list[str] = []
            i = 0
            while i < len(t):
                if i < len(t) - 1 and (t[i], t[i + 1]) in chosen_set:
                    out.append(t[i] + t[i + 1])
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    return merges
