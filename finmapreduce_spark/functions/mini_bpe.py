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
