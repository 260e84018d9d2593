"""Per-document suffix-automaton substring statistics — the
compression-style quality signal (a highly repetitive document has few
distinct substrings relative to its window count; Lee et al. 2021 use
exactly this family of signals to find low-quality/duplicated text).

The suffix automaton is the classic linear-time construction (Blumer
et al. 1985; the textbook form popularized by cp-algorithms): one
state per endpos-equivalence class, suffix links form a tree, and the
number of distinct substrings is Σ_v (len(v) − len(link(v))). Capping
at window K needs no re-walk — each state contributes
max(0, min(len(v), K) − min(len(link(v)), K)) — and the longest
REPEATED substring is the max len(v) among states whose endpos class
has ≥ 2 occurrences (occurrence counts seed 1 at non-clone states and
propagate up the link tree in len-descending order).

Spark posture: this is inherently per-document imperative work with
no JVM/SQL equivalent, so it runs as an Arrow-batched mapInPandas
stage (queries/textops.py::text_substring_diversity); the DuckDB
oracle brute-forces the same statistics from the explicit ≤K-window
multiset, which is exact but quadratic — the linear automaton is the
scale path, the quadratic window enumeration is the CHECK.
"""

from __future__ import annotations


def _sam_build(s: str):
    """Linear suffix-automaton construction (Blumer 1985 / the
    cp-algorithms textbook form) → (len, link, next, is_clone) lists.
    Shared by the per-doc substring statistics and the cross-doc LCS
    streamer."""
    sa_len = [0]
    sa_link = [-1]
    sa_next: list[dict[str, int]] = [{}]
    is_clone = [False]
    last = 0
    for ch in s:
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        sa_next.append({})
        is_clone.append(False)
        p = last
        while p >= 0 and ch not in sa_next[p]:
            sa_next[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = sa_next[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                sa_next.append(dict(sa_next[q]))
                is_clone.append(True)
                while p >= 0 and sa_next[p].get(ch) == q:
                    sa_next[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
    return sa_len, sa_link, sa_next, is_clone


def sam_lcs(a: str, b: str) -> int:
    """Longest common substring LENGTH of two strings in
    O(|a| + |b|): build the suffix automaton of ``a`` and stream
    ``b`` through it (the classic cp-algorithms two-string LCS walk —
    on a transition miss, follow suffix links until a state accepts
    the character, clamping the current match length to that state's
    len). Exact, uncapped — the scale path the quadratic
    substring-enumeration oracle checks."""
    if not a or not b:
        return 0
    sa_len, sa_link, sa_next, _ = _sam_build(a)
    v, cur, best = 0, 0, 0
    for ch in b:
        while v and ch not in sa_next[v]:
            v = sa_link[v]
            cur = sa_len[v]
        if ch in sa_next[v]:
            v = sa_next[v][ch]
            cur += 1
            if cur > best:
                best = cur
        else:
            v, cur = 0, 0
    return best


def sam_substring_stats(s: str, k: int) -> tuple[int, int, int]:
    """→ (n_windows, n_distinct, longest_repeat), all over substrings
    of length ≤ ``k``:

    - n_windows: total (position, length≤k) windows = Σ_{l=1..min(k,L)}
      (L−l+1) — closed form, no enumeration;
    - n_distinct: distinct substrings of length ≤ k;
    - longest_repeat: max l ≤ k such that some length-l substring
      occurs ≥ 2 times (0 if none; a repeat of length l implies
      repeats of every shorter length, so this is the capped LRS).
    """
    n = len(s)
    m = min(k, n)
    n_windows = m * (n + 1) - m * (m + 1) // 2
    if n == 0:
        return 0, 0, 0
    sa_len, sa_link, sa_next, is_clone = _sam_build(s)
    # --- capped distinct count ---
    n_distinct = 0
    for v in range(1, len(sa_len)):
        hi = sa_len[v] if sa_len[v] < k else k
        lo = sa_len[sa_link[v]] if sa_len[sa_link[v]] < k else k
        if hi > lo:
            n_distinct += hi - lo
    # --- occurrence counts up the link tree (len-descending) ---
    cnt = [0 if is_clone[v] else 1 for v in range(len(sa_len))]
    cnt[0] = 0
    order = sorted(range(1, len(sa_len)), key=sa_len.__getitem__, reverse=True)
    longest_repeat = 0
    for v in order:
        if cnt[v] >= 2 and sa_len[v] > longest_repeat:
            longest_repeat = sa_len[v]
        link = sa_link[v]
        if link > 0:
            cnt[link] += cnt[v]
        elif link == 0:
            pass  # root accumulates nothing we report
    return n_windows, n_distinct, min(longest_repeat, k)
