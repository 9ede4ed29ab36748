"""String-similarity kernels (SURVEY.md §2 L2, docs/PIPELINE_SPEC.md §4).

From-scratch Jaro-Winkler / Levenshtein (no jellyfish/rapidfuzz in the
environment). The hot path calls these on UNIQUE normalized strings
only (the Linker dedups per batch and caches per actor), so a clean
pure-Python kernel is the right trade-off; `levenshtein` uses the
two-row DP with an early band cutoff.
"""

from __future__ import annotations


def levenshtein(a: str, b: str) -> int:
    """Standard unit-cost edit distance (two-row DP)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la < lb:  # keep inner loop over the longer string's rows small
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    cur = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur[0] = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            x = prev[j] + 1
            y = cur[j - 1] + 1
            z = prev[j - 1] + cost
            if y < x:
                x = y
            if z < x:
                x = z
            cur[j] = x
        prev, cur = cur, prev
    return prev[lb]


def jaro(a: str, b: str) -> float:
    """Standard Jaro similarity; both empty -> 1.0, one empty -> 0.0."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i in range(la):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1 if i + window + 1 < lb else lb
        for j in range(lo, hi):
            if not b_flags[j] and a[i] == b[j]:
                a_flags[i] = True
                b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched chars in order
    transpositions = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions / 2.0
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler with p=0.1, prefix cap 4, boost applied
    unconditionally (PIPELINE_SPEC.md §4)."""
    j = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix == 4:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def combined_score(a: str, b: str) -> float:
    """Linking score: 0.6*JW + 0.4*(1 - lev/maxlen); 0.0 if both empty."""
    maxlen = max(len(a), len(b))
    if maxlen == 0:
        return 0.0
    return 0.6 * jaro_winkler(a, b) + 0.4 * (1.0 - levenshtein(a, b) / maxlen)
