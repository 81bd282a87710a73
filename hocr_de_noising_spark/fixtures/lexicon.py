"""Seeded lexicon generator (FIXTURES.md §5).

5 000 lowercase alpha tokens from a word-shape (syllable) grammar, with
Zipf(a=1.3) frequencies. Deterministic under seed 42. Tokens never
contain a >=3 repeated-char run (so the repeat-run noise rule can never
fire on a clean token) and are 4..12 chars long.
"""

from __future__ import annotations

import numpy as np

ONSETS = [
    "b", "c", "d", "f", "g", "h", "l", "m", "n", "p", "r", "s", "t", "v", "w",
    "br", "ch", "cl", "cr", "dr", "fl", "fr", "gr", "pl", "pr", "sh", "sl",
    "sp", "st", "th", "tr", "wh",
]
VOWELS = ["a", "e", "i", "o", "u", "ai", "ea", "ee", "ie", "ou", "oa"]
CODAS = ["", "", "", "n", "r", "s", "t", "l", "m", "d", "k", "nd", "nt", "st", "th", "ng"]


def _has_run(token: str, n: int = 3) -> bool:
    run = 1
    for a, b in zip(token, token[1:]):
        run = run + 1 if a == b else 1
        if run >= n:
            return True
    return False


def gen_lexicon(n: int = 5000, seed: int = 42) -> list[tuple[str, int]]:
    """Returns [(token, freq)] sorted by token; freq ~ Zipf(a=1.3)."""
    rng = np.random.default_rng(seed)
    tokens: set[str] = set()
    while len(tokens) < n:
        n_syll = int(rng.integers(2, 5))
        parts = []
        for _ in range(n_syll):
            parts.append(ONSETS[int(rng.integers(0, len(ONSETS)))])
            parts.append(VOWELS[int(rng.integers(0, len(VOWELS)))])
            parts.append(CODAS[int(rng.integers(0, len(CODAS)))])
        tok = "".join(parts)
        if 4 <= len(tok) <= 12 and not _has_run(tok):
            tokens.add(tok)
    ordered = sorted(tokens)
    freqs = rng.zipf(1.3, size=len(ordered))
    return [(t, int(min(f, 1_000_000))) for t, f in zip(ordered, freqs)]
