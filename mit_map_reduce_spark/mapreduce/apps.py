"""The reference's application plugins, as Python map/reduce callables.

Each pair reimplements the *semantics* of a reference ``mrapps``
plugin (cited per function) for use with
:func:`mit_map_reduce_spark.mapreduce.run_job` and the sequential
oracle. These are deliberately opaque record-at-a-time functions — the
reference's UDTF/UDAF contract. The DataFrame-native formulations of
the same queries (Catalyst-optimized, shuffle-combined) live in
``mit_map_reduce_spark.operators.mr_queries``.
"""

from __future__ import annotations

import re
import unicodedata

# Unicode-letter tokenization: the reference splits on any non-letter
# rune (src/mrapps/wc.go:21-24, strings.FieldsFunc + unicode.IsLetter).
# Go's unicode.IsLetter admits exactly the L* categories; Python's
# [^\W\d_] ALSO admits Nl/No codepoints (Ⅻ, ①, ½ — str.isalnum minus
# decimal digits), so matched runs take a second, rarely-taken split
# pass: str.isalpha (C-speed, exactly "all chars in L*") gates the
# fast path, and only tokens containing an Nl/No char walk the
# per-character category check.
_LETTERISH = re.compile(r"[^\W\d_]+", re.UNICODE)  # runs of L*/Nl/No


def _letter_runs(token: str) -> list[str]:
    """Split a token on its non-L* characters, the way Go's
    strings.FieldsFunc(s, not unicode.IsLetter) would."""
    runs: list[str] = []
    cur: list[str] = []
    for ch in token:
        if unicodedata.category(ch).startswith("L"):
            cur.append(ch)
        elif cur:
            runs.append("".join(cur))
            cur = []
    if cur:
        runs.append("".join(cur))
    return runs


def tokenize(text: str) -> list[str]:
    """Split into maximal runs of Unicode letters (categories L*
    exactly, matching Go's unicode.IsLetter); drop empty tokens."""
    out: list[str] = []
    for tok in _LETTERISH.findall(text):
        if tok.isalpha():
            out.append(tok)
        else:
            out.extend(_letter_runs(tok))
    return out


# --- wc: word count (src/mrapps/wc.go) ---------------------------------


def wc_map(filename: str, contents: str) -> list[tuple[str, str]]:
    # One ("word", "1") pair per occurrence, case-sensitive, no
    # lowercasing (src/mrapps/wc.go:19-32).
    return [(w, "1") for w in tokenize(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    # Count of occurrences (src/mrapps/wc.go:37-40).
    return str(len(values))


# --- indexer: inverted index (src/mrapps/indexer.go) -------------------


def indexer_map(filename: str, contents: str) -> list[tuple[str, str]]:
    # Distinct words per document -> (word, docname)
    # (src/mrapps/indexer.go:20-31).
    return [(w, filename) for w in set(tokenize(contents))]


def indexer_reduce(key: str, values: list[str]) -> str:
    # "<count> <comma-joined sorted doc list>"; the sort inside reduce
    # is what makes the output deterministic despite unspecified value
    # order (src/mrapps/indexer.go:36-39).
    docs = sorted(values)
    return f"{len(docs)} {','.join(docs)}"


# --- crash/nocrash computation (src/mrapps/nocrash.go) -----------------
# The fault-injection *behavior* of crash.go (random os.Exit / sleeps)
# is a test concern, exercised in tests/test_fault_tolerance.py; the
# underlying computation is identical to nocrash.go and lives here.


def crashsafe_map(filename: str, contents: str) -> list[tuple[str, str]]:
    # (src/mrapps/nocrash.go:17-35)
    return [
        ("a", filename),
        ("b", str(len(filename))),
        ("c", str(len(contents))),
        ("d", "xyzzy"),
    ]


def crashsafe_reduce(key: str, values: list[str]) -> str:
    # sort + space-join (src/mrapps/nocrash.go:37-47)
    return " ".join(sorted(values))


# --- early_exit computation (src/mrapps/early_exit.go:19-36) -----------


def early_exit_map(filename: str, contents: str) -> list[tuple[str, str]]:
    return [(filename, "1")]


def early_exit_reduce(key: str, values: list[str]) -> str:
    return str(len(values))
