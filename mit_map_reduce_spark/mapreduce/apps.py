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

# Unicode-letter tokenization: the reference splits on any non-letter
# rune (src/mrapps/wc.go:21-24, strings.FieldsFunc + unicode.IsLetter).
_NON_LETTER = re.compile(r"[^\W\d_]+", re.UNICODE)  # runs of letters


def tokenize(text: str) -> list[str]:
    """Split into maximal runs of Unicode letters; drop empty tokens."""
    return _NON_LETTER.findall(text)


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
