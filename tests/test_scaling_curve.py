"""Unit pins for tools/scaling_curve.py's corpus-synthesis helpers.

The per-copy salt is the load-bearing trick of the documents
synthesis: distinct copies must share NO shingles, which requires the
salt to (a) survive the letter tokenizer (letters only — any
non-letter character is a token boundary and the salt collapses) and
(b) differ per copy. The original chr(ord('a')+c) violated (a) at
c >= 26 and inflated an x30 curve's pair output 5x before the base-26
rewrite; these pins keep that class of synthesis bug out.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_curve import _salt


def test_salt_is_letters_only_at_any_copy_index():
    for c in range(0, 200):
        s = _salt(c)
        assert s.isalpha() and s.islower(), (c, s)


def test_salt_distinct_per_copy():
    seen = {_salt(c) for c in range(200)}
    assert len(seen) == 200


def test_salt_backward_compatible_below_26():
    # committed 1x/3x/10x tables were built under the original salt;
    # base-26 must reproduce it exactly there so cached corpora and
    # published numbers stay valid
    for c in range(26):
        assert _salt(c) == "q" + chr(ord("a") + c)
