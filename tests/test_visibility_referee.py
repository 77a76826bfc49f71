"""ColumnVisibility referee (round 8): expression TREES generated with
ground truth known by construction, rendered to Accumulo-syntax
strings, evaluated by the engine's parser — the parser can't drift
from the generator's semantics because the generator never parses.

The r8 sweep found the unquoted-label charset missing '/' (Accumulo's
ColumnVisibility accepts alphanumeric plus ``_ - : . /`` unquoted), so
a stored 'org/team' label failed to parse and the fail-closed path
DROPPED the row where Accumulo evaluates it — for a security filter,
fail-closed on a legal label is silent data loss.  Quoted-term
escapes (\\" and \\\\) were also unsupported.  Both fixed + pinned.
"""

from __future__ import annotations

import random
import re

import pytest

from datawave_spark.visibility import (VisibilityParseError,
                                       _evaluate_fail_closed, evaluate)

LABELS = ["A", "B", "C", "org/team", "x.y:z", "a-b_c",
          "q space", 'w"x', "back\\slash"]


def _needs_quote(label):
    return not re.fullmatch(r"[A-Za-z0-9_.:/-]+", label)


def _render_label(label):
    if _needs_quote(label):
        return '"' + label.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return label


def _gen_tree(rng, depth=0):
    if depth >= 3 or rng.random() < 0.4:
        return ("L", rng.choice(LABELS))
    op = rng.choice(["&", "|"])
    return (op, [_gen_tree(rng, depth + 1)
                 for _ in range(rng.randint(2, 3))])


def _render(rng, t, parent_op=None):
    if t[0] == "L":
        return _render_label(t[1])
    op, kids = t
    body = op.join(_render(rng, k, op) for k in kids)
    if parent_op is not None or rng.random() < 0.3:
        return f"({body})"
    return body


def _ev_tree(t, auths):
    if t[0] == "L":
        return t[1] in auths
    op, kids = t
    agg = all if op == "&" else any
    return agg(_ev_tree(k, auths) for k in kids)


def test_constructed_trees_agree():
    rng = random.Random(55)
    for _ in range(1500):
        t = _gen_tree(rng)
        s = _render(rng, t)
        auths = {l for l in LABELS if rng.random() < 0.5}
        assert evaluate(s, auths) == _ev_tree(t, auths), (s, sorted(auths))


def test_slash_and_quoted_escape_labels():
    assert evaluate("org/team", {"org/team"})
    assert not evaluate("org/team", {"org"})
    assert evaluate('"w\\"x"&A', {'w"x', "A"})
    assert evaluate('"back\\\\slash"', {"back\\slash"})
    assert evaluate('"q space"|Z', {"q space"})


@pytest.mark.parametrize("bad", [
    "A&B|C", "A&", "|A", "(A", "A)", "A B", "()", "&", "A&&B",
    'A&"unclosed',
])
def test_invalid_rejected_and_fail_closed(bad):
    with pytest.raises(VisibilityParseError):
        evaluate(bad, {"A", "B", "C"})
    assert _evaluate_fail_closed(bad, {"A", "B", "C"}) is False
