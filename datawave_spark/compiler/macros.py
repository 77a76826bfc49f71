"""Query macros — QueryMacroFunction parity
(query/tables/QueryMacroFunction.java:12).

The reference lets deployments register named query templates; a query
containing ``MACRO(sel1, sel2, ...)`` has the call replaced by the
template with ``$0, $1, ...`` substituted by the selectors, repeatedly
until no macro call remains (macros may expand to text containing
further macro calls).  This is a pure string→string front-end pass,
applied before parsing.
"""

from __future__ import annotations

import re


class MacroError(ValueError):
    pass


def expand_macros(query: str, macros: dict[str, str],
                  max_expansions: int = 100) -> str:
    """Expand ``NAME(a, b, ...)`` macro calls using the template map.

    Selectors are comma-split and trimmed (empty selectors dropped,
    matching the reference's Splitter.omitEmptyStrings); ``$i``
    placeholders substitute positionally.  A macro name only matches at
    a token boundary (``GRANGE(...)`` is never rewritten by a ``RANGE``
    macro — the reference's bare substring match silently corrupts such
    queries).  ``max_expansions`` bounds TOTAL substitutions, so both
    direct (A→A) and mutual (A→B→A) macro recursion fail fast instead
    of looping forever as the reference would."""
    expansions = 0
    while True:
        changed = False
        for key, template in macros.items():
            pat = re.compile(r"(?<![A-Za-z0-9_])"
                             + re.escape(key) + r"\(([^()]*)\)")
            m = pat.search(query)
            while m is not None:
                expansions += 1
                if expansions > max_expansions:
                    raise MacroError(
                        f"macro expansion exceeded {max_expansions} "
                        "substitutions (recursive macro definition?)")
                selectors = [s.strip() for s in m.group(1).split(",")
                             if s.strip()]
                repl = template
                # replace longer indices first so $12 is not eaten by $1
                for i in reversed(range(len(selectors))):
                    repl = repl.replace(f"${i}", selectors[i])
                query = query[:m.start()] + repl + query[m.end():]
                changed = True
                m = pat.search(query)
        if not changed:
            return query
