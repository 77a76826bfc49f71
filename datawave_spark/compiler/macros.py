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
                  max_rounds: int = 25) -> str:
    """Expand ``NAME(a, b, ...)`` macro calls using the template map.

    Selectors are comma-split and trimmed (empty selectors dropped,
    matching the reference's Splitter.omitEmptyStrings); ``$i``
    placeholders substitute positionally.  ``max_rounds`` bounds
    mutually-recursive macro definitions (the reference would loop
    forever; we fail fast)."""
    for _ in range(max_rounds):
        changed = False
        for key, template in macros.items():
            pat = re.compile(re.escape(key) + r"\(([^()]*)\)")
            m = pat.search(query)
            while m is not None:
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
    raise MacroError(
        f"macro expansion did not terminate in {max_rounds} rounds "
        "(mutually recursive macros?)")
