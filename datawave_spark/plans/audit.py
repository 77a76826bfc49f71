"""Query auditing: selector extraction + audit record construction.

Reference:
- selector extraction: warehouse/query-core/src/main/java/datawave/
  audit/DatawaveSelectorExtractor.java:22 — parse the query as JEXL
  (fall back to LUCENE -> JEXL), collect the literal values of the
  POSITIVE ``==`` nodes (an EQ under a negation is not a selector);
  SplitSelectorExtractor.java:18 — selector-list logics (LookupUUID)
  split the raw query string on a configured separator instead.
- audit record: core/common/src/main/java/datawave/core/common/audit/
  PrivateAuditConstants.java:13-17 (auditType, logicClass, userDn,
  selectors, ...) + web-services/common/.../audit/AuditBean.java —
  every query create emits one record with the query string, the
  extracted selectors, the caller identity, and the marking/auths.

Spark restatement: the extractor walks the SAME JexlNode AST the
compiler executes, so the audited selectors are exactly the values the
plan will scan for; the audit "service" is an append to an ordinary
audit DataFrame/table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from datawave_spark.jexl.ast import (
    AndNode, CmpNode, FuncNode, JexlNode, Literal, NotNode, OrNode,
)
from datawave_spark.jexl.parser import JexlParseError, parse


def _positive_eq_literals(node: JexlNode, negated: bool,
                          out: list[str]) -> None:
    """DatawaveSelectorExtractor.extractSelectors: literal values of EQ
    nodes not under an odd number of negations (JexlASTHelper
    .getPositiveEQNodes).  ``!=`` under a negation is NOT rewritten to
    a selector — the reference collects ASTEQNode only."""
    if isinstance(node, NotNode):
        _positive_eq_literals(node.term, not negated, out)
    elif isinstance(node, (AndNode, OrNode)):
        for c in node.children():
            _positive_eq_literals(c, negated, out)
    elif isinstance(node, CmpNode) and node.op == "==" and not negated:
        if node.value.value is not None:
            out.append(str(node.value.value))
    elif isinstance(node, FuncNode):
        return                      # function args are not EQ selectors
    else:
        for c in node.children():
            _positive_eq_literals(c, negated, out)


def extract_selectors(query: str) -> list[str]:
    """Literal values of the positive ``==`` comparisons of ``query``
    (JEXL first, LUCENE fallback), in query order — the audit selector
    list (DatawaveSelectorExtractor.java:22-53)."""
    try:
        ast = parse(query)
    except JexlParseError:
        from datawave_spark.lucene import parse_lucene
        from datawave_spark.lucene.parser import LuceneParseError
        try:
            ast = parse_lucene(query)
        except LuceneParseError:
            # DatawaveSelectorExtractor catches parse failures and
            # audits with NO selectors — the audit record must still be
            # produced for exactly the malformed queries a trail needs
            return []
    out: list[str] = []
    _positive_eq_literals(ast, False, out)
    return out


def split_selectors(query: str, separator: str | None = None,
                    use_splits: list[int] | None = None) -> list[str]:
    """SplitSelectorExtractor.java:18 — selector-list logics treat the
    raw query string as a separator-joined selector list; no separator
    means the whole query IS the one selector.  ``use_splits`` keeps
    only the listed split positions (useSplitsList parity)."""
    if separator is None:
        return [query]
    parts = [p.strip() for p in query.split(separator)]
    if use_splits is not None:
        keep = set(use_splits)
        parts = [p for i, p in enumerate(parts) if i in keep]
    return parts


@dataclass(frozen=True)
class AuditRecord:
    """One audit entry (PrivateAuditConstants field set)."""
    query: str
    logic_class: str
    user_dn: str
    auths: str
    audit_type: str = "ACTIVE"          # ACTIVE | PASSIVE | NONE | LOCALONLY
    column_visibility: str = ""
    selectors: tuple[str, ...] = field(default_factory=tuple)


def audit_record(query: str, logic_class: str, user_dn: str, auths: str,
                 audit_type: str = "ACTIVE",
                 column_visibility: str = "",
                 separator: str | None = None) -> AuditRecord:
    """Build the audit record for a query create: extracts selectors
    with the logic's configured extractor (JEXL AST walk, or the split
    extractor when ``separator`` is given)."""
    if audit_type not in ("ACTIVE", "PASSIVE", "NONE", "LOCALONLY"):
        raise ValueError(f"unknown audit type {audit_type!r}")
    sels = (split_selectors(query, separator) if separator is not None
            else extract_selectors(query))
    return AuditRecord(query=query, logic_class=logic_class,
                       user_dn=user_dn, auths=auths, audit_type=audit_type,
                       column_visibility=column_visibility,
                       selectors=tuple(sels))
