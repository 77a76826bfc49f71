"""Parser unit tests — modeled on the reference's per-visitor JEXL tests
(warehouse/query-core/src/test/java/datawave/query/jexl/)."""

import pytest

from datawave_spark.jexl import (
    AndNode, CmpNode, FieldCmpNode, FuncNode, Identifier, Literal,
    NotNode, OrNode, parse_jexl,
)
from datawave_spark.jexl.parser import JexlParseError


def test_simple_eq():
    node = parse_jexl("CITY == 'rome'")
    assert node == CmpNode("==", Identifier("CITY"), Literal("rome"))


def test_precedence_and_over_or():
    node = parse_jexl("A == '1' || B == '2' && C == '3'")
    assert isinstance(node, OrNode)
    assert isinstance(node.terms[1], AndNode)


def test_parens():
    node = parse_jexl("(A == '1' || B == '2') && C == '3'")
    assert isinstance(node, AndNode)
    assert isinstance(node.terms[0], OrNode)


def test_not():
    node = parse_jexl("!(A == '1')")
    assert node == NotNode(CmpNode("==", Identifier("A"), Literal("1")))


def test_literal_inversion():
    # InvertNodeVisitor parity: 'x' == F → F == 'x'; '5' < F → F > 5
    assert parse_jexl("'x' == F") == CmpNode("==", Identifier("F"), Literal("x"))
    assert parse_jexl("5 < F") == CmpNode(">", Identifier("F"), Literal(5))


def test_numbers_and_null():
    assert parse_jexl("N > 10.5") == CmpNode(">", Identifier("N"), Literal(10.5))
    assert parse_jexl("N == null") == CmpNode("==", Identifier("N"), Literal(None))


def test_regex_ops():
    assert parse_jexl("F =~ 'ro.*'").op == "=~"
    assert parse_jexl("F !~ 'ro.*'").op == "!~"


def test_field_to_field():
    assert parse_jexl("F1 == F2") == FieldCmpNode("==", Identifier("F1"), Identifier("F2"))


def test_function_call():
    node = parse_jexl("filter:includeRegex(NAME, 'a.*')")
    assert node == FuncNode("filter", "includeRegex",
                            (Identifier("NAME"), Literal("a.*")))


def test_function_in_boolean():
    node = parse_jexl("A == '1' && filter:isNotNull(B)")
    assert isinstance(node, AndNode)
    assert isinstance(node.terms[1], FuncNode)


def test_escaped_quote():
    assert parse_jexl(r"F == 'o\'brien'").value.value == "o'brien"


def test_trailing_garbage_rejected():
    with pytest.raises(JexlParseError):
        parse_jexl("A == '1' garbage")


def test_roundtrip_str():
    q = "(A == '1' && (B > 2 || !(C =~ 'x.*')))"
    node = parse_jexl(q)
    assert parse_jexl(str(node)) == node
