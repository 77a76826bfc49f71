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


class TestArithmetic:
    """commons-jexl3 arithmetic surface inside comparisons
    (JexlArithmetic): precedence, folding, unary minus, parens."""

    def test_precedence_and_str(self):
        from datawave_spark.jexl.parser import parse
        assert str(parse("VALUE + 2 * 3 > 10")) == "(VALUE + 6) > 10"
        assert str(parse("(VALUE + 2) * 3 > 10")) == "((VALUE + 2) * 3) > 10"
        assert str(parse("VALUE * 2 + U > 10")) == "((VALUE * 2) + U) > 10"

    def test_literal_folding(self):
        from datawave_spark.jexl.parser import parse
        assert str(parse("VALUE > 2 * 50 + 1")) == "VALUE > 101"
        assert str(parse("VALUE > 10 / 4")) == "VALUE > 2.5"

    def test_unary_minus(self):
        from datawave_spark.jexl.parser import parse
        assert str(parse("VALUE > -5")) == "VALUE > -5"
        assert str(parse("VALUE > -(2 + 3)")) == "VALUE > -5"
        assert str(parse("-VALUE > 5")) == "((0 - VALUE)) > 5" \
            or str(parse("-VALUE > 5")) == "(0 - VALUE) > 5"

    def test_boolean_parens_still_group(self):
        from datawave_spark.jexl.parser import parse
        from datawave_spark.jexl.ast import AndNode
        assert isinstance(parse("(A == 1) && (B == 2)"), AndNode)

    def test_regex_over_arithmetic_rejected(self):
        import pytest
        from datawave_spark.jexl.parser import JexlParseError, parse
        with pytest.raises(JexlParseError):
            parse("VALUE + 1 =~ 'x.*'")

    def test_division_by_zero_literal_rejected(self):
        import pytest
        from datawave_spark.jexl.parser import JexlParseError, parse
        with pytest.raises(JexlParseError):
            parse("VALUE > 1 / 0")


class TestQueryPropertyMarkers:
    """Reference-planned query strings wrap subtrees in marker
    assignments (QueryPropertyMarker.java): they must parse, evaluate
    true, and prune away."""

    def test_bounded_marker_unwraps(self):
        from datawave_spark.jexl.parser import parse
        from datawave_spark.compiler.rewrite import default_pipeline
        # r8: the marker FUSES into a RangeNode (same-value semantics
        # on multi-valued fields) and round-trips through str()
        from datawave_spark.jexl.ast import RangeNode
        n = default_pipeline(parse(
            "((_Bounded_ = true) && (VALUE >= 10 && VALUE <= 20))"))
        assert isinstance(n, RangeNode)
        assert str(n) == "((_Bounded_ = true) && (VALUE >= 10 && VALUE <= 20))"
        assert default_pipeline(parse(str(n))) == n

    def test_delayed_and_eval_markers(self):
        from datawave_spark.jexl.parser import parse
        from datawave_spark.compiler.rewrite import default_pipeline
        n = default_pipeline(parse(
            "((_Delayed_ = true) && (A == 'x')) || ((_Eval_ = true) && (B == 'y'))"))
        assert str(n) == "(A == 'x' || B == 'y')"

    def test_non_marker_assignment_rejected(self):
        import pytest
        from datawave_spark.jexl.parser import JexlParseError, parse
        with pytest.raises(JexlParseError, match="non-marker"):
            parse("FIELD = 'x'")


class TestNormalizeNamespace:
    """normalize:* folds to a canonical literal at parse time
    (NormalizationFunctions.java:23-52)."""

    def test_ipv4_literal_folds(self):
        node = parse_jexl("IP == normalize:ipv4('010.000.003.007')")
        assert node == CmpNode("==", Identifier("IP"), Literal("10.0.3.7"))

    def test_ipv4_wildcard_keeps_suffix(self):
        node = parse_jexl("IP =~ normalize:ipv4('192.168.001..*')")
        assert node == CmpNode("=~", Identifier("IP"),
                               Literal("192.168.1..*"))

    def test_ipv4_inverted_literal_position(self):
        node = parse_jexl("normalize:ipv4('08.09.010.011') == IP")
        assert node == CmpNode("==", Identifier("IP"), Literal("8.9.10.11"))

    def test_unknown_normalize_function_rejected(self):
        with pytest.raises(JexlParseError, match="unknown normalize"):
            parse_jexl("IP == normalize:ipv6('::1')")

    def test_non_literal_arg_rejected(self):
        with pytest.raises(JexlParseError, match="literal args"):
            parse_jexl("IP == normalize:ipv4(OTHER_FIELD)")


class TestQueryMacros:
    """QueryMacroFunction.java:12 parity."""

    def test_positional_substitution(self):
        from datawave_spark.compiler.macros import expand_macros
        got = expand_macros("M(A, 'x')", {"M": "$0 == $1"})
        assert got == "A == 'x'"

    def test_nested_macro_expansion(self):
        from datawave_spark.compiler.macros import expand_macros
        got = expand_macros("OUTER(F)", {"OUTER": "INNER($0) || B == '2'",
                                         "INNER": "$0 == '1'"})
        assert got == "F == '1' || B == '2'"

    def test_double_digit_placeholders(self):
        from datawave_spark.compiler.macros import expand_macros
        args = ", ".join(f"a{i}" for i in range(12))
        got = expand_macros(f"M({args})", {"M": "$11 $1"})
        assert got == "a11 a1"

    def test_runaway_recursion_fails_fast(self):
        import pytest
        from datawave_spark.compiler.macros import MacroError, expand_macros
        with pytest.raises(MacroError):
            expand_macros("A(x)", {"A": "B($0)", "B": "A($0)"})

    def test_no_macros_is_identity(self):
        from datawave_spark.compiler.macros import expand_macros
        q = "F == 'v' && G > 2"
        assert expand_macros(q, {}) == q

    def test_direct_self_recursion_fails_fast(self):
        from datawave_spark.compiler.macros import MacroError, expand_macros
        with pytest.raises(MacroError):
            expand_macros("A(1)", {"A": "A($0) && B == '2'"})

    def test_macro_name_requires_token_boundary(self):
        from datawave_spark.compiler.macros import expand_macros
        got = expand_macros("GRANGE(VALUE, 1, 2)",
                            {"RANGE": "($0 > $1 && $0 < $2)"})
        assert got == "GRANGE(VALUE, 1, 2)"  # untouched
