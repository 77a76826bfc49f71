"""JEXL query language front-end.

DataWave's query language is Apache Commons JEXL3 with a custom
interpreter/arithmetic giving *set semantics over multi-valued fields*
(reference: warehouse/query-core/src/main/java/datawave/query/jexl/
DatawaveInterpreter.java:71, DatawaveArithmetic.java:24).  This package
implements the practically-used JEXL subset: comparison operators
(== != < > <= >= =~ !~), boolean operators (&& || !), parenthesised
grouping, literals (single/double-quoted strings, numbers, null, booleans)
and namespaced function calls (filter:, f:, content:, geo:, geowave:,
grouping:).
"""

from datawave_spark.jexl.ast import (  # noqa: F401
    AndNode, OrNode, NotNode, CmpNode, FieldCmpNode, FuncNode,
    Literal, Identifier, JexlNode,
)
from datawave_spark.jexl.parser import parse as parse_jexl  # noqa: F401
