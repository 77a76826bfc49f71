"""LUCENE query front-end → JEXL AST."""

from datawave_spark.lucene.parser import parse_lucene  # noqa: F401
