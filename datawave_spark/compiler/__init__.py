"""JEXL AST → pyspark.sql.Column compiler and AST rewrite passes."""

from datawave_spark.compiler.columns import (  # noqa: F401
    CompileContext, FieldSpec, compile_node, compile_query,
)
