"""JEXL function namespaces compiled to Column expressions.

The reference registers function namespaces statically
(jexl/functions/JexlFunctionNamespaceRegistry.java:13-21): ``filter:``
(evaluation-phase predicates), ``f:`` (query options + predicates),
``content:`` (phrase/term-offset functions), ``geo:``/``geowave:`` and
``grouping:``.  Importing this package registers every compiler into
``datawave_spark.compiler.columns.FUNCTION_COMPILERS``.
"""

import datawave_spark.functions.filter_functions  # noqa: F401
import datawave_spark.functions.query_functions  # noqa: F401
import datawave_spark.functions.geo  # noqa: F401
import datawave_spark.functions.content  # noqa: F401
import datawave_spark.functions.grouping  # noqa: F401
