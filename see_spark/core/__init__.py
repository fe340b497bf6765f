"""Pure-Python kernels (no pyspark imports).

These implement the reference's scalar semantics exactly and are shared by
(a) the vectorized pandas UDFs in ``see_spark.functions`` and (b) the
pure-Python oracle in ``oracle/``. Every behavior is pinned to a reference
file:line in the function docstrings and to an eunit golden in ``tests/``.
"""
