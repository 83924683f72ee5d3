"""Column-level functions: text analysis, dedup, similarity.

All built on pyspark.sql.functions (JVM-side, whole-stage codegen); no
per-row Python UDFs. Each function returns Column expressions or
DataFrame transforms designed to be oracle-checkable in ANSI SQL.
"""
