"""Training-data-pipeline operators over document/embedding tables.

All hot paths are built-in ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage codegen); Python appears only to *construct* expression trees.
Each operator has a DuckDB-oracle twin in ``__spark_entry__.oracle_sql``
where ANSI-SQL-expressible, else a pytest golden.
"""
