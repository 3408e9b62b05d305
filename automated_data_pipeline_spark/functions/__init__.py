"""Scalar expression helpers — all built-in ``pyspark.sql.functions``
compositions (JVM-side, whole-stage-codegen'd); no Python UDFs in the
relational hot path."""
