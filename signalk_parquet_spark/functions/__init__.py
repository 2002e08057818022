"""Column-expression builders. Everything here returns pyspark Column
expressions that stay JVM-side (whole-stage codegen) — no Python UDFs."""
