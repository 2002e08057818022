"""Schema validation & repair (SURVEY §2.10; reference
src/schema-service.ts:242-569): detect files whose columns were written with
the wrong physical type (numerics/booleans stored as UTF8, banned BIGINT) and
rewrite them with the corrected schema, quarantining unparseable rows.

Spark form: a partition-scoped rewrite job — read, diagnose, cast, write
back with dynamic partition overwrite. The quarantine dir mirrors the
reference's backup+quarantine protocol.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class SchemaDiagnosis:
    string_numerics: list[str] = field(default_factory=list)  # UTF8 cols that parse as DOUBLE
    string_booleans: list[str] = field(default_factory=list)  # UTF8 cols that are all true/false
    bigints: list[str] = field(default_factory=list)  # banned BIGINT value columns

    @property
    def needs_repair(self) -> bool:
        return bool(self.string_numerics or self.string_booleans or self.bigints)


_VALUE_PREFIX = "value"
_EXEMPT = {"value_text", "value_json"}


def diagnose(df: DataFrame) -> SchemaDiagnosis:
    """One pass of aggregates — no collect of data rows."""
    diag = SchemaDiagnosis()
    checks = []
    str_cols, long_cols = [], []
    for f_ in df.schema.fields:
        if not f_.name.startswith(_VALUE_PREFIX) or f_.name in _EXEMPT:
            continue
        if isinstance(f_.dataType, T.StringType):
            str_cols.append(f_.name)
            c = F.col(f_.name)
            checks.append(F.count(c).alias(f"{f_.name}__n"))
            checks.append(F.count(F.when(c.try_cast("double").isNotNull(), 1)).alias(f"{f_.name}__num"))
            checks.append(
                F.count(F.when(F.lower(c).isin("true", "false"), 1)).alias(f"{f_.name}__bool")
            )
        elif isinstance(f_.dataType, (T.LongType, T.IntegerType)):
            long_cols.append(f_.name)
    if checks:
        row = df.agg(*checks).first()
        for c in str_cols:
            n = row[f"{c}__n"]
            if n == 0:
                continue
            if row[f"{c}__bool"] == n:
                diag.string_booleans.append(c)
            elif row[f"{c}__num"] == n:
                diag.string_numerics.append(c)
    diag.bigints = long_cols
    return diag


def repair(df: DataFrame, diag: SchemaDiagnosis) -> DataFrame:
    """Cast-correct the diagnosed columns ('always DOUBLE for maritime data'
    — BIGINT is banned by design, parquet-writer.ts:498-505)."""
    out = df
    for c in diag.string_numerics:
        out = out.withColumn(c, F.col(c).try_cast("double"))
    for c in diag.string_booleans:
        out = out.withColumn(c, F.lower(F.col(c)).try_cast("boolean"))
    for c in diag.bigints:
        out = out.withColumn(c, F.col(c).cast("double"))
    return out


def quarantine_unparseable(df: DataFrame, diag: SchemaDiagnosis) -> tuple[DataFrame, DataFrame]:
    """Split rows whose diagnosed-numeric strings fail the cast (clean,
    quarantined) — the reference moves such files to quarantine/
    (parquet-export-service.ts:488-550)."""
    if not diag.string_numerics:
        return df, df.limit(0)
    bad = None
    for c in diag.string_numerics:
        cond = F.col(c).isNotNull() & F.col(c).try_cast("double").isNull()
        bad = cond if bad is None else (bad | cond)
    return df.filter(~F.coalesce(bad, F.lit(False))), df.filter(F.coalesce(bad, F.lit(False)))
