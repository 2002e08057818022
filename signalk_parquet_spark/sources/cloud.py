"""Cloud supplement configuration (SURVEY §2.1 S4, §1.1 'cloud supplement').

The reference reaches S3/R2 through DuckDB httpfs + CREATE SECRET
(duckdb-pool.ts:162-203) and unions cloud globs for dates older than local
retention (HistoryAPI.ts:1387-1426). In Spark the same capability is a
second lake root on s3a:// plus Hadoop credentials — `Lake(spark, local,
s3a_url)` already unions the roots with per-root failure fallback (the
reference's hybrid→local-only behavior).

No network in this container, so this module only sets configuration; the
multi-root read path itself is exercised with local roots in tests.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def configure_s3a(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,  # e.g. R2: https://<account>.r2.cloudflarestorage.com
    path_style_access: bool = True,
) -> None:
    """Hadoop S3A credentials/endpoint — the CREATE SECRET equivalent.
    Leaves unset values to the default provider chain (IAM roles etc.)."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key:
        conf.set("fs.s3a.secret.key", secret_key)
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.path.style.access", str(path_style_access).lower())
    # sane large-scan defaults for lakehouse access patterns
    conf.set("fs.s3a.connection.maximum", "64")
    conf.set("fs.s3a.experimental.input.fadvise", "random")


def cloud_supplement_roots(local_root: str, bucket_url: str | None) -> tuple[str, ...]:
    """Root list for Lake(): local first (fresh data), cloud second (the
    retention-aged supplement)."""
    return (local_root, bucket_url) if bucket_url else (local_root,)
