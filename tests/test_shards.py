"""Shard writer: layout, manifest-vs-footers truth, audit, determinism."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from signalk_parquet_spark.operators.shards import (
    plan_shards,
    read_manifest,
    shard_id,
    verify_shards,
    write_shards,
)
from signalk_parquet_spark.registry import load


def test_write_shards_roundtrip_and_manifest(spark, sf_smoke, tmp_path) -> None:
    d = load(spark, sf_smoke, "documents")
    out = str(tmp_path / "shards")
    manifest = write_shards(d, out, "doc_id", n_shards=8)
    n = d.count()
    assert manifest["total_rows"] == n
    assert sorted(manifest["shards"]) == sorted(str(k) for k in range(8))
    assert not os.path.exists(os.path.join(out, "._manifest.json.tmp"))
    # read-back: every row survives, in the shard its id hashes to
    back = spark.read.parquet(out)
    assert back.count() == n
    mism = back.filter(F.col("shard") != shard_id("doc_id", 8)).count()
    assert mism == 0
    # the plan agg and the written tree agree per shard
    plan = {r["shard"]: r["n_docs"] for r in plan_shards(d, "doc_id", 8).collect()}
    for k, info in manifest["shards"].items():
        assert info["n_rows"] == plan[int(k)]
    audit = verify_shards(out)
    assert audit["ok"], audit["errors"]


def test_verify_catches_tampering(spark, sf_smoke, tmp_path) -> None:
    d = load(spark, sf_smoke, "documents").limit(50)
    out = str(tmp_path / "shards")
    write_shards(d, out, "doc_id", n_shards=4)
    # delete one listed file -> missing-file error
    m = read_manifest(out)
    victim = next(v["files"][0] for v in m["shards"].values() if v["files"])
    os.remove(os.path.join(out, victim))
    audit = verify_shards(out)
    assert not audit["ok"] and any("missing file" in e for e in audit["errors"])
    # plant an unlisted parquet -> detected
    stray_dir = os.path.join(out, "shard=0")
    d.limit(1).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "stray"))
    stray_src = next(
        f for f in os.listdir(os.path.join(str(tmp_path), "stray")) if f.endswith(".parquet")
    )
    os.replace(
        os.path.join(str(tmp_path), "stray", stray_src),
        os.path.join(stray_dir, "zz-stray.parquet"),
    )
    audit = verify_shards(out)
    assert any("unlisted" in e for e in audit["errors"])


def test_manifest_version_guard(tmp_path) -> None:
    out = tmp_path / "bad"
    out.mkdir()
    (out / "_manifest.json").write_text(json.dumps({"version": 99}))
    try:
        read_manifest(str(out))
        raise AssertionError("version guard did not fire")
    except ValueError as e:
        assert "version" in str(e)


def test_assignment_deterministic_and_uniform(spark) -> None:
    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shard"] for r in df.select("doc_id", shard_id("doc_id", 16)).collect()}
    b = {r["doc_id"]: r["shard"] for r in
         df.repartition(7).select("doc_id", shard_id("doc_id", 16)).collect()}
    assert a == b
    sizes = [sum(1 for v in a.values() if v == k) for k in range(16)]
    # uniform hash: 4000/16 = 250 expected; allow generous 4-sigma band
    assert min(sizes) > 180 and max(sizes) < 320, sizes


def test_verify_catches_byte_truncation(spark, sf_smoke, tmp_path) -> None:
    """A listed file whose on-disk size drifted from the manifest (partial
    copy, bit-rot truncation that keeps the footer parseable length-wise)
    must fail the audit even when row counts still read back."""
    d = load(spark, sf_smoke, "documents").limit(40)
    out = str(tmp_path / "shards")
    write_shards(d, out, "doc_id", n_shards=2)
    m = read_manifest(out)
    victim = next(v["files"][0] for v in m["shards"].values() if v["files"])
    fp = os.path.join(out, victim)
    with open(fp, "ab") as fh:
        fh.write(b"\x00" * 16)  # grow the file; footer still parses
    audit = verify_shards(out)
    assert not audit["ok"], audit
    assert any("bytes" in e or "unreadable footer" in e for e in audit["errors"]), audit


def test_null_id_raises_before_write(spark, tmp_path) -> None:
    """md5(NULL) is NULL -> the row would land in the Hive default partition
    and the manifest build would crash AFTER the data write (ADVICE r9).
    The guard fires before any bytes move."""
    import os

    import pytest

    from signalk_parquet_spark.operators.shards import write_shards

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c")], "doc_id long, text string"
    )
    out = str(tmp_path / "sharded")
    with pytest.raises(ValueError, match="2 row\\(s\\) have NULL 'doc_id'"):
        write_shards(df, out, "doc_id", 4)
    assert not os.path.exists(out)
