"""Engine-path differential: the full ingest→lake→HistoryPlanner pipeline
must reproduce DuckDB's answer computed directly from the source parquet.
This closes the loop the gate queries can't: those test the OPERATORS; this
tests the ENGINE (schema mapping, partitioned write, pruned read, planner
aggregation) end-to-end against an independent implementation."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from signalk_parquet_spark import registry
from signalk_parquet_spark.plans.history import HistoryPlanner
from signalk_parquet_spark.sources.lake import Lake

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_lake(spark, tmp_path_factory):
    """events.parquet ingested as DataRecords: user_id -> context,
    event_type -> path, value -> value."""
    root = str(tmp_path_factory.mktemp("evlake"))
    e = registry.load(spark, SF, "events")
    records = e.select(
        F.col("ts").alias("received_timestamp"),
        F.col("ts").alias("signalk_timestamp"),
        F.concat(F.lit("vessels.user"), F.col("user_id")).alias("context"),
        F.concat(F.lit("sensors."), F.col("event_type")).alias("path"),
        F.col("value"),
        F.lit(None).cast("string").alias("value_text"),
        F.lit(None).cast("boolean").alias("value_bool"),
        F.lit(None).cast("string").alias("value_json"),
        F.lit(None).cast("string").alias("source"),
        F.lit("sim").alias("source_label"),
        F.lit(None).cast("string").alias("source_type"),
        F.lit(None).cast("double").alias("source_pgn"),
        F.lit(None).cast("string").alias("source_src"),
        F.lit(None).cast("string").alias("meta"),
    )
    lake = Lake(spark, root)
    lake.write_records(records, tier="raw")
    return lake


def test_planner_matches_duckdb_daily_averages(spark, event_lake):
    planner = HistoryPlanner(event_lake)
    df = planner.get_values(
        "sensors.purchase",
        "2024-01-01T00:00:00Z",
        "2024-01-31T00:00:00Z",
        resolution_s=86400,
        context="vessels.user3",
    )
    got = {r["bucket_ts"]: round(r["sensors.purchase"], 9) for r in df.collect()}

    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT strftime(epoch_ms(CAST(floor(epoch_ms(ts)/86400000)*86400000 AS BIGINT)),
                        '%Y-%m-%dT%H:%M:%SZ') AS b,
               round(avg(value), 9) AS a
        FROM read_parquet('{SF}/events.parquet')
        WHERE event_type = 'purchase' AND user_id = 3
          AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
        GROUP BY 1
    """).fetchall()
    expect = {b: a for b, a in rows}
    assert got == expect


def test_planner_matches_duckdb_multi_context_max(spark, event_lake):
    planner = HistoryPlanner(event_lake)
    # no context filter: all contexts blended per bucket by the planner read
    df = planner.get_values(
        "sensors.error:max",
        "2024-01-01T00:00:00Z",
        "2024-01-31T00:00:00Z",
        resolution_s=7 * 86400,
    )
    got = {r["bucket_ts"]: r["sensors.error:max"] for r in df.collect()}
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT strftime(epoch_ms(CAST(floor(epoch_ms(ts)/{7 * 86400000})*{7 * 86400000} AS BIGINT)),
                        '%Y-%m-%dT%H:%M:%SZ') AS b,
               max(value) AS m
        FROM read_parquet('{SF}/events.parquet')
        WHERE event_type = 'error'
          AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
        GROUP BY 1
    """).fetchall()
    assert got == {b: m for b, m in rows}


# --- foreign-session robustness: the driver runs OUR queries on ITS session --
def test_gate_queries_survive_a_vanilla_session(spark):
    """spark.newSession() has a fresh SQLConf — stock 200 shuffle
    partitions, no nanosAsLong, no UTC pin — exactly the shape of the
    driver's own session. ensure_query_confs (called inside registry.load)
    must make the queries correct there, with per-session caches."""
    fresh = spark.newSession()
    assert fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) in (None, "false")

    qs = registry.queries()
    # one per table family, including a nano-timestamp events query and a
    # documents/embeddings consumer (per-session cache spread path)
    for name in ("bucket_avg_1h", "tpch_q6", "dedup_exact", "knn_bruteforce"):
        ours = {tuple(r) for r in qs[name](spark, SF).collect()}
        theirs = {tuple(r) for r in qs[name](fresh, SF).collect()}
        assert ours == theirs, name
    # the conf hardening actually landed on the foreign session
    assert fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert fresh.conf.get("spark.sql.session.timeZone") == "UTC"


# --- concurrent queries on one session (reference: MAX_QUERIES semaphore) ----
def test_concurrent_queries_match_sequential(spark):
    """The reference serves up to 10 concurrent History queries from one
    process (cache-defaults MAX_QUERIES); our equivalent is many threads on
    one SparkSession. Results must equal the sequential run — exercises the
    session table cache under concurrent first-touch."""
    import threading

    names = [
        "bucket_avg_1h", "tpch_q6", "dedup_exact", "text_quality",
        "knn_bruteforce", "count_by_type", "distinct_users", "topk_values",
    ]
    qs = registry.queries()
    fresh = spark.newSession()  # empty per-session cache -> racing loads
    sequential = {n: {tuple(r) for r in qs[n](spark, SF).collect()} for n in names}

    results: dict[str, set] = {}
    errors: list[Exception] = []

    def run(name: str) -> None:
        try:
            results[name] = {tuple(r) for r in qs[name](fresh, SF).collect()}
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=run, args=(n,)) for n in names]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert results == sequential


def test_window_hash_twins_random_adversarial_text(spark):
    """The md5-prefix window-hash twin (the foundation under the spans /
    winnowing / substring gates) must agree between Spark and DuckDB on
    ADVERSARIAL random text, not just the fixed corpus: unicode, digits,
    punctuation, empty tokens from doubled spaces, and docs shorter than
    the window."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from signalk_parquet_spark.functions.text import hashed_grams, shingles, tokens

    k = 4
    alphabet = ["tok", "a", "λ", "émü", "1.5", "x-y", "{}", "''", "%", "日本"]
    rng = np.random.RandomState(77)
    docs = []
    for i in range(60):
        n = rng.randint(0, 12)
        words = [alphabet[j] for j in rng.randint(0, len(alphabet), size=n)]
        text = " ".join(words)
        if n > 2 and rng.rand() < 0.3:
            text = text.replace(" ", "  ", 1)  # doubled space -> empty token
        docs.append((i, text))

    got = {
        r["id"]: r["whs"]
        for r in spark.createDataFrame(docs, "doc_id long, text string")
        .select(
            F.col("doc_id").alias("id"),
            hashed_grams(shingles(tokens("text"), k)).alias("whs"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("docs_t", __import__("pandas").DataFrame(docs, columns=["doc_id", "text"]))
    pos_dd = (
        f"list_transform(list_transform(range(1, len(string_split(text,' '))-{k - 2}), "
        f"i -> array_to_string((string_split(text,' '))[i:i+{k - 1}], ' ')), "
        "s -> CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT))"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(f"SELECT doc_id, {pos_dd} FROM docs_t").fetchall()
    }
    assert set(got) == set(want)
    for i in got:
        assert list(got[i] or []) == list(want[i] or []), (i, docs[i])
