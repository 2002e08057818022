"""Misra–Gries frequent-items: the guarantee, mergeability, and the 2-pass
exact pipeline. The guarantee (every item with count > N/(m+1) survives the
sketch) is what makes heavy_hitters_2pass EXACT — these tests attack it with
randomized skewed and adversarial-uniform streams, and with arbitrary
partition splits for the merge path."""

from __future__ import annotations

import random
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from signalk_parquet_spark.operators.sketch import (
    frequent_tokens_exact,
    mg_merge,
    mg_sketch,
    partition_sketches,
)


def _true_heavies(stream: list[str], m: int) -> set[str]:
    n = len(stream)
    return {t for t, c in Counter(stream).items() if c * (m + 1) > n}


def _zipf_stream(rng: random.Random, n: int, vocab: int) -> list[str]:
    # heavy skew: P(rank r) ~ 1/r — the common natural-text shape
    weights = [1.0 / (r + 1) for r in range(vocab)]
    return rng.choices([f"w{r}" for r in range(vocab)], weights=weights, k=n)


@given(seed=st.integers(0, 10_000), m=st.integers(2, 40), vocab=st.integers(2, 200))
@settings(max_examples=60, deadline=None)
def test_mg_guarantee_zipf(seed: int, m: int, vocab: int) -> None:
    rng = random.Random(seed)
    stream = _zipf_stream(rng, 2_000, vocab)
    sk = mg_sketch(stream, m)
    assert len(sk) <= m
    missed = _true_heavies(stream, m) - set(sk)
    assert not missed, f"MG dropped true heavies {missed} (m={m}, vocab={vocab})"


def test_mg_guarantee_uniform_eviction_storm() -> None:
    """Capacity below vocabulary on a near-uniform stream — evictions fire
    on nearly every step (the bench-corpus shape). Slight skew planted so
    the heavy set is non-empty."""
    rng = random.Random(7)
    stream = [f"w{rng.randrange(31)}" for _ in range(30_000)] + ["w0"] * 2_000
    rng.shuffle(stream)
    sk = mg_sketch(stream, 30)
    assert "w0" in sk  # the only token above 1/31 of this stream
    assert _true_heavies(stream, 30) <= set(sk)


@given(seed=st.integers(0, 10_000), m=st.integers(2, 30), parts=st.integers(1, 8))
@settings(max_examples=60, deadline=None)
def test_mg_merge_preserves_guarantee(seed: int, m: int, parts: int) -> None:
    """Split a stream arbitrarily, sketch each part, merge — every global
    heavy hitter must survive (Mergeable Summaries, PODS'12)."""
    rng = random.Random(seed)
    stream = _zipf_stream(rng, 3_000, 80)
    cuts = sorted(rng.randrange(len(stream)) for _ in range(parts - 1))
    pieces = [stream[a:b] for a, b in zip([0, *cuts], [*cuts, len(stream)])]
    merged = mg_merge([mg_sketch(p, m) for p in pieces], m)
    assert len(merged) <= m
    missed = _true_heavies(stream, m) - set(merged)
    assert not missed, f"merge dropped {missed} (m={m}, parts={parts})"


def test_partition_sketches_bounded_and_superset(spark) -> None:
    rng = random.Random(11)
    docs = [
        (" ".join(_zipf_stream(rng, 40, 50)),) for _ in range(400)
    ]
    df = spark.createDataFrame(docs, "text string").repartition(8)
    m = 12
    rows = partition_sketches(df, "text", m).collect()
    # bounded output: at most m rows per partition
    assert len(rows) <= 8 * m
    all_tokens = [t for (text,) in docs for t in text.split(" ")]
    heavies = _true_heavies(all_tokens, m)
    exact = (
        frequent_tokens_exact(df, "text", m)
        .toPandas()
        .set_index("token")["cnt"]
        .to_dict()
    )
    true_counts = Counter(all_tokens)
    assert set(exact) == heavies
    for t, c in exact.items():
        assert c == true_counts[t]


def test_frequent_tokens_exact_empty_and_tiny(spark) -> None:
    empty = spark.createDataFrame([], "text string")
    assert frequent_tokens_exact(empty, "text", 5).count() == 0
    one = spark.createDataFrame([("a a b",)], "text string")
    out = {r["token"]: r["cnt"] for r in frequent_tokens_exact(one, "text", 5).collect()}
    # N=3, threshold cnt*6 > 3 -> both tokens qualify
    assert out == {"a": 2, "b": 1}


def test_streaming_heavy_hitters_supersets_batch_gate(spark, tmp_path) -> None:
    """Replay the corpus as two micro-batches: the union of the groups'
    LATEST sketches must contain every token the batch heavy_hitters_2pass
    gate reports (the a-fortiori group guarantee), and each group's sketch
    stays bounded at m counters."""
    from signalk_parquet_spark.queries_text import heavy_hitters_2pass
    from signalk_parquet_spark.registry import load
    from signalk_parquet_spark.streaming.stateful import streaming_heavy_hitters

    sf = "/root/testdata/sf0.001"
    rows = load(spark, sf, "documents").select("doc_id", "text").collect()
    half = len(rows) // 2
    src = str(tmp_path / "hh_src")
    schema = "doc_id long, text string"
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        streaming_heavy_hitters(stream, m=30, n_groups=8)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hh_out")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from hh_out").toPandas()
    assert len(emitted), "stream emitted nothing"
    latest = emitted[
        emitted.groupby("grp")["n_seen"].transform("max") == emitted["n_seen"]
    ]
    assert latest.groupby("grp").size().max() <= 30
    cands = set(latest["token"])
    batch = {r["token"] for r in heavy_hitters_2pass(spark, sf).collect()}
    missing = batch - cands
    assert not missing, f"streaming sketch union dropped true heavies: {missing}"


def test_streaming_heavy_hitters_state_survives_restart(spark, tmp_path) -> None:
    """MG counters must recover from the checkpoint across two separate
    query runs: run 2's tiny top-up can only push a token's weight past
    run 1's total if run 1's counters came back. Parquet sink — the memory
    sink cannot recover from checkpoints (CLAUDE.md)."""
    from signalk_parquet_spark.streaming.stateful import streaming_heavy_hitters

    src = str(tmp_path / "hhr_src")
    out = str(tmp_path / "hhr_out")
    ckpt = str(tmp_path / "hhr_ckpt")
    schema = "doc_id long, text string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_heavy_hitters(stream, m=8, n_groups=2)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, " ".join(["alpha"] * 50 + ["beta"] * 3))], schema
    ).coalesce(1).write.parquet(src)
    run_once()
    spark.createDataFrame([(2, "alpha alpha alpha")], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    run_once()  # NEW query, same checkpoint: counters must come back

    emitted = spark.read.parquet(out).toPandas()
    latest = emitted[
        emitted.groupby("grp")["n_seen"].transform("max") == emitted["n_seen"]
    ]
    wt = dict(zip(latest["token"], latest["wt"]))
    # 50 from run 1 + 3 from run 2 (minus any MG decrements; m=8 > vocab=2,
    # so none fire and the count is exact)
    assert wt.get("alpha") == 53, wt


def test_empty_string_token_counts_like_jvm(spark) -> None:
    """''.split(sep) is [''] on BOTH sides (Python and Spark's split), so an
    all-empty-doc corpus has one heavy token: the empty string. The sketch
    must carry it or the 2-pass superset guarantee silently breaks."""
    df = spark.createDataFrame([("",)] * 10 + [("a b",)], "text string")
    out = {r["token"]: r["cnt"] for r in frequent_tokens_exact(df, "text", 5).collect()}
    # N = 10*1 + 2 = 12; '' has 10 -> 10*6 > 12 qualifies; a/b have 1 each (6 < 12)
    assert out == {"": 10}, out


def test_degenerate_parameter_guards(spark) -> None:
    import pytest

    from signalk_parquet_spark.operators.sampling import cluster_quota_sample
    from signalk_parquet_spark.operators.shards import shard_id

    with pytest.raises(ValueError, match="m must be >= 1"):
        mg_sketch(["a"], 0)
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError, match="m must be >= 1"):
        frequent_tokens_exact(df, "text", 0)
    with pytest.raises(ValueError, match="n_shards"):
        shard_id("doc_id", 0)
    vecs = spark.createDataFrame(
        [(1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    no_cents = spark.createDataFrame([], "cid long, cemb array<double>")
    with pytest.raises(ValueError, match="empty centroid"):
        cluster_quota_sample(vecs, no_cents, "vec_id", "embedding", 5)
    with pytest.raises(ValueError, match="quota"):
        cluster_quota_sample(vecs, no_cents, "vec_id", "embedding", 0)


def test_regex_metachar_separator_consistent_across_passes(spark) -> None:
    """sep is LITERAL in pass 1 (str.split) but was fed raw to Java-regex
    F.split in pass 2 — a metachar separator like '|' tokenized differently
    across passes and could silently drop true heavy hitters (ADVICE r9).
    literal_split_pattern closes it: both passes must see identical tokens."""
    docs = ["x|x|x|y", "x|z|x|x", "x|x|y|z"]  # x: 8 of 12 tokens
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    out = {r["token"]: r["cnt"] for r in frequent_tokens_exact(df, "text", 3, sep="|").collect()}
    stream = [t for d in docs for t in d.split("|")]
    truth = {t: c for t, c in Counter(stream).items() if c * 4 > len(stream)}
    assert out == truth, (out, truth)
    # '.' — matches EVERYTHING as a raw regex, the worst-case divergence
    docs2 = ["a.a.b", "a.a.a", "b.a.a"]
    df2 = spark.createDataFrame([(d,) for d in docs2], "text string")
    out2 = {r["token"]: r["cnt"] for r in frequent_tokens_exact(df2, "text", 2, sep=".").collect()}
    stream2 = [t for d in docs2 for t in d.split(".")]
    truth2 = {t: c for t, c in Counter(stream2).items() if c * 3 > len(stream2)}
    assert out2 == truth2, (out2, truth2)


def test_literal_split_pattern_guards_and_passthrough() -> None:
    import pytest

    from signalk_parquet_spark.operators.sketch import literal_split_pattern

    assert literal_split_pattern(" ") == " "  # no plan churn for the default
    assert literal_split_pattern("\t") == "\t"
    assert literal_split_pattern(".") == "\\."
    assert literal_split_pattern("||") == "\\|\\|"
    with pytest.raises(ValueError, match="non-empty"):
        literal_split_pattern("")


def test_tree_merge_rung_preserves_exactness(spark) -> None:
    """The distributed MG-merge rung (PODS'12 composition) must yield the
    same final exact output as the direct driver merge. Forced on by
    dropping the driver budget to 0 via monkeypatched threshold."""
    from signalk_parquet_spark.operators import sketch as sk

    rng = random.Random(11)
    stream = _zipf_stream(rng, 4000, 50)
    docs = [" ".join(stream[i : i + 8]) for i in range(0, len(stream), 8)]
    df = spark.createDataFrame([(d,) for d in docs], "text string").repartition(16)
    direct = {r["token"]: r["cnt"] for r in frequent_tokens_exact(df, "text", 12).collect()}
    old = sk._DRIVER_MERGE_MAX_ROWS
    sk._DRIVER_MERGE_MAX_ROWS = 0
    try:
        treed = {r["token"]: r["cnt"] for r in frequent_tokens_exact(df, "text", 12).collect()}
    finally:
        sk._DRIVER_MERGE_MAX_ROWS = old
    assert treed == direct == {
        t: c for t, c in Counter(stream).items() if c * 13 > len(stream)
    }


def _grouped_truth(streams: dict[str, list[str]], m: int) -> dict:
    return {
        (g, t): c
        for g, s in streams.items()
        for t, c in Counter(s).items()
        if c * (m + 1) > len(s)
    }


def test_grouped_frequent_tokens_exact_both_rungs(spark) -> None:
    """Per-group MG 2-pass == per-group full-shuffle truth, with the
    per-group tree-merge rung forced both off and on (same outputs) —
    groups of very different sizes and skews so per-group thresholds
    actually differ."""
    from signalk_parquet_spark.operators.sketch import grouped_frequent_tokens_exact

    rng = random.Random(7)
    streams = {
        "en": _zipf_stream(rng, 6000, 40),
        "de": _zipf_stream(rng, 900, 25),
        "fr": ["x"] * 50 + ["y"] * 30 + [f"r{i}" for i in range(40)],
    }
    rows = []
    for g, s in streams.items():
        rows += [(g, " ".join(s[i : i + 7])) for i in range(0, len(s), 7)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "lang string, text string").repartition(16)
    m = 12
    for force in (False, True):
        got = {
            (r["lang"], r["token"]): r["cnt"]
            for r in grouped_frequent_tokens_exact(
                df, "text", "lang", m, force_tree_merge=force
            ).collect()
        }
        # the doc-join pads streams to multiples of 7? no — join with ' '
        # preserves token multiset exactly, so truth is the raw streams'
        truth = _grouped_truth(streams, m)
        assert got == truth, f"force_tree_merge={force}"


def test_grouped_frequent_tokens_null_group_and_empty(spark) -> None:
    from signalk_parquet_spark.operators.sketch import grouped_frequent_tokens_exact

    df = spark.createDataFrame(
        [(None, "a a a"), ("g1", "b b c")], "lang string, text string"
    )
    got = {
        (r["lang"], r["token"]): r["cnt"]
        for r in grouped_frequent_tokens_exact(df, "text", "lang", 2).collect()
    }
    # NULL-lang stream excluded entirely; g1: b=2,c=1 over n=3, m=2 ->
    # threshold cnt*3 > 3 -> only b
    assert got == {("g1", "b"): 2}

    empty = spark.createDataFrame([], "lang string, text string")
    assert grouped_frequent_tokens_exact(empty, "text", "lang", 2).count() == 0


def test_streaming_grouped_heavy_hitters_supersets_batch_gate(spark, tmp_path) -> None:
    """Replay the corpus as two micro-batches: for EVERY language, the
    union of that language's latest (g, grp) sketches must contain every
    token the batch grouped_heavy_hitters gate reports (the a-fortiori
    guarantee applied within the group), and each state group stays
    bounded at m counters."""
    from signalk_parquet_spark.queries_text import grouped_heavy_hitters
    from signalk_parquet_spark.registry import load
    from signalk_parquet_spark.streaming.stateful import (
        streaming_grouped_heavy_hitters,
    )

    sf = "/root/testdata/sf0.001"
    rows = load(spark, sf, "documents").select("doc_id", "lang", "text").collect()
    half = len(rows) // 2
    src = str(tmp_path / "ghh_src")
    schema = "doc_id long, lang string, text string"
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        streaming_grouped_heavy_hitters(stream, m=30, n_groups=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ghh_out")
        .option("checkpointLocation", str(tmp_path / "ghh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from ghh_out").toPandas()
    assert len(emitted), "stream emitted nothing"
    latest = emitted[
        emitted.groupby(["g", "grp"])["n_seen"].transform("max")
        == emitted["n_seen"]
    ]
    assert latest.groupby(["g", "grp"]).size().max() <= 30
    cands = set(zip(latest["g"], latest["token"]))
    batch = {
        (r["lang"], r["token"]) for r in grouped_heavy_hitters(spark, sf).collect()
    }
    missing = batch - cands
    assert not missing, f"grouped streaming sketch dropped true heavies: {missing}"


def test_streaming_grouped_heavy_hitters_state_survives_restart(spark, tmp_path) -> None:
    """Per-(group, token-hash) MG counters must recover from the
    checkpoint across two separate query runs — and stay ISOLATED per
    group: run 2 tops up only one language's counter, the other
    language's total must be exactly run 1's."""
    from signalk_parquet_spark.streaming.stateful import (
        streaming_grouped_heavy_hitters,
    )

    src = str(tmp_path / "ghhr_src")
    out = str(tmp_path / "ghhr_out")
    ckpt = str(tmp_path / "ghhr_ckpt")
    schema = "doc_id long, lang string, text string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_grouped_heavy_hitters(stream, m=8, n_groups=2)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [
            (1, "en", " ".join(["alpha"] * 50 + ["beta"] * 3)),
            (2, "de", " ".join(["alpha"] * 7)),
        ],
        schema,
    ).coalesce(1).write.parquet(src)
    run_once()
    spark.createDataFrame(
        [(3, "en", "alpha alpha alpha")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()  # NEW query, same checkpoint: counters must come back

    emitted = spark.read.parquet(out).toPandas()
    latest = emitted[
        emitted.groupby(["g", "grp"])["n_seen"].transform("max")
        == emitted["n_seen"]
    ]
    wt = {(g, t): w for g, t, w in zip(latest["g"], latest["token"], latest["wt"])}
    # en: 50 from run 1 + 3 from run 2 (m=8 > vocab, no decrements);
    # de: untouched by run 2 — exactly run 1's 7
    assert wt.get(("en", "alpha")) == 53, wt
    assert wt.get(("de", "alpha")) == 7, wt
