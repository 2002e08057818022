"""window_check's gate-fingerprint mechanism (r9): the edited-gate pull-in
used to be the rotation policy's one manual step, and the r9 micro_avg edit
showed why that fails — 10 gates changed behavior with no change to any
gate's own source. The fingerprint hashes the ANALYZED plan (helper edits
change the expression tree) + oracle SQL; these tests pin the plan
normalization (session noise must not fake edits) and the manifest diff."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import window_check as wc  # noqa: E402


def test_normalize_strips_session_noise():
    raw = (
        "Aggregate [event_type#123], [sum(v#45L) AS s#46L,"
        " cast((rand(-7803756047644013511) * cast(16 as double)) as int) AS __salt#47,"
        " randn(99) AS g#48,"
        " <function fn at 0x7f93a1b2c040>]"
        " +- Relation [x#1] parquet /root/testdata/sf0.001/events.parquet"
    )
    a = wc._normalize_plan(raw, "/root/testdata/sf0.001")
    b = wc._normalize_plan(
        raw.replace("#123", "#999")
        .replace("#45L", "#7L").replace("#46L", "#8L").replace("#47", "#9")
        .replace("#48", "#10").replace("#1]", "#2]")
        .replace("rand(-7803756047644013511)", "rand(42)")
        .replace("randn(99)", "randn(-3)")
        .replace("0x7f93a1b2c040", "0x55aa00"),
        "/root/testdata/sf0.001",
    )
    assert a == b
    assert "<SF>" in a and "0x7f93" not in a and "rand()" in a and "randn()" in a


def test_normalize_strips_lambda_counter():
    """HOF lambda variables are named from a session-global counter
    (lambda x_244#...) — allocation order, not semantics. The r12 lesson:
    one new gate registered mid-order shifted the counter of every later
    lambda-bearing plan and faked 19 EDITs."""
    a = wc._normalize_plan(
        "ArrayTransform(sh#12, lambdafunction(xxhash64(x_1#), x_1#), y_2#)", "/x"
    )
    b = wc._normalize_plan(
        "ArrayTransform(sh#99, lambdafunction(xxhash64(x_244#), x_244#), y_245#)", "/x"
    )
    assert a == b and "x_244" not in b
    # multi-letter names (real columns) are left alone
    assert "len_" in wc._normalize_plan("len_7#3", "/x")


def test_normalize_preserves_semantic_change():
    raw = "Aggregate [sum(v#45L) AS s#46L]"
    changed = "Aggregate [avg(v#45L) AS s#46L]"
    sf = "/x"
    assert wc._normalize_plan(raw, sf) != wc._normalize_plan(changed, sf)


def test_edited_gates_diffs_manifest(tmp_path, monkeypatch):
    manifest = {"a": "h1", "b": "h2", "c": "h3"}
    (tmp_path / wc.FINGERPRINT_FILE).write_text(json.dumps(manifest))
    monkeypatch.setattr(
        wc, "compute_fingerprints",
        lambda sf_dir=None: {"a": "h1", "b": "CHANGED", "d": "new-gate"},
    )
    monkeypatch.setattr(wc, "HAND_QUEUED_EDITS", ())
    # b changed -> edited; d has no manifest entry (new) -> NOT edited
    # (never-checked ranking covers it); c absent from current -> ignored
    assert wc.edited_gates(str(tmp_path)) == ["b"]


def test_edited_gates_bootstrap_without_manifest(tmp_path, monkeypatch):
    # hand-queued names must NOT leak into the bootstrap case: with no
    # manifest, every gate is equally unevidenced and the never-checked
    # ranking covers them
    monkeypatch.setattr(wc, "HAND_QUEUED_EDITS", ("x",))
    assert wc.edited_gates(str(tmp_path)) == []


def test_edited_gates_hand_queue(tmp_path, monkeypatch):
    """The hand-queue (r11): a post-manifest-refresh edit is invisible to
    the fingerprint diff, so HAND_QUEUED_EDITS appends it — exactly once,
    never duplicating a name the diff already found, and clearing the
    queue returns the contract to the pure-diff baseline."""
    (tmp_path / wc.FINGERPRINT_FILE).write_text(
        json.dumps({"a": "h1", "b": "h2", "q": "h4"})
    )
    monkeypatch.setattr(
        wc, "compute_fingerprints",
        lambda sf_dir=None: {"a": "h1", "b": "CHANGED", "q": "h4"},
    )
    monkeypatch.setattr(wc, "HAND_QUEUED_EDITS", ("q",))
    assert wc.edited_gates(str(tmp_path)) == ["b", "q"]
    # a hand-queued name the diff ALSO caught appears exactly once
    monkeypatch.setattr(wc, "HAND_QUEUED_EDITS", ("b",))
    assert wc.edited_gates(str(tmp_path)) == ["b"]
    # cleared queue -> pure diff
    monkeypatch.setattr(wc, "HAND_QUEUED_EDITS", ())
    assert wc.edited_gates(str(tmp_path)) == ["b"]


def test_committed_manifest_covers_every_gate():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, wc.FINGERPRINT_FILE)
    assert os.path.exists(path), "run tools/window_check.py --fingerprint"
    from signalk_parquet_spark import registry

    missing = set(registry.queries()) - set(json.load(open(path)))
    assert not missing, f"stale manifest — re-run --fingerprint: {missing}"
