"""Guard for conftest.SLOWTAIL (the gate-tier exclusion list): every
entry must still resolve to a real test, or a rename has silently
returned a multi-minute test to the driver's wall-clock-budgeted gate
tier. Runs in the gate tier itself (fast, no Spark)."""

import os
import re

import conftest


def test_slowtail_entries_resolve():
    here = os.path.dirname(os.path.abspath(__file__))
    for entry in sorted(conftest.SLOWTAIL):
        fname, _, test = entry.partition("::")
        base = test.split("[")[0]
        path = os.path.join(here, fname)
        assert os.path.exists(path), f"stale SLOWTAIL file: {entry}"
        src = open(path).read()
        assert re.search(rf"^def {re.escape(base)}\(", src, re.M), (
            f"stale SLOWTAIL test name: {entry}"
        )


def test_slowtail_parity_params_are_registered_gates():
    """Parametrized oracle-parity entries name gate queries — a renamed
    gate must not strand its exclusion."""
    from signalk_parquet_spark import registry

    names = set(registry.queries())
    for entry in sorted(conftest.SLOWTAIL):
        if "test_oracle_parity" in entry and "[" in entry:
            gate = entry.split("[", 1)[1].rstrip("]")
            assert gate in names, f"stale SLOWTAIL gate param: {entry}"
