"""Oracle-parity tests at sf0.001 — the same compare the driver runs
at sf0.01 (tools/check_parity.py runs that scale)."""

from __future__ import annotations

import pytest

from crime_spark_ml_spark.plans.parity import run_parity
from crime_spark_ml_spark.plans.registry import load_all_plans


def _names():
    return sorted(load_all_plans())


@pytest.mark.parametrize("name", _names())
def test_query_parity(spark, sf_dir, name):
    (result,) = run_parity(spark, sf_dir, only=[name])
    assert result.ok, f"{result.name}: {result.status} — {result.detail}"
    if result.status == "match":
        assert result.spark_rows >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.slow  # ~100-query subprocess probe; per-round gate twin: tools/run_vanilla_probe.py
def test_vanilla_session_sampled_parity():
    """Sampled gate for the vanilla-session guarantee: 20 queries per
    run re-checked under a bare SparkSession (no repo confs, hostile
    half-hour-offset timezone) in a SUBPROCESS — the session shape the
    driver actually uses. The full-registry probe
    (tools/run_vanilla_probe.py all) runs manually per campaign; this
    keeps the guarantee from silently rotting between full probes.
    Date-seeded sampling: deterministic within a day (a failure
    reproduces), different slice every day (coverage accumulates)."""
    import datetime
    import os
    import random
    import subprocess
    import sys

    from conftest import SF_SMOKE

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = _names()
    rng = random.Random(datetime.date.today().toordinal())
    sample = rng.sample(names, 20)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(root, "tools", "run_vanilla_probe.py"),
            SF_SMOKE,
            *sample,
        ],
        capture_output=True,
        text=True,
        cwd=root,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"vanilla-session parity failed for sample {sample}:\n"
        f"{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
