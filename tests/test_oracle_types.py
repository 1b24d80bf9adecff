"""Permanent gate for the r7 driver-mismatch class: every DuckDB
oracle's result schema must use only portable types.

The r7 driver window failed `dp_shard_manifest` (hash mismatch) while
the local mirror passed — DuckDB promotes SUM(BIGINT) to HUGEINT, a
type with no Spark analogue whose canonicalization is DuckDB-build-
sensitive. tools/sweep_oracle_types.py DESCRIBEs all ~400 oracles
(plans only, nothing executes) and flags HUGEINT/DECIMAL/FLOAT/etc.
This test keeps the count at zero so a new oracle can never
reintroduce the class.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep_oracle_types import _is_portable, sweep  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_every_oracle_output_column_is_portable():
    bad = sweep(SF_DIR)
    assert bad == [], (
        "env-fragile oracle output types (cast to BIGINT/DOUBLE in the "
        f"oracle SQL): {bad}"
    )


def test_portability_classifier_itself():
    # fragile: the exact types that have bitten or can bite
    for t in ("HUGEINT", "UHUGEINT", "DECIMAL(7,6)", "DECIMAL(38,0)",
              "FLOAT", "REAL", "HUGEINT[]", "STRUCT(a HUGEINT)"):
        assert not _is_portable(t), t
    # portable: exact Spark counterparts
    for t in ("BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
              "DATE", "TIMESTAMP", "TIMESTAMP_NS", "DOUBLE[]",
              "STRUCT(a BIGINT, b VARCHAR[])"):
        assert _is_portable(t), t
