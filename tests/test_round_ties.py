"""Permanent gate for the second r7 driver-mismatch class: no oracle's
output may depend on ROUND's tie-breaking rule.

`ev_fdr_bh` passed the local mirror (DuckDB 1.0.0) and failed the r7
driver window — ROUND(DOUBLE, k) is build-sensitive when a scaled
value sits on (or within float error of) the .5 tie.
tools/sweep_round_ties.py runs every oracle twice with ROUND redirected
to half-toward-+inf vs half-toward--inf macros; any output difference
means a fixture cell sits on a tie and the query must use the
FLOOR-in-both quantization idiom instead (both engines compute
FLOOR(x * 1e6 + 0.5) — pure IEEE ops, identical on every build).

Runs at sf0.001 for speed; run the tool at sf0.01 (the driver's gate
scale) and sf0.1 before each round lands — the hazard is data-
dependent. r8 findings converted: ev_retention_next_day,
q11_important_stock, dp_cdc_chunk_stats, dp_empirical_bayes_ctr,
ev_uplift_qini (plus ev_fdr_bh itself).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep_round_ties import _rewrite_rounds, sweep  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.slow  # whole-registry dual-engine sweep; per-round gate twin: tools/sweep_round_ties.py
def test_no_oracle_depends_on_round_tie_breaking():
    flagged = sweep(SF_DIR)
    assert flagged == [], (
        "tie-sensitive oracles (convert to FLOOR-in-both quantization "
        f"on BOTH engines): {flagged}"
    )


def test_round_rewriter_arity_and_nesting():
    assert _rewrite_rounds("ROUND(x)") == "__rr1(x)"
    assert _rewrite_rounds("round(x, 6)") == "__rr2(x, 6)"
    # commas inside nested calls don't bump the arity
    assert (
        _rewrite_rounds("ROUND(COALESCE(a, b))") == "__rr1(COALESCE(a, b))"
    )
    # nested ROUNDs rewrite too, inner first
    assert (
        _rewrite_rounds("ROUND(ROUND(x, 4), 2)") == "__rr2(__rr2(x, 4), 2)"
    )
    # string literals containing commas or parens are opaque
    assert (
        _rewrite_rounds("ROUND(strpos(s, '(,'), 2)")
        == "__rr2(strpos(s, '(,'), 2)"
    )
    # non-ROUND identifiers are untouched
    assert _rewrite_rounds("AROUND(x, 2)") == "AROUND(x, 2)"
