"""Near-cliff tests for the integer-ppm division helper.

The r16 sf10 sweep caught ``rev_cents * 1000000`` wrapping int64 at
~9.2e12 cents (~$92 B of regional revenue) — values a 100-TB corpus or
order book reaches routinely, while every sub-sf10 test SF sails under
the cliff (and a HUGEINT-backed oracle like DuckDB stays silently
exact, so only the Spark side fails, and only at scale). r16 widened
the one failing site; r17 closed the CLASS: every corpus/revenue-scaled
ppm share routes through ``operators.util.ppm_div_sql`` (DECIMAL(38,0)
on both sides), enforced by the source guard in test_plan_quality.py.

These tests drive the shared helper AT the cliff — numerators whose
``x * 1e6`` product exceeds 2^63 — so the exactness claim is executed,
not just asserted in a docstring. Under Spark 4's default ANSI mode the
unwidened expression is a hard error here, which is exactly how the
class would resurface if someone bypassed the helper.
"""

import pytest
from pyspark.sql import functions as F

from omop_etl_spark.operators.util import ppm_div_sql

# numerator past the int64 x1e6 cliff: 9.3e12 * 1e6 = 9.3e18 > 2^63-1
_CLIFF_NUM = 9_300_000_000_000
_CLIFF_DEN = 13_800_000_000_000


def test_ppm_div_sql_exact_past_int64_cliff(spark):
    df = spark.createDataFrame(
        [(_CLIFF_NUM, _CLIFF_DEN), (1, 3), (0, 7), (2**62, 2**62 + 1)],
        "num bigint, den bigint",
    )
    got = {
        (r.num, r.den): r.ppm
        for r in df.select(
            "num", "den", F.expr(ppm_div_sql("num", "den")).alias("ppm")
        ).collect()
    }
    for (num, den), ppm in got.items():
        assert ppm == num * 10**6 // den, (num, den, ppm)
    # the widened quotient still fits bigint and came back as one
    assert got[(_CLIFF_NUM, _CLIFF_DEN)] == 673_913


def test_ppm_div_sql_bare_int64_would_fail_here(spark):
    """The same cliff row through the UNwidened expression is an ANSI
    overflow error — proof the test data actually sits past the cliff
    (if ANSI were ever disabled, the bare expression would instead wrap
    to a wrong value, which the exactness test above still catches)."""
    df = spark.createDataFrame([(_CLIFF_NUM, _CLIFF_DEN)], "num bigint, den bigint")
    if spark.conf.get("spark.sql.ansi.enabled") == "true":
        with pytest.raises(Exception, match="(?i)overflow"):
            df.select(F.expr("(num * 1000000) div den").alias("p")).collect()
    else:  # pragma: no cover - ANSI is Spark 4's default
        (bad,) = df.select(F.expr("(num * 1000000) div den").alias("p")).collect()
        assert bad.p != _CLIFF_NUM * 10**6 // _CLIFF_DEN


def test_ppm_div_sql_product_operands_past_cliff(spark):
    """The lift_ppm shape: BOTH operands are products of corpus-scale
    counts (n_docs x pair_count over df_a x df_b), each of which can
    wrap int64 on its own before the x1e6 scaling is even applied —
    the call-site contract is to pre-widen the first factor so the
    product itself is computed in decimal."""
    n, pair, dfa, dfb = 5_000_000_000, 1_000_000, 4_000_000_000, 3_000_000_000
    df = spark.createDataFrame(
        [(n, pair, dfa, dfb)], "__n bigint, pc bigint, df_a bigint, df_b bigint"
    )
    (row,) = df.select(
        F.expr(
            ppm_div_sql(
                "CAST(__n AS DECIMAL(38,0)) * pc",
                "CAST(df_a AS DECIMAL(38,0)) * df_b",
            )
        ).alias("lift_ppm")
    ).collect()
    assert dfa * dfb > 2**63 - 1  # the denominator alone is past int64
    assert row.lift_ppm == n * pair * 10**6 // (dfa * dfb)


def test_quantized_covariance_exact_past_int64_product_cliff(spark):
    """The r17 sibling of the ppm class in `n * sum` shape: with
    component magnitudes near 2^31.5 post-quantization, s_ij alone
    approaches 2^63 and `n * s_ij` crosses it — the bare-int64 r16
    expression wraps (or ANSI-errors) while the DECIMAL(38,0) form
    stays exact. Values chosen so the comoment SUMS still fit int64
    (the operator's documented bound — s_ij ~ 5e18 here) while
    `n * s_ij` ~ 1.5e19 does not."""
    import numpy as np

    from omop_etl_spark.operators.stats import quantized_covariance

    x = 79_345.0  # floor(x * 2^14) ~ 1.3e9; s_ij ~ 5e18, n*s_ij ~ 1.5e19
    df = spark.createDataFrame(
        [(1, [x, -x]), (2, [x, x]), (3, [-x, x])],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        (r.i, r.j): (r.n, r.s_i, r.s_j, r.s_ij, r.cov_scaled)
        for r in quantized_covariance(df, "embedding", shift=14).collect()
    }
    q = np.floor(np.array([[x, -x], [x, x], [-x, x]]) * float(1 << 14))
    qi = [[int(v) for v in row] for row in q]  # Python bigints
    n = 3
    for i in range(2):
        for j in range(i, 2):
            s_i = sum(r[i] for r in qi)
            s_j = sum(r[j] for r in qi)
            s_ij = sum(r[i] * r[j] for r in qi)
            if i == j:  # the diagonals are genuinely past the cliff
                assert abs(n * s_ij) > 2**63 - 1, (i, j, n * s_ij)
            want = (n, s_i, s_j, s_ij, (n * s_ij - s_i * s_j) // n)
            assert got[(i, j)] == want, (i, j, got[(i, j)], want)


def test_ppm_div_sql_truncation_matches_hugeint_floor_on_nonnegatives(spark):
    """decimal `div` truncates toward zero; every ppm caller has a
    nonnegative numerator, where truncation == floor == DuckDB's
    HUGEINT `//` — the property that keeps oracle hashes unchanged."""
    df = spark.createDataFrame(
        [(i, 7) for i in range(15)], "num bigint, den bigint"
    )
    rows = df.select(
        "num", F.expr(ppm_div_sql("num", "den")).alias("ppm")
    ).collect()
    for r in rows:
        assert r.ppm == r.num * 10**6 // 7
