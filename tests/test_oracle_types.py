"""No oracle's final projection may widen to DuckDB HUGEINT (VERDICT r8 #1).

The driver's value hash stringifies HUGEINT differently from BIGINT
while its schema canonicalization maps both to the int family, so an
uncast ``SUM(BIGINT)`` in an oracle's final SELECT passes every local
check but fails ``hash_match`` at the driver (r8: ``orders_rfm``,
``cust_cohort_ltv``).  This test makes the trap structurally
impossible to reship: it DESCRIBEs every registered oracle against
the sf0.001 views and asserts no result column is HUGEINT, UHUGEINT,
or an un-aliased DECIMAL-widened aggregate.
"""

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = {"hugeint", "uhugeint"}


def test_no_oracle_returns_hugeint():
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in e.TPCH_TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    offenders = {}
    for name, sql in e.oracle_sql().items():
        # DESCRIBE resolves result types without executing the query,
        # so scanning all ~180 oracles stays sub-second.
        rows = con.sql(f"DESCRIBE {sql}").fetchall()
        bad = [
            (col, str(typ))
            for col, typ, *_ in rows
            if str(typ).strip().lower() in FORBIDDEN
        ]
        if bad:
            offenders[name] = bad

    assert not offenders, (
        "oracle final projections widen to HUGEINT — wrap the listed "
        f"columns in CAST(... AS BIGINT): {offenders}"
    )
