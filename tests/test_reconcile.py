"""Tests for table checksums and snapshot diffs."""

from pyspark.sql import Row

from omop_etl_spark.operators.reconcile import snapshot_diff, table_checksum


def test_checksum_partition_and_order_invariant(spark):
    rows = [Row(k=i, v=f"val{i}") for i in range(500)]
    a = spark.createDataFrame(rows).repartition(1)
    b = spark.createDataFrame(list(reversed(rows))).repartition(13)
    ca = table_checksum(a).collect()[0]
    cb = table_checksum(b).collect()[0]
    assert ca["n_rows"] == cb["n_rows"] == 500
    assert ca["checksum"] == cb["checksum"]


def test_checksum_detects_single_row_change(spark):
    a = spark.createDataFrame([Row(k=i, v=i * 2) for i in range(100)])
    b = spark.createDataFrame(
        [Row(k=i, v=(i * 2 if i != 50 else 999)) for i in range(100)]
    )
    assert (
        table_checksum(a).collect()[0]["checksum"]
        != table_checksum(b).collect()[0]["checksum"]
    )


def test_checksum_null_vs_empty_string(spark):
    a = spark.createDataFrame([Row(k=1, v=None)], "k int, v string")
    b = spark.createDataFrame([Row(k=1, v="")], "k int, v string")
    assert (
        table_checksum(a).collect()[0]["checksum"]
        != table_checksum(b).collect()[0]["checksum"]
    )


def test_snapshot_diff_classifies_all_cases(spark):
    old = spark.createDataFrame(
        [Row(k=1, a="x", b=10), Row(k=2, a="y", b=20), Row(k=3, a="z", b=30)]
    )
    new = spark.createDataFrame(
        [Row(k=1, a="x", b=10), Row(k=2, a="y", b=99), Row(k=4, a="w", b=40)]
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_explicit_compare_cols(spark):
    old = spark.createDataFrame([Row(k=1, a="x", noise="p")])
    new = spark.createDataFrame([Row(k=1, a="x", noise="q")])
    got = snapshot_diff(old, new, ["k"], compare_cols=["a"]).collect()
    assert got[0]["change_type"] == "unchanged"
    got_all = snapshot_diff(old, new, ["k"]).collect()
    assert got_all[0]["change_type"] == "changed"


def test_partition_checksums_localize_changes(spark):
    from omop_etl_spark.operators.reconcile import partition_checksums

    old = spark.createDataFrame(
        [Row(p=i % 4, k=i, v=i * 3) for i in range(200)]
    )
    new = spark.createDataFrame(
        [Row(p=i % 4, k=i, v=(i * 3 if i != 42 else -1)) for i in range(200)]
    )  # i=42 -> partition 2
    co = {r["p"]: r["checksum"] for r in partition_checksums(old, ["p"]).collect()}
    cn = {r["p"]: r["checksum"] for r in partition_checksums(new, ["p"]).collect()}
    changed = [p for p in co if co[p] != cn[p]]
    assert changed == [2]


def test_signature_injective_over_delimiter_and_sentinel(spark):
    """ADVICE r6: values containing the '|' delimiter or a literal
    NULL-sentinel string must not alias another row's signature —
    per-column digests are fixed-width, so the tuple encoding is
    injective."""
    from omop_etl_spark.operators.reconcile import table_checksum

    def cksum(rows):
        df = spark.createDataFrame(rows, schema="a string, b string")
        return table_checksum(df, cols=["a", "b"]).collect()[0]["checksum"]

    # delimiter smuggling: ('a|b','c') vs ('a','b|c')
    assert cksum([Row(a="a|b", b="c")]) != cksum([Row(a="a", b="b|c")])
    # literal sentinel string vs real NULL
    assert cksum([Row(a=" null", b="x")]) != cksum([Row(a=None, b="x")])
    # md5-looking value vs the value whose digest it equals
    import hashlib

    d = hashlib.md5(b"hello").hexdigest()
    assert cksum([Row(a=d, b="x")]) != cksum([Row(a="hello", b="x")])


def test_diff_column_counts_null_semantics(spark):
    """Per-column changed counts over common keys: NULL->value and
    value->NULL count as changes, NULL==NULL does not; added/removed
    keys never enter n_common."""
    from omop_etl_spark.operators.reconcile import diff_column_counts

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, None, 30), (4, "d", 40)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 11), (2, "b", None), (3, "c", 30), (5, "e", 50)],
        "k int, s string, v int",
    )
    got = {
        r["column"]: (r["n_changed"], r["n_common"])
        for r in diff_column_counts(old, new, ["k"], ["s", "v"]).collect()
    }
    # common keys 1,2,3: s changes only on 3 (NULL->'c'); v only on 1
    assert got == {"s": (1, 3), "v": (1, 3)}
