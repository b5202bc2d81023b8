"""snapshot_diff (operators/diff): added/removed/changed classification,
null-safe compare semantics, and multi-column keys."""

from __future__ import annotations

from pyspark.sql import Row

from vacancy_gpt_etl_pipeline_spark.operators.diff import snapshot_diff


def test_classifies_added_removed_changed_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [Row(k=1, v="a", x=1.0), Row(k=2, v="b", x=2.0), Row(k=3, v="c", x=3.0)]
    )
    new = spark.createDataFrame(
        [Row(k=2, v="b", x=2.0), Row(k=3, v="C", x=3.0), Row(k=4, v="d", x=4.0)]
    )
    out = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["v", "x"]).collect()
    }
    assert set(out) == {1, 3, 4}  # k=2 unchanged -> absent
    assert out[1]["change_type"] == "removed" and out[1]["new_v"] is None
    assert out[3]["change_type"] == "changed"
    assert (out[3]["old_v"], out[3]["new_v"]) == ("c", "C")
    assert out[4]["change_type"] == "added" and out[4]["old_x"] is None


def test_null_compare_values_are_null_safe(spark):
    # NULL -> NULL is unchanged; NULL -> value and value -> NULL are changes
    old = spark.createDataFrame(
        [Row(k=1, v=None), Row(k=2, v=None), Row(k=3, v="z")]
    )
    new = spark.createDataFrame(
        [Row(k=1, v=None), Row(k=2, v="now"), Row(k=3, v=None)]
    )
    out = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert out == {2: "changed", 3: "changed"}  # k=1 NULL==NULL -> absent


def test_composite_keys(spark):
    old = spark.createDataFrame([Row(a=1, b="x", v=10), Row(a=1, b="y", v=20)])
    new = spark.createDataFrame([Row(a=1, b="x", v=11), Row(a=2, b="y", v=20)])
    rows = snapshot_diff(old, new, ["a", "b"], ["v"]).collect()
    by_key = {(r["a"], r["b"]): r["change_type"] for r in rows}
    assert by_key == {
        (1, "x"): "changed",
        (1, "y"): "removed",
        (2, "y"): "added",
    }


def test_null_keys_classified_correctly(spark):
    # NULL keys join null-safe: present-in-both-unchanged disappears,
    # old-side-only is 'removed' (not a phantom 'added')
    old = spark.createDataFrame([(None, "keep"), (1, "x")], "k int, v string")
    new = spark.createDataFrame([(None, "keep")], "k int, v string")
    out = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert len(out) == 1
    assert out[0]["k"] == 1 and out[0]["change_type"] == "removed"
    # and a NULL-keyed change is a single 'changed' row
    new2 = spark.createDataFrame([(None, "edited")], "k int, v string")
    out2 = snapshot_diff(old, new2, ["k"], ["v"]).collect()
    by = {(r["k"], r["change_type"]) for r in out2}
    assert by == {(None, "changed"), (1, "removed")}
