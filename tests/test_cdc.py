"""CDC merge_upsert semantics: upsert/insert/delete, last-write-wins,
explicit-NULL override, pass-through of untouched base rows."""

from __future__ import annotations

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    cdc,
)


def _snapshot(spark, changes_rows):
    base = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        changes_rows, "k long, op string, bal double, seq long"
    )
    out = cdc.merge_upsert(base, changes, ["k"], ["seq"], op_col="op")
    return {r.k: r for r in out.collect()}


def test_merge_upsert_update_insert_delete(spark):
    snap = _snapshot(
        spark,
        [
            (1, "U", 11.0, 1),   # update existing
            (3, "D", None, 2),   # delete existing
            (4, "U", 40.0, 3),   # insert new key
            (5, "D", None, 4),   # delete of absent key is a no-op
        ],
    )
    assert set(snap) == {1, 2, 4}
    assert snap[1].bal == 11.0 and snap[1].name == "alice"
    assert snap[2].bal == 20.0          # untouched base row passes through
    assert snap[4].bal == 40.0 and snap[4].name is None  # insert: no base cols


def test_merge_upsert_last_write_wins(spark):
    snap = _snapshot(
        spark,
        [
            (1, "U", 99.0, 1),
            (1, "D", None, 2),
            (1, "U", 55.0, 3),   # latest op resurrects the key
            (2, "U", 21.0, 5),
            (2, "D", None, 6),   # latest op deletes
        ],
    )
    assert snap[1].bal == 55.0
    assert 2 not in snap


def test_merge_upsert_explicit_null_overrides_base(spark):
    snap = _snapshot(spark, [(1, "U", None, 1)])
    assert snap[1].bal is None          # the change is authoritative


def test_merge_upsert_change_only_column_null_for_untouched(spark):
    snap = _snapshot(spark, [(1, "U", 11.0, 7)])
    assert snap[1].seq == 7
    assert snap[2].seq is None


from hypothesis import given, settings, strategies as st

_OPS = st.lists(
    st.tuples(
        st.integers(0, 5),                       # key
        st.sampled_from(["U", "D", None]),       # op (NULL op = upsert)
        st.one_of(st.none(), st.integers(0, 99)),  # new balance
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(_OPS)
def test_merge_upsert_matches_sequential_fold(spark, ops):
    """merge_upsert == applying the log one change at a time."""
    base = {0: 10.0, 1: 20.0, 2: 30.0}
    expected = dict(base)
    for key, op, val in ops:
        if op == "D":
            expected.pop(key, None)
        else:
            expected[key] = None if val is None else float(val)

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "k long, bal double"
    )
    if ops:
        chg_df = spark.createDataFrame(
            [
                (k, op, None if v is None else float(v), seq)
                for seq, (k, op, v) in enumerate(ops)
            ],
            "k long, op string, bal double, seq long",
        )
    else:
        chg_df = spark.createDataFrame(
            [], "k long, op string, bal double, seq long"
        )
    got = {
        r.k: r.bal
        for r in cdc.merge_upsert(
            base_df, chg_df, ["k"], ["seq"], op_col="op"
        ).collect()
    }
    assert got == expected
