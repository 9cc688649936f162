"""Property-based codec round-trips (SURVEY §5.4: decode(encode(row)) ==
row for random rows). Examples are batched into one DataFrame per case
so hypothesis doesn't pay a Spark job per generated string."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.functions import (
    codecs,
)

# printable-ish unicode, excluding the delimited test's separator
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(-(2**62), 2**62), TEXT), min_size=1, max_size=8))
def test_json_roundtrip_property(spark, rows):
    ddl = "id BIGINT, s STRING"
    df = spark.createDataFrame(rows, ddl)
    back = (
        df.select(codecs.json_encode(["id", "s"]).alias("v"))
        .select(codecs.json_decode("v", ddl).alias("d"))
        .select("d.*")
    )
    assert sorted(back.collect(), key=str) == sorted(df.collect(), key=str)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**31), 2**31),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",),
                    blacklist_characters="\x00|\r\n",
                ),
                min_size=1,
                max_size=30,
            ),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_delimited_roundtrip_property(spark, rows):
    ddl = "id BIGINT, s STRING, x DOUBLE"
    df = spark.createDataFrame(rows, ddl)
    back = (
        df.select(codecs.delimited_encode(["id", "s", "x"], sep="|").alias("v"))
        .select(codecs.delimited_decode("v", ddl, sep="|").alias("d"))
        .select("d.*")
    )
    assert sorted(back.collect(), key=str) == sorted(df.collect(), key=str)
