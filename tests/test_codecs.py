"""Wire-format codec round-trips (SURVEY §5.4) — the §0 quirk class.

The reference's producer wrote delimited strings while its consumers
parsed JSON, silently yielding all-NULL structs. These tests pin both
codecs' round-trip property (decode(encode(row)) == row), the NULL and
embedded-separator edge cases, and the quirk itself.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.functions import (
    codecs,
)

DDL = "id BIGINT, name STRING, score DOUBLE"

ROWS = [
    Row(id=1, name="alpha", score=1.5),
    Row(id=2, name="", score=0.0),
    Row(id=None, name="gamma", score=None),
    Row(id=4, name=None, score=-3.25),
]


def _df(spark):
    return spark.createDataFrame(ROWS, DDL)


def test_json_roundtrip(spark):
    df = _df(spark)
    encoded = df.select(codecs.json_encode(["id", "name", "score"]).alias("v"))
    decoded = encoded.select(codecs.json_decode("v", DDL).alias("d")).select("d.*")
    assert sorted(decoded.collect(), key=str) == sorted(df.collect(), key=str)


def test_delimited_roundtrip(spark):
    df = _df(spark)
    encoded = df.select(
        codecs.delimited_encode(["id", "name", "score"], sep="|").alias("v")
    )
    decoded = encoded.select(
        codecs.delimited_decode("v", DDL, sep="|").alias("d")
    ).select("d.*")
    got = sorted(decoded.collect(), key=str)
    want = sorted(df.collect(), key=str)
    # delimited cannot distinguish NULL from '' — both decode to NULL
    want = [
        Row(id=r.id, name=(None if r.name == "" else r.name), score=r.score)
        for r in want
    ]
    assert got == want


def test_delimited_decode_malformed_cell_yields_null(spark):
    df = spark.createDataFrame([("1|notanumber|x",)], "v STRING")
    out = df.select(
        codecs.delimited_decode("v", "a BIGINT, b DOUBLE, c STRING", sep="|").alias("d")
    ).select("d.*").first()
    assert out.a == 1 and out.b is None and out.c == "x"


def test_delimited_separator_is_regex_escaped(spark):
    # '|' is a regex metachar; a naive split() on it explodes per-char
    df = spark.createDataFrame([(7, "x", 2.0)], DDL)
    enc = df.select(codecs.delimited_encode(["id", "name", "score"], sep="|").alias("v"))
    assert enc.first().v == "7|x|2.0"
    dec = enc.select(codecs.delimited_decode("v", DDL, sep="|").alias("d")).select("d.*")
    assert dec.first() == Row(id=7, name="x", score=2.0)


def test_format_mismatch_quirk_yields_all_null(spark):
    """The reference bug (SURVEY §0): delimited producer + JSON consumer
    parses to NULL fields, never an error."""
    df = _df(spark)
    delimited = df.select(codecs.delimited_encode(["id", "name", "score"]).alias("v"))
    wrong = delimited.select(codecs.json_decode("v", DDL).alias("d")).select("d.*")
    for r in wrong.collect():
        assert r.id is None and r.name is None and r.score is None


def test_kafka_encode_decode_roundtrip(spark):
    df = _df(spark).na.drop()
    wire = codecs.encode_for_kafka(df, key_col="name", wire_format="json")
    assert dict(wire.dtypes) == {"key": "binary", "value": "binary"}
    back = codecs.decode_kafka_value(wire, DDL, wire_format="json")
    assert sorted(back.collect()) == sorted(df.collect())


def test_kafka_delimited_wire_roundtrip(spark):
    # delimited maps '' → NULL on decode, so use the NULL-free, ''-free rows
    df = _df(spark).na.drop().filter(F.col("name") != "")
    wire = codecs.encode_for_kafka(df, key_col="id", wire_format="delimited", sep=";")
    back = codecs.decode_kafka_value(wire, DDL, wire_format="delimited", sep=";")
    assert sorted(back.collect()) == sorted(df.collect())


def test_variant_schema_on_read_tolerates_evolution(spark):
    """The VARIANT claim in q_variant_shred: payloads with new/missing
    keys or malformed JSON need no schema change — extraction paths
    bind at query time, absent paths are NULL (try_variant_get), and
    parse failures quarantine as NULL rather than failing the job."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ('{"k": 1}',),
            ('{"k": 2, "new_key": "later-added"}',),
            ('{"other": true}',),
            ("not json at all",),
        ],
        "props string",
    )
    out = df.select(
        F.try_variant_get(F.try_parse_json("props"), "$.k", "int").alias("k"),
        F.try_variant_get(
            F.try_parse_json("props"), "$.new_key", "string"
        ).alias("nk"),
    ).collect()
    assert [r.k for r in out] == [1, 2, None, None]
    assert [r.nk for r in out] == [None, "later-added", None, None]


def test_variant_decoder_drift_tolerance_vs_from_json(spark):
    """What the VARIANT wire decoder adds over from_json: (1) a payload
    with EXTRA keys decodes the declared fields cleanly; (2) one
    mistyped field quarantines as NULL at FIELD level while the other
    fields survive — from_json's PERMISSIVE mode nulls the whole row's
    struct on such input."""
    from pyspark.sql import functions as F

    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.functions import (
        codecs,
    )

    ddl = "id BIGINT, v DOUBLE"
    df = spark.createDataFrame(
        [
            ('{"id": 1, "v": 2.5, "added_later": true}',),
            ('{"id": "not_a_number", "v": 3.5}',),
        ],
        "s string",
    )
    out = df.select(codecs.variant_decode("s", ddl).alias("d")).select(
        "d.*"
    ).collect()
    assert (out[0].id, out[0].v) == (1, 2.5)  # extra key: harmless
    assert out[1].id is None and out[1].v == 3.5  # field-level quarantine
