"""CDC JSON normalizer: inference, widening, flattening, epoch promotion,
sanitization, pk extraction (FIXTURES.md §B4 shapes)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from oltp_to_data_warehouse_pipeline_spark.streaming import normalizer as norm

FIXTURE_MSG = json.dumps(
    {
        "_id": "a1",
        "user": {"name": "x", "age": 31},
        "tags": ["p", "q"],
        "created": 1700000000,
        "updated_ms": 1700000000123,
        "score": 0.5,
        "empty": "  ",
        "deep": {"a": {"b": {"c": 1}}},
        "wide": {"k1": 1, "k2": 2, "k3": 3, "k4": 4, "k5": 5, "k6": 6},
    }
)


def test_sanitize_identifier():
    assert norm.sanitize_identifier("First Name") == "first_name"
    assert norm.sanitize_identifier("2col") == "col_2col"
    assert norm.sanitize_identifier("a.b-c") == "a_b_c"
    assert norm.sanitize_identifier("weird!@#") == "weird"


def test_infer_flatten_rules():
    schema = norm.infer_schema([FIXTURE_MSG])
    f = schema.fields
    assert f["user_name"].sql_type == "string" and f["user_age"].sql_type == "bigint"
    assert f["tags"].is_json_blob          # arrays -> JSON string
    assert f["deep"].is_json_blob          # too deep -> JSON string
    assert f["wide"].is_json_blob          # >5 keys -> JSON string
    assert f["score"].sql_type == "double"


def test_widening_monotone():
    a = norm.infer_schema(['{"x": 1}'])
    b = norm.infer_schema(['{"x": 1.5}'])
    c = norm.infer_schema(['{"x": "s"}'])
    assert a.merge(b).fields["x"].sql_type == "double"
    assert a.merge(c).fields["x"].sql_type == "string"
    assert b.merge(c).fields["x"].sql_type == "string"
    # additive evolution (B9 fixed): new columns appear
    d = norm.infer_schema(['{"x": 1, "y": true}'])
    assert set(a.merge(d).fields) == {"x", "y"}


def test_normalize_end_to_end(spark):
    df = spark.createDataFrame([(FIXTURE_MSG, "t1")], ["value", "topic"])
    schema = norm.infer_schema([FIXTURE_MSG])
    out = norm.normalize(df, schema)
    row = out.first()
    assert row["kafka_primary_key"] == "a1"
    assert row["user_name"] == "x" and row["user_age"] == 31
    assert row["empty"] is None                       # blank scrub
    assert json.loads(row["tags"]) == ["p", "q"]      # array as JSON string
    assert row["created"] == 1700000000
    assert str(row["created_ts"]).startswith("2023-11-14")   # epoch secs promoted
    assert str(row["updated_ms_ts"]).startswith("2023-11-14")  # epoch millis
    assert row["raw_data"] == FIXTURE_MSG
    assert row["kafka_topic"] == "t1"


def test_no_pk_rejected_and_poison_tolerated(spark):
    msgs = [
        ('{"name": "no key here"}', "t"),
        ("{not json at all", "t"),
        ('{"id": "ok", "name": "fine"}', "t"),
    ]
    df = spark.createDataFrame(msgs, ["value", "topic"])
    schema = norm.infer_schema([m for m, _ in msgs])
    out = norm.normalize(df, schema)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["kafka_primary_key"] == "ok"


def test_pk_priority_and_star_id_fallback(spark):
    # uuid beats a trailing *id field; customer_id used when no candidate
    m1 = '{"uuid": "u1", "customer_id": "c9"}'
    m2 = '{"customer_id": "c7", "v": 1}'
    df = spark.createDataFrame([(m1, "t"), (m2, "t")], ["value", "topic"])
    schema = norm.infer_schema([m1, m2])
    got = {r["raw_data"]: r["kafka_primary_key"] for r in norm.normalize(df, schema).collect()}
    assert got[m1] == "u1" and got[m2] == "c7"


def test_reserved_name_collision():
    schema = norm.infer_schema(['{"id": 1, "kafka_topic": "spoof"}'])
    assert "kafka_topic" not in schema.fields
    assert "kafka_topic_1" in schema.fields


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh_ ", min_size=1, max_size=8),
        st.one_of(st.booleans(), st.integers(-1000, 1000), st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=10)),
        min_size=1,
        max_size=6,
    )
)
def test_inference_names_always_valid(doc):
    """Property: produced column names are valid lowercase identifiers and
    unique (collision renaming)."""
    schema = norm.infer_schema([json.dumps(doc)])
    names = list(schema.fields)
    assert len(names) == len(set(names))
    for n in names:
        assert n == norm.sanitize_identifier(n) or n.rsplit("_", 1)[0] == norm.sanitize_identifier(n.rsplit("_", 1)[0])
        assert n not in norm.RESERVED
