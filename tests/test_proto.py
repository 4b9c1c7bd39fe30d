"""Span/SpanBuffer wire codec + packer framing round-trips (S2/S3/S5)."""

from __future__ import annotations

import pytest

from haystack_traces_spark.sources import packer as P
from haystack_traces_spark.sources import proto as W


SPAN = {
    "trace_id": "t-1",
    "span_id": "s-1",
    "parent_span_id": "",
    "service_name": "svc-a",
    "operation_name": "op-1",
    "start_time": 1_704_067_200_000_000,
    "duration": 125_000,
    "tags": [
        {"key": "errorcode", "vtype": "LONG", "vstr": None, "vlong": 3,
         "vdouble": None, "vbool": None, "vbytes": None},
        {"key": "role", "vtype": "STRING", "vstr": "haystack", "vlong": None,
         "vdouble": None, "vbool": None, "vbytes": None},
        {"key": "sampled", "vtype": "BOOL", "vstr": None, "vlong": None,
         "vdouble": None, "vbool": True, "vbytes": None},
        {"key": "weight", "vtype": "DOUBLE", "vstr": None, "vlong": None,
         "vdouble": 0.25, "vbool": None, "vbytes": None},
        {"key": "blob", "vtype": "BINARY", "vstr": None, "vlong": None,
         "vdouble": None, "vbool": None, "vbytes": b"\x00\x01\xff"},
    ],
    "logs": [
        {"timestamp": 1_704_067_200_000_100,
         "fields": [{"key": "event", "vstr": "cs"}]},
    ],
}


def test_varint_roundtrip_edges():
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -(2**63)):
        buf = W._varint(n)
        val, i = W._read_varint(buf, 0)
        assert val == n and i == len(buf)


def test_wire_format_golden():
    # field 1 (traceId) wire: key 0x0A, len, utf8 — fixed by the proto spec
    buf = W.encode_span({"trace_id": "ab"})
    assert buf[:2] == b"\x0a\x02" and buf[2:4] == b"ab"


def test_span_roundtrip():
    decoded = W.decode_span(W.encode_span(SPAN))
    assert decoded["trace_id"] == SPAN["trace_id"]
    assert decoded["start_time"] == SPAN["start_time"]
    assert decoded["duration"] == SPAN["duration"]
    assert decoded["parent_span_id"] == ""  # proto3 default round-trips
    tags = {t["key"]: t for t in decoded["tags"]}
    assert tags["errorcode"]["vlong"] == 3 and tags["errorcode"]["vtype"] == "LONG"
    assert tags["role"]["vstr"] == "haystack"
    assert tags["sampled"]["vbool"] is True
    assert tags["weight"]["vdouble"] == 0.25
    assert tags["blob"]["vbytes"] == b"\x00\x01\xff"
    assert decoded["logs"][0]["timestamp"] == SPAN["logs"][0]["timestamp"]
    assert decoded["logs"][0]["fields"][0] == {"key": "event", "vstr": "cs"}


def test_span_buffer_roundtrip():
    buf = W.encode_span_buffer("t-1", [SPAN, dict(SPAN, span_id="s-2")])
    tid, spans = W.decode_span_buffer(buf)
    assert tid == "t-1"
    assert [s["span_id"] for s in spans] == ["s-1", "s-2"]


@pytest.mark.parametrize("codec", P.available_codecs())
def test_pack_unpack(codec):
    payload = W.encode_span_buffer("t-1", [SPAN]) * 20
    packed = P.pack(payload, codec)
    assert packed.startswith(P.MAGIC)
    assert P.unpack(packed) == payload


def test_unpack_legacy_raw():
    raw = W.encode_span(SPAN)
    assert P.unpack(raw) == raw  # no magic → passthrough (Unpacker.scala:52-80)


def test_proto_spark_roundtrip(spark):
    """binary Kafka values → proto_to_spans_df → flat span rows."""
    vals = [(W.encode_span(dict(SPAN, span_id=f"s-{i}")),) for i in range(5)]
    vals.append((b"\xff\xff\xff",))  # undecodable → skipped
    raw = spark.createDataFrame(vals, "value binary")
    out = W.proto_to_spans_df(raw).collect()
    assert {r.span_id for r in out} == {f"s-{i}" for i in range(5)}
    assert all(r.start_time == SPAN["start_time"] for r in out)


def test_buffer_proto_spark(spark):
    from haystack_traces_spark.sources.events import spans_from_events
    from haystack_traces_spark.sources.spans import build_trace_store

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    store = build_trace_store(spans_from_events(events)).limit(10)
    msgs = W.spans_df_to_buffer_proto(store).collect()
    assert len(msgs) == 10
    for m in msgs:
        tid, spans = W.decode_span_buffer(bytes(m.value))
        assert tid == m.key and len(spans) >= 1
        assert all(s["trace_id"] == tid for s in spans)


def test_otlp_export_round_trip(spark):
    """The OTLP/JSON export parses back as valid JSON with the OTLP
    structure: resourceSpans -> resource service.name + scopeSpans ->
    spans with nano timestamps and single-field AnyValue attributes."""
    import json

    from haystack_traces_spark import entry_queries as EQ
    from haystack_traces_spark.sources.otlp import spans_to_otlp

    spans = EQ._spans(spark, "/root/testdata/sf0.001")
    row = spans_to_otlp(spans).filter("trace_id = '7'").collect()[0]
    doc = json.loads(row["otlp_json"])
    assert doc["resourceSpans"], "at least one resourceSpans entry"
    n_spans = 0
    for rs in doc["resourceSpans"]:
        svc = rs["resource"]["attributes"][0]
        assert svc["key"] == "service.name" and svc["value"]["stringValue"]
        for scope in rs["scopeSpans"]:
            for s in scope["spans"]:
                n_spans += 1
                assert s["traceId"] == "7" and s["spanId"]
                assert int(s["endTimeUnixNano"]) >= int(s["startTimeUnixNano"])
                assert int(s["startTimeUnixNano"]) % 1000 == 0  # micros->nanos
                for attr in s["attributes"]:
                    # OTLP AnyValue: exactly ONE value field set
                    assert len(attr["value"]) == 1, attr
    # every span of trace 42 exported exactly once
    n_true = spans.filter("trace_id = '7'").count()
    assert n_spans == n_true and n_true > 0


# -------------------------------------------- JVM decode seam (r7, ask #6) --

def test_span_descriptor_set_structure():
    """The hand-assembled FileDescriptorSet parses with this module's own
    wire reader: one file, package 'haystack', the four messages with the
    haystack-idl field numbers, the TagType enum with this module's vtype
    names. (No protobuf python lib in the container — the structural walk
    is the strongest local check; the skip-marked live test below runs
    the real JVM parse where the jar exists.)"""
    fds = W.span_descriptor_set()
    files = [v for f, _w, v in W._fields(fds) if f == 1]
    assert len(files) == 1
    name = pkg = syntax = None
    messages, enums = {}, {}
    for f, _w, v in W._fields(files[0]):
        if f == 1:
            name = v.decode()
        elif f == 2:
            pkg = v.decode()
        elif f == 4:
            mname = None
            fields = {}
            for f2, _w2, v2 in W._fields(v):
                if f2 == 1:
                    mname = v2.decode()
                elif f2 == 2:
                    fname, fnum = None, None
                    for f3, _w3, v3 in W._fields(v2):
                        if f3 == 1:
                            fname = v3.decode()
                        elif f3 == 3:
                            fnum = int(v3)
                    fields[fname] = fnum
            messages[mname] = fields
        elif f == 5:
            ename, values = None, {}
            for f2, _w2, v2 in W._fields(v):
                if f2 == 1:
                    ename = v2.decode()
                elif f2 == 2:
                    vn, vv = None, 0
                    for f3, _w3, v3 in W._fields(v2):
                        if f3 == 1:
                            vn = v3.decode()
                        elif f3 == 2:
                            vv = int(v3)
                    values[vn] = vv
            enums[ename] = values
        elif f == 12:
            syntax = v.decode()
    assert (name, pkg, syntax) == ("haystack_spans.proto", "haystack", "proto3")
    assert messages["Span"] == {
        "traceId": 1, "spanId": 2, "parentSpanId": 3, "serviceName": 4,
        "operationName": 5, "startTime": 6, "duration": 7, "logs": 8,
        "tags": 9,
    }
    assert messages["Tag"] == {
        "key": 1, "type": 2, "vStr": 3, "vLong": 4, "vDouble": 5,
        "vBool": 6, "vBytes": 7,
    }
    assert messages["Log"] == {"timestamp": 1, "fields": 2}
    assert messages["SpanBuffer"] == {"traceId": 1, "childSpans": 2}
    assert enums["TagType"] == {
        "STRING": 0, "DOUBLE": 1, "BOOL": 2, "LONG": 3, "BINARY": 4,
    }


def test_proto_to_spans_df_jvm_dispatch(spark):
    """use_jvm='auto' falls back to the Python codec in this container
    (no spark-protobuf jar) and produces identical rows; use_jvm=True
    raises the deploy-instruction error; use_jvm=False pins Python."""
    span = {
        "trace_id": "t1", "span_id": "s1", "service_name": "svc",
        "operation_name": "op", "start_time": 7, "duration": 3,
        "tags": [{"key": "k", "vtype": "LONG", "vlong": 9}],
    }
    raw = spark.createDataFrame(
        [(bytearray(W.encode_span(span)),)], "value binary"
    )
    auto = W.proto_to_spans_df(raw, use_jvm="auto").collect()
    pinned = W.proto_to_spans_df(raw, use_jvm=False).collect()
    assert auto == pinned and auto[0]["trace_id"] == "t1"
    if not W.jvm_protobuf_available(spark):
        with pytest.raises(RuntimeError, match="spark-protobuf"):
            W.proto_to_spans_df(raw, use_jvm=True)
    with pytest.raises(ValueError, match="use_jvm"):
        W.proto_to_spans_df(raw, use_jvm="yes")


def test_jvm_default_normalization_matches_python_codec(spark):
    """ADVICE r7 (proto.py medium): spark-protobuf materializes proto3
    non-optional scalars as defaults (""/0/0.0/false/x'') where the
    Python codec emits NULL for absent slots. This pins the JVM-side
    normalization WITHOUT the jar: hand-build the struct rows
    spark-protobuf would produce (defaults filled in) for a crafted
    span, run _normalize_jvm_decoded, and require exact equality with
    the Python wire codec's rows for the same span."""
    span = {
        "trace_id": "t1", "span_id": "s1", "parent_span_id": "",
        "service_name": "svc", "operation_name": "op",
        "start_time": 7, "duration": 3,
        "tags": [
            {"key": "kl", "vtype": "LONG", "vlong": 9},
            {"key": "ks", "vtype": "STRING", "vstr": "hello"},
            {"key": "kd", "vtype": "DOUBLE", "vdouble": 2.5},
            {"key": "kb", "vtype": "BOOL", "vbool": True},
            {"key": "ky", "vtype": "BINARY", "vbytes": b"\x01\x02"},
            # default-valued slots: canonical proto3 never serializes
            # these, so both decoders see an absent field
            {"key": "k0", "vtype": "LONG", "vlong": 0},
        ],
        "logs": [{"timestamp": 5, "fields": [{"key": "f", "vstr": "v"}]}],
    }
    raw = spark.createDataFrame(
        [(bytearray(W.encode_span(span)),)], "value binary"
    )
    py = W.proto_to_spans_df(raw, use_jvm=False).collect()

    # what spark-protobuf would materialize: absent scalar slots filled
    # with proto3 defaults, enum rendered as its value name
    def jvm_tag(key, vtype, vstr="", vlong=0, vdouble=0.0,
                vbool=False, vbytes=b""):
        return (key, vtype, vstr, vlong, vdouble, vbool, bytearray(vbytes))

    tag_t = (
        "key string, type string, vStr string, vLong bigint,"
        " vDouble double, vBool boolean, vBytes binary"
    )
    jvm_struct = spark.createDataFrame(
        [((
            "t1", "s1", "", "svc", "op", 7, 3,
            [
                jvm_tag("kl", "LONG", vlong=9),
                jvm_tag("ks", "STRING", vstr="hello"),
                jvm_tag("kd", "DOUBLE", vdouble=2.5),
                jvm_tag("kb", "BOOL", vbool=True),
                jvm_tag("ky", "BINARY", vbytes=b"\x01\x02"),
                jvm_tag("k0", "LONG"),  # vlong=0 default == absent
            ],
            [(5, [jvm_tag("f", "STRING", vstr="v")])],
        ),)],
        f"s struct<traceId string, spanId string, parentSpanId string,"
        f" serviceName string, operationName string, startTime bigint,"
        f" duration bigint, tags array<struct<{tag_t}>>,"
        f" logs array<struct<timestamp bigint, fields array<struct<{tag_t}>>>>>",
    )
    jvm = W._normalize_jvm_decoded(jvm_struct).collect()
    assert jvm == py


def test_proto_to_spans_df_jvm_path_live(spark):
    """Runs ONLY where the spark-protobuf jar is loadable (a real cluster):
    the JVM decode of a crafted span must equal the Python codec's row,
    including tag enum names and proto3 default normalization."""
    if not W.jvm_protobuf_available(spark):
        pytest.skip(
            "spark-protobuf connector jar not present in this container "
            "(deploy path: --packages org.apache.spark:spark-protobuf_2.13)"
        )
    span = {
        "trace_id": "t1", "span_id": "s1", "service_name": "svc",
        "operation_name": "op", "start_time": 7, "duration": 3,
        "tags": [{"key": "k", "vtype": "LONG", "vlong": 9}],
        "logs": [{"timestamp": 5, "fields": [{"key": "f", "vstr": "v"}]}],
    }
    raw = spark.createDataFrame(
        [(bytearray(W.encode_span(span)),)], "value binary"
    )
    jvm = W.proto_to_spans_df(raw, use_jvm=True).collect()
    py = W.proto_to_spans_df(raw, use_jvm=False).collect()
    assert jvm == py
