"""protomini (vendor/protomini): the from-scratch minimal protobuf runtime
that unlocks transformWithStateInPandas in protobuf-less containers.

Wire-format assertions are hand-computed from the PUBLIC encoding spec
(protobuf.dev/programming-guides/encoding/): tag = field_number << 3 |
wire_type; varints are little-endian base-128. The end-to-end proof is
tests/test_streaming.py::test_transform_with_state_matches_apply_in_pandas
_with_state, which drives a real JVM state server through this codec."""

from __future__ import annotations

import pytest

from phageclouds_graphdatabase_spark.vendor import ensure_protobuf

assert ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")

from google.protobuf import _mini  # noqa: E402  (protomini or real-absent)


def test_varint_roundtrip_vectors():
    # spec examples: 1 -> 0x01, 300 -> 0xAC 0x02
    for n, expect in [(0, b"\x00"), (1, b"\x01"), (300, b"\xac\x02"),
                      (2 ** 32, b"\x80\x80\x80\x80\x10")]:
        buf = bytearray()
        _mini.write_varint(buf, n)
        assert bytes(buf) == expect
        got, pos = _mini.read_varint(bytes(buf), 0)
        assert got == n and pos == len(buf)


def test_negative_int64_is_ten_bytes():
    buf = bytearray()
    _mini.write_varint(buf, -1)
    assert len(buf) == 10  # two's-complement 64-bit varint per spec
    got, _ = _mini.read_varint(bytes(buf), 0)
    assert _mini._signed64(got) == -1


def test_handle_state_wire_bytes_hand_computed():
    # StateRequest.statefulProcessorCall (field 2, msg) ->
    #   StatefulProcessorCall.setHandleState (field 1, msg) ->
    #     SetHandleState.state (field 1, enum CREATED=1)
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert msg.SerializeToString() == bytes(
        [0x12, 0x04, 0x0A, 0x02, 0x08, 0x01]
    )


def test_empty_oneof_message_still_emits_tag():
    # RemoveImplicitKey has no fields; setting it must still serialize the
    # containing field (tag + zero length) so the JVM sees WHICH oneof arm
    req = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    assert req.SerializeToString() == bytes([0x12, 0x00])


def test_response_parse_with_unknown_fields_skipped():
    resp = sm.StateResponse(statusCode=2, errorMessage="boom", value=b"\x01")
    raw = resp.SerializeToString()
    # append an unknown field 15 (varint) — parser must skip it
    raw2 = raw + bytes([15 << 3 | 0, 0x2A])
    r = sm.StateResponse()
    r.ParseFromString(raw2)
    assert (r.statusCode, r.errorMessage, r.value) == (2, "boom", b"\x01")


def test_defaults_for_unset_fields():
    r = sm.StateResponse()
    assert r.statusCode == 0 and r.errorMessage == "" and r.value == b""
    lg = sm.StateResponseWithListGet()
    assert lg.value == [] and lg.requireNextFetch is False


def test_repeated_bytes_and_nested_messages_roundtrip():
    mi = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    out = sm.StateResponseWithMapIterator()
    out.ParseFromString(mi.SerializeToString())
    assert [(p.key, p.value) for p in out.kvPair] == [
        (b"k1", b"v1"), (b"k2", b"v2")
    ]
    assert out.requireNextFetch is True


def test_negative_timestamp_roundtrip():
    t = sm.RegisterTimer(expiryTimestampMs=-1)
    t2 = sm.RegisterTimer()
    t2.ParseFromString(t.SerializeToString())
    assert t2.expiryTimestampMs == -1


def test_enum_module_constants_and_wrapper():
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.DATA_PROCESSED,
            sm.TIMER_PROCESSED, sm.CLOSED) == (0, 1, 2, 3, 4, 5)
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("CLOSED") == 5


def test_descriptor_parse_covers_all_messages():
    # the parsed pool must know every message the state clients construct
    from google.protobuf import descriptor_pool

    pool = descriptor_pool.Default()
    pkg = ".org.apache.spark.sql.execution.streaming.state."
    for name in ("StateRequest", "StateResponse", "ValueStateCall",
                 "ListStateCall", "MapStateCall", "TimerStateCallCommand",
                 "StateCallCommand", "SetImplicitKey", "TTLConfig",
                 "KeyAndValuePair", "TimerInfo"):
        assert pool.message_class(pkg + name) is not None


def test_proto3_optional_field():
    # TimerInfo.key is proto3-optional (synthetic oneof): unset -> default
    ti = sm.TimerInfo(timestampMs=42)
    t2 = sm.TimerInfo()
    t2.ParseFromString(ti.SerializeToString())
    assert t2.timestampMs == 42 and t2.key == b""
