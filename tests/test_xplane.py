"""Unit test for the xplane wire-format parser (utils/xplane.py) using a
hand-encoded protobuf message."""
import numpy as np

from prcv2025reid_tpu.utils.xplane import parse_xspace


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _field(num: int, wtype: int, payload) -> bytes:
    tag = _varint((num << 3) | wtype)
    if wtype == 0:
        return tag + _varint(payload)
    return tag + _varint(len(payload)) + payload


def _event(metadata_id: int, duration_ps: int) -> bytes:
    return _field(1, 0, metadata_id) + _field(3, 0, duration_ps)


def _event_metadata(mid: int, name: str) -> bytes:
    return _field(1, 0, mid) + _field(2, 2, name.encode())


def _meta_entry(mid: int, name: str) -> bytes:
    return _field(1, 0, mid) + _field(2, 2, _event_metadata(mid, name))


def _line(name: str, events, events_field=9) -> bytes:
    buf = _field(2, 2, name.encode())
    for ev in events:
        buf += _field(events_field, 2, ev)
    return buf


def _plane(name: str, lines, metas) -> bytes:
    buf = _field(2, 2, name.encode())
    for ln in lines:
        buf += _field(3, 2, ln)
    for m in metas:
        buf += _field(4, 2, m)
    return buf


def test_parse_synthetic_xspace(tmp_path):
    line = _line(
        "XLA Ops",
        [_event(7, 2_000_000_000), _event(7, 1_000_000_000), _event(8, 500_000_000)],
    )
    # axon traces put events at field 4 — cover that too
    line_alt = _line("Steps", [_event(9, 4_000_000_000)], events_field=4)
    plane = _plane(
        "/device:TPU:0",
        [line, line_alt],
        [_meta_entry(7, "fusion.1"), _meta_entry(8, "copy.2"), _meta_entry(9, "step")],
    )
    xspace = _field(1, 2, plane)
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(xspace)

    planes = parse_xspace(str(path))
    t = planes["/device:TPU:0"]
    np.testing.assert_allclose(t["XLA Ops::fusion.1"], 3.0)  # ms
    np.testing.assert_allclose(t["XLA Ops::copy.2"], 0.5)
    np.testing.assert_allclose(t["Steps::step"], 4.0)
