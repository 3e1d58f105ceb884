"""Minimal XSpace/XPlane trace parser (protobuf wire format, no deps).

``jax.profiler`` writes .xplane.pb traces; the TensorBoard profile plugin in
this image cannot load them (proto codegen mismatch), so this module decodes
the wire format directly for the subset the framework needs: per-op device
time aggregation.  Schema: tsl/profiler/protobuf/xplane.proto (public,
stable field numbers).

Usage:
    from prcv2025reid_tpu.utils.xplane import op_time_breakdown
    table = op_time_breakdown("/tmp/trace")   # {op_name: total_ms}
"""
from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wtype = tag >> 3, tag & 0x7
        if wtype == 0:  # varint
            val, pos = _read_varint(buf, pos)
            yield field, wtype, val
        elif wtype == 1:  # 64-bit
            yield field, wtype, buf[pos : pos + 8]
            pos += 8
        elif wtype == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            yield field, wtype, buf[pos : pos + ln]
            pos += ln
        elif wtype == 5:  # 32-bit
            yield field, wtype, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")


def _parse_event(buf: bytes) -> Tuple[int, int]:
    """XEvent: metadata_id=1 (varint), duration_ps=3 (varint)."""
    mid = dur = 0
    for f, w, v in _fields(buf):
        if f == 1 and w == 0:
            mid = v
        elif f == 3 and w == 0:
            dur = v
    return mid, dur


def _parse_line(buf: bytes) -> Tuple[str, List[Tuple[int, int]]]:
    """XLine -> (name, events).  Events appear at field 9 (current proto) or
    field 4 (older/axon traces); name at field 2."""
    events = []
    name = ""
    for f, w, v in _fields(buf):
        if w == 2 and f in (4, 9):
            events.append(_parse_event(v))
        elif f == 2 and w == 2:
            try:
                name = v.decode("utf-8", "replace")
            except Exception:
                name = ""
    return name, events


def _parse_event_metadata(buf: bytes) -> Tuple[int, str]:
    """XEventMetadata: id=1, name=2."""
    mid = 0
    name = ""
    for f, w, v in _fields(buf):
        if f == 1 and w == 0:
            mid = v
        elif f == 2 and w == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def _parse_metadata_entry(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry: key=1, value=2."""
    key = 0
    name = ""
    for f, w, v in _fields(buf):
        if f == 1 and w == 0:
            key = v
        elif f == 2 and w == 2:
            mid, name = _parse_event_metadata(v)
            if key == 0:
                key = mid
    return key, name


def parse_plane(buf: bytes) -> Tuple[str, Dict[str, float]]:
    """XPlane -> (name, {event_name: total_ms})."""
    name = ""
    lines: List[bytes] = []
    meta: Dict[int, str] = {}
    for f, w, v in _fields(buf):
        if f == 2 and w == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3 and w == 2:
            lines.append(v)
        elif f == 4 and w == 2:
            k, nm = _parse_metadata_entry(v)
            meta[k] = nm
    totals: Dict[str, float] = defaultdict(float)
    for line in lines:
        line_name, events = _parse_line(line)
        for mid, dur in events:
            key = f"{line_name}::{meta.get(mid, f'#{mid}')}"
            totals[key] += dur / 1e9  # ps -> ms
    return name, dict(totals)


def parse_xspace(path: str) -> Dict[str, Dict[str, float]]:
    """xplane.pb file -> {plane_name: {op: total_ms}}."""
    buf = open(path, "rb").read()
    planes = {}
    for f, w, v in _fields(buf):
        if f == 1 and w == 2:
            name, totals = parse_plane(v)
            planes[name] = totals
    return planes


def op_time_breakdown(
    trace_dir: str, device_only: bool = True
) -> Dict[str, float]:
    """Aggregate op time over every plane of the newest trace in a dir."""
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    planes = parse_xspace(files[-1])
    out: Dict[str, float] = defaultdict(float)
    for pname, totals in planes.items():
        lname = pname.lower()
        if device_only and not ("tpu" in lname or "device" in lname or "/gpu" in lname):
            continue
        for op, ms in totals.items():
            out[op] += ms
    return dict(out)


def print_top(table: Dict[str, float], n: int = 25):
    # "XLA Ops::" lines are op OCCUPANCY; "Async ...::" lines are spans that
    # overlap compute — summing both double-counts device time (CLAUDE.md),
    # so async spans are excluded from the total/percentages and flagged.
    is_async = lambda op: op.split("::", 1)[0].lower().startswith("async")
    total = sum(ms for op, ms in table.items() if not is_async(op))
    async_total = sum(ms for op, ms in table.items() if is_async(op))
    print(f"total device op time: {total:.2f} ms over {len(table)} ops"
          + (f" (+{async_total:.2f} ms async overlap, not summed)"
             if async_total else ""))
    for op, ms in sorted(table.items(), key=lambda kv: -kv[1])[:n]:
        pct = ("async" if is_async(op)
               else f"{100 * ms / max(total, 1e-9):5.1f}%")
        print(f"  {ms:9.3f} ms  {pct:>5s}  {op[:100]}")
