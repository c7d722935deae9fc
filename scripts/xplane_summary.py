"""Summarize a jax.profiler xplane.pb dump per-op — no TensorFlow needed.

jax.profiler.trace() writes plugins/profile/<run>/<host>.xplane.pb in the
TensorBoard XPlane format. This decodes it with a hand-rolled
protobuf-wire-format reader (the schema is stable; tensorflow/tsl
profiler/protobuf/xplane.proto) and prints, for the TPU device plane,
total + self time per HLO op name so a fused frame's ms can be attributed
without TensorBoard.

Usage: python scripts/xplane_summary.py [trace_dir] [top_n]
"""
from __future__ import annotations

import gzip
import os
import sys
from collections import defaultdict


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    """Yield (field_no, wire_type, value) over a serialized message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _zigzag(v):
    return (v >> 1) ^ -(v & 1)


def parse_xspace(data):
    """XSpace { repeated XPlane planes = 1; } -> list of plane dicts."""
    planes = []
    for fno, _, v in _fields(data):
        if fno == 1:
            planes.append(parse_xplane(v))
    return planes


def parse_xplane(data):
    # XPlane: id=1, name=2, lines=3, event_metadata=4 (map<int64,
    # XEventMetadata>), stat_metadata=5
    plane = {"name": "", "lines": [], "event_meta": {}, "stat_meta": {}}
    for fno, _, v in _fields(data):
        if fno == 2:
            plane["name"] = v.decode()
        elif fno == 3:
            plane["lines"].append(v)
        elif fno == 4:
            k = mv = None
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    mv = v2
            if mv is not None:
                em = {"name": "", "display": ""}
                for f3, _, v3 in _fields(mv):
                    if f3 == 2:
                        em["name"] = v3.decode()
                    elif f3 == 4:
                        em["display"] = v3.decode()
                plane["event_meta"][k] = em
    return plane


def parse_line(data):
    # XLine: id=1, display_name=4(?), name=2, events=6, timestamp_ns=3
    name = ""
    events = []
    for fno, _, v in _fields(data):
        if fno == 2:
            name = v.decode()
        elif fno == 4 and isinstance(v, bytes):
            try:
                name = v.decode() or name
            except Exception:
                pass
        elif fno == 6:
            events.append(v)
    return name, events


def parse_event(data):
    # XEvent: metadata_id=1, offset_ps=2 (sint64) OR num_occurrences..,
    # duration_ps=3
    mid = off = dur = 0
    for fno, wt, v in _fields(data):
        if fno == 1:
            mid = v
        elif fno == 2 and wt == 0:
            off = _zigzag(v)
        elif fno == 3 and wt == 0:
            dur = v
    return mid, off, dur


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    pbs = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".xplane.pb"):
                pbs.append(os.path.join(dirpath, f))
    if not pbs:
        print("no xplane.pb under", root)
        return
    pb = max(pbs, key=os.path.getmtime)
    data = open(pb, "rb").read()
    if pb.endswith(".gz"):
        data = gzip.decompress(data)
    planes = parse_xspace(data)
    for plane in planes:
        if "TPU" not in plane["name"] and "/device" not in plane["name"]:
            continue
        per_op = defaultdict(float)
        per_line = {}
        for lraw in plane["lines"]:
            lname, events = parse_line(lraw)
            tot = 0.0
            for eraw in events:
                mid, off, dur = parse_event(eraw)
                meta = plane["event_meta"].get(mid, {})
                nm = meta.get("display") or meta.get("name") or str(mid)
                per_op[(lname, nm)] += dur / 1e9  # ps -> ms
                tot += dur / 1e9
            per_line[lname] = tot
        print(f"== plane: {plane['name']}")
        for ln, t in sorted(per_line.items(), key=lambda kv: -kv[1]):
            print(f"   line {ln}: total {t:.3f} ms")
        ranked = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]
        for (ln, nm), t in ranked:
            print(f"  {t:9.3f} ms  [{ln}] {nm[:110]}")


if __name__ == "__main__":
    main()
