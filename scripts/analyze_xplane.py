"""Aggregate an XLA profiler trace (xplane.pb) by op, on the TPU device plane.

Usage:
    python scripts/analyze_xplane.py /tmp/prof              # newest xplane.pb under dir
    python scripts/analyze_xplane.py path/to/xplane.pb --top 40 --line "XLA Ops"

Reads the XSpace protobuf written by jax.profiler.start_trace (the same file
XProf/Perfetto consume) and prints, per op-name on the chosen device line, the
summed duration, call count and share of the busy timeline — the table the
PERF.md optimization chains are built from. The reference repo has no
profiling tooling at all (SURVEY §5); this is the TPU-native analog of a
torch.profiler table dump.

Parsing uses tensorflow's bundled xplane_pb2 when importable and falls back to
a minimal hand-rolled protobuf wire decoder (the XSpace schema is stable:
planes(1){name(2), lines(3){name(2), events(4){metadata_id(1), duration_ps(3)}},
event_metadata(5){id(1), name(2)}}), so the script works in images without
tensorflow.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


# ---------------------------------------------------------------- wire decode
def _read_varint(buf, i):
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:
            val, i = _read_varint(buf, i)
        elif wtype == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wtype == 5:
            val = buf[i : i + 4]
            i += 4
        elif wtype == 1:
            val = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


def _parse_events_fallback(path):
    """[(plane_name, line_name, op_name, duration_ps, occurrences)] without TF."""
    with open(path, "rb") as f:
        space = f.read()
    rows = []
    for fnum, _, plane in _fields(space):
        if fnum != 1:  # XSpace.planes
            continue
        plane_name, lines, metadata = "", [], {}
        for pf, _, pv in _fields(plane):
            if pf == 2:
                plane_name = pv.decode("utf-8", "replace")
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata> (5 is stat_metadata)
                mid, mname, mdisp = 0, "", ""
                for ef, _, ev in _fields(pv):
                    if ef == 1:
                        mid = ev
                    elif ef == 2:  # value: XEventMetadata
                        for mf, _, mv in _fields(ev):
                            if mf == 1:
                                mid = mv
                            elif mf == 2:
                                mname = mv.decode("utf-8", "replace")
                            elif mf == 3:  # display_name: HLO op text
                                mdisp = mv.decode("utf-8", "replace")
                metadata[mid] = mdisp or mname
        for line in lines:
            line_name = ""
            per_op = collections.Counter()
            per_op_n = collections.Counter()
            for lf, _, lv in _fields(line):
                if lf == 2:
                    line_name = lv.decode("utf-8", "replace")
                elif lf == 4:  # XLine.events
                    mid = dur = 0
                    occ = 1
                    for ef, wt, ev in _fields(lv):
                        if ef == 1:
                            mid = ev
                        elif ef == 3:
                            dur = ev
                        elif ef == 5:
                            occ = ev  # num_occurrences (aggregated planes)
                    per_op[mid] += dur * max(occ, 1) if occ > 1 else dur
                    per_op_n[mid] += max(occ, 1)
            for mid, dur in per_op.items():
                rows.append((plane_name, line_name, metadata.get(mid, str(mid)), dur, per_op_n[mid]))
    return rows


def _parse_events_tf(path):
    from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    rows = []
    for plane in space.planes:
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            per_op = collections.Counter()
            per_op_n = collections.Counter()
            for ev in line.events:
                occ = getattr(ev, "num_occurrences", 0)
                per_op[ev.metadata_id] += ev.duration_ps * max(occ, 1) if occ > 1 else ev.duration_ps
                per_op_n[ev.metadata_id] += max(occ, 1)
            for mid, dur in per_op.items():
                rows.append((plane.name, line.name, meta.get(mid, str(mid)), dur, per_op_n[mid]))
    return rows


def load_rows(path):
    try:
        return _parse_events_tf(path)
    except Exception:
        return _parse_events_fallback(path)


def find_xplane(root):
    if os.path.isfile(root):
        return root
    hits = glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    if not hits:
        sys.exit(f"no *.xplane.pb under {root}")
    return max(hits, key=os.path.getmtime)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="xplane.pb file or trace directory")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default="XLA Ops", help="substring of the line name to aggregate")
    ap.add_argument("--plane", default="TPU", help="substring of the device plane name")
    ap.add_argument("--list", action="store_true", help="list plane/line names and exit")
    args = ap.parse_args()

    path = find_xplane(args.path)
    rows = load_rows(path)
    if args.list:
        seen = {}
        for plane, line, _, dur, _ in rows:
            key = (plane, line)
            seen[key] = seen.get(key, 0) + dur
        for (plane, line), dur in sorted(seen.items(), key=lambda kv: -kv[1]):
            print(f"{dur / 1e9:10.3f} ms  {plane!r} :: {line!r}")
        return

    agg = collections.Counter()
    cnt = collections.Counter()
    for plane, line, name, dur, n in rows:
        if args.plane in plane and args.line in line:
            agg[name] += dur
            cnt[name] += n
    total = sum(agg.values())
    if not total:
        sys.exit(f"no events matched plane~{args.plane!r} line~{args.line!r}; try --list")
    print(f"# {path}")
    print(f"# plane~{args.plane!r} line~{args.line!r}: {total / 1e9:.3f} ms busy, {len(agg)} ops")
    print(f"{'ms':>10} {'%':>6} {'calls':>8}  op")
    for name, dur in agg.most_common(args.top):
        print(f"{dur / 1e9:10.3f} {100.0 * dur / total:6.2f} {cnt[name]:8d}  {name[:140]}")


if __name__ == "__main__":
    main()
