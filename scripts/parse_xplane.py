"""Minimal XSpace wire-format parser: aggregate device event durations.

This image ships no xplane_pb2 (tensorboard_plugin_profile 2.13 and
xprof 2.21 both lack it), so jax.profiler captures are decoded straight
from the protobuf wire format: XSpace.planes(1) -> XPlane{name=2,
lines=3, event_metadata=4{key=1, XEventMetadata{name=2}}} ->
XLine.events(4) -> XEvent{metadata_id=1, duration_ps=3}.

Usage: python scripts/parse_xplane.py <capture.xplane.pb> [nframes]
"""
import sys
from collections import defaultdict


def varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    i = 0
    n = len(buf)
    while i < n:
        tag, i = varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = varint(buf, i)
            yield fnum, v
        elif wt == 2:
            ln, i = varint(buf, i)
            yield fnum, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fnum, buf[i:i + 4]
            i += 4
        elif wt == 1:
            yield fnum, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wt {wt}")


def parse(path, nframes=8, top=30):
    buf = open(path, "rb").read()
    for fnum, val in fields(buf):
        if fnum != 1:  # XPlane
            continue
        name = ""
        meta = {}
        lines = []
        for f2, v2 in fields(val):
            if f2 == 2:
                name = v2.decode(errors="replace")
            elif f2 == 4:  # event_metadata map entry
                k = None
                mname = ""
                for f3, v3 in fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:  # XEventMetadata
                        for f4, v4 in fields(v3):
                            if f4 == 2:
                                mname = v4.decode(errors="replace")
                meta[k] = mname
            elif f2 == 3:
                lines.append(v2)
        if "TPU" not in name and "device" not in name.lower():
            continue
        agg = defaultdict(lambda: [0.0, 0])
        for ln in lines:
            for f3, v3 in fields(ln):
                if f3 == 4:  # XEvent
                    mid = dur = 0
                    for f4, v4 in fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 3:
                            dur = v4
                    a = agg[meta.get(mid, str(mid))]
                    a[0] += dur / 1e6  # ps -> us
                    a[1] += 1
        total = sum(a[0] for a in agg.values())
        print(f"== plane {name}: total {total/1e3/nframes:.2f} ms/frame")
        for nm, (us, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
            print(f"  {us/1e3/nframes:8.3f} ms  x{cnt:4d}  {nm[:110]}")


if __name__ == "__main__":
    parse(sys.argv[1], nframes=int(sys.argv[2]) if len(sys.argv) > 2
          else 8)
