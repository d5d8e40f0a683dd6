"""Timeline analysis of an already-captured xplane trace.

Usage:  python tools/profile_timeline.py [trace_dir]

Unlike profile_encoder.py's per-op duration sums (misleading for async
copy-start/done pairs, which span their whole in-flight window), this
computes, per device line: total covered time, gaps, and the top ops by
*exclusive* time (event duration minus time covered by shorter
concurrent events on the same line), i.e. an estimate of the critical
path.
"""

import glob
import sys
from collections import defaultdict


def main() -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flacx_trace"
    path = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        print(f"== {plane.name} ==")
        for line in plane.lines:
            evs = [(ev.offset_ps, ev.offset_ps + ev.duration_ps,
                    meta.get(ev.metadata_id, str(ev.metadata_id)))
                   for ev in line.events]
            if not evs:
                continue
            evs.sort()
            span = evs[-1][1] - evs[0][0]
            # merged coverage + busy time
            busy, gaps = 0, []
            cur_s, cur_e = evs[0][0], evs[0][1]
            for s, e, _ in evs[1:]:
                if s > cur_e:
                    gaps.append((cur_e, s - cur_e))
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            busy += cur_e - cur_s
            print(f"-- line '{line.name}': {len(evs)} events, span "
                  f"{span / 1e9:.3f} ms, busy {busy / 1e9:.3f} ms, idle "
                  f"{(span - busy) / 1e9:.3f} ms")
            gaps.sort(key=lambda g: -g[1])
            for off, dur in gaps[:5]:
                if dur < 20e6:
                    break
                print(f"     gap {dur / 1e9:7.3f} ms at +"
                      f"{(off - evs[0][0]) / 1e9:.3f} ms")
            # exclusive time: sweep; charge each instant to the event
            # with the LATEST start among those covering it (innermost)
            pts = []
            for i, (s, e, n) in enumerate(evs):
                pts.append((s, 0, i))
                pts.append((e, 1, i))
            pts.sort()
            import heapq
            excl = defaultdict(float)
            active: list = []       # heap of (-start, idx)
            closed = set()
            last_t = None
            for t, kind, i in pts:
                if last_t is not None and t > last_t and active:
                    while active and active[0][1] in closed:
                        heapq.heappop(active)
                    if active:
                        excl[evs[active[0][1]][2]] += t - last_t
                last_t = t
                if kind == 0:
                    heapq.heappush(active, (-evs[i][0], i))
                else:
                    closed.add(i)
            top = sorted(excl.items(), key=lambda kv: -kv[1])[:20]
            for name, ps in top:
                print(f"   {ps / 1e9:9.3f}  {name[:90]}")


if __name__ == "__main__":
    main()
