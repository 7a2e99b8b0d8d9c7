"""Parse a JAX xplane trace and print top ops by total device time.

Usage: python scripts/parse_trace.py <xplane.pb path or trace dir> [top_n]
"""

import collections
import glob
import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main(path, top_n=40):
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                          recursive=True)
        path = max(cands, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        emeta = plane.event_metadata
        line_totals = collections.Counter()
        per_line = {}
        for line in plane.lines:
            totals = collections.Counter()
            counts = collections.Counter()
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                totals[name] += dur
                counts[name] += 1
                line_totals[line.name] += dur
            per_line[line.name] = (totals, counts)
        print(f"== plane {plane.name}")
        for ln, t in line_totals.most_common(8):
            print(f"  line {ln:<40s} {t:10.2f} ms total")
        for ln in ("XLA Ops",):
            if ln not in per_line:
                continue
            totals, counts = per_line[ln]
            # also bucket by op prefix (fusion kind)
            buckets = collections.Counter()
            for name, t in totals.items():
                key = name.split(".")[0].split("(")[0]
                buckets[key] += t
            print(f"-- {ln}: top buckets")
            for name, t in buckets.most_common(20):
                print(f"  {t:9.2f} ms  {name[:110]}")
            print(f"-- {ln}: top ops")
            for name, t in totals.most_common(top_n):
                print(f"  {t:9.2f} ms  x{counts[name]:<5d} {name[:200]}")
            print(f"-- {ln}: top plain %fusion ops")
            shown = 0
            for name, t in totals.most_common(10000):
                if not name.startswith("%fusion"):
                    continue
                print(f"  {t:9.2f} ms  x{counts[name]:<5d} {name[:220]}")
                shown += 1
                if shown >= top_n:
                    break


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
