"""Standalone xplane.pb analyzer: top TPU ops by self-time.

The tensorboard_plugin_profile converter in this image is broken twice over
(pre-gencode protos + a _pywrap_profiler wrapper mismatch), so this parses
the raw XSpace proto directly via tensorflow's bundled xplane_pb2 and
aggregates XLA-op event durations from the TPU device plane.

Usage:
  python scripts/xplane_report.py /tmp/pasta_trace_b8 [--top 40] [--by source|op|category]
"""

import argparse
import collections
import glob
import gzip
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def device_planes(xspace):
    return [p for p in xspace.planes
            if "TPU" in p.name and "device" in p.name.lower()
            or p.name.startswith("/device:TPU")]


def analyze(xspace, by="op", top=40, name_filter=None):
    planes = device_planes(xspace)
    if not planes:
        print("planes available:", [p.name for p in xspace.planes])
        raise SystemExit("no TPU device plane found")

    total_by_key = collections.Counter()
    count_by_key = collections.Counter()
    grand_total = 0
    for plane in planes:
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        for line in plane.lines:
            # XLA Ops line carries per-op events; steps/XLA Modules lines
            # double-count the same wall time.
            if line.name not in ("XLA Ops",):
                continue
            emeta = plane.event_metadata
            for ev in line.events:
                md = emeta.get(ev.metadata_id)
                name = md.name if md else f"id{ev.metadata_id}"
                dur = ev.duration_ps
                grand_total += dur
                stats = {}
                for st in list(ev.stats) + (list(md.stats) if md else []):
                    sname = stat_names.get(st.metadata_id, "")
                    val = (st.str_value or st.uint64_value or st.int64_value
                           or st.double_value or
                           (st.ref_value and stat_names.get(st.ref_value, "")))
                    stats[sname] = val
                if by == "op":
                    key = name
                elif by == "category":
                    key = str(stats.get("hlo_category", "?"))
                elif by == "source":
                    key = str(stats.get("source", "") or
                              stats.get("source_info", "") or "?")
                elif by == "scope":
                    # group by the jit scope prefix of the hlo op name
                    tf_op = str(stats.get("tf_op", "") or name)
                    parts = tf_op.split("/")
                    key = "/".join(parts[:3]) if len(parts) > 2 else tf_op
                else:
                    key = name
                if name_filter and name_filter not in (name + str(stats)):
                    continue
                total_by_key[key] += dur
                count_by_key[key] += 1

    print(f"planes: {[p.name for p in planes]}")
    print(f"total device op time: {grand_total / 1e12 * 1e3:.1f} ms "
          f"(all traced steps combined)")
    print(f"{'ms':>9} {'%':>6} {'count':>7}  key")
    for key, dur in total_by_key.most_common(top):
        print(f"{dur / 1e9:9.2f} {dur / grand_total * 100:6.2f} "
              f"{count_by_key[key]:7d}  {key[:160]}")
    return total_by_key, grand_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", default="op",
                    choices=["op", "category", "source", "scope"])
    ap.add_argument("--filter", default=None)
    args = ap.parse_args()
    xspace = load_xspace(args.trace_dir)
    analyze(xspace, by=args.by, top=args.top, name_filter=args.filter)


if __name__ == "__main__":
    main()
