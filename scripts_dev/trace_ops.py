"""Dev: op-level attribution from a jax.profiler trace (.xplane.pb).

Parses the XSpace proto directly (the tensorboard profile plugin's converter
is version-broken against the installed TF) and aggregates device-plane op
durations by name. Events nested inside other events (XLA op -> sub-ops)
appear on separate lines; we aggregate per line and report the busiest line
(usually "XLA Ops") so parents don't double-count children.

Usage: python scripts_dev/trace_ops.py [trace_dir] [--top 40]
"""

import argparse
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/jaxtrace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default=None,
                    help="restrict to one line name (default: busiest)")
    args = ap.parse_args()

    paths = sorted(glob.glob(
        f"{args.trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {args.trace_dir}")
    path = paths[-1]
    print(f"# {path}")
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        print(f"\n== plane: {plane.name} ==")
        metas = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            total_by_name = collections.Counter()
            count_by_name = collections.Counter()
            span = [float("inf"), 0.0]
            for ev in line.events:
                name = metas.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                total_by_name[name] += dur
                count_by_name[name] += 1
                t0 = ev.offset_ps / 1e9
                span[0] = min(span[0], t0)
                span[1] = max(span[1], t0 + dur)
            if not total_by_name:
                continue
            busy = sum(total_by_name.values())
            if args.line and line.name != args.line:
                continue
            print(f"\n-- line '{line.name}': {len(line.events)} events, "
                  f"busy {busy:.1f} ms, span {span[1]-span[0]:.1f} ms --")
            if busy < 1.0:
                continue
            for name, tot in total_by_name.most_common(args.top):
                print(f"{tot:10.2f} ms  x{count_by_name[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
