"""Parse a JAX/XLA profiler trace (xplane.pb) into per-op device timings.

The tensorboard_plugin_profile converter bundled in this image is
version-skewed against its TensorFlow (missing ``xspace_to_tools_data``
native symbol), so we read the XSpace proto directly with TF's tsl
``xplane_pb2`` schema: device plane -> "XLA Ops" line -> events
aggregated by metadata name. Events on one XLine do not overlap, so
summing durations per line gives self-time and the line total gives
device busy time.

Run standalone (imports TensorFlow -- heavy; needs pure-python protobuf
because the plugin's generated protos predate protobuf 4):

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/xplane_stats.py <trace_dir> [--top 15] [--json]

``profile_trace.py`` invokes this in a subprocess with that env set so
the TPU-holding parent process never imports TensorFlow.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def newest_xplane(trace_dir: str) -> str | None:
    planes = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime)
    return planes[-1] if planes else None


_CATEGORY_RE = re.compile(r"^%?([a-zA-Z][a-zA-Z0-9_-]*?)[._-]?\d*$")


def categorize(name: str) -> str:
    """HLO op name -> category ('fusion.123' -> 'fusion')."""
    m = _CATEGORY_RE.match(name.split("/")[-1])
    return m.group(1) if m else name


def op_stats(xplane_path: str) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        space.ParseFromString(f.read())

    out = {"xplane": xplane_path, "planes": [], "devices": []}
    has_device_plane = any(p.name.startswith("/device:")
                           for p in space.planes)
    for plane in space.planes:
        out["planes"].append(plane.name)
        if has_device_plane:
            if not plane.name.startswith("/device:"):
                continue
        elif plane.name != "/host:CPU":
            # CPU-backend traces have no device plane; XLA:CPU ops land
            # on /host:CPU's PjRt-client thread lines (not 'python')
            continue
        meta = {m.id: (m.display_name or m.name)
                for m in plane.event_metadata.values()}
        lines = {}
        for line in plane.lines:
            per_op: dict[str, float] = {}
            total_ps = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] = per_op.get(name, 0.0) + ev.duration_ps
                total_ps += ev.duration_ps
            lines[line.name or str(line.id)] = {
                "busy_us": total_ps / 1e6,
                "n_events": len(line.events),
                "per_op_us": {k: v / 1e6 for k, v in per_op.items()},
            }
        # the per-HLO-op line; axon/TPU traces name it "XLA Ops",
        # older CPU traces "XLA Op". Fallback: busiest non-python line.
        op_line = None
        for key in lines:
            if key.lower().startswith("xla op"):
                op_line = key
                break
        if op_line is None:
            cands = [k for k in lines if k != "python"] or list(lines)
            if cands:
                op_line = max(cands, key=lambda k: lines[k]["n_events"])
        out["devices"].append({
            "plane": plane.name,
            "lines": {k: {kk: vv for kk, vv in v.items()
                          if kk != "per_op_us"}
                      for k, v in lines.items()},
            "op_line": op_line,
            "busy_us": lines[op_line]["busy_us"] if op_line else 0.0,
            "per_op_us": lines[op_line]["per_op_us"] if op_line else {},
        })
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--json", action="store_true",
                   help="print one machine-readable JSON line only")
    args = p.parse_args(argv)

    path = (args.trace_dir if args.trace_dir.endswith(".xplane.pb")
            else newest_xplane(args.trace_dir))
    if path is None:
        print(json.dumps({"error": f"no xplane.pb under {args.trace_dir}"}))
        return 1
    stats = op_stats(path)
    devs = [d for d in stats["devices"] if d["per_op_us"]]
    if not devs:
        print(json.dumps({"error": "no device plane with op events",
                          "planes": stats["planes"]}))
        return 1
    dev = max(devs, key=lambda d: d["busy_us"])
    ops = sorted(dev["per_op_us"].items(), key=lambda kv: -kv[1])
    cats: dict[str, float] = {}
    for name, us in ops:
        c = categorize(name)
        cats[c] = cats.get(c, 0.0) + us
    top_cats = sorted(cats.items(), key=lambda kv: -kv[1])

    result = {
        "xplane": path,
        "plane": dev["plane"],
        "device_busy_us": dev["busy_us"],
        "top_ops": [{"name": n, "us": round(u, 1),
                     "pct": round(100 * u / dev["busy_us"], 1)}
                    for n, u in ops[:args.top]],
        "categories": [{"name": n, "us": round(u, 1),
                        "pct": round(100 * u / dev["busy_us"], 1)}
                       for n, u in top_cats[:args.top]],
    }
    if args.json:
        print(json.dumps(result))
        return 0
    print(f"device plane: {dev['plane']}  "
          f"(op line '{dev['op_line']}', busy {dev['busy_us'] / 1e3:.2f} ms)")
    print(f"{'HLO op':<52} {'ms':>9} {'%':>6}")
    for r in result["top_ops"]:
        print(f"{r['name'][:52]:<52} {r['us'] / 1e3:9.3f} {r['pct']:5.1f}%")
    print("\nby category:")
    for r in result["categories"]:
        print(f"{r['name'][:52]:<52} {r['us'] / 1e3:9.3f} {r['pct']:5.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
