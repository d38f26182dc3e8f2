#!/usr/bin/env python
"""Parse a jax.profiler xplane trace into a per-op-category device-time
report: where does a step's wall time actually go on the TPU?

Usage:
  python tools/trace_report.py <trace_dir> [--top N]

Reports, per device plane: busy time by op-name bucket, total busy span,
and the idle fraction (gaps inside the traced span).
"""
import sys
import re
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def find_xplanes(trace_dir):
    return sorted(Path(trace_dir).rglob("*.xplane.pb"))


def bucket(name: str) -> str:
    # bucket on the instruction NAME PREFIX only — the metadata string is
    # the full HLO line, and operand names would otherwise pollute matching
    m = re.match(r"%?([\w\-\.]+)", name)
    n = (m.group(1) if m else name).lower()
    if ("all-reduce" in n or "all-gather" in n or "reduce-scatter" in n
            or "all-to-all" in n or "collective" in n or "permute" in n):
        return "collective"
    if "convolution" in n or ("conv" in n and "convert" not in n):
        return "conv (MXU)"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "dot (MXU)"
    if "dynamic-update-slice" in n or "dynamic-slice" in n:
        return "dyn-slice"
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    if "reduce" in n:
        return "reduce (norms)"
    if "gather" in n or "scatter" in n:
        return "gather/scatter"
    if "fusion" in n or "fused" in n:
        return "elementwise fusion"
    if "rng" in n or "bitcast" in n:
        return "rng/bitcast"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "host transfer"
    return "other"


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=12)
    ns = ap.parse_args()
    trace_dir, top = ns.trace_dir, ns.top
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # proto location moved across TF versions
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = find_xplanes(trace_dir)
    if not paths:
        print(f"no xplane.pb under {trace_dir}")
        return 1
    if len(paths) > 1:
        print(f"note: {len(paths)} xplane files found, parsing the newest: "
              f"{paths[-1].name} (others: {[p.name for p in paths[:-1]]})")
    space = xplane_pb2.XSpace()
    space.ParseFromString(paths[-1].read_bytes())

    reported = 0
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        by_bucket = defaultdict(float)
        by_name = defaultdict(float)
        span_lo, span_hi = None, 0
        # merge busy intervals across lines to compute true busy/idle
        intervals = []
        for line in plane.lines:
            lname = line.name.lower()
            # 'XLA Ops' is the serialized device timeline (the critical
            # path); 'XLA Modules' is a container and 'Async XLA Ops' holds
            # overlapped DMA spans — both double-count.
            if lname != "xla ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                t0 = (line.timestamp_ns * 1000 + ev.offset_ps) / 1e9
                intervals.append((t0, t0 + dur))
                by_bucket[bucket(name)] += dur
                key = re.sub(r"[.\d]+$", "", name)
                by_name[key] += dur
                span_lo = t0 if span_lo is None else min(span_lo, t0)
                span_hi = max(span_hi, t0 + dur)
        if not intervals:
            continue
        intervals.sort()
        busy, cur_lo, cur_hi = 0.0, intervals[0][0], intervals[0][1]
        for lo, hi in intervals[1:]:
            if lo > cur_hi:
                busy += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        busy += cur_hi - cur_lo
        span = span_hi - span_lo
        print(f"\n=== {plane.name} ===")
        print(f"traced span {span:.1f} ms, busy {busy:.1f} ms, "
              f"idle {span - busy:.1f} ms ({100 * (span - busy) / max(span, 1e-9):.0f}%)")
        print("-- by bucket (sum of event durations; overlapping lines may double-count) --")
        for k, v in sorted(by_bucket.items(), key=lambda kv: -kv[1]):
            print(f"  {k:24s} {v:9.2f} ms")
        print(f"-- top {top} ops --")
        for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {v:9.2f} ms  {k[:90]}")
        reported += 1
    if not reported:
        names = [p.name for p in space.planes]
        print(f"no device plane with an 'XLA Ops' line found; planes: {names}")
        print("(CPU-backend traces carry host lines only — run on the TPU "
              "to get a device timeline)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
