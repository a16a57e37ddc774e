"""Summarise a jax.profiler trace (xplane.pb) from the command line.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xprof_summary.py <trace_dir_or_xplane.pb> [--steps N] [--top K]

Prints per-HLO-category time (with achieved FLOP/s and HBM bandwidth from
XLA's own cost stats) and the top individual ops — the quick roofline view
used to find the bandwidth-bound elementwise chains that motivated the
fused kernels in ``ops/fused_qkv.py`` (see CLAUDE.md perf notes).

The 'while' category double-counts its body (the op event spans the loop);
read it as scan overhead context, not additive time.
"""

import argparse
import collections
import glob
import os
import sys


def find_xplane(path: str) -> str:
    if path.endswith(".pb"):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    )
    if not hits:
        sys.exit(f"no *.xplane.pb under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir or xplane.pb file")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of profiled steps to divide by")
    ap.add_argument("--top", type=int, default=20, help="top-K individual ops")
    ap.add_argument("--category", default=None,
                    help="only list ops of this hlo_category")
    args = ap.parse_args()

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        sys.exit("needs tensorflow's xplane proto "
                 "(run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python)")

    xs = xplane_pb2.XSpace()
    with open(find_xplane(args.trace), "rb") as fh:
        xs.ParseFromString(fh.read())
    planes = [p for p in xs.planes if "TPU" in p.name or "GPU" in p.name]
    if not planes:
        sys.exit(f"no device plane; planes: {[p.name for p in xs.planes]}")
    plane = planes[0]
    emeta = plane.event_metadata
    smeta = plane.stat_metadata
    op_lines = [l for l in plane.lines if l.name == "XLA Ops"]
    if not op_lines:
        sys.exit(f"no 'XLA Ops' line; lines: {[l.name for l in plane.lines]}")

    def md_stat(md, want):
        for s in md.stats:
            if smeta[s.metadata_id].name == want:
                return s.str_value or s.int64_value or s.uint64_value
        return None

    n = args.steps
    cat_t = collections.Counter()
    cat_f = collections.Counter()
    cat_b = collections.Counter()
    op_t = collections.Counter()
    op_cat = {}
    for e in op_lines[0].events:
        md = emeta[e.metadata_id]
        c = md_stat(md, "hlo_category") or "?"
        cat_t[c] += e.duration_ps
        cat_f[c] += md_stat(md, "flops") or 0
        cat_b[c] += md_stat(md, "bytes_accessed") or 0
        if args.category in (None, c):
            op_t[md.name[:100]] += e.duration_ps
            op_cat[md.name[:100]] = c

    total = sum(v for k, v in cat_t.items() if k != "while")
    print(f"device busy (excl. while wrapper): {total/1e9/n:.1f} ms/step over {n} step(s)")
    print(f"{'ms/step':>9} {'%':>6} {'TFLOP/s':>8} {'GB/s':>7}  category")
    for k, v in cat_t.most_common():
        s = v / 1e12
        pct = 100 * v / total if k != "while" else float("nan")
        print(f"{v/1e9/n:9.2f} {pct:6.1f} {cat_f[k]/s/1e12 if s else 0:8.1f} "
              f"{cat_b[k]/s/1e9 if s else 0:7.0f}  {k}")
    print(f"\ntop {args.top} ops" + (f" [{args.category}]" if args.category else ""))
    for k, v in op_t.most_common(args.top):
        print(f"{v/1e9/n:8.2f} ms/step [{op_cat[k][:14]:>14}] {k}")


if __name__ == "__main__":
    main()
