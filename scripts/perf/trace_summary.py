"""Aggregate per-op device time from a jax.profiler trace directory.

Usage: python scripts/perf/trace_summary.py /tmp/jaxtrace_cloud [top_n]

Parses the .xplane.pb the profiler writes (via the tensorboard profile
plugin protos baked into this image), finds the TPU device plane, and
prints device-time totals grouped by (a) HLO op category and (b) the
fusion/op name — the same XLA-Ops rollup the round-2 optimization log was
built from, scripted instead of hand-read.
"""
import collections
import glob
import gzip
import os
import sys


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    pats = [os.path.join(trace_dir, "**", "*.xplane.pb"),
            os.path.join(trace_dir, "**", "*.xplane.pb.gz"),
            os.path.join(trace_dir, "*.xplane.pb"),
            os.path.join(trace_dir, "*.xplane.pb.gz")]
    paths = sorted(set(sum((glob.glob(p, recursive=True) for p in pats), [])),
                   key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    path = paths[-1]
    raw = open(path, "rb").read()
    if path.endswith(".gz"):
        raw = gzip.decompress(raw)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(raw)
    return xs, path


def device_planes(xs):
    # TPU device planes are named like "/device:TPU:0"; the axon tunnel
    # may surface them under a custom prefix, so match loosely.
    out = [p for p in xs.planes
           if "TPU" in p.name.upper() and "HOST" not in p.name.upper()]
    return out or [p for p in xs.planes if "device:" in p.name]


def summarize(plane):
    by_cat = collections.Counter()
    by_name = collections.Counter()
    occ = collections.Counter()
    ev_meta = {m.id: m for m in plane.event_metadata.values()} \
        if hasattr(plane.event_metadata, "values") else dict(plane.event_metadata)
    stat_meta = dict(plane.stat_metadata)
    for line in plane.lines:
        lname = line.name.lower()
        # XLA op/fusion timelines only; skip step/annotation lines
        if "xla op" not in lname and "xla_op" not in lname \
                and "tensorflow op" not in lname and "ops" != lname.strip():
            continue
        for ev in line.events:
            md = ev_meta.get(ev.metadata_id)
            name = md.name if md else str(ev.metadata_id)
            dur = ev.duration_ps / 1e9  # ps -> ms
            cat = "?"
            for st in list(ev.stats) + (list(md.stats) if md else []):
                sm = stat_meta.get(st.metadata_id)
                if sm and sm.name in ("hlo_category", "category"):
                    cat = st.str_value or st.ref_value
                    if isinstance(cat, int):
                        cat = stat_meta.get(cat).name if cat in stat_meta else str(cat)
            by_cat[cat] += dur
            by_name[name] += dur
            occ[name] += 1
    return by_cat, by_name, occ


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_cloud"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xs, path = load_xspace(trace_dir)
    print(f"# {path}")
    planes = device_planes(xs)
    if not planes:
        print("planes found:", [p.name for p in xs.planes])
        raise SystemExit("no device plane")
    for plane in planes:
        by_cat, by_name, occ = summarize(plane)
        total = sum(by_cat.values())
        if total == 0:
            continue
        print(f"\n== plane {plane.name}: {total:.1f} ms device op time ==")
        print("-- by HLO category --")
        for cat, ms in by_cat.most_common():
            print(f"{ms:9.2f} ms  {100*ms/total:5.1f}%  {cat}")
        print(f"-- top {top_n} ops --")
        for name, ms in by_name.most_common(top_n):
            print(f"{ms:9.2f} ms  {100*ms/total:5.1f}%  x{occ[name]:<5d} "
                  f"{name[:110]}")


if __name__ == "__main__":
    main()
