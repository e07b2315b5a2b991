#!/usr/bin/env python
"""Device-trace profiler: per-HLO-op self times for a model's eval forward.

Runs a few frames under `jax.profiler.trace`, hand-parses the xplane proto
(`tensorflow.tsl.profiler.protobuf.xplane_pb2` — the tensorboard-plugin-
profile converters are version-broken in this environment, PERF.md), and
prints the top-K ops by total self time plus a while-loop / outside split.

Usage:
  python tools/device_trace.py [camliraft|camliraft_l|raft] [n_frames] [top_k]
"""

import glob
import sys
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "camliraft"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from measure_model import build, sync

    out_key = "flow_2d" if model_name in ("camliraft", "raft") else "flow_3d"
    forward, variables, inputs = build(model_name)
    sync(forward(variables, inputs), out_key)  # compile + warm
    sync(forward(variables, inputs), out_key)

    trace_dir = "/tmp/device_trace"
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(n_frames):
            out = forward(variables, inputs)
        sync(out, out_key)

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    # device plane: per-op events with self time
    totals = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                self_dur = dur
                for st in ev.stats:
                    sname = stat_meta[st.metadata_id].name
                    if sname == "self_duration_ps":
                        self_dur = st.uint64_value / 1e9
                totals[name] += self_dur
    if not totals:
        print("no device events found; planes:",
              [p.name for p in space.planes])
        return

    items = sorted(totals.items(), key=lambda kv: -kv[1])
    grand = sum(totals.values())
    in_loop = sum(v for k, v in totals.items() if "while" in k)
    print(f"total device self-time {grand/n_frames:.2f} ms/frame over "
          f"{n_frames} frames; while-loop ops {in_loop/n_frames:.2f} ms/frame")
    print(f"{'ms/frame':>9}  {'%':>5}  op")
    for name, ms in items[:top_k]:
        print(f"{ms/n_frames:9.3f}  {100*ms/grand:5.1f}  {name[:140]}")


if __name__ == "__main__":
    main()
