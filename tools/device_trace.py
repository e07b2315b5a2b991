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

    # device plane: per-op events. We bucket ops by whether their time range
    # lies inside a while-loop event's range (op names inside the loop body
    # don't mention "while", so name matching cannot attribute them).
    events = []  # (name, start_ps, dur_ps)
    module_ms = 0.0
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                if name.startswith("jit_"):
                    module_ms += ev.duration_ps / 1e9
                    continue
                events.append((name, ev.offset_ps, ev.duration_ps))
    if not events:
        print("no device events found; planes:",
              [p.name for p in space.planes])
        return

    loop_ranges = [
        (s, s + d) for n, s, d in events if n.startswith("%while")
    ]

    def in_loop(start, dur):
        return any(s <= start and start + dur <= e for s, e in loop_ranges)

    totals = defaultdict(float)
    loop_totals = defaultdict(float)
    while_ms = sum((e - s) for s, e in loop_ranges) / 1e9
    attributed_loop = 0.0
    attributed_out = 0.0
    for name, start, dur in events:
        if name.startswith("%while"):
            continue
        ms = dur / 1e9
        totals[name] += ms
        if in_loop(start, dur):
            loop_totals[name] += ms
            attributed_loop += ms
        else:
            attributed_out += ms

    items = sorted(totals.items(), key=lambda kv: -kv[1])
    print(
        f"module total {module_ms/n_frames:.2f} ms/frame over {n_frames} "
        f"frames | while {while_ms/n_frames:.2f} (attributed "
        f"{attributed_loop/n_frames:.2f}) | outside attributed "
        f"{attributed_out/n_frames:.2f} | outside unattributed "
        f"{(module_ms - while_ms - attributed_out)/n_frames:.2f}"
    )
    print(f"{'ms/frame':>9}  {'loop':>5}  op")
    for name, ms in items[:top_k]:
        lp = loop_totals.get(name, 0.0)
        print(f"{ms/n_frames:9.3f}  {lp/ms if ms else 0:5.2f}  {name[:140]}")


if __name__ == "__main__":
    main()
