#!/usr/bin/env python
"""Device-trace profiler: per-HLO-op self times for a model's eval forward.

Runs a few frames under `jax.profiler.trace`, hand-parses the xplane proto
(`tensorflow.tsl.profiler.protobuf.xplane_pb2` — the tensorboard-plugin-
profile converters are version-broken in this environment, PERF.md), and
prints the top-K ops by total self time plus a while-loop / outside split.

Usage:
  python tools/device_trace.py [camliraft|camliraft_l|raft] [n_frames] [top_k]
  python tools/device_trace.py gaps [model] [n_frames] [top_k]
  python tools/device_trace.py train [model] [n_steps] [top_k]  # fwd+bwd+opt

`gaps` mode reconstructs the per-line timeline INSIDE the while-loop window
and prints the largest stalls on the busiest (compute) line together with
the ops bracketing each stall and any events concurrently active on the
other lines (DMA queues) — self-time top lists say where time is spent,
this says where time is LOST.
"""

import glob
import sys
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

sys.path.insert(0, ".")


def collect_events(model_name, n_frames):
    """Trace n_frames forwards; return (events, line_events, module_ms).

    events: flat [(name, start_ps, dur_ps)]. line_events: {line_name: same},
    preserving which trace line (compute core vs DMA queues) each op ran on.
    """
    from measure_model import build, sync

    out_key = "flow_2d" if model_name in ("camliraft", "raft") else "flow_3d"
    forward, variables, inputs = build(model_name)
    sync(forward(variables, inputs), out_key)  # compile + warm
    sync(forward(variables, inputs), out_key)

    def run():
        return forward(variables, inputs)

    return _collect_traced(run, lambda out: sync(out, out_key), n_frames)


def collect_events_train(model_name, n_steps):
    """Trace n_steps TRAINING steps (fwd+bwd+adamw at the PERF.md protocol:
    bs=2, 640x384, n_iters_train=10) — same return contract as
    `collect_events`. State is threaded through the traced steps, so the
    trace covers the donation-free steady state."""
    from measure_model import build_train

    train_step, state, batch, _ = build_train(model_name)
    box = [state]

    def run():
        new_state, loss, _, _ = train_step(box[0], batch)
        box[0] = new_state
        return loss

    float(run())  # compile + warm
    float(run())
    return _collect_traced(run, float, n_steps)


def _collect_traced(run, sync_fn, n_frames):
    trace_dir = "/tmp/device_trace"
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(n_frames):
            out = run()
        sync_fn(out)

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        # Large traces (e.g. the fwd+bwd train step) come back WITHOUT an
        # xplane.pb on this platform — only the Chrome-format
        # vm.trace.json.gz is written. Same events, different container.
        jpaths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
        assert jpaths, f"neither xplane.pb nor trace.json.gz under {trace_dir}"
        return _parse_chrome_trace(sorted(jpaths)[-1])
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    events = []  # (name, start_ps, dur_ps)
    line_events = defaultdict(list)
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
                line_events[line.name or f"line{line.id}"].append(
                    (name, ev.offset_ps, ev.duration_ps)
                )
    return events, line_events, module_ms


def _parse_chrome_trace(path):
    """(events, line_events, module_ms) from a vm.trace.json.gz.

    Device events ride the process named '/device:TPU:*'; thread names map
    to the xplane line names ('XLA Ops' = sync compute, 'XLA Modules' =
    whole-module spans). Times are us in the JSON — converted to ps to keep
    the xplane contract.
    """
    import gzip
    import json

    with gzip.open(path) as f:
        data = json.load(f)
    raw = data["traceEvents"]
    device_pids = set()
    tid_names = {}
    for e in raw:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and "/device:" in e["args"].get(
            "name", ""
        ):
            device_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"]["name"]

    events = []
    line_events = defaultdict(list)
    module_ms = 0.0
    for e in raw:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e["name"]
        start_ps = e["ts"] * 1e6
        dur_ps = e["dur"] * 1e6
        line = tid_names.get((e["pid"], e["tid"]), f"tid{e['tid']}")
        if line == "XLA Modules" or name.startswith("jit_"):
            module_ms += dur_ps / 1e9
            continue
        if line == "Steps":
            continue
        events.append((name, start_ps, dur_ps))
        line_events[line].append((name, start_ps, dur_ps))
    return events, line_events, module_ms


def cmd_gaps(model_name="camliraft", n_frames=2, top_k=30):
    """Stall analysis of ONE while-loop window: gaps on the compute line."""
    events, line_events, module_ms = collect_events(model_name, n_frames)
    loops = sorted(
        ((s, s + d) for n, s, d in events if n.startswith("%while")),
        key=lambda r: r[1] - r[0],
    )
    assert loops, "no while-loop events in trace"
    lo, hi = loops[-1]  # largest loop window (the refinement scan)
    print(f"while window {(hi-lo)/1e9:.2f} ms; module "
          f"{module_ms/n_frames:.2f} ms/frame")

    # per-line busy time inside the window. Trace lines are hierarchical
    # (the while event and fusion groups CONTAIN their member ops), so keep
    # only LEAF events: drop any event that fully contains another.
    def leaves(evts):
        iv = sorted(
            ((s, s + d, n) for n, s, d in evts if not n.startswith("%while")),
            key=lambda t: (t[0], -t[1]),
        )
        # innermost filter: reversed sweep — an event contains another iff
        # some other event with s' >= s has e' < e
        kept = []
        import bisect

        ends = []
        for s, e, n in reversed(iv):
            pos = bisect.bisect_left(ends, e)
            contains = pos > 0  # some already-seen event (s' >= s) has e' < e
            # equal ranges: treat duplicates as leaves
            if not contains:
                kept.append((s, e, n))
            bisect.insort(ends, e)
        kept.reverse()
        return kept

    def clip(evts):
        out = []
        for s, e, n in leaves(evts):
            cs, ce = max(s, lo), min(e, hi)
            if ce > cs:
                out.append((n, cs, ce))
        return sorted(out, key=lambda t: t[1])

    clipped = {ln: clip(evts) for ln, evts in line_events.items()}
    clipped = {ln: evts for ln, evts in clipped.items() if evts}
    for ln, evts in sorted(clipped.items(), key=lambda kv: -len(kv[1])):
        busy = sum(e - s for _, s, e in evts)
        print(f"  line '{ln}': {len(evts)} events, busy "
              f"{busy/1e9:.2f} ms ({100*busy/(hi-lo):.0f}%)")

    # compute line = busiest by event count (XLA op stream)
    comp = max(clipped.items(), key=lambda kv: len(kv[1]))[1]
    gaps = []  # (gap_ps, t, prev_name, next_name)
    cursor = lo
    prev_name = "<loop entry>"
    for n, s, e in comp:
        if s > cursor:
            gaps.append((s - cursor, cursor, prev_name, n))
        if e > cursor:
            cursor = e
            prev_name = n
    if hi > cursor:
        gaps.append((hi - cursor, cursor, prev_name, "<loop exit>"))
    total_gap = sum(g for g, *_ in gaps)
    print(f"compute-line gaps: {total_gap/1e9:.2f} ms total over "
          f"{len(gaps)} gaps ({100*total_gap/(hi-lo):.0f}% of window)")

    def concurrent(t0, t1):
        out = []
        for ln, evts in clipped.items():
            if evts is comp:
                continue
            for n, s, e in evts:
                if s < t1 and e > t0:
                    out.append(f"{ln}:{n[:60]}")
        return out

    gaps.sort(key=lambda g: -g[0])
    for g, t, pn, nn in gaps[:top_k]:
        cc = concurrent(t, t + g)
        print(f"  {g/1e9:7.3f} ms @ +{(t-lo)/1e9:7.3f}  after "
              f"{pn[:70]}\n           before {nn[:70]}")
        for c in cc[:4]:
            print(f"           concurrent {c}")

    # aggregate: gap time by (prev -> next) pair to expose per-iteration
    # recurring stalls
    agg = defaultdict(lambda: [0.0, 0])
    for g, t, pn, nn in gaps:
        key = (pn[:60], nn[:60])
        agg[key][0] += g
        agg[key][1] += 1
    print("\nrecurring stalls (summed over the window):")
    for (pn, nn), (tot, cnt) in sorted(
        agg.items(), key=lambda kv: -kv[1][0]
    )[:top_k]:
        print(f"  {tot/1e9:7.3f} ms x{cnt:3d}  {pn} -> {nn}")


def main():
    argv = sys.argv[1:]
    train = argv[:1] == ["train"]
    if train:
        argv = argv[1:]
    model_name = argv[0] if argv else "camliraft"
    n_frames = int(argv[1]) if len(argv) > 1 else 3
    top_k = int(argv[2]) if len(argv) > 2 else 40

    collect = collect_events_train if train else collect_events
    events, _, module_ms = collect(model_name, n_frames)
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
    if sys.argv[1:2] == ["gaps"]:
        cmd_gaps(
            *(sys.argv[2:3] or ["camliraft"]),
            *(int(a) for a in sys.argv[3:5]),
        )
    else:
        main()
