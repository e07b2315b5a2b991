"""Compute-line-only self-time ranking inside the refinement while loop.

gaps mode (tools/device_trace.py) showed the 'XLA Ops' line is 100% busy in
the while window — so the loop cost IS compute-line op time, and the async
copy windows in the mixed top list are red herrings. This view sums LEAF
event durations on the compute line only, grouped by a coarse op family, to
rank what actually occupies the 72 ms.

Usage: python tools/trace_compute_line.py [model] [n_frames] [top_k]
"""
import re
import sys
from collections import defaultdict

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from device_trace import collect_events  # noqa: E402


def main(model="camliraft", n_frames=2, top_k=45):
    events, line_events, module_ms = collect_events(model, n_frames)
    # EVERY frame's while window (n_frames executions of the loop) — using
    # only the longest one while dividing by n_frames halved every family
    # number in the round-4/5 PERF traces (the other frame's loop events
    # landed in OUTSIDE): intersect with the union of all windows instead.
    loops = sorted(
        ((s, s + d) for n, s, d in events if n.startswith("%while")),
        key=lambda r: r[0],
    )
    windows = []
    for s, e in loops:
        if windows and s <= windows[-1][1]:  # nested/overlapping: merge
            windows[-1] = (windows[-1][0], max(windows[-1][1], e))
        else:
            windows.append((s, e))
    total_win = sum(e - s for s, e in windows)
    print(
        f"while windows {len(windows)} totalling {total_win / 1e9 / n_frames:.2f}"
        f" ms/frame; module {module_ms / n_frames:.2f} ms/frame"
    )

    comp = min(
        line_events.items(),
        key=lambda kv: sum(
            1 for n, s, d in kv[1] if "copy-start" in n or "async" in n
        )
        - len(kv[1]),
    )
    # pick the line whose name looks like the sync compute line
    for name, evts in line_events.items():
        frac_async = sum(
            1
            for n, _, _ in evts
            if "-start" in n or "-done" in n and False
        )
        print(f"line '{name}': {len(evts)} events")

    for line_name, evts in line_events.items():
        if "Async" in line_name:
            continue
        # leaf filter: drop events that contain others (fusion groups/while)
        iv = sorted(
            (
                (s, s + d, n)
                for n, s, d in evts
                if not n.startswith("%while")
            ),
            key=lambda t: (t[0], -t[1]),
        )
        import bisect

        kept = []
        ends = []
        for s, e, n in reversed(iv):
            pos = bisect.bisect_left(ends, e)
            if pos == 0:
                kept.append((s, e, n))
            bisect.insort(ends, e)
        kept.reverse()

        in_loop = defaultdict(float)
        outside = defaultdict(float)
        for s, e, n in kept:
            # family key: op kind + shape signature, strip ids
            m = re.match(r"%([a-zA-Z_0-9.\-]+?)(\.\d+)? = ([^ ]+) ", n)
            if m:
                key = f"{m.group(1).rstrip('0123456789.')} {m.group(3)}"
            else:
                key = n[:60]
            dur = sum(
                max(0, min(e, hi) - max(s, lo)) for lo, hi in windows
            ) / 1e9 / n_frames
            full = (e - s) / 1e9 / n_frames
            if dur > 0:
                in_loop[key] += dur
            if full - dur > 0:
                outside[key] += full - dur

        total_in = sum(in_loop.values())
        total_out = sum(outside.values())
        print(
            f"\n=== line '{line_name}': in-loop {total_in:.2f} ms/frame, "
            f"outside {total_out:.2f} ms/frame ==="
        )
        for title, table in (("IN-LOOP", in_loop), ("OUTSIDE", outside)):
            print(f"-- {title} top {top_k} --")
            for key, ms in sorted(table.items(), key=lambda kv: -kv[1])[
                :top_k
            ]:
                print(f"  {ms:8.3f}  {key[:130]}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        args[0] if args else "camliraft",
        int(args[1]) if len(args) > 1 else 2,
        int(args[2]) if len(args) > 2 else 45,
    )
