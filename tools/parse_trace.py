"""Aggregate device-op times from a jax.profiler perfetto trace.

    python tools/parse_trace.py /tmp/trace_dir [--top 30]

Finds the newest */*.trace.json.gz under the directory, sums per-op
durations on the device "XLA Ops" timeline, and prints the top offenders —
the ground truth this runtime's wall clocks can't give (block_until_ready
may return while work is queued).
"""

import argparse
import collections
import glob
import gzip
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", default=30, type=int)
    args = p.parse_args()

    files = sorted(glob.glob(os.path.join(
        args.trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise SystemExit(f"no trace under {args.trace_dir}")
    path = files[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])

    # Map (pid, tid) -> thread name; keep device-side op threads.
    tnames = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e.get("pid"), e.get("tid"))] = e["args"]["name"]

    per_thread = collections.defaultdict(collections.Counter)
    totals = collections.Counter()
    for e in ev:
        if e.get("ph") != "X":
            continue
        tn = tnames.get((e.get("pid"), e.get("tid")), "?")
        name = e.get("name", "?")
        per_thread[tn][name] += e.get("dur", 0)
        totals[tn] += e.get("dur", 0)

    print(f"trace: {path}")
    for tn, tot in totals.most_common():
        print(f"\n== {tn}: {tot/1e3:.2f} ms total")
        for name, d in per_thread[tn].most_common(args.top):
            print(f"  {d/1e3:10.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
