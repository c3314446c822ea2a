"""Summarize a JAX profiler trace: top device ops by total self-time.

Reads the .trace.json.gz a tools/profile_chunk.py capture writes under
<logdir>/plugins/profile/*/, groups complete events on the device lanes
by XLA op name (collapsing fusion instance suffixes), and prints a
top-N table with total/mean duration and occurrence count — enough to
attribute the per-keyframe glue budget without TensorBoard (the round-5
target is the 46 -> <=35 ms/keyframe round glue, VERDICT r4 item 5).

  python tools/trace_summary.py runs/profile_chunk [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os.path as osp
import re


def load_trace(logdir):
    paths = sorted(glob.glob(
        osp.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        paths = sorted(glob.glob(
            osp.join(logdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no .trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f), paths[-1]


_SUFFIX = re.compile(r"[._-]?\d+$")


def canon(name):
    """Collapse op-instance suffixes: fusion.123 -> fusion, %copy.4 ->
    copy, dynamic-update-slice.7 -> dynamic-update-slice."""
    name = name.split("/")[-1].lstrip("%")
    prev = None
    while prev != name:
        prev = name
        name = _SUFFIX.sub("", name)
    return name or "<anon>"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--lane", default=None,
                    help="substring filter on the process/thread lane "
                         "name (default: lanes containing 'TPU' or "
                         "'/device:', falling back to all)")
    args = ap.parse_args()

    trace, path = load_trace(args.logdir)
    events = trace.get("traceEvents", [])

    # map (pid, tid) -> lane label from metadata events
    proc = {}
    thread = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def lane(e):
        return (proc.get(e.get("pid"), "") + " / "
                + thread.get((e.get("pid"), e.get("tid")), ""))

    def is_device(e):
        ln = lane(e)
        if args.lane:
            return args.lane.lower() in ln.lower()
        return ("tpu" in ln.lower() or "/device:" in ln.lower()
                or "xla ops" in ln.lower())

    rows = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    n_dev = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not is_device(e):
            continue
        n_dev += 1
        key = canon(e.get("name", ""))
        rows[key][0] += e["dur"]
        rows[key][1] += 1
        total += e["dur"]

    if n_dev == 0:
        # no recognizable device lane: fall back to everything
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                key = canon(e.get("name", ""))
                rows[key][0] += e["dur"]
                rows[key][1] += 1
                total += e["dur"]

    print(f"trace: {path}")
    print(f"device events: {n_dev}, total self-time {total / 1e3:.1f} ms")
    print(f"{'op':<44} {'total ms':>10} {'count':>8} {'mean us':>9} {'%':>6}")
    for name, (dur, cnt) in sorted(rows.items(),
                                   key=lambda kv: -kv[1][0])[: args.top]:
        print(f"{name[:44]:<44} {dur / 1e3:>10.2f} {cnt:>8} "
              f"{dur / cnt:>9.1f} {100 * dur / max(total, 1e-9):>6.2f}")


if __name__ == "__main__":
    main()
