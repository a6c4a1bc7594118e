"""Summarize a jax.profiler trace without tensorboard.

Reads ``profiles/<ts>/plugins/profile/*/vm.trace.json.gz`` (the Chrome-trace
export the TPU runtime writes alongside the xplane file) and prints the top
ops by total device time, grouped by event name, plus per-PID totals so
device vs host lanes are distinguishable.

Usage:
    python scripts/trace_summary.py profiles/20260817_165524 [--top 30]
    python scripts/trace_summary.py --latest [--top 30]   # newest capture dir
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def find_trace(capture_dir: str) -> str:
    pats = os.path.join(capture_dir, "plugins", "profile", "*", "*.trace.json.gz")
    hits = sorted(glob.glob(pats))
    if not hits:
        raise FileNotFoundError("no *.trace.json.gz under %s" % capture_dir)
    return hits[-1]


def load_events(trace_path: str):
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


GROUP_RULES = [
    # collapse fusion instances: "fusion.123" -> "fusion", "%fusion.5" etc.
    (re.compile(r"\.\d+$"), ""),
    (re.compile(r"^%"), ""),
]


def group_name(name: str) -> str:
    for pat, repl in GROUP_RULES:
        name = pat.sub(repl, name)
    return name


def summarize(events, top: int = 30):
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", str(ev["pid"]))

    by_pid = collections.Counter()
    by_op = collections.Counter()
    n_op = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid = ev.get("pid")
        lane = pid_names.get(pid, str(pid))
        by_pid[lane] += ev["dur"]
        # only aggregate op lanes from the device (XLA Ops / TensorFlow Ops)
        if "Ops" in lane or "XLA" in lane or "TPU" in lane:
            g = group_name(ev.get("name", "?"))
            by_op[g] += ev["dur"]
            n_op[g] += 1
    return pid_names, by_pid, by_op, n_op


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("capture", nargs="?", help="profiles/<ts> capture dir")
    ap.add_argument("--latest", action="store_true",
                    help="use the newest capture dir under profiles/")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args(argv)

    cap = args.capture
    if args.latest or not cap:
        dirs = sorted(glob.glob(os.path.join(HERE, "profiles", "*")))
        if not dirs:
            sys.exit("no capture dirs under profiles/")
        cap = dirs[-1]
    trace = find_trace(cap)
    events = load_events(trace)
    pid_names, by_pid, by_op, n_op = summarize(events, args.top)

    print("trace: %s  (%d events)" % (trace, len(events)))
    print("\n== total us by lane ==")
    for lane, dur in by_pid.most_common(12):
        print("  %12.0f  %s" % (dur, lane))
    print("\n== top %d ops by total us (op lanes only) ==" % args.top)
    total = sum(by_op.values()) or 1
    for op, dur in by_op.most_common(args.top):
        print("  %12.0f  %5.1f%%  x%-6d %s"
              % (dur, 100.0 * dur / total, n_op[op], op[:110]))


if __name__ == "__main__":
    main()
