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


def lane_name(pid_names, tid_names, ev):
    pid = ev.get("pid")
    return "%s/%s" % (pid_names.get(pid, str(pid)),
                      tid_names.get((pid, ev.get("tid")), str(ev.get("tid"))))


def meta_names(events):
    pid_names, tid_names = {}, {}
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", str(ev["pid"]))
        elif ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev.get("args", {}).get(
                "name", str(ev["tid"]))
    return pid_names, tid_names


def module_spans(events):
    """Total us and count of the device 'XLA Modules' envelope events.

    Each event is one executed program (e.g. one jit_generate call); its span
    covers every op the program ran, so it must never be summed with op time.
    """
    pid_names, tid_names = meta_names(events)
    total, n = 0.0, 0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if "Modules" in lane_name(pid_names, tid_names, ev):
            total += ev["dur"]
            n += 1
    return total, n


def self_times(events, lane_substr="XLA Ops", keyfn=None):
    """Exclusive (self) device time per op group, from op lanes only.

    The device exposes two parallel lanes per pid — 'XLA Modules' (one
    envelope event per executed program, spanning everything) and 'XLA Ops'
    (the individual ops, which additionally nest: fusion parents ⊃ children).
    Summing across both double-counts the entire timeline, so only lanes
    whose thread name matches ``lane_substr`` are read, and within a lane a
    stack sweep over start-sorted events charges each op only the time not
    covered by its direct children. Returns (by_op_self_us, n_op).

    ``keyfn(ev) -> hashable`` overrides the default grouping (op name with
    instance suffixes collapsed); decomposition scripts pass a classifier
    that reads ``ev["args"]["long_name"]`` (full HLO with operand shapes),
    which separates e.g. the vocab-projection matmul fusions from optimizer
    element-wise fusions that share the generic ``fusion.N`` name.
    """
    pid_names, tid_names = meta_names(events)

    tracks = collections.defaultdict(list)
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if lane_substr in lane_name(pid_names, tid_names, ev):
            tracks[(ev.get("pid"), ev.get("tid"))].append(ev)

    by_op = collections.Counter()
    n_op = collections.Counter()

    def close(frame):
        end, g, dur, child = frame
        by_op[g] += max(0.0, dur - child[0])
        n_op[g] += 1

    for evs in tracks.values():
        # start-ascending; ties: longest first so parents precede children
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # frames: [end_ts, key, dur, [child_dur_sum]]
        for ev in evs:
            ts, dur = ev["ts"], ev["dur"]
            while stack and stack[-1][0] <= ts:
                close(stack.pop())
            if stack:  # nested: charge my span to the parent's child sum
                stack[-1][3][0] += dur
            key = (keyfn(ev) if keyfn is not None
                   else group_name(ev.get("name", "?")))
            stack.append((ts + dur, key, dur, [0.0]))
        while stack:
            close(stack.pop())
    return by_op, n_op


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
