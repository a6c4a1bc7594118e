"""Run the multi-process dryrun and commit its proof as a driver-visible
artifact (VERDICT r4 #8).

``__graft_entry__.dryrun_multiprocess`` spawns a real 2-process gloo cluster
and asserts the (B x lbs) NAR decode sweep sharded ACROSS PROCESS BOUNDARIES
is token-identical to the single-process decode — but only builder tests run
it. This script captures its tail into MULTIPROC_r<N>.json (the same
``{ok, rc, tail}`` shape the driver uses for MULTICHIP_r<N>.json) so the
evidence ships with the round.

    python scripts/emit_multiproc_artifact.py [--out MULTIPROC_r05.json]
"""

import argparse
import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "MULTIPROC_r05.json"))
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # workers re-force cpu themselves too
    cmd = [sys.executable, os.path.join(ROOT, "__graft_entry__.py"),
           "--multiprocess"]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=args.timeout)
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-12:])
    result = {
        "ok": proc.returncode == 0 and "dryrun_multiprocess OK" in proc.stdout,
        "rc": proc.returncode,
        "cmd": " ".join(cmd),
        "tail": tail,
        "timestamp": datetime.datetime.now(
            datetime.timezone.utc).isoformat(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps({"ok": result["ok"], "rc": result["rc"],
                      "out": args.out}))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
