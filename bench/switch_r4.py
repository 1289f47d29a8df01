#!/usr/bin/env python
"""One-shot supervisor: when run_r4_master.sh finishes its stage 1
(headline re-tune), kill the master's whole process tree and hand the
TPU to the queue-driven runner (run_r4_queue.sh), whose r4_queue.txt
order is editable mid-flight. Exists because bash buffers small
scripts at exec — the running master's remaining fixed stage order
cannot be changed in place, and the queue puts the high-value cells
(GAT grid, reddit baseline) ahead of multi-hour grid stages.

Kills are by PID-tree walk (/proc ppid links) + process-group ids —
never by name pattern. Usage:
  setsid python bench/switch_r4.py <master_pid> >> bench/r4_queue.log 2>&1 &
"""
import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
LOG = os.path.join(HERE, "r4_master.log")
MARKERS = ("committed: Bench: re-warm", "=== grid: Yeast")


def descend_pgids(root: int) -> set[int]:
    """pgids of root and every /proc descendant (ppid-tree walk)."""
    children: dict[int, list[int]] = {}
    pgid: dict[int, int] = {}
    for e in os.listdir("/proc"):
        if not e.isdigit():
            continue
        try:
            with open(f"/proc/{e}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        rest = raw[raw.rfind(")") + 2:].split()
        children.setdefault(int(rest[1]), []).append(int(e))
        pgid[int(e)] = int(rest[2])
    out, stack = set(), [root]
    while stack:
        p = stack.pop()
        if p in pgid:
            out.add(pgid[p])
        stack.extend(children.get(p, []))
    return out


def main() -> int:
    master = int(sys.argv[1])
    while True:
        if not os.path.exists(f"/proc/{master}"):
            print("[switch] master already gone")
            break
        try:
            with open(LOG) as f:
                text = f.read()
        except OSError:
            text = ""
        if any(m in text for m in MARKERS):
            print("[switch] stage-1 marker seen — taking over")
            for pg in sorted(descend_pgids(master)):
                if pg <= 1 or pg == os.getpgrp():
                    continue
                try:
                    os.killpg(pg, signal.SIGKILL)
                    print(f"[switch] killed pgid {pg}")
                except OSError:
                    pass
            break
        time.sleep(10)
    for lock in ("/tmp/r4_master.lock",):
        try:
            os.rmdir(lock)
        except OSError:
            pass
    time.sleep(2)
    with open(os.path.join(HERE, "r4_queue.log"), "a") as logf:
        subprocess.Popen(
            ["setsid", "bash", os.path.join(HERE, "run_r4_queue.sh")],
            stdout=logf, stderr=subprocess.STDOUT,
            stdin=subprocess.DEVNULL, start_new_session=True,
        )
    print("[switch] queue runner launched")
    return 0


if __name__ == "__main__":
    sys.exit(main())
