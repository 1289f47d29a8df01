#!/usr/bin/env python
"""Stall watchdog for long TPU bench/tune jobs.

Pathology (CLAUDE.md): the axon relay drops for ~10-20 min at a time;
an in-flight RPC never returns, so a multi-hour sweep freezes silently
with zero CPU. bench.py protects the single headline cell with a
probe+retry loop; this wrapper protects ARBITRARY jobs: it launches the
command in its own process group, samples the process TREE's cumulative
CPU time every --poll seconds, and if the tree makes no CPU progress
for --stall-sec (far beyond any legitimate remote-compile wait of
20-40 s) it SIGKILLs the group and relaunches, up to --retries times.
Resumable state (tune .partial sidecars, per-dataset CSVs) makes the
relaunch cheap. Kills are by process-group id — never by name pattern.

Usage: python bench/watchdog.py [--stall-sec 360] [--retries 3]
           [--timeout 14400] -- <command...>
Exit code: the command's rc on success; 97 when retries are exhausted.
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def _tree_cpu_stats(root_pid: int) -> dict[int, int]:
    """pid -> utime+stime jiffies for root_pid and all descendants."""
    children: dict[int, list[int]] = {}
    stats: dict[int, int] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # pid (comm) state ppid ... utime[13] stime[14]; comm may hold
        # spaces/parens — split after the LAST ')'
        rest = raw[raw.rfind(")") + 2:].split()
        pid = int(entry)
        ppid = int(rest[1])
        stats[pid] = int(rest[11]) + int(rest[12])
        children.setdefault(ppid, []).append(pid)
    out: dict[int, int] = {}
    stack = [root_pid]
    while stack:
        p = stack.pop()
        if p in stats:
            out[p] = stats[p]
        stack.extend(children.get(p, []))
    return out


PAUSE_FILE = "/tmp/r4_pause"
PAUSE_STALE_S = 1800.0


def _pid_chain_contains(pid: int, ancestor: int) -> bool:
    """True if `ancestor` is `pid` or on its parent chain."""
    hops = 0
    while pid > 1 and hops < 64:
        if pid == ancestor:
            return True
        try:
            with open(f"/proc/{pid}/stat") as f:
                raw = f.read()
        except OSError:
            return False
        pid = int(raw[raw.rfind(")") + 2:].split()[1])
        hops += 1
    return pid == ancestor


def _pause_requested(watched_root: int | None = None) -> bool:
    """True while a fresh pause sentinel exists (bench.py creates it so
    the driver's headline capture measures on a QUIET chip; a sentinel
    older than PAUSE_STALE_S is treated as leaked and ignored).

    The sentinel carries its creator's PID; a pause originating INSIDE
    the watched tree is ignored — otherwise wrapping bench.py under this
    watchdog livelocks (kill child -> sentinel leaks -> wait staleness
    -> retry -> child re-creates sentinel, round-4 advisor finding)."""
    try:
        age = time.time() - os.path.getmtime(PAUSE_FILE)
    except OSError:
        return False
    if age >= PAUSE_STALE_S:
        return False
    if watched_root is not None:
        try:
            with open(PAUSE_FILE) as f:
                creator = int(f.read().strip() or "0")
        except (OSError, ValueError):
            creator = 0
        if creator and _pid_chain_contains(creator, watched_root):
            return False
    return True


def run_once(cmd, stall_sec, poll, timeout, min_jiffies, log):
    proc = subprocess.Popen(cmd, start_new_session=True)
    t0 = time.time()
    # (time, progress) history: stalled = the tree accrued <
    # min_jiffies of CPU over the trailing stall_sec. "Any change" is
    # NOT enough — a process blocked on an orphaned relay RPC still
    # ticks a few keepalive jiffies per minute (observed: <1 s CPU over
    # 12 min), while legit waits (remote compile 20-40 s) sit inside
    # windows with real work on either side. Progress is a MONOTONE
    # accumulator of per-PID positive deltas, NOT the raw tree total:
    # when a tuner probe subprocess exits, its jiffies leave the tree
    # sum, and the raw-total delta goes negative — a healthy Yeast tune
    # was stall-killed at "-1245 jiffies in 360s" exactly this way.
    hist: list[tuple[float, int]] = []
    last: dict[int, int] = {}
    progress = 0
    try:
        while True:
            rc = proc.poll()
            if rc is not None:
                return rc, "exit"
            now = time.time()
            if now - t0 > timeout:
                _kill_group(proc)
                return None, "timeout"
            if _pause_requested(proc.pid):
                log("pause sentinel — suspending (resumable sidecars)")
                _kill_group(proc)
                return None, "paused"
            stats = _tree_cpu_stats(proc.pid)
            for pid, jiffies in stats.items():
                # new pid: all its CPU is new work; pid reuse with a
                # lower count is clamped to 0 by max()
                progress += max(0, jiffies - last.get(pid, 0))
            last = stats
            hist.append((now, progress))
            baseline = None
            for ts, c in hist:
                if now - ts >= stall_sec:
                    baseline = c
                else:
                    break
            if baseline is not None and progress - baseline < min_jiffies:
                log(
                    f"STALL: tree accrued {progress - baseline} jiffies "
                    f"in {stall_sec}s (< {min_jiffies}, t+{now - t0:.0f}s) "
                    f"— killing group"
                )
                _kill_group(proc)
                return None, "stall"
            while hist and now - hist[0][0] > 2 * stall_sec:
                hist.pop(0)
            time.sleep(poll)
    except KeyboardInterrupt:
        _kill_group(proc)
        raise


def wait_tpu(max_wait_s: float, log) -> bool:
    """Block until a FRESH subprocess completes one tiny matmul on the
    device (bench.py wait_for_tpu role, shared by any watchdog-guarded
    job). Gating each attempt on relay health stops a 10-20 min outage
    from burning the whole retry budget on guaranteed stalls (observed:
    ddi sweep attempt 1+2 both stall-killed during one outage window)."""
    code = (
        "import jax.numpy as jnp;"
        "print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))"
    )
    deadline = time.time() + max_wait_s
    first = True
    while time.time() < deadline:
        try:
            # 240s: the relay handshake alone has measured ~100s wall on a
            # healthy chip (session 3) — a 90s cap declared "down" forever.
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, timeout=240
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if first:
            log(f"relay down — waiting (up to {max_wait_s:.0f}s)")
            first = False
        time.sleep(30)
    return False


def _kill_group(proc):
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        pass
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stall-sec", type=int, default=360)
    p.add_argument(
        "--min-jiffies", type=int, default=50,
        help="minimum tree CPU jiffies per stall window to count as "
        "progress (50 = 0.5s CPU/window, above RPC keepalive noise)",
    )
    p.add_argument("--poll", type=float, default=20.0)
    p.add_argument("--retries", type=int, default=3)
    p.add_argument("--timeout", type=int, default=14400)
    p.add_argument(
        "--wait-tpu", type=int, default=0, metavar="S",
        help="before each attempt, block up to S seconds for a tiny "
        "device matmul to succeed in a fresh subprocess; exit 98 if "
        "the relay never comes back",
    )
    p.add_argument("cmd", nargs=argparse.REMAINDER)
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (use: watchdog.py [opts] -- cmd ...)")

    def log(msg):
        print(f"[watchdog] {msg}", flush=True)

    attempt = 0
    pauses = 0
    while attempt <= args.retries:
        attempt += 1
        if args.wait_tpu and not wait_tpu(args.wait_tpu, log):
            log("relay never came back — giving up")
            sys.exit(98)
        log(f"attempt {attempt}: {' '.join(cmd)}")
        rc, why = run_once(
            cmd, args.stall_sec, args.poll, args.timeout,
            args.min_jiffies, log,
        )
        if why == "exit":
            log(f"command exited rc={rc}")
            sys.exit(rc)
        if why == "paused" and pauses < 8:
            # a headline capture asked for a quiet chip — wait it out
            # and retry WITHOUT consuming the retry budget (capped at 8
            # cycles so a pathological sentinel can never pin this job
            # forever; beyond the cap a pause consumes a retry)
            pauses += 1
            attempt -= 1
            while _pause_requested():
                time.sleep(15)
            log("pause released — resuming")
            continue
        if attempt <= args.retries:
            # give a downed relay time to come back before relaunching
            log(f"{why}; backing off 120s then retrying")
            time.sleep(120)
    log("retries exhausted")
    sys.exit(97)


if __name__ == "__main__":
    main()
