#!/bin/bash
# Queue-driven round-5 runner: pops one line at a time from
# r4_queue.txt ("<commit msg> :: <command>"), runs it, and commits any
# new bench artifacts. Crash-durable successor to run_r4_queue.sh
# (round-4 advisor finding): the popped line is MOVED to an in-flight
# file and cleared only on completion, and on startup any stranded
# in-flight line is re-queued first — so a runner crash or VM rotation
# mid-job no longer drops the in-flight cell from the durable plan of
# record. One TPU job at a time; lines themselves wrap long jobs in
# watchdog.py.
#
# Usage: setsid bash bench/run_r5_queue.sh >> bench/r4_queue.log 2>&1 &
# Edit bench/r4_queue.txt any time (flock /tmp/r4_q.lock around edits).
set -u
cd "$(dirname "$0")"
REPO="$(cd .. && pwd)"
Q=r4_queue.txt
INFLIGHT=r5_inflight.txt

LOCK=/tmp/r5_queue.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "queue runner already running (rm -rf $LOCK to override)"; exit 1
fi
trap 'rmdir "$LOCK" 2>/dev/null' EXIT

stamp () { date -u +"%Y-%m-%dT%H:%M:%SZ"; }

# Recover a line stranded by a crash/VM rotation mid-job.
(
  flock 8
  if [ -s "$INFLIGHT" ]; then
    echo "[$(stamp)] recovering stranded in-flight line"
    cat "$INFLIGHT" "$Q" > /tmp/r5_q_merged && mv /tmp/r5_q_merged "$Q"
    : > "$INFLIGHT"
  fi
) 8>/tmp/r4_q.lock

while :; do
  (
    flock 8
    head -n1 "$Q" > "$INFLIGHT" 2>/dev/null || : > "$INFLIGHT"
    sed -i '1d' "$Q" 2>/dev/null
  ) 8>/tmp/r4_q.lock
  line=$(cat "$INFLIGHT")
  if [ -z "$line" ]; then echo "[$(stamp)] queue empty — done"; break; fi
  case "$line" in \#*) : > "$INFLIGHT"; continue ;; esac
  msg="${line%% :: *}"
  cmd="${line#* :: }"
  echo "[$(stamp)] >>> $msg"
  bash -c "$cmd"
  rc=$?
  echo "[$(stamp)] <<< rc=$rc — $msg"
  # One runner-level retry pass: a job the watchdog gave up on (e.g. a
  # 45-min relay outage exhausting --wait-tpu) goes to the queue TAIL
  # once instead of silently leaving the plan of record. The [requeued]
  # marker caps this at a single extra pass per line.
  if [ "$rc" -ne 0 ]; then
    case "$msg" in
      *"[requeued]"*) echo "[$(stamp)] dropping twice-failed line: $msg" ;;
      *)
        echo "[$(stamp)] re-queuing failed line at tail"
        (
          flock 8
          printf '%s [requeued] :: %s\n' "$msg" "$cmd" >> "$Q"
        ) 8>/tmp/r4_q.lock
        ;;
    esac
  fi
  : > "$INFLIGHT"
  (
    flock 9
    cd "$REPO"
    git add bench/*.csv bench/*.json bench/*.png bench/exp_*.txt \
      bench/*.errors.txt 2>/dev/null
    git diff --cached --quiet || git commit -q -m "Bench: $msg"
  ) 9>/tmp/r4_git.lock
done
