#!/bin/bash
# Queue-driven round-4 runner: pops one line at a time from
# r4_queue.txt ("<commit msg> :: <command>"), runs it, and commits any
# new bench artifacts. Replaces the fixed-order run_r4_master.sh so
# priorities stay EDITABLE while hours of TPU work are in flight (this
# round keeps losing builder sessions; the queue file is the durable
# plan of record). One TPU job at a time; lines themselves wrap long
# jobs in watchdog.py.
#
# Usage: setsid bash bench/run_r4_queue.sh >> bench/r4_queue.log 2>&1 &
# Edit bench/r4_queue.txt any time (flock /tmp/r4_q.lock around edits).
set -u
cd "$(dirname "$0")"
REPO="$(cd .. && pwd)"
Q=r4_queue.txt

LOCK=/tmp/r4_queue.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "queue runner already running (rm -rf $LOCK to override)"; exit 1
fi
trap 'rmdir "$LOCK" 2>/dev/null' EXIT

stamp () { date -u +"%Y-%m-%dT%H:%M:%SZ"; }

while :; do
  (
    flock 8
    head -n1 "$Q" > /tmp/r4_next 2>/dev/null || : > /tmp/r4_next
    sed -i '1d' "$Q" 2>/dev/null
  ) 8>/tmp/r4_q.lock
  line=$(cat /tmp/r4_next)
  if [ -z "$line" ]; then echo "[$(stamp)] queue empty — done"; break; fi
  case "$line" in \#*) continue ;; esac
  msg="${line%% :: *}"
  cmd="${line#* :: }"
  echo "[$(stamp)] >>> $msg"
  bash -c "$cmd"
  rc=$?
  echo "[$(stamp)] <<< rc=$rc — $msg"
  (
    flock 9
    cd "$REPO"
    git add bench/*.csv bench/*.json bench/*.png bench/exp_*.txt \
      bench/*.errors.txt 2>/dev/null
    git diff --cached --quiet || git commit -q -m "Bench: $msg"
  ) 9>/tmp/r4_git.lock
done
