#!/bin/bash
# Round-4 grid catch-up: re-run every nan cell from the per-dataset
# sweep CSVs, ONE (dataset, method, dim) cell per watchdog-guarded
# PROCESS. Two reasons a cell can be nan: (1) genuinely infeasible
# (e.g. BCOO OOM at d1024 on mid-size graphs) — the re-run reproduces
# the failure in isolation and the nan stands, now uncontaminated;
# (2) collateral from an earlier method OOM-crashing the shared TPU
# worker in the same sweep process (observed: ddi BCOO d1024 crash
# took the following CSR-ELL cell down) — the isolated re-run lands a
# real number. Results go to results_r4_fix_*.csv for merge_results.py.
#
# Usage: bash bench/run_r4_fixups.sh
set -u
cd "$(dirname "$0")"

python - <<'EOF' > /tmp/r4_nan_cells.txt
import csv, glob
for p in sorted(glob.glob("results_r4_*.csv")):
    if "_fix_" in p:
        continue
    with open(p) as f:
        for r in csv.reader(f):
            if len(r) >= 4 and r[0] != "dataset" and r[3] == "nan":
                print(r[0], r[1], r[2])
EOF
sort -u /tmp/r4_nan_cells.txt | while read -r ds method dim; do
  [ -z "${ds:-}" ] && continue
  python watchdog.py --wait-tpu 2700 --stall-sec 360 --retries 1 --timeout 3600 -- \
    python -u bench_all.py --datasets "$ds" --dims "$dim" \
      --methods "$method" --seed-dim 256 \
      --out-csv "results_r4_fix_${ds}_${dim}_${method}.csv" --iters 8
  echo "=== fixup $ds $method d$dim rc=$? ==="
done
