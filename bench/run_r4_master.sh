#!/bin/bash
# Round-4 master runner: serializes ALL remaining TPU work in priority
# order and git-commits results after each stage. Run DETACHED (setsid)
# so it survives builder-session restarts — this round repeatedly lost
# sessions to API errors while the TPU sat idle, and a VM rotation
# wiped the tune cache + generated graphs; this script rebuilds
# everything hands-off. One TPU job at a time (single chip + 1 CPU
# core: CLAUDE.md serialization rule).
#
# Priority (VERDICT.md round-3 "Next round" items):
#   1. bench.py headline — re-tune rmat-17 d256 from the cold cache so
#      the driver's end-of-round BENCH_r04.json capture disk-hits.
#   2. Never-benched datasets (Yeast, YeastH, protein) full dims.
#   3. FraudYelp-RSR remaining cells (CSR-ELL d256, d512/1024).
#   4. GAT flash-vs-ELL small-graph cells (ppi, ogbn-arxiv, er-8k).
#   5. Remaining named graphs full dims (re-tunes d256 fresh-process =
#      anti-drift re-measurement, then seeded d512/1024).
#   6. reddit-proxy d256 baseline cell (CSR-ELL) + Voltrix re-tune.
#   7. nan fixups, merge, plot.
#
# Usage: setsid bash bench/run_r4_master.sh >> bench/r4_master.log 2>&1 &
set -u
cd "$(dirname "$0")"
REPO="$(cd .. && pwd)"

LOCK=/tmp/r4_master.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "master already running (rm -rf $LOCK to override)"; exit 1
fi
trap 'rmdir "$LOCK" 2>/dev/null' EXIT

stamp () { date -u +"%Y-%m-%dT%H:%M:%SZ"; }

commit_stage () {
  # flock the git dir so interactive commits don't race us
  local msg="$1"; shift
  (
    flock 9
    cd "$REPO"
    git add "$@" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$msg"
  ) 9>/tmp/r4_git.lock
  echo "[$(stamp)] committed: $msg"
}

run_ds () {
  local ds="$1" dims="$2" timeout="$3" methods="${4:-Voltrix,BCOO,CSR-ELL}"
  echo "[$(stamp)] === grid: $ds dims=$dims methods=$methods"
  python watchdog.py --wait-tpu 2700 --stall-sec 360 --retries 2 --timeout "$timeout" -- \
    python -u bench_all.py --datasets "$ds" --dims "$dims" \
      --methods "$methods" --seed-dim 256 \
      --out-csv "results_r4_${ds}.csv" --iters 8
  echo "[$(stamp)] === $ds rc=$?"
  commit_stage "Bench: ${ds} grid cells (round-4 sweep)" \
    "bench/results_r4_${ds}.csv"
}

echo "[$(stamp)] ######## round-4 master start"

# ---- stage 1: headline warm (VERDICT #1) --------------------------------
echo "[$(stamp)] === stage 1: bench.py headline (cold-cache re-tune)"
( cd "$REPO" && VOLTRIX_TPU_BENCH_BUDGET_S=2700 python bench.py ) \
  | tee headline_r4.json
commit_stage "Bench: re-warm rmat-17 headline tune cache after VM rotation" \
  bench/headline_r4.json

# ---- stage 2: never-benched datasets (VERDICT #3) -----------------------
run_ds Yeast  256,512,1024 4800
run_ds YeastH 256,512,1024 4800
run_ds protein 256,512,1024 7200

# ---- stage 3: FraudYelp-RSR remaining cells -----------------------------
run_ds FraudYelp-RSR 256 4800 CSR-ELL
run_ds FraudYelp-RSR 512,1024 7200

# ---- stage 4: GAT small-graph flash-vs-ELL cells (VERDICT #2) -----------
GATCSV=results_r4_gat.csv
for ds in ppi ogbn-arxiv er-8k; do
  npz="data/${ds}.reorder.npz"
  if [ ! -f "$npz" ]; then
    npz=$(python -c "import graph_gen; print(graph_gen.generate('${ds}', 'data', reorder=True))" | tail -1) || continue
  fi
  for method in flash ell; do
    extra=""
    [ "$method" = flash ] && extra="--tune"
    echo "[$(stamp)] === GAT $ds $method"
    python watchdog.py --wait-tpu 2700 --stall-sec 360 --retries 2 --timeout 4800 -- \
      python -u bm_gat.py "$npz" --method "$method" --mode train \
        --dims 64,256 $extra --csv "$GATCSV" --iters 8
    echo "[$(stamp)] === GAT $ds $method rc=$?"
  done
  commit_stage "Bench: GAT flash-vs-ELL cells for ${ds}" "bench/$GATCSV"
done

# ---- stage 5: remaining named graphs, full dims -------------------------
run_ds ogbn-arxiv 256,512,1024 7200
run_ds com-amazon 256,512,1024 7200
run_ds DD 256,512,1024 7200
run_ds ddi 1024 2400            # nan fixup: BCOO/CSR-ELL d1024 isolated
run_ds amazon0505 256,512,1024 9600
run_ds amazon0601 256,512,1024 9600
run_ds web-BerkStan 256,512,1024 9600

# ---- stage 6: reddit-proxy baseline cell (VERDICT #3 tail) --------------
for m in csrell voltrix; do
  echo "[$(stamp)] === reddit d256 $m"
  python watchdog.py --wait-tpu 2700 --stall-sec 600 --retries 1 --timeout 10800 -- \
    python -u run_r4_big.py reddit 256 "$m"
  echo "[$(stamp)] === reddit d256 $m rc=$?"
  commit_stage "Bench: reddit-proxy d256 ${m} cell" "bench/results_r4_reddit.csv"
done

# ---- stage 7: merge + plot ----------------------------------------------
echo "[$(stamp)] === stage 7: merge + plot"
python merge_results.py results_real_all.csv \
  results_real_all.csv results_r4_*.csv 2>/dev/null
python plot.py --results results_real_all.csv --out results_real.png \
  2>/dev/null || true
commit_stage "Bench: merged round-4 grid into results_real_all.csv + plot" \
  bench/results_real_all.csv bench/results_real.png

echo "[$(stamp)] ######## round-4 master done"
