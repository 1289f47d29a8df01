#!/bin/bash
# Round-4 grid completion (VERDICT item #3): the reference's 12 named
# datasets (reference bench/plot.py:8) x {256,512,1024} x
# {Voltrix, BCOO, CSR-ELL}, one watchdog-guarded process per dataset
# (CLAUDE.md bench pathology: one measurement per process; the axon
# relay drops silently — watchdog kills on CPU stall and relaunches
# against the resumable tune sidecars). d512/1024 Voltrix cells race a
# trimmed space seeded by the d256 cached winner (bench_all.seeded_space).
#
# Usage: bash bench/run_r4_grid.sh [stage]
#   stage small  — the 9 small/mid graphs (plus repo-extra ogbn-arxiv)
#   stage big    — reddit + ogbn-products (hours; run after `small`)
set -u
cd "$(dirname "$0")"

SMALL="ddi ppi ogbn-arxiv com-amazon DD amazon0505 amazon0601 Yeast YeastH protein web-BerkStan FraudYelp-RSR"
BIG="reddit ogbn-products"

run_ds () {
  local ds="$1" dims="$2" timeout="$3"
  python watchdog.py --wait-tpu 2700 --stall-sec 360 --retries 3 --timeout "$timeout" -- \
    python -u bench_all.py --datasets "$ds" --dims "$dims" \
      --methods Voltrix,BCOO,CSR-ELL --seed-dim 256 \
      --out-csv "results_r4_${ds}.csv" --iters 8
  echo "=== dataset $ds done rc=$? ==="
}

case "${1:-small}" in
  small)
    for ds in $SMALL; do run_ds "$ds" 256,512,1024 10800; done
    ;;
  big)
    # explicit seeded races via run_r4_big.py — a full default-space
    # re-tune at 100M-nnz scale would cost hours per graph (see its
    # docstring); one (dataset, dim, method) cell per process
    for ds in $BIG; do
      for dim in 256 512 1024; do
        for m in voltrix csrell bcoo; do
          python watchdog.py --wait-tpu 2700 --stall-sec 600 --retries 2 --timeout 14400 -- \
            python -u run_r4_big.py "$ds" "$dim" "$m"
          echo "=== $ds d$dim $m done rc=$? ==="
        done
      done
    done
    ;;
  *)
    run_ds "$1" "${2:-256,512,1024}" "${3:-10800}"
    ;;
esac
