#!/bin/bash
# Round-4 GAT small-graph cells (VERDICT item #2 tail): flash vs ELL on
# graphs where the 3-pass ELL pipeline's O(nnz) intermediates FIT HBM,
# so the comparison the benchmark exists for is actually measured
# (rmat-17 is flash-only: ELL needs 21.68 GB vs 15.75 GB HBM, recorded
# in results_gat.csv). One method per process (CLAUDE.md pathology);
# flash cells run --tune so they represent the framework's actual pick.
#
# Usage: bash bench/run_r4_gat.sh
set -u
cd "$(dirname "$0")"
CSV=results_r4_gat.csv

for ds in ppi ogbn-arxiv er-8k; do
  npz="data/${ds}.reorder.npz"
  if [ ! -f "$npz" ]; then
    npz=$(python -c "import graph_gen; print(graph_gen.generate('${ds}', 'data', reorder=True))") || exit 1
  fi
  for method in flash ell; do
    extra=""
    [ "$method" = flash ] && extra="--tune"
    python watchdog.py --wait-tpu 2700 --stall-sec 360 --retries 2 --timeout 5400 -- \
      python -u bm_gat.py "$npz" --method "$method" --mode train \
        --dims 64,256 $extra --csv "$CSV" --iters 8
    echo "=== $ds $method done rc=$? ==="
  done
done
