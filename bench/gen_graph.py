#!/usr/bin/env python
"""Generate (if missing) the reordered .npz for each named dataset.

Queue-line helper: `python gen_graph.py ppi er-8k` ensures
data/<name>.reorder.npz exists before a bench driver that takes a path
(bm_gat.py, bm_voltrix.py, antidrift.py). Idempotent; prints the paths.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import graph_gen  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

for name in sys.argv[1:]:
    path = os.path.join(HERE, "data", f"{name}.reorder.npz")
    if not os.path.exists(path):
        os.makedirs(os.path.join(HERE, "data"), exist_ok=True)
        path = graph_gen.generate(name, os.path.join(HERE, "data"), reorder=True)
    print(path)
