"""Graph classification: readout + GIN classifier over block-diagonal
batches (the workload of the reference's DD/protein/YeastH/Yeast
datasets, bench/plot.py:8)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.data.batching import (
    block_diagonal,
    node_graph_ids,
    split_nodes,
)
from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.models import (
    build_graph,
    gin_classifier_forward,
    gin_classifier_loss,
    graph_readout,
    init_gin_classifier,
    make_classifier_train_step,
)

CFG = PlanConfig(32, 128)


def _random_graphs(rng, sizes):
    out = []
    for n in sizes:
        a = sp.random(n, n, density=0.15, format="csr", random_state=rng)
        a.data[:] = 1.0
        out.append(a)
    return out


def test_node_graph_ids():
    ids = node_graph_ids([0, 3, 3, 7])
    assert ids.dtype == np.int32
    np.testing.assert_array_equal(ids, [0, 0, 0, 2, 2, 2, 2])


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_graph_readout_matches_numpy(rng, mode):
    sizes = (13, 1, 40, 27)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    x = rng.standard_normal((offs[-1], 6)).astype(np.float32)
    ids = jnp.asarray(node_graph_ids(offs))
    got = np.asarray(graph_readout(jnp.asarray(x), ids, len(sizes), mode))
    red = {"sum": np.sum, "mean": np.mean, "max": np.max}[mode]
    want = np.stack([red(part, axis=0) for part in split_nodes(x, offs)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batched_equals_per_graph(rng):
    """Block-diagonal invariance: the batched classifier's logits equal
    running each graph alone — the property that makes one SpMM launch
    per layer serve the whole batch."""
    graphs = _random_graphs(rng, (50, 90, 30))
    big, offs = block_diagonal(graphs)
    ids = jnp.asarray(node_graph_ids(offs))
    d, hidden, classes = 8, 16, 3
    x = rng.standard_normal((big.shape[0], d)).astype(np.float32)
    params = init_gin_classifier(jax.random.PRNGKey(0), d, hidden, classes)

    g_big = build_graph(big.indptr, big.indices, big.shape[0], CFG)
    batched = np.asarray(
        gin_classifier_forward(
            params, g_big, jnp.asarray(x), ids, len(graphs)
        )
    )

    for i, (a, xi) in enumerate(zip(graphs, split_nodes(x, offs))):
        gi = build_graph(a.indptr, a.indices, a.shape[0], CFG)
        alone = np.asarray(
            gin_classifier_forward(
                params, gi, jnp.asarray(xi),
                jnp.zeros((a.shape[0],), jnp.int32), 1,
            )
        )[0]
        np.testing.assert_allclose(batched[i], alone, rtol=2e-4, atol=2e-4)


def test_classifier_trains(rng):
    graphs = _random_graphs(rng, (40, 40, 60, 60))
    big, offs = block_diagonal(graphs)
    ids = jnp.asarray(node_graph_ids(offs))
    g = build_graph(big.indptr, big.indices, big.shape[0], CFG)
    d, hidden, classes = 8, 16, 2
    x = jnp.asarray(rng.standard_normal((big.shape[0], d)).astype(np.float32))
    y = jnp.asarray([0, 0, 1, 1], dtype=jnp.int32)

    params = init_gin_classifier(jax.random.PRNGKey(1), d, hidden, classes)
    opt = optax.adam(1e-2)
    step = jax.jit(make_classifier_train_step(opt))
    state = opt.init(params)
    first = float(
        gin_classifier_loss(params, g, x, ids, y.shape[0], y)
    )
    for _ in range(12):
        params, state, loss = step(params, state, g, x, ids, y)
    assert np.isfinite(float(loss))
    assert float(loss) < first

    grads = jax.grad(gin_classifier_loss)(params, g, x, ids, y.shape[0], y)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(p))) for p in flat)
