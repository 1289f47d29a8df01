"""R-GCN: per-relation SpMM aggregation, basis decomposition, training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.models import (
    build_graph,
    init_rgcn,
    make_rgcn_train_step,
    rgcn_forward,
    rgcn_loss,
)

CFG = PlanConfig(32, 128)


def _rel_graphs(rng, n=200, num_rels=3, density=0.04):
    mats, graphs = [], []
    for _ in range(num_rels):
        a = sp.random(n, n, density=density, format="csr", random_state=rng)
        a.data[:] = 1.0
        mats.append(a)
        graphs.append(
            build_graph(a.indptr, a.indices, n, CFG, symmetric=False)
        )
    return mats, graphs


def _dense_forward(params, mats, x):
    def layer(layer_p, h):
        if "w_rel" in layer_p:
            w_rel = np.asarray(layer_p["w_rel"])
        else:
            w_rel = np.einsum(
                "rb,bio->rio",
                np.asarray(layer_p["a_coef"]),
                np.asarray(layer_p["v_bases"]),
            )
        z = h @ np.asarray(layer_p["w_self"]) + np.asarray(layer_p["b"])
        for r, a in enumerate(mats):
            deg = np.maximum(np.asarray(a.sum(axis=1)), 1.0)
            agg = (a @ h) / deg
            z = z + agg @ w_rel[r]
        return z

    h = np.maximum(layer(params["layers"][0], x), 0.0)
    return layer(params["layers"][1], h)


@pytest.mark.parametrize("num_bases", [None, 2])
def test_rgcn_forward_matches_dense(rng, num_bases):
    n, d, hidden, classes, R = 200, 8, 12, 4, 3
    mats, graphs = _rel_graphs(rng, n=n, num_rels=R)
    x = rng.standard_normal((n, d)).astype(np.float32)
    params = init_rgcn(
        jax.random.PRNGKey(0), d, hidden, classes, R, num_bases=num_bases
    )
    got = np.asarray(rgcn_forward(params, graphs, jnp.asarray(x)))
    want = _dense_forward(params, mats, x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rgcn_trains(rng):
    n, d, hidden, classes, R = 240, 8, 16, 3, 2
    mats, graphs = _rel_graphs(rng, n=n, num_rels=R)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = np.full(n, -100, np.int32)
    train = rng.choice(n, size=n // 2, replace=False)
    y[train] = rng.integers(0, classes, size=len(train))
    y = jnp.asarray(y)

    params = init_rgcn(jax.random.PRNGKey(1), d, hidden, classes, R, num_bases=2)
    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = jax.jit(make_rgcn_train_step(opt))
    first = float(rgcn_loss(params, graphs, x, y))
    for _ in range(15):
        params, state, loss = step(params, state, graphs, x, y)
    assert np.isfinite(float(loss))
    assert float(loss) < first

    grads = jax.grad(rgcn_loss)(params, graphs, x, y)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
