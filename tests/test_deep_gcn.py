"""Deep scanned GCN: remat parity (outputs AND grads identical) and the
memory trade (remat strictly shrinks compiled temp memory)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.models import build_graph
from voltrix_spmm_tpu.models.deep_gcn import (
    deep_gcn_forward,
    deep_gcn_loss,
    init_deep_gcn,
    make_deep_train_step,
)

CFG = PlanConfig(32, 128)


def _problem(rng, n=256, d=16, hidden=32, classes=4, layers=6):
    a = sp.random(n, n, density=0.04, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    g = build_graph(a.indptr, a.indices, n, CFG, symmetric=True)
    params = init_deep_gcn(jax.random.PRNGKey(0), d, hidden, classes, layers)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, size=n))
    return g, params, x, y


def test_remat_forward_identical(rng):
    g, params, x, _ = _problem(rng)
    out = deep_gcn_forward(params, g, x, remat=False)
    out_r = deep_gcn_forward(params, g, x, remat=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_r))


def test_remat_grads_match(rng):
    g, params, x, y = _problem(rng)
    g_plain = jax.grad(deep_gcn_loss)(params, g, x, y, remat=False)
    g_remat = jax.grad(deep_gcn_loss)(params, g, x, y, remat=True)
    for k in g_plain:
        np.testing.assert_allclose(
            np.asarray(g_plain[k]), np.asarray(g_remat[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_deep_gcn_matches_dense_oracle(rng):
    n, d, hidden, classes, layers = 192, 8, 16, 3, 5
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    g = build_graph(a.indptr, a.indices, n, CFG, symmetric=True)
    params = init_deep_gcn(jax.random.PRNGKey(1), d, hidden, classes, layers)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    ad = jnp.asarray(a.toarray())
    invd = jnp.asarray(
        (1.0 / np.maximum(np.diff(a.indptr), 1.0)).astype(np.float32)[:, None]
    )

    def agg(h):
        return invd * (ad @ h)

    h = jax.nn.relu(agg(x) @ params["w_in"] + params["b_in"])
    for i in range(layers - 2):
        h = h + jax.nn.relu(agg(h) @ params["w_mid"][i] + params["b_mid"][i])
    ref = agg(h) @ params["w_out"] + params["b_out"]

    out = deep_gcn_forward(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_train_step_learns(rng):
    g, params, x, y = _problem(rng, layers=4)
    opt = optax.adam(3e-2)
    step = make_deep_train_step(opt, remat=True)
    state = opt.init(params)
    losses = []
    for _ in range(40):
        params, state, loss = step(params, state, g, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_remat_shrinks_temp_memory(rng):
    """AOT memory analysis: checkpointed layers hold O(1) hidden
    residuals instead of O(L). Skipped when the backend reports no
    memory analysis."""
    import pytest

    from voltrix_spmm_tpu.serve import compiled_stats

    g, params, x, y = _problem(rng, n=512, d=32, hidden=256, layers=10)
    opt = optax.sgd(1e-2)
    state = opt.init(params)

    def temp_bytes(remat):
        step = make_deep_train_step(opt, remat=remat)
        compiled = step.lower(params, state, g, x, y).compile()
        return compiled_stats(compiled).get("temp_size_in_bytes")

    plain, remat = temp_bytes(False), temp_bytes(True)
    if not plain or not remat:
        pytest.skip("backend reports no memory analysis")
    assert remat < plain, (remat, plain)
