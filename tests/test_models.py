"""Model-layer tests: aggregation semantics, autodiff, GCN/SAGE training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.models import (
    aggregate,
    build_graph,
    gcn_forward,
    gcn_loss,
    init_gcn,
    init_sage,
    make_train_step,
    sage_forward,
)

CFG = PlanConfig(32, 128)


def small_graph(rng, n=200, density=0.03, symmetric=True):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    if symmetric:
        a = ((a + a.T) != 0).astype(np.float32).tocsr()
    return a, build_graph(a.indptr, a.indices, n, CFG, symmetric=symmetric)


def test_spmm_ad_dispatches_fused_for_coverage_plans(rng):
    """A graph preprocessed with gather_segment >= 8 trains through the
    fused bulk-DMA kernel in both directions (spmm_ad dispatch)."""
    from voltrix_spmm_tpu.format import csr_preprocess
    from voltrix_spmm_tpu.ops import spmm_ad, spmm_scipy

    n, d = 300, 24
    a = sp.random(n, n, density=0.04, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(32, 128, gather_segment=8)
    )
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out = np.asarray(spmm_ad(plan, plan, x))
    np.testing.assert_allclose(
        out,
        spmm_scipy(a.indptr, a.indices, n, np.asarray(x)),
        rtol=1e-4, atol=1e-4,
    )
    g = jax.grad(lambda xj: jnp.sum(spmm_ad(plan, plan, xj) ** 2))(x)
    dense = a.toarray()
    want = 2.0 * dense.T @ (dense @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-3)


def test_build_graph_auto_config(rng):
    """config='auto' routes dense-ish graphs to the fused coverage plan
    and scattered ones to the pregather default, both correct."""
    from voltrix_spmm_tpu.models import build_graph

    n, d = 600, 24
    # dense-ish: high density -> low coverage waste -> fused config
    a = sp.random(n, n, density=0.2, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    g = build_graph(a.indptr, a.indices, n, config="auto", symmetric=True)
    assert g.plan.config.gather_segment == 128
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out = np.asarray(aggregate(g, x, mode="sum"))
    np.testing.assert_allclose(out, a @ np.asarray(x), rtol=1e-4, atol=1e-3)

    # scattered: one neighbor per 128-aligned stride -> pregather
    rows = np.arange(n, dtype=np.int64)
    cols = (rows * 131) % n
    a2 = sp.csr_matrix((np.ones(n, np.float32), (rows, cols)), shape=(n, n))
    g2 = build_graph(a2.indptr, a2.indices, n, config="auto", symmetric=False)
    assert g2.plan.config.gather_segment == 1

    with pytest.raises(ValueError, match="auto"):
        build_graph(a2.indptr, a2.indices, n, config="fused")


def test_build_graph_auto_scattered_clustered_branch(rng):
    """Scattered graphs >= 4096 nodes route to tall clustered-subtile
    windows; forward AND backward correct through spmm_ad's plan-driven
    subtile dispatch."""
    from voltrix_spmm_tpu.models import build_graph

    n, d = 4608, 16
    # strided neighbors: every edge lands in its own 128-segment, so
    # coverage waste is huge and the fused gate rejects the graph
    rows = np.repeat(np.arange(n, dtype=np.int64), 2)
    cols = np.concatenate([(np.arange(n) * 131) % n, (np.arange(n) * 257) % n])
    a = sp.csr_matrix(
        (np.ones(rows.shape[0], np.float32), (rows, np.sort(cols.reshape(2, n), 0).T.ravel())),
        shape=(n, n),
    )
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    g = build_graph(a.indptr, a.indices, n, config="auto", symmetric=True)
    assert g.plan.config.cluster_cols and g.plan.config.block_h == 2048
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out = np.asarray(aggregate(g, x, mode="sum"))
    np.testing.assert_allclose(out, a @ np.asarray(x), rtol=1e-4, atol=1e-3)
    grad = jax.grad(lambda xj: jnp.sum(aggregate(g, xj, mode="sum") ** 2))(x)
    dense = a.toarray()
    want = 2.0 * dense.T @ (dense @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), want, rtol=1e-4, atol=1e-2)


def test_build_graph_auto_asymmetric_transpose_gate(rng):
    """The auto gate evaluates A^T on ITS OWN coverage: one dense ROW
    makes A coverage-wasteful (cov=1.0, every covered row distinct) but
    its transpose is one dense COLUMN (every window covers only segment
    0 -> cov ~0.08, fused-eligible). The two plans must diverge."""
    from voltrix_spmm_tpu.models import build_graph

    n = 4608
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = n  # row 0 has all n neighbors, others empty
    indices = np.arange(n, dtype=np.int64)
    g = build_graph(indptr, indices, n, config="auto", symmetric=False)
    assert g.plan.config.gather_segment == 1, "A must not get a coverage plan"
    assert g.plan_t.config.gather_segment == 128, (
        "A^T (a dense column) is fused-eligible on its own coverage"
    )
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    out = np.asarray(aggregate(g, x, mode="sum"))
    want = np.zeros((n, 8), np.float32)
    want[0] = np.asarray(x).sum(axis=0)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3)


def test_spmm_ad_dispatches_hybrid_plan(rng):
    """spmm_ad trains through a HybridPlan forward (the rmat-17 d512
    sweep winner) with a regular transpose plan for the backward."""
    from voltrix_spmm_tpu.format import csr_preprocess
    from voltrix_spmm_tpu.format.hybrid import csr_preprocess_hybrid
    from voltrix_spmm_tpu.ops import spmm_ad, spmm_scipy

    n, d = 300, 24
    a = sp.random(n, n, density=0.04, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    hp = csr_preprocess_hybrid(a.indptr, a.indices, n)
    plan_t = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out = np.asarray(spmm_ad(hp, plan_t, x))
    np.testing.assert_allclose(
        out, spmm_scipy(a.indptr, a.indices, n, np.asarray(x)),
        rtol=1e-4, atol=1e-4,
    )
    g = jax.grad(lambda xj: jnp.sum(spmm_ad(hp, plan_t, xj) ** 2))(x)
    dense = a.toarray()
    want = 2.0 * dense.T @ (dense @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-3)


def test_aggregate_mean_matches_scipy(rng):
    a, g = small_graph(rng)
    n = a.shape[0]
    x = rng.standard_normal((n, 48)).astype(np.float32)
    out = np.asarray(aggregate(g, jnp.asarray(x), mode="mean"))
    deg = np.maximum(np.asarray(a.sum(axis=1)), 1.0)
    expect = (a @ x) / deg
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-4)


def test_aggregate_batched_equals_loop(rng):
    a, g = small_graph(rng)
    n = a.shape[0]
    x = rng.standard_normal((3, n, 32)).astype(np.float32)
    out = np.asarray(aggregate(g, jnp.asarray(x)))
    for b in range(3):
        single = np.asarray(aggregate(g, jnp.asarray(x[b])))
        np.testing.assert_allclose(out[b], single, rtol=1e-5, atol=1e-5)


def test_spmm_gradient_matches_dense(rng):
    # d/dX sum(W ⊙ (A @ X)) == A^T @ W — check against dense autodiff
    a, g = small_graph(rng, n=150, symmetric=False)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))

    grad = jax.grad(lambda xx: jnp.sum(w * aggregate(g, xx, mode="sum")))(x)
    ad = jnp.asarray(a.toarray())
    grad_dense = jax.grad(lambda xx: jnp.sum(w * (ad @ xx)))(x)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(grad_dense), rtol=1e-5, atol=1e-4
    )


def test_gcn_training_reduces_loss(rng):
    a, g = small_graph(rng)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 24)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=(n,)))
    params = init_gcn(jax.random.PRNGKey(0), 24, 32, 4)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(tx))
    loss0 = float(gcn_loss(params, g, x, y))
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, g, x, y)
    assert float(loss) < loss0


def test_sage_forward_shapes(rng):
    a, g = small_graph(rng)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 24)).astype(np.float32))
    params = init_sage(jax.random.PRNGKey(1), 24, 16, 5)
    out = sage_forward(params, g, x)
    assert out.shape == (n, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_gcn_forward_batched(rng):
    a, g = small_graph(rng)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((2, n, 24)).astype(np.float32))
    params = init_gcn(jax.random.PRNGKey(0), 24, 16, 3)
    out = gcn_forward(params, g, x)
    assert out.shape == (2, n, 3)


def test_gin_forward_and_grad(rng):
    import optax
    from voltrix_spmm_tpu.models import gin_forward, init_gin

    a, g = small_graph(rng)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 24)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(n,)))
    params = init_gin(jax.random.PRNGKey(3), 24, 32, 5)
    out = gin_forward(params, g, x)
    assert out.shape == (n, 5)
    assert np.isfinite(np.asarray(out)).all()

    def loss_fn(p):
        return optax.softmax_cross_entropy_with_integer_labels(
            gin_forward(p, g, x), y
        ).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(grads))


def test_aggregate_sym_matches_scipy(rng):
    a, g = small_graph(rng)
    n = a.shape[0]
    x = rng.standard_normal((n, 24)).astype(np.float32)
    out = np.asarray(aggregate(g, jnp.asarray(x), mode="sym"))
    deg = np.maximum(np.asarray(a.sum(axis=1)), 1.0)
    dinv = 1.0 / np.sqrt(deg)
    expect = dinv * (a @ (dinv * x))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-4)


def test_appnp_matches_dense_propagation(rng):
    """APPNP forward equals the dense K-step PPR recursion."""
    from voltrix_spmm_tpu.models import appnp_forward, init_appnp

    a, g = small_graph(rng)
    n, d, hidden, classes = a.shape[0], 12, 8, 4
    params = init_appnp(jax.random.PRNGKey(0), d, hidden, classes)
    x = rng.standard_normal((n, d)).astype(np.float32)
    k, alpha = 5, 0.15
    out = np.asarray(appnp_forward(params, g, jnp.asarray(x), k=k, alpha=alpha))

    deg = np.maximum(np.asarray(a.sum(1)).ravel(), 1.0)
    dinv = 1.0 / np.sqrt(deg)
    ahat = dinv[:, None] * a.toarray() * dinv[None, :]
    h = np.maximum(x @ np.asarray(params["w1"]) + np.asarray(params["b1"]), 0)
    h = h @ np.asarray(params["w2"]) + np.asarray(params["b2"])
    z = h.copy()
    for _ in range(k):
        z = (1 - alpha) * (ahat @ z) + alpha * h
    np.testing.assert_allclose(out, z, rtol=1e-4, atol=1e-3)


def test_appnp_trains(rng):
    import optax

    from voltrix_spmm_tpu.models import appnp_loss, init_appnp

    a, g = small_graph(rng)
    n, d, classes = a.shape[0], 12, 4
    params = init_appnp(jax.random.PRNGKey(1), d, 8, classes)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, size=n))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(appnp_loss)(p, g, x, y)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    params, opt_state, loss0 = step(params, opt_state)
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss)) and float(loss) < float(loss0)


def test_dropedge_expectation_and_determinism(rng):
    from voltrix_spmm_tpu.models import build_dropedge_graph, dropedge_aggregate

    n, d = 300, 16
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a.data[:] = 1.0
    g = build_dropedge_graph(a.indptr, a.indices, n, PlanConfig(32, 128))
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    # deterministic mode = exact full-graph aggregation
    out = np.asarray(
        dropedge_aggregate(g, x, jax.random.PRNGKey(0), deterministic=True)
    )
    np.testing.assert_allclose(out, a @ np.asarray(x), rtol=1e-4, atol=1e-3)

    # stochastic mode: mean over draws approaches the full aggregation
    acc = np.zeros((n, d), np.float32)
    reps = 48
    for i in range(reps):
        acc += np.asarray(
            dropedge_aggregate(g, x, jax.random.PRNGKey(i), keep_prob=0.7)
        )
    err = np.abs(acc / reps - a @ np.asarray(x)).mean()
    scale = np.abs(a @ np.asarray(x)).mean()
    assert err < 0.25 * scale, (err, scale)
    # and gradients flow
    grad = jax.grad(
        lambda xj: jnp.sum(
            dropedge_aggregate(g, xj, jax.random.PRNGKey(3), keep_prob=0.7)
            ** 2
        )
    )(x)
    assert np.isfinite(np.asarray(grad)).all()


def test_dropedge_duplicate_edges_eval_matches_training_convention(rng):
    """Duplicate (row, col) CSR edges sum in the training path's
    scatter-add; the deterministic/eval path must reproduce that
    multiplicity instead of the binary bitmask's count-once."""
    from voltrix_spmm_tpu.models import build_dropedge_graph, dropedge_aggregate

    n, d = 96, 8
    rows = np.array([0, 0, 1, 2, 5, 5, 5, 40], np.int64)
    cols = np.array([3, 3, 7, 0, 9, 9, 11, 40], np.int64)  # dups: (0,3)x2, (5,9)x2
    a = sp.csr_matrix(
        (np.ones(rows.shape[0], np.float32), (rows, cols)), shape=(n, n)
    )
    # scipy csr_matrix sums duplicates at construction — rebuild the
    # duplicate-carrying CSR explicitly to feed the plan builder
    order = np.lexsort((cols, rows))
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    indices = cols[order]
    g = build_dropedge_graph(indptr, indices, n, PlanConfig(32, 128))
    assert g.has_duplicate_edges
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out = np.asarray(
        dropedge_aggregate(g, x, jax.random.PRNGKey(0), deterministic=True)
    )
    np.testing.assert_allclose(out, a @ np.asarray(x), rtol=1e-4, atol=1e-4)
    # no duplicates -> the binary fast path stays in use
    a2 = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    g2 = build_dropedge_graph(a2.indptr, a2.indices, n, PlanConfig(32, 128))
    assert not g2.has_duplicate_edges


def test_auto_plan_config_bitmask_budget(rng):
    """auto config steps h2048 down to h512 clustered-subtile when the
    estimated dense bitmask would crowd device memory (the measured
    products-scale OOM + winner geometry)."""
    import scipy.sparse as sp

    from voltrix_spmm_tpu.models.graph import auto_plan_config

    # low-degree scattered graph: every 128-col segment is hit but
    # coverage waste is ~1 slot/edge, so the fused gate (<= 0.5) does
    # NOT fire and the pick lands in the tall-window branch
    n = 8192
    a = sp.random(n, n, density=4.0 / n, format="csr",
                  random_state=np.random.default_rng(3))
    big = auto_plan_config(a.indptr, a.indices, n)
    assert big.block_h == 2048 and big.cluster_cols
    tiny_budget = auto_plan_config(
        a.indptr, a.indices, n, bitmask_budget_bytes=1024
    )
    assert tiny_budget.block_h == 512 and tiny_budget.cluster_cols


def test_streamed_graph_training_parity(rng):
    """Window-chunked GraphData (stream_chunks): forward AND gradients
    match the unstreamed graph — the products-scale training path where
    one materialized gather exceeds HBM."""
    import jax
    import scipy.sparse as sp

    from voltrix_spmm_tpu.format import PlanConfig
    from voltrix_spmm_tpu.models import aggregate, build_graph

    n, d = 700, 32
    a = sp.random(n, n, density=0.02, format="csr",
                  random_state=np.random.default_rng(5))
    a = ((a + a.T) > 0).astype(np.float32).tocsr()
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    cfg = PlanConfig(128, 128, block_unroll=2)
    g1 = build_graph(a.indptr, a.indices, n, cfg, symmetric=True)
    g3 = build_graph(a.indptr, a.indices, n, cfg, symmetric=True,
                     stream_chunks=3)
    assert isinstance(g3.plan, list) and len(g3.plan) == 3
    assert g3.num_nodes == n

    out1 = np.asarray(aggregate(g1, x, mode="mean"))
    out3 = np.asarray(aggregate(g3, x, mode="mean"))
    np.testing.assert_allclose(out3, out1, rtol=1e-5, atol=1e-5)

    def loss(xx, g):
        return (aggregate(g, xx, mode="sum") ** 2).sum()

    g1x = np.asarray(jax.grad(loss)(x, g1))
    g3x = np.asarray(jax.grad(loss)(x, g3))
    np.testing.assert_allclose(g3x, g1x, rtol=1e-4, atol=1e-4)


def test_gcn_transform_first_order_parity(rng):
    """agg(x) @ W == agg(x @ W): the auto order picker (in_dim 320 >
    256 triggers transform-first on layer 1) matches the
    aggregate-then-transform order within float association."""
    n, d, hidden, classes = 256, 320, 64, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    g = build_graph(a.indptr, a.indices, n, PlanConfig(32, 128), symmetric=True)
    params = init_gcn(jax.random.PRNGKey(0), d, hidden, classes)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out_auto = np.asarray(gcn_forward(params, g, x))
    out_plain = np.asarray(gcn_forward(params, g, x, transform_first=False))
    np.testing.assert_allclose(out_auto, out_plain, rtol=1e-4, atol=1e-4)
    # grads agree through both orders too
    y = jnp.asarray(rng.integers(0, classes, size=n))
    from voltrix_spmm_tpu.models import gcn_loss

    g_auto = jax.grad(gcn_loss)(params, g, x, y)
    ref_loss = lambda p: gcn_loss(p, g, x, y)  # default auto
    g2 = jax.grad(lambda p: ref_loss(p))(params)
    for k in g_auto:
        np.testing.assert_allclose(
            np.asarray(g_auto[k]), np.asarray(g2[k]), rtol=1e-5, atol=1e-6
        )


def test_build_graph_plans_are_device_resident(rng):
    """Regression: GraphData travels as a traced jit argument, so plan
    leaves must be committed device arrays — numpy leaves re-upload the
    whole plan on EVERY dispatch (measured ~4 s of fixed per-dispatch
    transfer at rmat-17 scale, 200x the train step it fed)."""
    n = 256
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    g = build_graph(a.indptr, a.indices, n, PlanConfig(32, 128), symmetric=True)
    for leaf in jax.tree.leaves((g.plan, g.plan_t)):
        assert isinstance(leaf, jax.Array), type(leaf)
    g2 = build_graph(a.indptr, a.indices, n, PlanConfig(32, 128),
                     symmetric=True, stream_chunks=2)
    for leaf in jax.tree.leaves(g2.plan):
        assert isinstance(leaf, jax.Array), type(leaf)
