"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.models import build_graph, gcn_forward, init_gcn
from voltrix_spmm_tpu.ops import spmm_pallas
from voltrix_spmm_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    sharded_gcn_forward,
    sharded_spmm,
)

CFG = PlanConfig(32, 128)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "model")


def test_sharded_spmm_matches_single(rng):
    n, d = 256, 256  # d split 4-ways over 'model'
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    plan = csr_preprocess(a.indptr, a.indices, n, CFG)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    mesh = make_mesh(8)
    out_sharded = np.asarray(sharded_spmm(plan, x, mesh))
    out_single = np.asarray(spmm_pallas(plan, x))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-5, atol=1e-4)


def test_sharded_gcn_forward_matches_single(rng):
    n, d, h, c, b = 192, 32, 64, 4, 2
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    g = build_graph(a.indptr, a.indices, n, CFG)
    params = init_gcn(jax.random.PRNGKey(0), d, h, c)
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    mesh = make_mesh(8)
    out_sharded = np.asarray(sharded_gcn_forward(params, g, x, mesh))
    out_single = np.asarray(gcn_forward(params, g, x))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-4, atol=1e-3)


def test_row_sharded_spmm_matches_single(rng):
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.parallel import build_row_sharded_plan, row_sharded_spmm
    from voltrix_spmm_tpu.ops import spmm_scipy

    n, d, ndev = 700, 64, 4  # n not divisible by ndev*block_h -> padding
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)

    plan = build_row_sharded_plan(a.indptr, a.indices, n, ndev, CFG)
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    x_pad = np.zeros((plan.num_nodes, d), np.float32)
    x_pad[:n] = feat
    out = np.asarray(row_sharded_spmm(plan, jnp.asarray(x_pad), mesh))
    np.testing.assert_allclose(out[:n], oracle, rtol=1e-5, atol=1e-4)
    assert np.abs(out[n:]).max() == 0.0


def test_row_sharded_gcn_training(rng):
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.models import init_gcn
    from voltrix_spmm_tpu.parallel import (
        build_row_sharded_plan,
        make_row_sharded_train_step,
    )

    n, d, hidden, classes, ndev = 512, 16, 32, 4, 4
    # planted partition so the loss genuinely decreases
    comm = n // classes
    rows = rng.integers(0, n, size=n * 6)
    cols = (rows // comm) * comm + rng.integers(0, comm, size=rows.shape[0])
    a = sp.csr_matrix((np.ones(rows.shape[0]), (rows, cols)), shape=(n, n))
    a = ((a + a.T) != 0).astype(np.float32).tocsr()

    plan = build_row_sharded_plan(
        a.indptr, a.indices, n, ndev, CFG, with_transpose=True
    )
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    n_pad = plan.num_nodes
    deg = np.maximum(np.asarray(a.sum(1)).ravel(), 1.0)
    inv_deg = np.zeros(n_pad, np.float32)
    inv_deg[:n] = 1.0 / deg
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    y = np.full(n_pad, -100, np.int32)  # pad rows excluded from loss
    y[:n] = np.arange(n) // comm

    params = init_gcn(jax.random.PRNGKey(0), d, hidden, classes)
    step = make_row_sharded_train_step(plan, mesh, inv_deg, lr=5e-2)
    params, loss0 = step(params, jnp.asarray(x), jnp.asarray(y))
    for _ in range(15):
        params, loss = step(params, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(loss))
    assert float(loss) < float(loss0)


def test_rectangular_plan(rng):
    # rows != cols: 100 output rows gathering from 300 source rows
    from voltrix_spmm_tpu.format import csr_preprocess
    from voltrix_spmm_tpu.ops import spmm_pallas

    rows, cols_n, d = 100, 300, 32
    dense = (rng.random((rows, cols_n)) < 0.05).astype(np.float32)
    csr = sp.csr_matrix(dense)
    plan = csr_preprocess(
        csr.indptr, csr.indices, rows, CFG, num_cols=cols_n
    )
    x = rng.standard_normal((cols_n, d)).astype(np.float32)
    out = np.asarray(spmm_pallas(plan, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-5, atol=1e-4)


def test_sharded_train_step_runs_and_learns(rng):
    n, d, h, c, b = 128, 16, 32, 3, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    g = build_graph(a.indptr, a.indices, n, CFG)
    params = init_gcn(jax.random.PRNGKey(0), d, h, c)
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, size=(b, n)))
    mesh = make_mesh(8)
    step = make_sharded_train_step(mesh, lr=5e-2)
    _, loss0 = step(params, g, x, y)
    for _ in range(10):
        params, loss = step(params, g, x, y)
    assert float(loss) < float(loss0)
    assert np.isfinite(float(loss))


def test_balanced_row_sharding(rng):
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.parallel import build_row_sharded_plan, row_sharded_spmm
    from voltrix_spmm_tpu.ops import spmm_scipy

    # heavily skewed: first 30 rows are hubs
    n, d, ndev = 600, 48, 4
    dense = np.zeros((n, n), np.float32)
    dense[:30] = (rng.random((30, n)) < 0.4)
    dense[30:] = (rng.random((n - 30, n)) < 0.01)
    a = sp.csr_matrix(dense)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)

    unbal = build_row_sharded_plan(a.indptr, a.indices, n, ndev, CFG)
    bal = build_row_sharded_plan(a.indptr, a.indices, n, ndev, CFG, balance=True)
    # balancing shrinks the padded block count on skewed graphs
    assert bal.tb_max < unbal.tb_max

    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    x_pad = np.zeros((bal.num_nodes, d), np.float32)
    x_pad[:n] = feat
    out = np.asarray(row_sharded_spmm(bal, jnp.asarray(x_pad), mesh))
    np.testing.assert_allclose(out[:n], oracle, rtol=1e-5, atol=1e-4)


def test_balanced_row_sharded_training(rng):
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.models import init_gcn
    from voltrix_spmm_tpu.parallel import (
        build_row_sharded_plan,
        make_row_sharded_train_step,
    )

    n, d, hidden, classes, ndev = 384, 16, 32, 4, 4
    comm = n // classes
    rows = rng.integers(0, n, size=n * 6)
    cols = (rows // comm) * comm + rng.integers(0, comm, size=rows.shape[0])
    a = sp.csr_matrix((np.ones(rows.shape[0]), (rows, cols)), shape=(n, n))
    a = ((a + a.T) != 0).astype(np.float32).tocsr()

    plan = build_row_sharded_plan(
        a.indptr, a.indices, n, ndev, CFG, with_transpose=True, balance=True
    )
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    n_pad = plan.num_nodes
    deg = np.maximum(np.asarray(a.sum(1)).ravel(), 1.0)
    inv_deg = np.zeros(n_pad, np.float32)
    inv_deg[:n] = 1.0 / deg
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    y = np.full(n_pad, -100, np.int32)
    y[:n] = np.arange(n) // comm

    params = init_gcn(jax.random.PRNGKey(0), d, hidden, classes)
    step = make_row_sharded_train_step(plan, mesh, inv_deg, lr=5e-2)
    params, loss0 = step(params, jnp.asarray(x), jnp.asarray(y))
    for _ in range(12):
        params, loss = step(params, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(loss)) and float(loss) < float(loss0)


def test_ring_sharded_spmm_matches_oracle(rng):
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.ops import spmm_scipy
    from voltrix_spmm_tpu.parallel import build_ring_sharded_plan, ring_sharded_spmm

    n, d, ndev = 700, 48, 4  # unaligned n -> padded shards
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)

    plan = build_ring_sharded_plan(a.indptr, a.indices, n, ndev, CFG)
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    x_pad = np.zeros((plan.num_nodes, d), np.float32)
    x_pad[:n] = feat
    out = np.asarray(ring_sharded_spmm(plan, jnp.asarray(x_pad), mesh))
    np.testing.assert_allclose(out[:n], oracle, rtol=1e-5, atol=1e-4)
    assert np.abs(out[n:]).max() == 0.0


def test_ring_sharded_grad_matches_dense(rng):
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.parallel import build_ring_sharded_plan, ring_sharded_spmm

    n, d, ndev = 256, 16, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    plan = build_ring_sharded_plan(
        a.indptr, a.indices, n, ndev, CFG, with_transpose=True
    )
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    n_pad = plan.num_nodes
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    w = rng.standard_normal((n_pad, d)).astype(np.float32)

    def loss(xj):
        return jnp.sum(ring_sharded_spmm(plan, xj, mesh) * w)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    dense = np.zeros((n_pad, n_pad), np.float32)
    dense[:n, :n] = (a.toarray() != 0)
    g_ref = dense.T @ w
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-3)


def test_ring_forward_only_grad_raises(rng):
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.parallel import build_ring_sharded_plan, ring_sharded_spmm

    n, d, ndev = 128, 8, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    plan = build_ring_sharded_plan(a.indptr, a.indices, n, ndev, CFG)
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    x = jnp.zeros((plan.num_nodes, d), jnp.float32)
    with pytest.raises(ValueError, match="with_transpose"):
        jax.grad(lambda xj: jnp.sum(ring_sharded_spmm(plan, xj, mesh)))(x)


def test_row_sharded_multihost_mesh(rng):
    """Multi-host story (ROADMAP #8): the all_gather trainer runs on a
    2D (host, chip) mesh with rows sharded over BOTH axes — the DCN x
    ICI layout; collectives take the axis tuple. Loss must match the
    flat single-axis mesh."""
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.models import init_gcn
    from voltrix_spmm_tpu.parallel import (
        build_row_sharded_plan,
        make_row_sharded_train_step,
    )

    n, d, hidden, classes, ndev = 256, 16, 8, 4, 8
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    plan = build_row_sharded_plan(
        a.indptr, a.indices, n, ndev, CFG, with_transpose=True
    )
    n_pad = plan.num_nodes
    deg = np.maximum(np.diff(a.indptr).astype(np.float32), 1.0)
    inv_deg = np.zeros(n_pad, np.float32)
    inv_deg[:n] = 1.0 / deg
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    y = np.full(n_pad, -100, np.int32)
    y[:n] = rng.integers(0, classes, size=n)
    params = init_gcn(jax.random.PRNGKey(0), d, hidden, classes)

    mesh2d = Mesh(
        np.asarray(jax.devices()[:ndev]).reshape(2, 4), ("host", "chip")
    )
    step2d = make_row_sharded_train_step(
        plan, mesh2d, inv_deg, lr=5e-2, axis=("host", "chip")
    )
    _, loss2d = step2d(params, jnp.asarray(x), jnp.asarray(y))

    mesh1d = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    step1d = make_row_sharded_train_step(plan, mesh1d, inv_deg, lr=5e-2)
    _, loss1d = step1d(params, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(loss2d), float(loss1d), rtol=1e-5)


def test_ring_train_step_decreases_loss_and_matches_allgather(rng):
    """The ring trainer (ROADMAP #7) must train, and its loss must match
    the all_gather trainer's on the same problem (identical math,
    different comm schedule)."""
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.models import init_gcn
    from voltrix_spmm_tpu.parallel import (
        build_ring_sharded_plan,
        build_row_sharded_plan,
        make_ring_train_step,
        make_row_sharded_train_step,
    )

    n, d, hidden, classes, ndev = 256, 16, 8, 4, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    plan = build_ring_sharded_plan(
        a.indptr, a.indices, n, ndev, CFG, with_transpose=True
    )
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    n_pad = plan.num_nodes
    deg = np.maximum(np.diff(a.indptr).astype(np.float32), 1.0)
    inv_deg = np.zeros(n_pad, np.float32)
    inv_deg[:n] = 1.0 / deg
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    y = np.full(n_pad, -100, np.int32)
    y[:n] = rng.integers(0, classes, size=n)
    params = init_gcn(jax.random.PRNGKey(0), d, hidden, classes)

    step = make_ring_train_step(plan, mesh, inv_deg, lr=5e-2)
    p, loss0 = step(params, jnp.asarray(x), jnp.asarray(y))
    for _ in range(4):
        p, loss = step(p, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(loss)) and float(loss) < float(loss0)

    # one-step parity vs the all_gather trainer (contiguous shards share
    # the same row layout, so losses must agree to numeric tolerance)
    rs_plan = build_row_sharded_plan(
        a.indptr, a.indices, n, ndev, CFG, with_transpose=True
    )
    rs_step = make_row_sharded_train_step(rs_plan, mesh, inv_deg, lr=5e-2)
    _, rs_loss0 = rs_step(params, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(loss0), float(rs_loss0), rtol=1e-4)


def test_balanced_training_matches_unbalanced(rng):
    """Degree-balanced training computes the SAME model as contiguous
    sharding (advisor r1: the permuted layer-1 activations used to be
    aggregated with original-order column ids, silently scrambling layer
    2 — loss-decreases tests cannot catch that)."""
    from jax.sharding import Mesh
    from voltrix_spmm_tpu.models import init_gcn
    from voltrix_spmm_tpu.parallel import (
        build_row_sharded_plan,
        make_row_sharded_train_step,
    )

    n, d, hidden, classes, ndev = 320, 12, 24, 4, 4
    # skewed degrees so balance actually permutes rows
    dense = np.zeros((n, n), np.float32)
    dense[:20] = rng.random((20, n)) < 0.3
    dense[20:] = rng.random((n - 20, n)) < 0.02
    a = sp.csr_matrix(dense)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()

    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    params = init_gcn(jax.random.PRNGKey(1), d, hidden, classes)
    plans = {
        balance: build_row_sharded_plan(
            a.indptr, a.indices, n, ndev, CFG,
            with_transpose=True, balance=balance,
        )
        for balance in (False, True)
    }
    n_pad = plans[False].num_nodes
    assert plans[True].num_nodes == n_pad
    deg = np.maximum(np.asarray(a.sum(1)).ravel(), 1.0)
    inv_deg = np.zeros(n_pad, np.float32)
    inv_deg[:n] = 1.0 / deg
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    y = np.full(n_pad, -100, np.int32)
    y[:n] = np.arange(n) % classes
    losses = {}
    for balance, plan in plans.items():
        step = make_row_sharded_train_step(plan, mesh, inv_deg, lr=1e-2)
        _, loss = step(params, jnp.asarray(x), jnp.asarray(y))
        losses[balance] = float(loss)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_distributed_updates_match_dense_oracle(rng):
    """PARAMETER-update parity for all three trainers vs a dense-oracle
    SGD step (round-3 fix: under check_vma=False the transpose of an
    in-body lax.psum is psum again — the row-sharded trainer trained
    with ndev-scaled gradients and dp x tp with tp-scaled W grads;
    loss-only parity never caught either)."""
    import optax

    from jax.sharding import Mesh
    from voltrix_spmm_tpu.data import erdos_renyi_csr, symmetrize
    from voltrix_spmm_tpu.parallel import (
        build_ring_sharded_plan,
        build_row_sharded_plan,
        make_ring_train_step,
        make_row_sharded_train_step,
    )

    n, d, classes, ndev = 256, 32, 4, 8
    a = symmetrize(erdos_renyi_csr(n, 0.02, seed=0))
    params = init_gcn(jax.random.PRNGKey(0), d, 16, classes)
    deg = np.maximum(np.diff(a.indptr).astype(np.float32), 1.0)

    def dense_step(n_pad, x, y, invd, lr=1e-2):
        ap = np.zeros((n_pad, n_pad), np.float32)
        ap[:n, :n] = a.toarray()
        apj, invdj = jnp.asarray(ap), jnp.asarray(invd.reshape(-1, 1))
        xf, yf = jnp.asarray(x), jnp.asarray(y)

        def loss(p):
            h = invdj * (apj @ xf)
            h = jax.nn.relu(h @ p["w1"] + p["b1"])
            h = invdj * (apj @ h)
            logits = h @ p["w2"] + p["b2"]
            mask = yf >= 0
            l = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(yf, 0)
            )
            return jnp.where(mask, l, 0.0).sum() / jnp.maximum(mask.sum(), 1)

        g = jax.grad(loss)(params)
        return jax.tree.map(lambda p, gr: p - lr * gr, params, g)

    def max_delta(t1, t2):
        return max(
            float(jnp.max(jnp.abs(u - v)))
            for u, v in zip(jax.tree.leaves(t1), jax.tree.leaves(t2))
        )

    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    for builder, stepper in (
        (build_row_sharded_plan, make_row_sharded_train_step),
        (build_ring_sharded_plan, make_ring_train_step),
    ):
        plan = builder(
            a.indptr, a.indices, n, ndev, CFG, with_transpose=True
        )
        n_pad = plan.num_nodes
        invd = np.zeros(n_pad, np.float32)
        invd[:n] = 1.0 / deg
        x = np.zeros((n_pad, d), np.float32)
        x[:n] = rng.standard_normal((n, d))
        y = np.full(n_pad, -100, np.int32)
        y[:n] = rng.integers(0, classes, n)
        step = stepper(plan, mesh, invd, lr=1e-2)
        new_p, loss = step(params, jnp.asarray(x), jnp.asarray(y))
        want = dense_step(n_pad, x, y, invd)
        assert max_delta(new_p, want) < 1e-5, stepper.__name__


def _hybrid_mesh(nhost=2, nchip=4):
    from jax.sharding import Mesh

    return Mesh(
        np.asarray(jax.devices()[: nhost * nchip]).reshape(nhost, nchip),
        ("host", "chip"),
    )


def test_hybrid_sharded_spmm_matches_oracle(rng):
    from voltrix_spmm_tpu.ops import spmm_scipy
    from voltrix_spmm_tpu.parallel import (
        build_ring_sharded_plan,
        hybrid_sharded_spmm,
    )

    n, d, nhost, nchip = 700, 48, 2, 4  # unaligned n -> padded shards
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)

    plan = build_ring_sharded_plan(a.indptr, a.indices, n, nhost * nchip, CFG)
    mesh = _hybrid_mesh(nhost, nchip)
    x_pad = np.zeros((plan.num_nodes, d), np.float32)
    x_pad[:n] = feat
    out = np.asarray(hybrid_sharded_spmm(plan, jnp.asarray(x_pad), mesh))
    np.testing.assert_allclose(out[:n], oracle, rtol=1e-5, atol=1e-4)
    assert np.abs(out[n:]).max() == 0.0


def test_hybrid_sharded_grad_matches_dense(rng):
    from voltrix_spmm_tpu.parallel import (
        build_ring_sharded_plan,
        hybrid_sharded_spmm,
    )

    n, d, nhost, nchip = 256, 16, 2, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    plan = build_ring_sharded_plan(
        a.indptr, a.indices, n, nhost * nchip, CFG, with_transpose=True
    )
    mesh = _hybrid_mesh(nhost, nchip)
    n_pad = plan.num_nodes
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    w = rng.standard_normal((n_pad, d)).astype(np.float32)

    def loss(xj):
        return jnp.sum(hybrid_sharded_spmm(plan, xj, mesh) * w)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    dense = np.zeros((n_pad, n_pad), np.float32)
    dense[:n, :n] = (a.toarray() != 0)
    g_ref = dense.T @ w
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-3)


def test_hybrid_train_step_matches_ring(rng):
    """The hybrid (all_gather over DCN x ring over ICI) trainer computes
    the identical full-graph GCN step as the single-axis ring trainer —
    only the collective topology differs."""
    from voltrix_spmm_tpu.parallel import (
        build_ring_sharded_plan,
        make_hybrid_train_step,
        make_ring_train_step,
    )
    from jax.sharding import Mesh

    n, d, hidden, classes = 320, 16, 8, 3
    ndev = 8
    a = sp.random(n, n, density=0.04, format="csr", random_state=rng)
    plan = build_ring_sharded_plan(
        a.indptr, a.indices, n, ndev, CFG, with_transpose=True
    )
    n_pad = plan.num_nodes
    deg = np.maximum(np.diff(a.indptr).astype(np.float32), 1.0)
    inv_deg = np.zeros(n_pad, np.float32)
    inv_deg[:n] = 1.0 / deg
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    y = np.full(n_pad, -100, np.int32)
    y[:n] = rng.integers(0, classes, size=n)

    params = init_gcn(jax.random.PRNGKey(0), d, hidden, classes)
    hy_step = make_hybrid_train_step(plan, _hybrid_mesh(2, 4), inv_deg, lr=5e-2)
    ring_mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    ring_step = make_ring_train_step(plan, ring_mesh, inv_deg, lr=5e-2)

    hp, hl = hy_step(params, jnp.asarray(x), jnp.asarray(y))
    rp, rl = ring_step(params, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(hl), float(rl), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(hp[k]), np.asarray(rp[k]), rtol=1e-4, atol=1e-5
        )

    # and it trains
    p, l0 = hy_step(params, jnp.asarray(x), jnp.asarray(y))
    for _ in range(10):
        p, l = hy_step(p, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(l)) and float(l) < float(l0)
