"""Flash GAT (models/gat_flash.py): head-for-head parity with the
three-pass ELL formulation, full-model parity with identical params,
and training."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.models import (
    build_ell_graph,
    dot_attention_aggregate,
    flash_attention_aggregate,
    gat_dot_forward,
    gat_flash_forward,
    gat_flash_loss,
    init_gat_flash,
    make_gat_flash_train_step,
)

CFG = PlanConfig(64, 128)


def small_graph(rng, n=200, density=0.03):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    a = ((a + a.T + sp.eye(n)) != 0).astype(np.float32).tocsr()
    return a, csr_preprocess(a.indptr, a.indices, n, CFG)


def test_head_matches_ell_pipeline(rng):
    """The fused kernel and the 3-pass SDDMM->softmax->SpMM pipeline
    compute the same head on deduplicated adjacency."""
    a, plan = small_graph(rng)
    g_ell = build_ell_graph(a.indptr, a.indices, a.shape[0], CFG)
    n, f = a.shape[0], 24
    q = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    fused = flash_attention_aggregate(plan, q, k, v)
    pipeline = dot_attention_aggregate(g_ell, q, k, v)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(pipeline), rtol=2e-4, atol=2e-5
    )


def test_full_model_matches_ell(rng):
    """Same params (the trees are identical by design) -> same logits."""
    a, plan = small_graph(rng, n=160)
    g_ell = build_ell_graph(a.indptr, a.indices, a.shape[0], CFG)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))
    params = init_gat_flash(jax.random.PRNGKey(0), 10, 8, 5, num_heads=2)
    got = gat_flash_forward(params, plan, x)
    want = gat_dot_forward(params, g_ell, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_gat_flash_trains(rng):
    a, plan = small_graph(rng, n=150)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    params = init_gat_flash(jax.random.PRNGKey(1), 10, 8, 4, num_heads=2)
    import optax

    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(gat_flash_loss)(
            params, plan, x, labels
        )
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(30):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[:: len(losses) - 1]

    # the packaged SGD step also makes progress
    params2 = init_gat_flash(jax.random.PRNGKey(3), 10, 8, 4, num_heads=2)
    sgd = make_gat_flash_train_step(lr=5e-2)
    l0 = None
    for i in range(10):
        params2, loss = sgd(params2, plan, x, labels)
        l0 = float(loss) if l0 is None else l0
    assert np.isfinite(float(loss)) and float(loss) < l0


def test_gat_flash_grad_matches_ell(rng):
    """Gradients through the fused head equal the pipeline's."""
    a, plan = small_graph(rng, n=120)
    g_ell = build_ell_graph(a.indptr, a.indices, a.shape[0], CFG)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    params = init_gat_flash(jax.random.PRNGKey(2), 10, 8, 4, num_heads=2)

    from voltrix_spmm_tpu.models import gat_dot_loss

    gf = jax.grad(gat_flash_loss)(params, plan, x, labels)
    ge = jax.grad(gat_dot_loss)(params, g_ell, x, labels)
    flat_f, _ = jax.tree.flatten(gf)
    flat_e, _ = jax.tree.flatten(ge)
    for f_, e_ in zip(flat_f, flat_e):
        np.testing.assert_allclose(
            np.asarray(f_), np.asarray(e_), rtol=3e-3, atol=3e-4
        )
