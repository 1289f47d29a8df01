"""Link prediction: SDDMM edge decoder, negative sampling, training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.models import (
    build_graph,
    build_link_candidates,
    init_link_predictor,
    link_auc,
    link_pred_loss,
    link_scores,
    make_link_pred_step,
    sample_negative_edges,
)

CFG = PlanConfig(32, 128)


def _community_graph(rng, n=300, comm=3, deg=10):
    size = n // comm
    src = np.repeat(np.arange(n), deg)
    intra = (
        (src // size) * size + rng.integers(0, size, size=src.shape[0])
    ) % n
    rand = rng.integers(0, n, size=src.shape[0])
    dst = np.where(rng.random(src.shape[0]) < 0.92, intra, rand)
    a = sp.csr_matrix(
        (np.ones(src.shape[0], np.float32), (src, dst)), shape=(n, n)
    )
    return ((a + a.T) != 0).astype(np.float32).tocsr()


def test_negative_edges_disjoint(rng):
    a = _community_graph(rng, n=200)
    u, v = sample_negative_edges(a.indptr, a.indices, 200, 500, rng)
    assert len(u) == 500
    assert np.all(u != v)
    dense = a.toarray()
    assert not dense[u, v].any()


def test_link_scores_match_dense(rng):
    a = _community_graph(rng, n=200)
    plan, plan_t, labels = build_link_candidates(
        a.indptr, a.indices, 200, rng, neg_ratio=0.5, config=CFG
    )
    h = rng.standard_normal((200, 16)).astype(np.float32)
    scores = np.asarray(link_scores(plan, plan_t, jnp.asarray(h)))
    # rebuild the candidate CSR the same way to know the edge order
    gram = h @ h.T
    # positives and negatives: labels align with plan's CSR edge order,
    # and scores must equal the gram matrix sampled at those edges
    # (recover edges from the plan's own maps via a unit SDDMM identity:
    # score of one-hot embeddings = adjacency indicator)
    n_pos = int(labels.sum())
    assert n_pos == a.nnz
    # exact per-edge check through an independent oracle: compare
    # against SDDMM of one-hot basis h -> selects gram entries
    # Instead, verify statistically exact: norm of scores equals norm of
    # gram at candidate positions recovered from a second build with
    # the same rng-free positives-only plan
    pos_only, pos_only_t, lab1 = build_link_candidates(
        a.indptr, a.indices, 200, np.random.default_rng(0), neg_ratio=0.0,
        config=CFG,
    )
    s_pos = np.asarray(link_scores(pos_only, pos_only_t, jnp.asarray(h)))
    rows = np.repeat(np.arange(200), np.diff(a.indptr))
    want = gram[rows, a.indices]
    np.testing.assert_allclose(s_pos, want, rtol=1e-4, atol=1e-4)
    assert lab1.shape[0] == a.nnz and bool(jnp.all(lab1 == 1.0))
    assert scores.shape[0] == labels.shape[0]


def test_link_pred_trains_and_separates(rng):
    # many small communities: uniformly sampled negatives are then
    # mostly cross-community, which a community-embedding dot decoder
    # CAN separate (intra-community non-edges are its structural
    # ceiling — at comm=3 that floor caps AUC near 0.85)
    n, comm = 300, 6
    a = _community_graph(rng, n=n, comm=comm)
    g = build_graph(a.indptr, a.indices, n, CFG, symmetric=True)
    plan, plan_t, labels = build_link_candidates(
        a.indptr, a.indices, n, rng, neg_ratio=1.0, config=CFG
    )
    # community-informative features: the encoder can place communities
    # apart, so real (mostly intra-community) edges separate from the
    # (mostly cross-community) sampled negatives
    comm_ids = np.arange(n) // (n // comm)
    x_np = np.concatenate(
        [
            np.eye(comm, dtype=np.float32)[comm_ids]
            + 0.3 * rng.standard_normal((n, comm)).astype(np.float32),
            np.zeros((n, 16 - comm), np.float32),
        ],
        axis=1,
    )
    x = jnp.asarray(x_np)
    params = init_link_predictor(jax.random.PRNGKey(0), 16, 32, 16)
    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = jax.jit(make_link_pred_step(opt))

    first = float(link_pred_loss(params, g, plan, plan_t, x, labels))
    for _ in range(60):
        params, state, loss = step(params, state, g, plan, plan_t, x, labels)
    assert np.isfinite(float(loss)) and float(loss) < first

    from voltrix_spmm_tpu.models import gcn_forward

    h = gcn_forward(params, g, x)
    scores = np.asarray(link_scores(plan, plan_t, h))
    auc = link_auc(scores, np.asarray(labels))
    assert auc > 0.85, f"link-pred AUC {auc}"


def test_link_auc_statistic():
    scores = np.asarray([0.9, 0.8, 0.1, 0.2])
    labels = np.asarray([1.0, 1.0, 0.0, 0.0])
    assert link_auc(scores, labels) == 1.0
    assert link_auc(-scores, labels) == 0.0
    assert abs(link_auc(np.asarray([0.5, 0.5, 0.5, 0.5]), labels) - 0.5) < 1e-9
