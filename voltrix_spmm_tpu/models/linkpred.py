"""Link prediction: GNN encoder + SDDMM dot-product edge decoder.

The third classic GNN task family (node classification: gcn.py/
sage_minibatch.py; graph classification: readout.py). A 2-layer GCN
encodes nodes; candidate edges (positives from the graph + sampled
negatives) are scored in one differentiable SDDMM over an edge-per-lane
plan — score(u, v) = h_u . h_v — and trained with per-edge sigmoid
cross-entropy. This is the second production consumer of
`ops.sddmm_ell_ad` (after dot-product GAT), exercising its custom VJP
end to end.

The candidate-edge plan pins the score set for the whole run (static
shapes, one jit trace); resample negatives by rebuilding the plan —
per-epoch resampling retraces once per epoch, the usual JAX trade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..format.ell import build_ell_pair
from ..format.plan import PlanConfig
from ..ops.ell import sddmm_ell_ad
from .gcn import gcn_forward, init_gcn
from .graph import GraphData


def sample_negative_edges(
    indptr, indices, num_nodes: int, num_neg: int, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray]:
    """Uniform (u, v) pairs not present in A (and not self-loops),
    deduplicated — rejection sampling."""
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    if num_neg <= 0:
        z = np.zeros(0, np.int64)
        return z, z
    have = set(zip(np.repeat(np.arange(num_nodes), np.diff(indptr)), indices))
    out = set()
    while len(out) < num_neg:
        u = int(rng.integers(0, num_nodes))
        v = int(rng.integers(0, num_nodes))
        if u != v and (u, v) not in have and (u, v) not in out:
            out.add((u, v))
    arr = np.asarray(sorted(out), np.int64)
    return arr[:, 0], arr[:, 1]


def build_link_candidates(
    indptr,
    indices,
    num_nodes: int,
    rng: np.random.Generator,
    neg_ratio: float = 1.0,
    config: PlanConfig = PlanConfig(128, 128),
):
    """Candidate-edge set = all positives + `neg_ratio * nnz` sampled
    negatives, as an (EllPlan, EllPlan^T) pair plus the per-edge label
    vector IN THE PLAN'S CSR EDGE ORDER. Returns (plan, plan_t, labels)."""
    import scipy.sparse as sp

    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    pos_rows = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    pos_cols = indices
    n_neg = int(round(neg_ratio * len(pos_cols)))
    neg_rows, neg_cols = sample_negative_edges(
        indptr, indices, num_nodes, n_neg, rng
    )
    rows = np.concatenate([pos_rows, neg_rows])
    cols = np.concatenate([pos_cols, neg_cols])
    # carry the label through the COO->CSR reorder as value 1/2 (scipy
    # would silently drop explicit zeros and sum duplicates; negatives
    # are sampled disjoint from positives so no duplicates exist)
    tag = np.concatenate(
        [np.full(len(pos_cols), 2.0, np.float32),
         np.full(len(neg_cols), 1.0, np.float32)]
    )
    cand = sp.csr_matrix(
        (tag, (rows, cols)), shape=(num_nodes, num_nodes)
    )
    labels = (cand.data - 1.0).astype(np.float32)  # 1 = real edge
    plan, plan_t = build_ell_pair(
        cand.indptr.astype(np.int64),
        cand.indices.astype(np.int64),
        num_nodes,
        config=config,
    )
    # commit to device once: the candidate plans feed every training
    # step as traced arguments (numpy leaves would re-upload per step)
    return plan.device(), plan_t.device(), jnp.asarray(labels)


def link_scores(plan, plan_t, h: jax.Array) -> jax.Array:
    """Per-candidate-edge dot-product scores h_u . h_v, differentiable
    through the encoder embeddings (SDDMM custom VJP)."""
    h32 = h.astype(jnp.float32)
    return sddmm_ell_ad(plan, plan_t, h32, h32)


def init_link_predictor(key, in_dim: int, hidden: int, emb_dim: int):
    """Encoder = 2-layer GCN emitting emb_dim node embeddings."""
    return init_gcn(key, in_dim, hidden, emb_dim)


def link_pred_loss(
    params, g: GraphData, plan, plan_t, x, labels
) -> jax.Array:
    h = gcn_forward(params, g, x)
    scores = link_scores(plan, plan_t, h)
    return optax.sigmoid_binary_cross_entropy(scores, labels).mean()


def make_link_pred_step(optimizer: optax.GradientTransformation):
    """Jittable `(params, opt_state, g, plan, plan_t, x, labels) ->
    (params, opt_state, loss)`."""

    def step(params, opt_state, g, plan, plan_t, x, labels):
        loss, grads = jax.value_and_grad(link_pred_loss)(
            params, g, plan, plan_t, x, labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def link_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """ROC-AUC by the Mann-Whitney rank statistic with tie-averaged
    ranks (no sklearn dependency)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    uniq, inv, counts = np.unique(
        scores, return_inverse=True, return_counts=True
    )
    start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    avg_rank = start + (counts + 1) / 2.0  # 1-based average rank per tie group
    ranks = avg_rank[inv]
    n_pos = float(labels.sum())
    n_neg = float(len(labels) - n_pos)
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float(
        (ranks[labels > 0.5].sum() - n_pos * (n_pos + 1) / 2.0)
        / (n_pos * n_neg)
    )
