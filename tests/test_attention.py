"""Fused flash-attention kernel on the binned plan (ops/attention.py):
forward vs a dense oracle across plan geometries, gradient parity, lse
stats, and the weighted-plan rejection guard."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.ops import spmm_attention, spmm_attention_ad

NEG = -1e30


def random_graph(rng, n=260, density=0.03, empty_tail=0):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    if empty_tail:
        # zero out the last `empty_tail` rows AND their columns so whole
        # windows at the tail are empty (has_empty_windows path)
        keep = sp.diags(
            np.r_[np.ones(n - empty_tail), np.zeros(empty_tail)]
        )
        a = (keep @ a @ keep).tocsr()
        a.eliminate_zeros()
    return a


def dense_attn(a, q, k, v, scale, slope):
    mask = jnp.asarray(a.toarray() != 0)
    e = (q @ k.T) * scale
    if slope != 1.0:
        e = jnp.where(e > 0, e, slope * e)
    e = jnp.where(mask, e, NEG)
    m = jnp.max(e, axis=1, keepdims=True)
    alpha = jnp.exp(e - m) * mask
    denom = jnp.sum(alpha, axis=1, keepdims=True)
    p = alpha / jnp.maximum(denom, 1e-30)
    return p @ v


def qkv(rng, n, dk, dv):
    return (
        jnp.asarray(rng.standard_normal((n, dk)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((n, dk)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((n, dv)).astype(np.float32)),
    )


@pytest.mark.parametrize(
    "cfg",
    [
        PlanConfig(32, 128),
        PlanConfig(128, 128, block_unroll=2),
        PlanConfig(256, 128, cluster_cols=True),
        PlanConfig(128, 128, gather_segment=2),
    ],
    ids=["h32", "h128u2", "h256cluster", "h128seg2"],
)
@pytest.mark.parametrize("slope", [1.0, 0.2], ids=["ident", "leaky"])
def test_forward_matches_dense(rng, cfg, slope):
    a = random_graph(rng)
    n, dk, dv = a.shape[0], 24, 40
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    q, k, v = qkv(rng, n, dk, dv)
    scale = 1.0 / dk**0.5
    got = spmm_attention(
        plan, q, k, v, scale=scale, negative_slope=slope
    )
    want = dense_attn(a, q, k, v, scale, slope)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_forward_chunked_separate_gathers(rng):
    """dv past block_d forces the two-gather chunked path."""
    a = random_graph(rng, n=200)
    n, dk, dv = 200, 16, 200
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(64, 128))
    q, k, v = qkv(rng, n, dk, dv)
    got = spmm_attention(plan, q, k, v, scale=0.25, block_d=128)
    want = dense_attn(a, q, k, v, 0.25, 1.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_isolated_rows_padded_empty_windows(rng):
    """Few empty windows: preprocess pads them with zero-bit blocks
    (pad_empty_windows), so the kernel itself must emit exact zeros and
    the sentinel lse for all-masked groups."""
    a = random_graph(rng, n=300, density=0.02, empty_tail=170)
    n, dk, dv = 300, 8, 16
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(64, 128))
    assert not plan.has_empty_windows  # padded, visited in-kernel
    q, k, v = qkv(rng, n, dk, dv)
    got, lse = spmm_attention(
        plan, q, k, v, scale=1.0, return_stats=True
    )
    want = dense_attn(a, q, k, v, 1.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
    deg = np.diff(a.indptr)
    assert np.all(np.asarray(got)[deg == 0] == 0.0)
    assert np.all(np.asarray(lse)[:n][deg == 0] > 1e29)


def test_isolated_rows_and_empty_windows(rng):
    """Empty windows dominate (>64): preprocess leaves them unvisited
    and has_empty_windows gates the post-kernel zeroing."""
    n, dk, dv = 2560, 8, 16
    a = random_graph(rng, n=n, density=0.004, empty_tail=2200)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    assert plan.has_empty_windows
    q, k, v = qkv(rng, n, dk, dv)
    got, lse = spmm_attention(
        plan, q, k, v, scale=1.0, return_stats=True
    )
    want = dense_attn(a, q, k, v, 1.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
    # isolated rows aggregate to exactly zero and carry the sentinel lse
    deg = np.diff(a.indptr)
    assert np.all(np.asarray(got)[deg == 0] == 0.0)
    assert np.all(np.asarray(lse)[: n][deg == 0] > 1e29)


def test_lse_matches_dense(rng):
    a = random_graph(rng, n=150)
    n, dk, dv = 150, 12, 12
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    q, k, v = qkv(rng, n, dk, dv)
    _, lse = spmm_attention(plan, q, k, v, scale=0.5, return_stats=True)
    mask = a.toarray() != 0
    e = np.where(mask, (np.asarray(q) @ np.asarray(k).T) * 0.5, -np.inf)
    want = np.zeros(n)
    has = mask.any(axis=1)
    m = e[has].max(axis=1)
    want[has] = m + np.log(np.exp(e[has] - m[:, None]).sum(axis=1))
    np.testing.assert_allclose(
        np.asarray(lse)[:n][has], want[has], rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize(
    "cfg",
    [PlanConfig(32, 128), PlanConfig(128, 128, block_unroll=2)],
    ids=["h32", "h128u2"],
)
def test_grad_matches_dense(rng, cfg):
    a = random_graph(rng, n=140, density=0.04)
    n, dk, dv = 140, 12, 20
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    q, k, v = qkv(rng, n, dk, dv)
    w = jnp.asarray(rng.standard_normal((n, dv)).astype(np.float32))
    scale, slope = 1.0 / dk**0.5, 0.2

    def loss_kernel(q, k, v):
        out = spmm_attention_ad(
            plan, q, k, v, scale=scale, negative_slope=slope
        )
        return jnp.sum(out * w)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attn(a, q, k, v, scale, slope) * w)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, wv, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv), rtol=2e-3, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_grad_through_projections(rng):
    """End-to-end: gradients flow into q/k/v projection weights."""
    a = random_graph(rng, n=100)
    n, d, h = 100, 10, 12
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    wq = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.3)
    wk = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.3)
    wv = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.3)

    def loss(params):
        wq, wk, wv = params
        out = spmm_attention_ad(
            plan, x @ wq, x @ wk, x @ wv, negative_slope=0.2
        )
        return jnp.sum(out**2)

    def loss_dense(params):
        wq, wk, wv = params
        out = dense_attn(a, x @ wq, x @ wk, x @ wv, 1.0 / h**0.5, 0.2)
        return jnp.sum(out**2)

    got = jax.grad(loss)((wq, wk, wv))
    want = jax.grad(loss_dense)((wq, wk, wv))
    for g, wv_, name in zip(got, want, ["wq", "wk", "wv"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv_), rtol=2e-3, atol=2e-4,
            err_msg=name,
        )


def test_weighted_plan_rejected(rng):
    a = random_graph(rng, n=64)
    plan = csr_preprocess(
        a.indptr, a.indices, 64, PlanConfig(32, 128), values=a.data
    )
    q, k, v = qkv(rng, 64, 8, 8)
    with pytest.raises(ValueError, match="value"):
        spmm_attention(plan, q, k, v)


def test_jit_and_vmap_free(rng):
    """The op jits with the plan as a traced pytree argument."""
    a = random_graph(rng, n=96)
    plan = csr_preprocess(a.indptr, a.indices, 96, PlanConfig(32, 128))
    q, k, v = qkv(rng, 96, 8, 8)
    f = jax.jit(
        lambda p, q, k, v: spmm_attention(p, q, k, v, scale=0.3)
    )
    got = f(plan, q, k, v)
    want = dense_attn(a, q, k, v, 0.3, 1.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize(
    "cfg,cfg_t",
    [
        (PlanConfig(32, 128), PlanConfig(32, 128)),
        (PlanConfig(128, 128, block_unroll=2), PlanConfig(64, 128)),
        (
            PlanConfig(256, 128, cluster_cols=True),
            PlanConfig(128, 128, gather_segment=2),
        ),
    ],
    ids=["h32", "mixed-unroll", "cluster-vs-seg2"],
)
@pytest.mark.parametrize("directed", [False, True], ids=["sym", "directed"])
def test_split_backward_matches_dense(rng, cfg, cfg_t, directed):
    """dQ/dK/dV from the transpose-plan split backward vs the dense
    oracle, across mismatched plan/plan_t geometries and a directed
    graph (plan_t genuinely different from plan)."""
    n, dk, dv = 140, 12, 20
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a.data[:] = 1.0
    if not directed:
        a = ((a + a.T) != 0).astype(np.float32).tocsr()
    at = a.T.tocsr()
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    plan_t = csr_preprocess(at.indptr, at.indices, n, cfg_t)
    q, k, v = qkv(rng, n, dk, dv)
    w = jnp.asarray(rng.standard_normal((n, dv)).astype(np.float32))
    scale, slope = 1.0 / dk**0.5, 0.2

    def loss_split(q, k, v):
        out = spmm_attention_ad(
            plan, q, k, v, plan_t=plan_t, scale=scale, negative_slope=slope
        )
        return jnp.sum(out * w)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attn(a, q, k, v, scale, slope) * w)

    got = jax.grad(loss_split, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, wv, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv), rtol=2e-3, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_split_backward_matches_fallback_with_empty_rows(rng):
    """Split and per-lane backwards agree bit-for-bit in structure on a
    graph with isolated rows/cols (empty windows on both sides), and
    both jit with plans as traced arguments."""
    n, dk, dv = 160, 8, 8
    a = random_graph(rng, n=n, density=0.03, empty_tail=40)
    at = a.T.tocsr()
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    plan_t = csr_preprocess(at.indptr, at.indices, n, PlanConfig(32, 128))
    q, k, v = qkv(rng, n, dk, dv)

    def mk_loss(with_t):
        def loss(q, k, v):
            out = spmm_attention_ad(
                plan, q, k, v,
                plan_t=plan_t if with_t else None, negative_slope=0.2,
            )
            return jnp.sum(out**2)
        return loss

    got = jax.jit(jax.grad(mk_loss(True), argnums=(0, 1, 2)))(q, k, v)
    want = jax.jit(jax.grad(mk_loss(False), argnums=(0, 1, 2)))(q, k, v)
    for g, wv, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv), rtol=1e-4, atol=1e-5,
            err_msg=f"d{name}",
        )
    # isolated tail rows get exact-zero grads in every plane
    for g in got:
        assert np.all(np.asarray(g)[n - 40 :] == 0.0)


from voltrix_spmm_tpu.ops import spmm_attention_mh, spmm_attention_mh_ad


def _qkv_mh(rng, heads, n, dk, dv):
    return (
        jnp.asarray(rng.standard_normal((heads, n, dk)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((heads, n, dk)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((heads, n, dv)).astype(np.float32)),
    )


@pytest.mark.parametrize(
    "cfg",
    [PlanConfig(32, 128), PlanConfig(128, 128, block_unroll=2)],
    ids=["h32", "h128u2"],
)
def test_mh_forward_matches_per_head(rng, cfg):
    a = random_graph(rng, n=200, density=0.04)
    n, heads, dk, dv = 200, 3, 12, 20
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    q, k, v = _qkv_mh(rng, heads, n, dk, dv)
    got = spmm_attention_mh(plan, q, k, v, negative_slope=0.2)
    assert got.shape == (heads, n, dv)
    for h in range(heads):
        want = spmm_attention(
            plan, q[h], k[h], v[h], negative_slope=0.2
        )
        np.testing.assert_allclose(
            np.asarray(got[h]), np.asarray(want), rtol=1e-5, atol=1e-6,
            err_msg=f"head {h}",
        )


def test_mh_forward_stats_and_empty_windows(rng):
    a = random_graph(rng, n=180, density=0.03, empty_tail=50)
    n, heads = 180, 2
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    q, k, v = _qkv_mh(rng, heads, n, 8, 8)
    got, lse = spmm_attention_mh(
        plan, q, k, v, scale=0.5, return_stats=True
    )
    for h in range(heads):
        want, lse_h = spmm_attention(
            plan, q[h], k[h], v[h], scale=0.5, return_stats=True
        )
        np.testing.assert_allclose(
            np.asarray(got[h]), np.asarray(want), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(lse[h]), np.asarray(lse_h), rtol=1e-5, atol=1e-5
        )
    assert np.all(np.asarray(got)[:, n - 50 :] == 0.0)


@pytest.mark.parametrize("directed", [False, True], ids=["sym", "directed"])
def test_mh_grad_matches_dense(rng, directed):
    n, heads, dk, dv = 150, 3, 12, 20
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a.data[:] = 1.0
    if not directed:
        a = ((a + a.T) != 0).astype(np.float32).tocsr()
    at = a.T.tocsr()
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    plan_t = csr_preprocess(
        at.indptr, at.indices, n, PlanConfig(64, 128, block_unroll=2)
    )
    q, k, v = _qkv_mh(rng, heads, n, dk, dv)
    w = jnp.asarray(
        rng.standard_normal((heads, n, dv)).astype(np.float32)
    )
    scale, slope = 1.0 / dk**0.5, 0.2

    def loss_mh(q, k, v):
        out = spmm_attention_mh_ad(
            plan, q, k, v, plan_t=plan_t, scale=scale, negative_slope=slope
        )
        return jnp.sum(out * w)

    def loss_dense(q, k, v):
        return sum(
            jnp.sum(dense_attn(a, q[h], k[h], v[h], scale, slope) * w[h])
            for h in range(heads)
        )

    got = jax.jit(jax.grad(loss_mh, argnums=(0, 1, 2)))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, wv, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv), rtol=2e-3, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_mh_requires_plan_t(rng):
    a = random_graph(rng, n=64)
    plan = csr_preprocess(a.indptr, a.indices, 64, PlanConfig(32, 128))
    q, k, v = _qkv_mh(rng, 2, 64, 8, 8)
    with pytest.raises(ValueError, match="plan_t"):
        spmm_attention_mh_ad(plan, q, k, v, plan_t=None)


def test_mh_bf16_planes_match_f32(rng):
    """bf16 gathered planes: on inputs pre-rounded to bf16 (so both
    paths see identical plane values and the only machinery difference
    is the hi/lo-split softmax statistics), bf16 and f32 planes agree
    tightly in forward AND gradients. On UNROUNDED inputs the remaining
    gap is the bf16 rounding of the plane itself — the accuracy class
    the MXU's default matmul precision already imposes on device —
    checked loosely on the forward."""
    n, heads, dk, dv = 150, 3, 12, 20
    a = random_graph(rng, n=n, density=0.05)
    at = a.T.tocsr()
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    plan_t = csr_preprocess(at.indptr, at.indices, n, PlanConfig(32, 128))
    q, k, v = _qkv_mh(rng, heads, n, dk, dv)
    w = jnp.asarray(rng.standard_normal((heads, n, dv)).astype(np.float32))

    def mk_loss(pdt, w):
        def loss(q, k, v):
            out = spmm_attention_mh_ad(
                plan, q, k, v, plan_t=plan_t, negative_slope=0.2,
                plane_dtype=pdt,
            )
            return jnp.sum(out * w), out
        return loss

    rd = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    qr, kr, vr, wr = rd(q), rd(k), rd(v), rd(w)
    (_, out16), g16 = jax.value_and_grad(
        mk_loss(jnp.bfloat16, wr), argnums=(0, 1, 2), has_aux=True
    )(qr, kr, vr)
    (_, out32), g32 = jax.value_and_grad(
        mk_loss(None, wr), argnums=(0, 1, 2), has_aux=True
    )(qr, kr, vr)
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=1e-4, atol=1e-5
    )
    for a16, a32, name in zip(g16, g32, "qkv"):
        scale_ref = float(np.max(np.abs(np.asarray(a32)))) + 1e-30
        err = float(np.max(np.abs(np.asarray(a16) - np.asarray(a32))))
        assert err / scale_ref < 1e-3, f"d{name}: {err/scale_ref:.3e}"

    # unrounded inputs: bf16-plane forward stays in the bf16 class
    (_, out16u), _ = jax.value_and_grad(
        mk_loss(jnp.bfloat16, w), argnums=(0,), has_aux=True
    )(q, k, v)
    (_, out32u), _ = jax.value_and_grad(
        mk_loss(None, w), argnums=(0,), has_aux=True
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out16u), np.asarray(out32u), rtol=2e-2, atol=2e-2
    )


# ---------------------------------------------------- subtile skipping


@pytest.mark.parametrize(
    "cfg",
    [
        PlanConfig(128, 128, block_unroll=2, cluster_cols=True),
        PlanConfig(256, 128, block_unroll=2, cluster_cols=True),
    ],
    ids=["h128", "h256"],
)
def test_mh_subtile_forward_matches_full(rng, cfg):
    # rows of an empty sub-window provably keep their m/l/out state, so
    # the subtiled walk must be bit-compatible with the full walk on the
    # SAME clustered plan (and both match the dense oracle)
    n, heads, dk, dv = 300, 2, 12, 20
    a = random_graph(rng, n=n, density=0.02, empty_tail=64)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    assert plan.occ is not None
    q, k, v = _qkv_mh(rng, heads, n, dk, dv)
    full, lse_full = spmm_attention_mh(
        plan, q, k, v, negative_slope=0.2, return_stats=True
    )
    sub, lse_sub = spmm_attention_mh(
        plan, q, k, v, negative_slope=0.2, return_stats=True, subtile=True
    )
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(full), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(lse_sub), np.asarray(lse_full), rtol=1e-6, atol=1e-6
    )
    for h in range(heads):
        want = dense_attn(
            a, q[h], k[h], v[h], 1.0 / dk**0.5, 0.2
        )
        np.testing.assert_allclose(
            np.asarray(sub[h]), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_mh_subtile_grad_matches_dense(rng):
    n, heads, dk, dv = 220, 3, 12, 20
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    a.data[:] = 1.0
    at = a.T.tocsr()
    plan = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(128, 128, block_unroll=2, cluster_cols=True),
    )
    plan_t = csr_preprocess(
        at.indptr, at.indices, n,
        PlanConfig(256, 128, block_unroll=2, cluster_cols=True),
    )
    q, k, v = _qkv_mh(rng, heads, n, dk, dv)
    w = jnp.asarray(rng.standard_normal((heads, n, dv)).astype(np.float32))
    scale, slope = 1.0 / dk**0.5, 0.2

    def loss_sub(q, k, v):
        out = spmm_attention_mh_ad(
            plan, q, k, v, plan_t=plan_t, scale=scale,
            negative_slope=slope, subtile=True,
        )
        return jnp.sum(out * w)

    def loss_dense(q, k, v):
        return sum(
            jnp.sum(dense_attn(a, q[h], k[h], v[h], scale, slope) * w[h])
            for h in range(heads)
        )

    got = jax.jit(jax.grad(loss_sub, argnums=(0, 1, 2)))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, wv, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv), rtol=2e-3, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_mh_subtile_bf16_planes(rng):
    n, heads = 200, 2
    a = random_graph(rng, n=n, density=0.03)
    plan = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(128, 128, block_unroll=2, cluster_cols=True),
    )
    q, k, v = _qkv_mh(rng, heads, n, 8, 8)
    w = jnp.asarray(rng.standard_normal((heads, n, 8)).astype(np.float32))

    def loss(q2, k2, v2):
        out = spmm_attention_mh_ad(
            plan, q2, k2, v2, plan_t=plan, negative_slope=0.2,
            plane_dtype=jnp.bfloat16, subtile=True,
        )
        return jnp.sum(out * w)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

    def loss_full(q2, k2, v2):
        # same bf16 planes WITHOUT subtiling — isolates the skip logic
        # from the (separately tested) bf16 accuracy class
        out = spmm_attention_mh_ad(
            plan, q2, k2, v2, plan_t=plan, negative_slope=0.2,
            plane_dtype=jnp.bfloat16,
        )
        return jnp.sum(out * w)

    g_full = jax.jit(jax.grad(loss_full, argnums=(0, 1, 2)))(q, k, v)
    for a_sub, a_ref in zip(g, g_full):
        np.testing.assert_allclose(
            np.asarray(a_sub), np.asarray(a_ref), rtol=1e-5, atol=1e-6
        )


def test_attn_tuner_space_has_subtile_variants():
    from voltrix_spmm_tpu.tuner.attention import (
        AttnVariant,
        attention_default_space,
    )

    space = attention_default_space()
    subs = [v for v in space if v.subtile]
    assert {v.block_h for v in subs} == {512, 1024}
    assert any(v.plane_dtype == "bfloat16" for v in subs)
    assert AttnVariant(512, 4, subtile=True).key() != AttnVariant(
        512, 4
    ).key()
    assert AttnVariant(512, 4, subtile=True).plan_config.cluster_cols
