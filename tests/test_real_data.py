"""Real-dataset protocol tests: TC-GNN npz round-trip, proxy stats,
loader fallback labeling."""

import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.data import (
    PUBLISHED,
    chung_lu_csr,
    load_graph,
    load_tcgnn_npz,
    proxy_csr,
)


def test_tcgnn_npz_roundtrip(tmp_path, rng):
    n = 500
    a = sp.random(n, n, density=0.02, format="csr", random_state=rng)
    coo = a.tocoo()
    path = str(tmp_path / "toy.npz")
    # the reference's container: edge lists + node count
    np.savez(path, src_li=coo.row, dst_li=coo.col, num_nodes=np.int64(n))
    b = load_tcgnn_npz(path)
    assert b.shape == (n, n)
    np.testing.assert_array_equal(
        (b.toarray() != 0), (a.toarray() != 0)
    )


def test_tcgnn_npz_dedups_duplicate_edges(tmp_path):
    path = str(tmp_path / "dup.npz")
    np.savez(
        path,
        src_li=np.array([0, 0, 1, 0]),
        dst_li=np.array([1, 1, 2, 1]),
        num_nodes=np.int64(4),
    )
    b = load_tcgnn_npz(path)
    assert b.nnz == 2
    assert b.max() == 1.0


def test_indptr_protocol_accepted(tmp_path, rng):
    from voltrix_spmm_tpu.data import save_npz_graph

    n = 300
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    a.data[:] = 1.0
    path = save_npz_graph(str(tmp_path / "own.npz"), a)
    b = load_tcgnn_npz(path)
    np.testing.assert_array_equal(b.indices, a.indices)


def test_load_graph_prefers_real_file(tmp_path, rng):
    n = 200
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    coo = a.tocoo()
    np.savez(
        str(tmp_path / "reddit.npz"),
        src_li=coo.row, dst_li=coo.col, num_nodes=np.int64(n),
    )
    g, label = load_graph("reddit", data_dir=str(tmp_path))
    assert label == "reddit"  # real file, not the proxy
    assert g.shape == (n, n)


def test_load_graph_proxy_fallback(tmp_path):
    g, label = load_graph("ppi", data_dir=str(tmp_path))
    assert label == "ppi-proxy"
    st = PUBLISHED["ppi"]
    assert g.shape == (st.num_nodes, st.num_nodes)
    # edge count within collision slack of the published target
    assert 0.7 * st.num_edges <= g.nnz <= st.num_edges


def test_chung_lu_is_powerlaw_and_seeded():
    a = chung_lu_csr(20000, 200000, alpha=2.1, seed=3)
    b = chung_lu_csr(20000, 200000, alpha=2.1, seed=3)
    np.testing.assert_array_equal(a.indices, b.indices)  # reproducible
    deg = np.asarray(a.sum(axis=1)).ravel()
    # heavy tail: the top 1% of nodes carry far more than 1% of edges
    top = np.sort(deg)[-200:].sum()
    assert top / deg.sum() > 0.05


def test_unknown_dataset_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_graph("not-a-dataset", data_dir=str(tmp_path))


def test_published_inventory_matches_reference_list():
    # the reference evaluates these families (bench/plot.py:8); every
    # BASELINE.json perf target must be loadable by name
    for name in ("reddit", "ogbn-products", "ogbn-arxiv", "ddi",
                 "amazon0505", "web-BerkStan", "ppi"):
        assert name in PUBLISHED


def test_tcgnn_npz_through_full_bench_path(tmp_path, rng, monkeypatch, capsys):
    """Protocol drill (round-2 verdict Next #9): a TC-GNN-format npz
    dropped into $VOLTRIX_TPU_DATASETS flows through the REAL bench
    chain — graph_gen.generate(name) -> load_graph (real file, no
    proxy) -> reorder -> bench method -> oracle validation — so the day
    genuine files land, everything works first try."""
    import os
    import sys

    import jax.numpy as jnp

    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench"
    )
    sys.path.insert(0, bench_dir)
    try:
        import bench_all
        import graph_gen
    finally:
        sys.path.remove(bench_dir)

    # write a synthetic graph in the reference's src_li/dst_li protocol
    n = 600
    a = sp.random(n, n, density=0.02, format="csr",
                  random_state=np.random.default_rng(3))
    rows = np.repeat(np.arange(n), np.diff(a.indptr))
    datasets = tmp_path / "datasets"
    datasets.mkdir()
    np.savez(
        datasets / "myrealgraph.npz",
        src_li=rows.astype(np.int64),
        dst_li=a.indices.astype(np.int64),
        num_nodes=np.int64(n),
    )
    monkeypatch.setenv("VOLTRIX_TPU_DATASETS", str(datasets))

    out_dir = tmp_path / "bench_data"
    out_dir.mkdir()
    path = graph_gen.generate("myrealgraph", str(out_dir), reorder=True)
    assert "myrealgraph: source = myrealgraph" in capsys.readouterr().out, (
        "real file was not picked up (proxy fallback fired)"
    )
    g = graph_gen.load(path)

    from voltrix_spmm_tpu.ops import spmm_scipy
    from voltrix_spmm_tpu.utils import calc_diff

    feat = np.random.default_rng(0).standard_normal((n, 32)).astype(
        np.float32
    )
    oracle = spmm_scipy(g.indptr, g.indices, n, feat)
    for method in ("Voltrix-pregather", "CSR-ELL"):
        fn, plan = bench_all.methods_registry()[method](g, feat)
        rest = () if plan is None else (plan,)
        out = np.asarray(fn(jnp.asarray(feat), *rest))
        assert calc_diff(out, oracle) < 1e-4, method
