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
