"""CLI (`python -m voltrix_spmm_tpu`) tests — main() called in-process
so the conftest's CPU forcing applies."""

import json

import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.__main__ import main


def test_cli_info(capsys):
    assert main(["info"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["backend"] == "cpu"
    assert "VOLTRIX_TPU_CACHE_DIR" in info["env_flags"].values()


def test_cli_preprocess_validate_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "er.plan.npz")
    assert main(["preprocess", "er-512", "-o", out, "--block-h", "32"]) == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["plan_path"] == out and rec["num_nodes"] == 512
    assert main(["validate", out]) == 0
    assert "ok:" in capsys.readouterr().out


def test_cli_spmm_checks_oracle(capsys):
    assert main(["spmm", "er-512", "-d", "32", "--block-h", "32"]) == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["difference_rate"] < 1e-4


def test_cli_loads_tcgnn_npz(tmp_path, rng, capsys):
    n = 300
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    coo = a.tocoo()
    path = str(tmp_path / "g.npz")
    np.savez(path, src_li=coo.row, dst_li=coo.col, num_nodes=n)
    assert main(["spmm", path, "-d", "16", "--block-h", "32"]) == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["difference_rate"] < 1e-4


def test_cli_rejects_unknown_spec():
    with pytest.raises(SystemExit):
        main(["preprocess", "nonsense-spec"])
