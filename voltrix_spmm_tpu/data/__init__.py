from .generate import erdos_renyi_csr, rmat_csr, reorder_rcm, symmetrize

__all__ = ["erdos_renyi_csr", "rmat_csr", "reorder_rcm", "symmetrize"]
