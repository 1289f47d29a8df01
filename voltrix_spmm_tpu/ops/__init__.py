from .reference import spmm_reference, spmm_scipy
from .pallas_spmm import spmm_pallas
from .bitmask import expand_bitmask, expand_bitmask_batched
from .autodiff import spmm_ad


def spmm(plan, feat, *, impl: str = "pallas", **kwargs):
    """Public SpMM entry point (reference: voltrix/spmm/spmm.py:92-114).

    impl: "pallas" (device kernel), "reference" (plain-JAX oracle).
    """
    if impl == "pallas":
        return spmm_pallas(plan, feat, **kwargs)
    if impl == "reference":
        return spmm_reference(plan, feat)
    raise ValueError(f"unknown impl {impl!r}")


__all__ = [
    "spmm",
    "spmm_ad",
    "spmm_pallas",
    "spmm_reference",
    "spmm_scipy",
    "expand_bitmask",
    "expand_bitmask_batched",
]
