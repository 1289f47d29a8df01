from .reference import spmm_reference, spmm_scipy
from .pallas_spmm import spmm_pallas
from .pallas_spmm_fused import spmm_pallas_fused
from .bitmask import expand_bitmask, expand_bitmask_batched
from .autodiff import spmm_ad


def spmm(plan, feat, *, impl: str = "auto", **kwargs):
    """Public SpMM entry point (reference: voltrix/spmm/spmm.py:92-114).

    impl: "auto" (fused when the plan supports it), "fused" (in-kernel
    DMA gather), "pregather" / "pallas" (XLA gather + streaming kernel),
    "reference" (plain-JAX oracle).
    """
    if impl == "auto":
        impl = "fused" if plan.config.gather_segment >= 8 else "pregather"
    if impl == "fused":
        return spmm_pallas_fused(plan, feat, **kwargs)
    if impl in ("pallas", "pregather"):
        return spmm_pallas(plan, feat, **kwargs)
    if impl == "reference":
        return spmm_reference(plan, feat)
    raise ValueError(f"unknown impl {impl!r}")


__all__ = [
    "spmm",
    "spmm_ad",
    "spmm_pallas",
    "spmm_pallas_fused",
    "spmm_reference",
    "spmm_scipy",
    "expand_bitmask",
    "expand_bitmask_batched",
]
