from .reference import spmm_reference, spmm_scipy
from .pallas_spmm import spmm_pallas
from .pallas_spmm_fused import spmm_pallas_fused
from .bitmask import expand_bitmask, expand_bitmask_batched
from .autodiff import spmm_ad
from .quant import spmm_pallas_int8, quantize_rows, dequantize_rows
from .hybrid import spmm_pallas_hybrid
from .weighted import (
    sddmm,
    spmm_pallas_weighted,
    spmm_weighted_ad,
    spmm_weighted_dvalues,
)
from .ell import (
    sddmm_ell,
    sddmm_ell_ad,
    spmm_ell,
    spmm_ell_ad,
    spmm_ell_dvals,
    spmm_ell_streamed,
)
from .attention import spmm_attention, spmm_attention_ad
from .attention_mh import spmm_attention_mh, spmm_attention_mh_ad


def spmm_streamed(plan, feat, *, num_chunks: int = 8, subtile=False, **kwargs):
    """Window-chunked pregather dispatch with bounded peak HBM: each
    chunk's gather materializes, feeds the kernel, and is freed before
    the next chunk (XLA buffer liveness). For graphs whose full gather
    exceeds device memory (reddit-class; see format/stream.py).

    `plan` may be an SpmmPlan (sliced here, host-side) or a pre-sliced
    list from `format.stream.slice_plan_windows` (pass that under jit).
    """
    import jax.numpy as jnp

    from ..format.plan import SpmmPlan as _Plan
    from ..format.stream import slice_plan_windows

    # materialize first: `plan` may be a one-shot iterable (e.g. a
    # generator over slice_plan_windows), and the value-plane guard
    # below must not consume it before the dispatch loop
    subs = (
        slice_plan_windows(plan, num_chunks)
        if isinstance(plan, _Plan)
        else list(plan)
    )
    if getattr(plan, "values", None) is not None or any(
        getattr(s, "values", None) is not None for s in subs
    ):
        raise ValueError(
            "plan carries a value plane; spmm_streamed dispatches the "
            "binary pregather kernel — use ops.spmm(plan, feat)"
        )
    if subs and getattr(subs[0], "src_perm", None) is not None:
        # pack_order="incidence": permute the source ONCE for all
        # chunks (each chunk would otherwise re-pay the n-row gather)
        import dataclasses as _dc

        feat = jnp.take(
            feat, jnp.asarray(subs[0].src_perm), axis=0, mode="clip"
        )
        subs = [_dc.replace(s, src_perm=None) for s in subs]
    outs = [spmm_pallas(s, feat, subtile=subtile, **kwargs) for s in subs]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def spmm(plan, feat, *, impl: str = "auto", **kwargs):
    """Public SpMM entry point (reference: voltrix/spmm/spmm.py:92-114).

    impl: "auto" (dispatch on plan type), "fused" (in-kernel DMA
    gather), "pregather" / "pallas" (XLA gather + streaming kernel),
    "hybrid" (dense runs fused + scattered tail pregathered), "int8"
    (quantized stream), "weighted" (per-edge value plane), "reference"
    (plain-JAX oracle).

    feat may be (N, D) or graph-batched (B, N, D): SpMM is linear over
    feature columns, so the batch folds into the feature axis and ONE
    kernel launch serves the whole batch (MXU-friendlier than vmap —
    same folding as models.aggregate).
    """
    import jax.numpy as jnp

    from ..format.ell import EllPlan
    from ..format.hybrid import HybridPlan

    if getattr(feat, "ndim", 2) == 3:
        b, n, d = feat.shape
        flat = jnp.transpose(feat, (1, 0, 2)).reshape(n, b * d)
        out = spmm(plan, flat, impl=impl, **kwargs)
        return jnp.transpose(out.reshape(-1, b, d), (1, 0, 2))

    if isinstance(plan, (list, tuple)):
        # window-chunk lists (format.stream.slice_plan_windows / a
        # streamed build_graph): bounded-memory pregather dispatch
        assert impl in ("auto", "pregather", "pallas"), (
            f"streamed plan lists dispatch pregather chunks, not {impl!r}"
        )
        sub = plan[0].config.cluster_cols if plan else False
        return spmm_streamed(plan, feat, subtile=sub, **kwargs)

    if isinstance(plan, HybridPlan):
        kwargs.setdefault("subtile", plan.dense.config.cluster_cols)
        return spmm_pallas_hybrid(plan, feat, **kwargs)
    if isinstance(plan, EllPlan):
        assert impl in ("auto", "ell"), f"EllPlan cannot run impl={impl!r}"
        return spmm_ell(plan, feat, **kwargs)
    if impl == "ell":
        raise ValueError("impl='ell' needs an EllPlan (csr_preprocess_ell)")
    if impl == "auto":
        if getattr(plan, "values", None) is not None:
            impl = "weighted"
        elif (
            plan.config.seg_interleaved
            or getattr(plan, "src_perm", None) is not None
        ):
            # interleaved / incidence-packed layouts are pregather-only
            # (the fused kernel assumes run-contiguous natural lanes)
            impl = "pregather"
        else:
            impl = "fused" if plan.config.gather_segment >= 8 else "pregather"
    if impl == "weighted":
        return spmm_pallas_weighted(plan, feat, **kwargs)
    if impl == "fused":
        return spmm_pallas_fused(plan, feat, **kwargs)
    if impl == "int8":
        return spmm_pallas_int8(plan, feat, **kwargs)
    if impl in ("pallas", "pregather"):
        return spmm_pallas(plan, feat, **kwargs)
    if impl == "reference":
        return spmm_reference(plan, feat)
    raise ValueError(f"unknown impl {impl!r}")


__all__ = [
    "spmm",
    "spmm_ad",
    "spmm_attention",
    "spmm_attention_ad",
    "spmm_attention_mh",
    "spmm_attention_mh_ad",
    "spmm_pallas",
    "spmm_pallas_fused",
    "spmm_pallas_int8",
    "spmm_pallas_hybrid",
    "sddmm",
    "sddmm_ell",
    "sddmm_ell_ad",
    "spmm_ell",
    "spmm_ell_ad",
    "spmm_ell_dvals",
    "spmm_ell_streamed",
    "spmm_pallas_weighted",
    "spmm_weighted_ad",
    "spmm_weighted_dvalues",
    "spmm_streamed",
    "quantize_rows",
    "dequantize_rows",
    "spmm_reference",
    "spmm_scipy",
    "expand_bitmask",
    "expand_bitmask_batched",
]
