"""Raw kernel-pipeline tests: hand-built plan buffers, no csr_preprocess.

Parity with the reference's tests/test_spmm_kernel.py, which allocates
the format buffers manually and drives the kernels directly (:52-110) —
here the SpmmPlan arrays are constructed by hand with hand-computed
expected output, pinning the kernel's buffer contract independently of
the preprocessing code.
"""

import jax.numpy as jnp
import numpy as np

from voltrix_spmm_tpu.format import PlanConfig, SpmmPlan
from voltrix_spmm_tpu.ops import spmm_pallas


def hand_plan():
    """2 windows of 32 rows, K=128. Window 0 has one block with:
    - bit (row 0, lane 0) -> source row 5
    - bit (row 0, lane 1) -> source row 9
    - bit (31, lane 2)    -> source row 63
    Window 1 has one block with bit (row 3, lane 0) -> source row 0.
    """
    cfg = PlanConfig(32, 128)
    bitmask = np.zeros((2, 1, 128), np.uint32)
    hind = np.zeros((2, 128), np.int32)
    # window 0 / block 0
    bitmask[0, 0, 0] |= 1 << 0  # row 0, lane 0
    bitmask[0, 0, 1] |= 1 << 0  # row 0, lane 1
    bitmask[0, 0, 2] |= 1 << 31  # row 31, lane 2
    hind[0, 0], hind[0, 1], hind[0, 2] = 5, 9, 63
    # window 1 / block 1
    bitmask[1, 0, 0] |= 1 << 3  # row 3 (global 35), lane 0
    hind[1, 0] = 0
    return SpmmPlan(
        bitmask=bitmask,
        hind=hind,
        window_of_block=np.array([0, 1], np.int32),
        block_ptr=np.array([0, 1, 2], np.int32),
        config=cfg,
        num_nodes=64,
        num_edges=4,
        num_windows=2,
        total_blocks=2,
    )


def test_hand_built_plan_output(rng):
    plan = hand_plan()
    x = rng.standard_normal((64, 32)).astype(np.float32)
    out = np.asarray(spmm_pallas(plan, jnp.asarray(x)))
    expect = np.zeros((64, 32), np.float32)
    expect[0] = x[5] + x[9]
    expect[31] = x[63]
    expect[35] = x[0]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_hand_built_duplicate_lanes_accumulate(rng):
    # two lanes pointing at the SAME source row with bits on the same
    # output row must add twice (multiset semantics of the gather map)
    cfg = PlanConfig(32, 128)
    bitmask = np.zeros((1, 1, 128), np.uint32)
    hind = np.zeros((1, 128), np.int32)
    bitmask[0, 0, 0] |= 1
    bitmask[0, 0, 1] |= 1
    hind[0, 0] = hind[0, 1] = 7
    plan = SpmmPlan(
        bitmask=bitmask,
        hind=hind,
        window_of_block=np.array([0], np.int32),
        block_ptr=np.array([0, 1], np.int32),
        config=cfg,
        num_nodes=32,
        num_edges=2,
        num_windows=1,
        total_blocks=1,
    )
    x = rng.standard_normal((32, 16)).astype(np.float32)
    out = np.asarray(spmm_pallas(plan, jnp.asarray(x)))
    np.testing.assert_allclose(out[0], 2 * x[7], rtol=1e-5, atol=1e-5)
