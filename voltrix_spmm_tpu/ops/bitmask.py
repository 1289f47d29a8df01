"""Bitmask expansion on the VPU.

The reference expands its MMA-swizzled bitmask to tensor-core fragments
with one mask test per lane register (spmm_kernels.cuh:1632-1644). The
TPU equivalent: the bitmask words are packed along *rows* (32 rows per
uint32 word, lanes = compressed columns), so a block expands to a dense
(block_h, block_w) 0/1 tile with one broadcasted variable shift + AND —
an (words, 32, K)-shaped VPU op, no gathers, no per-element scalar code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_bitmask(words: jax.Array, block_h: int, dtype=jnp.float32) -> jax.Array:
    """(words_per_col, K) uint32 -> (block_h, K) 0/1 tile of `dtype`.

    Requires block_h % 32 == 0 (device layout); the numpy-side format
    supports arbitrary block_h, but the Pallas kernels use 32-multiples.
    """
    nwords, K = words.shape
    assert nwords * 32 == block_h, (nwords, block_h)
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (nwords, 32, K), 1)
    bits = (words[:, None, :] >> shifts) & jnp.uint32(1)
    # Mosaic has no uint32->float cast; bitcast to int32 first (values 0/1)
    bits_i32 = jax.lax.bitcast_convert_type(bits, jnp.int32)
    return bits_i32.reshape(block_h, K).astype(dtype)


def expand_bitmask_batched(words: jax.Array, block_h: int, dtype=jnp.float32):
    """(B, words_per_col, K) -> (B, block_h, K)."""
    return jax.vmap(lambda w: expand_bitmask(w, block_h, dtype))(words)
