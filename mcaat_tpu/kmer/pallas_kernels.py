"""Pallas TPU kernels for the k-mer hot path.

``extract_kmers_pallas``: fused k-mer window extraction + 2-bit packing.
The XLA fallback (``kmer.count.extract_kmers``) runs k dynamic-slice +
shift passes over the read matrix in HBM; this kernel streams each read
tile through VMEM once, maintaining the rolling packed k-mer in a pair of
uint32 registers (hi: bits ≥ 32, lo: low 32 bits — 2k ≤ 48 bits for
k ≤ 24), so the HBM traffic is one read of the codes and one write of
the outputs.

Grid: one program per row tile. Rows are the vectorized dimension
(sublanes × lanes hold a column of reads); the scan runs along the read
length in a ``fori_loop``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcaat_tpu.kmer.count import SENTINEL

ROW_TILE = 256  # reads per program


def _extract_kernel(k: int, codes_ref, lengths_ref, hi_ref, lo_ref):
    L = codes_ref.shape[1]
    W = L - k + 1
    codes = codes_ref[:].astype(jnp.uint32)  # [ROWS, L]
    lengths = lengths_ref[:]  # [ROWS]
    rows = codes.shape[0]

    hi_mask = jnp.uint32((1 << (2 * k - 32)) - 1) if 2 * k > 32 else jnp.uint32(0)

    # statically-unrolled rolling pack over k window offsets: every slice
    # is static, all ops are full [ROWS, W] vector ops on the VPU
    hi = jnp.zeros((rows, W), jnp.uint32)
    lo = jnp.zeros((rows, W), jnp.uint32)
    for t in range(k):
        c = codes[:, t : t + W]
        hi = ((hi << 2) | (lo >> 30)) & hi_mask
        lo = (lo << 2) | c

    # mask out-of-range windows with an all-ones sentinel pattern
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
    live = col + k <= lengths[:, None]
    hi_ref[:, :] = jnp.where(live, hi, jnp.uint32(0xFFFFFFFF))
    lo_ref[:, :] = jnp.where(live, lo, jnp.uint32(0xFFFFFFFF))


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def extract_kmers_pallas(
    codes: jax.Array, lengths: jax.Array, k: int, interpret: bool = False
) -> jax.Array:
    """Packed int64 k-mers ``[R, L-k+1]`` (SENTINEL on dead windows)."""
    R, L = codes.shape
    W = L - k + 1
    if W <= 0:
        return jnp.full((R, 0), SENTINEL, dtype=jnp.int64)
    # pad rows to a tile multiple
    R_pad = (R + ROW_TILE - 1) // ROW_TILE * ROW_TILE
    codes_p = jnp.zeros((R_pad, L), dtype=jnp.uint8).at[:R].set(codes)
    lengths_p = jnp.zeros((R_pad,), dtype=jnp.int32).at[:R].set(lengths)

    grid = (R_pad // ROW_TILE,)
    hi, lo = pl.pallas_call(
        functools.partial(_extract_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROW_TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, W), jnp.uint32),
            jax.ShapeDtypeStruct((R_pad, W), jnp.uint32),
        ],
        interpret=interpret,
    )(codes_p, lengths_p)

    packed = (hi[:R].astype(jnp.int64) << 32) | lo[:R].astype(jnp.int64)
    # dead windows carry the all-ones pattern; map them to SENTINEL
    dead = (hi[:R] == jnp.uint32(0xFFFFFFFF)) & (lo[:R] == jnp.uint32(0xFFFFFFFF))
    return jnp.where(dead, SENTINEL, packed)
