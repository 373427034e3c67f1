"""Pallas TPU kernel for batched bit-parallel edit-distance scoring.

The named BASELINE kernel-efficiency deliverable ("banded-DP inner loops
at speed-of-light"): rapidfuzz ``fuzz::ratio`` semantics (indel distance
via LCS, reference include/post_processing.h:114) for ≤64bp strings —
spacers and repeats are 23-50bp (settings.h:39-44).

Same math as ``report.batched_fuzz.lcs_batch`` (Hyyrö bit-parallel LCS,
64-bit row emulated as a pair of uint32 words), restructured for the
VPU:

* pairs are laid out ``[G, 128]`` (sublanes × lanes), so every DP-state
  op is a native ``(8, 128)`` vector tile — one program scores 1024
  pairs;
* the per-lane match masks are precomputed by XLA (einsum over the
  one-hot — MXU work) and passed in as ``[4, G, 128]`` planes; the
  kernel's inner loop is 64 statically-unrolled steps of pure bitwise
  VPU ops on VMEM-resident state — no HBM traffic inside the scan.

Parity with the lax.scan implementation (and transitively the host
``report.fuzz``) is asserted in ``tests/test_pallas_dp.py``.

Measured on v5e (scripts/perf_r2b.py): see the module docstring of
``report.batched_fuzz`` for the A/B numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcaat_tpu.report.batched_fuzz import MAXLEN, _match_masks

# sublane rows per grid step -> 32*128 = 4096 pairs/step. Swept on v5e
# (scripts r5): {8: 9.5, 32: 10.7, 64: 10.6} M pairs/s at 1M pairs —
# larger blocks amortize per-step overheads; 32 is the knee.
GROUP = 32

# the 64-step statically-unrolled kernel's trace/lowering recursion sits
# near CPython's default 1000-frame limit on the real-TPU (Mosaic) path
# (interpret mode stays shallower); headroom, set once at import
import sys as _sys

if _sys.getrecursionlimit() < 10_000:
    _sys.setrecursionlimit(10_000)


def _lcs_kernel(mlo_ref, mhi_ref, bw_ref, blen_ref, alen_ref, flo_ref, fhi_ref, out_ref):
    # the length-dependent all-ones masks are precomputed by XLA and
    # passed in: Mosaic cannot legalize unsigned min (arith.minui) on
    # this toolchain, and the kernel body then needs only &,|,+,-,
    # compares and shifts-by-constant. b arrives 2-bit-PACKED as 4
    # uint32 planes (16 codes/word): the r4 form shipped b as a
    # [64, G, 128] byte cube whose XLA-side transpose dominated the
    # prep (VERDICT r4 #8) — packed, the transpose is 16x smaller and
    # the per-step code is a constant-shift extract on a VMEM word.
    full_lo = flo_ref[:]
    full_hi = fhi_ref[:]

    blen = blen_ref[:]
    words = [bw_ref[w] for w in range(MAXLEN // 16)]  # hoisted VMEM loads
    slo, shi = full_lo, full_hi
    for j in range(MAXLEN):
        # c stays uint32: Mosaic's uint32->int32 convert helper recurses
        # infinitely on this toolchain (same family as the minui limit),
        # and c is only ever compared anyway
        c = (words[j // 16] >> (2 * (j % 16))) & jnp.uint32(3)
        mlo = jnp.where(
            c == 0,
            mlo_ref[0],
            jnp.where(c == 1, mlo_ref[1], jnp.where(c == 2, mlo_ref[2], mlo_ref[3])),
        )
        mhi = jnp.where(
            c == 0,
            mhi_ref[0],
            jnp.where(c == 1, mhi_ref[1], jnp.where(c == 2, mhi_ref[2], mhi_ref[3])),
        )
        ulo, uhi = slo & mlo, shi & mhi
        plo = slo + ulo
        # carries/borrows as selects, not bool->uint32 astype: Mosaic's
        # convert-to-unsigned helper recurses on this toolchain
        one = jnp.uint32(1)
        zero = jnp.uint32(0)
        phi = shi + uhi + jnp.where(plo < slo, one, zero)
        qlo = slo - ulo
        qhi = shi - uhi - jnp.where(slo < ulo, one, zero)
        nlo, nhi = plo | qlo, phi | qhi
        live = j < blen
        slo = jnp.where(live, nlo & full_lo, slo)
        shi = jnp.where(live, nhi & full_hi, shi)

    # stay unsigned end to end: Mosaic's uint32<->int32 converts recurse
    # on this toolchain (alen arrives uint32; XLA converts the output)
    ones = _popcount32(slo & full_lo) + _popcount32(shi & full_hi)
    out_ref[:] = alen_ref[:] - ones


def _popcount32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


@functools.partial(jax.jit, static_argnames=("interpret",))
def lcs_batch_pallas(
    a_codes: jax.Array,
    a_lengths: jax.Array,
    b_codes: jax.Array,
    b_lengths: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """LCS length per pair (|a| ≤ 64); drop-in for batched_fuzz.lcs_batch."""
    B = a_codes.shape[0]
    lanes = GROUP * 128
    B_pad = (B + lanes - 1) // lanes * lanes

    def pad(x, fill=0):
        if x.shape[0] == B_pad:
            return x
        pad_width = [(0, B_pad - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    masks = _match_masks(pad(a_codes), pad(a_lengths))  # [B_pad, 4, 2]
    G = B_pad // 128
    mlo = masks[:, :, 0].T.reshape(4, G, 128)
    mhi = masks[:, :, 1].T.reshape(4, G, 128)
    # 2-bit-pack b into 4 uint32 words/lane (bits are disjoint ⇒ the
    # shifted sum is an OR); [B_pad, 4] transposes 16x cheaper than the
    # r4 [B_pad, 64] byte cube
    b_u = pad(b_codes).astype(jnp.uint32)  # [B_pad, 64]
    sh = (jnp.uint32(2) * (jnp.arange(16, dtype=jnp.uint32)))[None, :]
    # dtype pinned: under the session's x64, jnp.sum(uint32) promotes its
    # accumulator to uint64 — a 64-bit kernel operand Mosaic cannot
    # convert (its u64->u32 helper recurses)
    bw = jnp.stack(
        [
            jnp.sum(
                b_u[:, w * 16 : (w + 1) * 16] << sh, axis=1,
                dtype=jnp.uint32,
            )
            for w in range(MAXLEN // 16)
        ]
    ).reshape(MAXLEN // 16, G, 128)
    blen = pad(b_lengths).reshape(G, 128)
    alen_flat = pad(a_lengths)
    alen = alen_flat.astype(jnp.uint32).reshape(G, 128)

    # length-dependent all-ones masks, precomputed in XLA (see kernel)
    la = alen_flat.astype(jnp.uint32)
    lo_sh = jnp.minimum(la, jnp.uint32(31))
    full_lo = jnp.where(la >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << lo_sh) - 1)
    ha = jnp.where(la > 32, la - 32, jnp.uint32(0))
    hi_sh = jnp.minimum(ha, jnp.uint32(31))
    full_hi = jnp.where(ha >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << hi_sh) - 1)
    flo = full_lo.reshape(G, 128)
    fhi = full_hi.reshape(G, 128)

    grid = G // GROUP
    # the session enables jax_enable_x64 (48-bit packed k-mers); Mosaic
    # cannot compile 64-bit values, and under x64 even the BlockSpec
    # index-map constants trace as i64 ("func.return (i64, i32, i64)") —
    # scope the kernel call to 32-bit mode (all operands are ≤32-bit)
    with jax.enable_x64(False):
        out = pl.pallas_call(
        _lcs_kernel,
        out_shape=jax.ShapeDtypeStruct((G, 128), jnp.uint32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((4, GROUP, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, GROUP, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MAXLEN // 16, GROUP, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        )(mlo, mhi, bw, blen, alen, flo, fhi)
    return out.reshape(B_pad)[:B].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ratio_batch_pallas(
    a_codes, a_lengths, b_codes, b_lengths, interpret: bool = False
) -> jax.Array:
    """fuzz::ratio per pair, float32 [B] in [0, 100] (Pallas DP core)."""
    lcs = lcs_batch_pallas(a_codes, a_lengths, b_codes, b_lengths, interpret)
    total = (a_lengths + b_lengths).astype(jnp.float32)
    return jnp.where(total > 0, 200.0 * lcs.astype(jnp.float32) / total, 100.0)
