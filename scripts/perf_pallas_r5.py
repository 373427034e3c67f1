"""Pallas DP kernel throughput + prep/kernel split (VERDICT r4 #8).

r4 measured 6.1M pairs/s at 262k pairs with the builder's note that the
XLA-side one-hot/transpose prep dominates. r5 packs b into 4 uint32
planes (16x smaller transpose; constant-shift extract in-kernel). This
probe measures, at 262k and 1M pairs:

  prep_only  — all kernel inputs computed + scalar-summed (no pallas)
  full       — ratio_batch_pallas end to end
  (kernel ≈ full - prep)

Run on the TPU:  python scripts/perf_pallas_r5.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import mcaat_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from mcaat_tpu.report.batched_fuzz import _match_masks, encode_batch
from mcaat_tpu.report.pallas_dp import GROUP, MAXLEN, ratio_batch_pallas


@jax.jit
def prep_only(a_codes, a_lengths, b_codes, b_lengths):
    B = a_codes.shape[0]
    lanes = GROUP * 128
    B_pad = (B + lanes - 1) // lanes * lanes

    def pad(x, fill=0):
        if x.shape[0] == B_pad:
            return x
        pw = [(0, B_pad - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pw, constant_values=fill)

    masks = _match_masks(pad(a_codes), pad(a_lengths))
    G = B_pad // 128
    mlo = masks[:, :, 0].T.reshape(4, G, 128)
    mhi = masks[:, :, 1].T.reshape(4, G, 128)
    b_u = pad(b_codes).astype(jnp.uint32)
    sh = (jnp.uint32(2) * (jnp.arange(16, dtype=jnp.uint32)))[None, :]
    bw = jnp.stack(
        [
            jnp.sum(
                b_u[:, w * 16 : (w + 1) * 16] << sh, axis=1,
                dtype=jnp.uint32,
            )
            for w in range(MAXLEN // 16)
        ]
    ).reshape(MAXLEN // 16, G, 128)
    return (
        jnp.sum(mlo) + jnp.sum(mhi) + jnp.sum(bw) + jnp.sum(pad(b_lengths))
    )


def wall(fn, *args, reps=4):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        r = float(np.asarray(r).sum())
        best = min(best, time.perf_counter() - t0)
    return best


res = {}
for n_sp in (512, 1024):
    rng = np.random.default_rng(1)
    spacers = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, size=34))
        for _ in range(n_sp)
    ]
    codes_f, lens_f = encode_batch(spacers)
    ii, jj = np.meshgrid(np.arange(n_sp), np.arange(n_sp), indexing="ij")
    a_c = jnp.asarray(codes_f[ii.reshape(-1)])
    a_l = jnp.asarray(lens_f[ii.reshape(-1)])
    b_c = jnp.asarray(codes_f[jj.reshape(-1)])
    b_l = jnp.asarray(lens_f[jj.reshape(-1)])
    pairs = n_sp * n_sp
    t_prep = wall(prep_only, a_c, a_l, b_c, b_l)
    t_full = wall(ratio_batch_pallas, a_c, a_l, b_c, b_l)
    res[f"pairs_{pairs}"] = {
        "prep_only_ms": round(t_prep * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "mpairs_per_s": round(pairs / t_full / 1e6, 2),
    }
    print(
        f"{pairs} pairs: prep {t_prep*1e3:.2f}ms full {t_full*1e3:.2f}ms "
        f"= {pairs/t_full/1e6:.2f}M pairs/s",
        flush=True,
    )

print(json.dumps(res, indent=2))
with open("/root/repo/EXP_PALLAS_r5.json", "w") as fh:
    json.dump(res, fh, indent=2)
