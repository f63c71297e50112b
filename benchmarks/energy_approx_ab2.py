"""Round-2 on-chip A/B of the chord-surrogate energy kernel after the
r5 cost cuts (clamped-floor plane: −1 max/pair; approx depth = exact−1:
−1 insertion level + 1 payload plane).  Baselines from the first run
(/tmp/energy_approx.log): exact 18.75 ms, approx(depth3, 3-term plane)
19.01 ms at 1M x 64 B=2048 k=10.  Target <= ~13.6 ms (150k QPS).

Variants (same corpus/queries, DCE-immune consume-all amortised):
  A. new default      (depth 2, auto layout — expect block 512 r16)
  B. manual b1024     (depth 2, block 1024 / tile 2048 / r 16 — the
                       exact kernel's winning resident block; may OOM
                       in Mosaic -> caught and logged)
  C. depth 3          (isolates the depth lever vs A)
Then exactness + flag rate for the winner at k=10/64.

Usage: nohup python benchmarks/energy_approx_ab2.py > /tmp/ea_ab2.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from arrowspace_tpu.config import setup_cache
setup_cache()

import jax
import jax.numpy as jnp

from _harness import amortised

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main(n=1_000_000, g=64, b=2048, k=10):
    from arrowspace_tpu.energymaps import _energy_score_topk_chunked
    from arrowspace_tpu.ops.energy_approx import (
        binned_energy_topk_approx, prepare_energy_chord_sample)
    from arrowspace_tpu.ops.pallas_bintopk import (
        prepare_binned_energy_corpus)

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(5)
    Z = jnp.asarray(rng.normal(size=(n, g)).astype(np.float32))
    zlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    ZQ = jnp.asarray(rng.normal(size=(b, g)).astype(np.float32))
    zql = jnp.asarray(rng.uniform(0, 1, (b,)).astype(np.float32))
    np.asarray(Z[:1, :1])
    zp, zl, zn = prepare_binned_energy_corpus(Z, zlam, bsz=b, k=k)
    zs, xns = prepare_energy_chord_sample(zp, zn, n, seed=0)
    np.asarray(zs[:1, :1])
    log("prepared")

    def run(tag, **kw):
        def body(q, z, l_, n_, s_, xs_):
            s, i, fl = binned_energy_topk_approx(
                q, zql, z, l_, 1.0, 0.5, s_, xs_, k=k, n_items=n,
                z_norms=n_, **kw)
            return (jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])
                    + jnp.sum(fl)) * 1e-20
        try:
            per = amortised(body, ZQ, (zp, zl, zn, zs, xns)) * 1e3
            _, _, fl = binned_energy_topk_approx(
                ZQ, zql, zp, zl, 1.0, 0.5, zs, xns, k=k, n_items=n,
                z_norms=zn, **kw)
            nfl = int(np.asarray(fl).sum())
            log(f"{tag:28s}: {per:6.2f} ms/batch ({b/per:.1f}k QPS)  "
                f"flags {nfl}/{b}")
            return per
        except Exception as e:  # noqa: BLE001
            log(f"{tag:28s}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return None

    run("A new default (depth2)")
    run("B manual b1024 t2048 r16", block_b=1024, tile=2048,
        lane_split=16, pre_reduce=True)
    run("C depth 3", depth=3)
    run("D manual b512 t4096 r16", block_b=512, tile=4096,
        lane_split=16, pre_reduce=True)

    # exactness for the default config at k=10 and k=64
    for kk in (k, 64):
        s1, i1, fl = binned_energy_topk_approx(
            ZQ, zql, zp, zl, 1.0, 0.5, zs, xns, k=kk, n_items=n,
            z_norms=zn)
        s1, i1, fl = jax.device_get((s1, i1, fl))
        s2, i2 = _energy_score_topk_chunked(
            ZQ, zql, Z, zlam, jnp.float32(1.0), jnp.float32(0.5), k=kk)
        s2, i2 = jax.device_get((s2, i2))
        cert = np.nonzero(fl == 0)[0]
        ok_i = all(np.array_equal(i1[r], i2[r]) for r in cert)
        d = max((np.abs(s1[r] - s2[r]).max() for r in cert),
                default=0.0)
        log(f"k={kk:3d}: certified {len(cert)}/{b}  ids-bitwise={ok_i}  "
            f"max|score delta| {d}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
