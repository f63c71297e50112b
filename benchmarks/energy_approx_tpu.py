"""On-chip validation of the chord-surrogate energy kernel
(ops/energy_approx) — the VERDICT-r4 item-2 target: energy serving at
1M x 64 B=2048 in <= ~13.6 ms (>= 150k QPS), exactness preserved.

Measures (DCE-immune amortised harness, every output row consumed):
  1. exact binned kernel (rsqrt2 plane) — the 18.8 ms r4 baseline
  2. chord-surrogate kernel — certified-exact, target <= 13.6 ms
  3. certification rate on random-normal AND clustered corpora
  4. bitwise exactness: certified rows vs the chunked oracle at
     k = 10 and 64 (ids AND scores)
  5. EnergySearchSession(approx=True) end-to-end wall per batch

Usage: nohup python benchmarks/energy_approx_tpu.py > /tmp/energy_approx.log 2>&1 &
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
        binned_energy_topk, prepare_binned_energy_corpus)

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(5)
    Z = jnp.asarray(rng.normal(size=(n, g)).astype(np.float32))
    zlam = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    ZQ = jnp.asarray(rng.normal(size=(b, g)).astype(np.float32))
    zql = jnp.asarray(rng.uniform(0, 1, (b,)).astype(np.float32))
    np.asarray(Z[:1, :1])
    log("corpus uploaded")

    zp, zl, zn = prepare_binned_energy_corpus(Z, zlam, bsz=b, k=k)
    zs, xns = prepare_energy_chord_sample(zp, zn, n, seed=0)
    np.asarray(zs[:1, :1])

    # 1. exact binned baseline
    per = amortised(
        lambda q, z, l_, n_: jnp.sum(binned_energy_topk(
            q, zql, z, l_, 1.0, 0.5, k=k, prepared=True, n_items=n,
            z_norms=n_)[0][:, :1]) * 1e-20,
        ZQ, (zp, zl, zn)) * 1e3
    log(f"exact binned  : {per:6.2f} ms/batch ({b/per:.1f}k QPS)")

    # 2. chord-surrogate kernel (consume scores + ids + flags)
    def approx_body(q, z, l_, n_, s_, xs_):
        s, i, fl = binned_energy_topk_approx(
            q, zql, z, l_, 1.0, 0.5, s_, xs_, k=k, n_items=n, z_norms=n_)
        return (jnp.sum(s[:, :1]) + jnp.sum(i[:, :1]) + jnp.sum(fl)) \
            * 1e-20
    per_a = amortised(approx_body, ZQ, (zp, zl, zn, zs, xns)) * 1e3
    log(f"chord approx  : {per_a:6.2f} ms/batch ({b/per_a:.1f}k QPS)  "
        f"target <= 13.6")

    # 3+4. exactness + flag rate at k=10 and k=64
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

    # clustered corpus flag rate (the friendly regime)
    cents = (rng.normal(size=(256, g)) * 2).astype(np.float32)
    Zc = jnp.asarray(cents[rng.integers(0, 256, n)]
                     + rng.normal(0, 0.5, (n, g)).astype(np.float32))
    zpc, zlc, znc = prepare_binned_energy_corpus(Zc, zlam, bsz=b, k=k)
    zsc, xnsc = prepare_energy_chord_sample(zpc, znc, n, seed=0)
    qi = rng.integers(0, n, b)
    ZQc = Zc[qi] * 1.02
    _, _, flc = jax.device_get(binned_energy_topk_approx(
        ZQc, zql, zpc, zlc, 1.0, 0.5, zsc, xnsc, k=k, n_items=n,
        z_norms=znc))
    log(f"clustered corpus: flags {int((np.asarray(flc) != 0).sum())}/{b}")
    del Zc, zpc, zlc, znc, zsc, xnsc

    # 5. session end-to-end (random corpus, in-distribution queries):
    # a minimal index shim — EnergySearchSession reads aspace/gl/nitems
    from types import SimpleNamespace

    from arrowspace_tpu.core import ArrowSpace
    from arrowspace_tpu.index import EnergySearchSession
    from arrowspace_tpu.taumode import TauMode
    aspace = ArrowSpace(nfeatures=g, nitems=n, data=Z, signals=None,
                        lambdas=zlam, taumode=TauMode.median())
    idx = SimpleNamespace(aspace=aspace,
                          gl=SimpleNamespace(
                              matrix=jnp.eye(g, dtype=jnp.float32)),
                          nitems=n)
    try:
        sess = EnergySearchSession(idx, b, k=k, approx=True)
        sess.warmup()
        t0 = time.time()
        outs = list(sess.search_stream(
            [np.asarray(ZQ)] * 10))
        wall = (time.time() - t0) / 10
        log(f"approx session: {wall*1e3:6.2f} ms wall/batch "
            f"({b/(wall*1e3):.1f}k QPS incl tunnel)")
    except Exception as e:  # noqa: BLE001
        log(f"session stage FAILED {type(e).__name__}: {str(e)[:200]}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
