"""Cost decomposition of binned_energy_topk_approx at 1M x 64 B=2048:
which stage eats the time — the chord fit, the pallas fold, or the
pooled-d² flush/rescore?

History (r5): the ROUND-1 design (gather corpus rows for m_cand
candidates per pool slot + block-diag rescore matmuls) measured here at
fit 6.0 ms (a lax.top_k knot fit — it sorts!), gather+rescore 5.2 ms,
kernel ~13 ms — which drove the redesign to (a) moment-based knots (no
sort) and (b) a d² PAYLOAD carried through the kernel pool so the
rescore is elementwise on pooled values (no corpus gather, no matmuls).
This script now decomposes the CURRENT design; the old numbers live in
ops/energy_approx.py's module docstring.

Usage: nohup python benchmarks/energy_approx_decomp.py > /tmp/ea_decomp.log 2>&1 &
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
    import arrowspace_tpu.ops.energy_approx as ea
    from arrowspace_tpu.ops.energy_approx import (
        _fit_chords, prepare_energy_chord_sample)
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

    # 1. chord fit alone (moment knots — no sort)
    @jax.jit
    def fit_only(q, s_, xs_):
        qn = jnp.sum(q * q, axis=1)
        ca, cb = _fit_chords(q, qn, s_, xs_, jnp.float32(0.5))
        return (jnp.sum(ca[:, :1]) + jnp.sum(cb[:, :1])) * 1e-20
    per = amortised(lambda q, s_, xs_: fit_only(q, s_, xs_),
                    ZQ, (zs, xns)) * 1e3
    log(f"fit_chords alone : {per:6.2f} ms")

    # 2. full kernel + pooled-d² flush (the production call)
    def body(q, z, l_, n_, s_, xs_):
        s, i, fl = ea.binned_energy_topk_approx(
            q, zql, z, l_, 1.0, 0.5, s_, xs_, k=k, n_items=n,
            z_norms=n_)
        return (jnp.sum(s[:, :1]) + jnp.sum(i[:, :1])
                + jnp.sum(fl)) * 1e-20
    per = amortised(body, ZQ, (zp, zl, zn, zs, xns)) * 1e3
    _, _, fl = ea.binned_energy_topk_approx(
        ZQ, zql, zp, zl, 1.0, 0.5, zs, xns, k=k, n_items=n,
        z_norms=zn)
    nfl = int(np.asarray(fl).sum())
    log(f"full approx      : {per:6.2f} ms  flags {nfl}/{b}")

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
