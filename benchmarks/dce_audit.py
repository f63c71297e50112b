"""Measurement-validity audit for the amortised kernel harness.

The amortised lax.scan harness (benchmarks/device_time.py, bench.py)
consumes only `out[0][:1]` of each iteration.  At B > block the binned
kernels split into ceil(B/block) SEPARATE pallas_calls concatenated on
the query axis — if XLA dead-code-eliminates the calls whose outputs the
[:1] slice never touches, every "B=2048 kernel device time" we have
reported measured ONE 256-query block, and the honest number is ~8x
slower.  The 10M lane_split A/B (scale_10m_roundtrip) and the pre-reduce
fold A/Bs used the same slice, so the *relative* conclusions are also in
scope.

Experiments (all on the real chip, one process):
  A. consume-one vs consume-all: the same 8-block B=2048 program
     amortised with (1) only block 0's scores in the carry and (2) every
     block's scores in the carry.  Equal times => no DCE (calls are
     opaque); ~8x => DCE, prior numbers measured one block.
  B. full-fetch wall: real dispatches of B=2048 and B=256 with
     device_get of ALL scores, median of 7, RTT subtracted — a
     DCE-immune (if fetch-heavy) cross-check.
  C. energy-kernel tile sweep at B=256 (consume-all): tile 1024/2048/
     4096 x lane_split {1,4} — is the single-dispatch energy cost
     grid-step-bound?

Usage: nohup python benchmarks/dce_audit.py > /tmp/dce_audit.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from arrowspace_tpu.config import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp

    from arrowspace_tpu.ops.pallas_bintopk import (binned_energy_topk,
                                                   binned_lambda_topk)

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter() - t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    N, F, K = 1_000_000, 128, 10
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    ilam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    np.asarray(X[:1, :1])
    print("corpus uploaded", flush=True)

    def amortised(make_body, q, big, repeats=8, outer=5):
        # big arrays MUST be jit ARGUMENTS: a closure capture embeds
        # them as HLO constants and blows the remote-compile 413 limit.
        @jax.jit
        def looped(qq, *bb):
            def body(carry, i):
                return carry + make_body(qq + i.astype(qq.dtype) * 1e-7,
                                         *bb), ()
            c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(repeats))
            return c

        np.asarray(looped(q, *big))
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            np.asarray(looped(q, *big))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / repeats

    # ---- A: consume-one vs consume-all, cosine kernel B=2048 ------------
    Q = jnp.asarray(rng.uniform(0.1, 1.0, (2048, F)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (2048,)).astype(np.float32))

    def one(q, x, il):
        s, i, fl = binned_lambda_topk(q, qlam, x, il, 0.9, k=K)
        return jnp.sum(s[:1, :1]) * 1e-20

    def all_(q, x, il):
        s, i, fl = binned_lambda_topk(q, qlam, x, il, 0.9, k=K)
        # one scalar per 256-block: no block's output is dead
        return jnp.sum(s[::256, :1]) * 1e-20

    t_one = amortised(one, Q, (X, ilam))
    t_all = amortised(all_, Q, (X, ilam))
    print(f"A cos B=2048 consume-one {t_one * 1e3:8.2f} ms/iter | "
          f"consume-all {t_all * 1e3:8.2f} ms/iter | ratio "
          f"{t_all / t_one:.2f}x", flush=True)

    # ---- B: full-fetch wall, cosine --------------------------------------
    f_triv = jax.jit(lambda x: jnp.sum(x) * 0.5)
    one_dev = jnp.ones((8, 128), jnp.float32)

    def rtt():
        ts = []
        for _ in range(12):
            t0 = time.perf_counter()
            np.asarray(f_triv(one_dev))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rtt_s = rtt()
    print(f"tunnel RTT {rtt_s * 1e3:.1f} ms", flush=True)

    for bsz in (2048, 256):
        qb, qlb = Q[:bsz], qlam[:bsz]
        ts = []
        for rep in range(7):
            qj = qb + np.float32(rep) * 1e-7
            t0 = time.perf_counter()
            s, i, fl = jax.device_get(binned_lambda_topk(
                qj, qlb, X, ilam, 0.9, k=K))
            ts.append(time.perf_counter() - t0)
        w = float(np.median(ts))
        print(f"B cos B={bsz} full-fetch wall {w * 1e3:8.2f} ms "
              f"(wall-RTT {max(w - rtt_s, 0) * 1e3:8.2f} ms)", flush=True)

    # ---- C: energy tile sweep at B=256, consume-all ----------------------
    G = 64
    Z = jnp.asarray(rng.normal(size=(N, G)).astype(np.float32))
    zlam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    ZQ = jnp.asarray(rng.normal(size=(256, G)).astype(np.float32))
    zql = jnp.asarray(rng.uniform(0, 1, (256,)).astype(np.float32))
    np.asarray(Z[:1, :1])
    print("energy corpus uploaded", flush=True)

    for tile in (0, 1024, 2048, 4096):
        for r in (1, 4):
            def ebody(q, z, zl, tile=tile, r=r):
                s, i, fl = binned_energy_topk(
                    q, zql, z, zl, 1.0, 0.5, k=K, tile=tile,
                    lane_split=r, pre_reduce=(r > 1))
                return jnp.sum(s[:1, :1]) * 1e-20
            try:
                per = amortised(ebody, ZQ, (Z, zlam))
                print(f"C energy B=256 tile={tile or 'auto':>5} r={r} "
                      f"{per * 1e3:8.2f} ms/iter", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"C energy B=256 tile={tile} r={r} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)

    # energy consume-one vs consume-all at B=2048
    ZQ8 = jnp.asarray(rng.normal(size=(2048, G)).astype(np.float32))
    zql8 = jnp.asarray(rng.uniform(0, 1, (2048,)).astype(np.float32))

    def eone(q, z, zl):
        s, i, fl = binned_energy_topk(q, zql8, z, zl, 1.0, 0.5, k=K)
        return jnp.sum(s[:1, :1]) * 1e-20

    def eall(q, z, zl):
        s, i, fl = binned_energy_topk(q, zql8, z, zl, 1.0, 0.5, k=K)
        return jnp.sum(s[::256, :1]) * 1e-20

    t_eone = amortised(eone, ZQ8, (Z, zlam))
    t_eall = amortised(eall, ZQ8, (Z, zlam))
    print(f"A energy B=2048 consume-one {t_eone * 1e3:8.2f} ms/iter | "
          f"consume-all {t_eall * 1e3:8.2f} ms/iter | ratio "
          f"{t_eall / t_eone:.2f}x", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
