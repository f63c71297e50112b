"""Honest layout sweep for binned_energy_topk with the r4 fast form
(VERDICT-r3 item 3: the energy kernel never got the resident-block
sweep the cosine kernel got; target 1M x 64 B=2048 >= 150k QPS).

Baseline after the fast-form rewrite (auto layout): 19.06 ms = 107k QPS
(benchmarks/exactness_r4.py, 2026-08-19).  The lambda kernel's champion
at F=128 is (block 1024, tile 2048, r 16, pre) = 7.10 ms; energy at
g=64 has half the matmul work but a sqrt+div score plane.

All configs pre_reduce=True (the r3 finding: bins = tile/r must stay
>= 128 for full-lane VPU occupancy).  DCE-immune consume-all harness.

Usage: nohup python benchmarks/energy_sweep_r4.py > /tmp/energy_sweep_r4.log 2>&1 &
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

    from arrowspace_tpu.ops.pallas_bintopk import (binned_energy_layout,
                                                   binned_energy_topk,
                                                   prepare_binned_energy_corpus)
    from benchmarks._harness import amortised

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter() - t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(3)
    N, G, K, B = 1_000_000, 64, 10, 2048
    Z = jnp.asarray(rng.normal(size=(N, G)).astype(np.float32))
    zlam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    ZQ = jnp.asarray(rng.normal(size=(B, G)).astype(np.float32))
    zql = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    np.asarray(Z[:1, :1])
    print(f"energy corpus uploaded; auto layout = "
          f"{binned_energy_layout(B, N, G, K, 0)}", flush=True)

    zp, zl, zn = prepare_binned_energy_corpus(Z, zlam, bsz=B, k=K)

    # (label, block_b, lane_split, tile)  — all prepared, pre_reduce on
    configs = [
        ("auto (prod default)",   0,    0,  0),
        ("b1024 r8  t1024 b128",  1024, 8,  1024),
        ("b1024 r16 t2048 b128",  1024, 16, 2048),
        ("b1024 r8  t2048 b256",  1024, 8,  2048),
        ("b1024 r32 t4096 b128",  1024, 32, 4096),
        ("b1024 r16 t4096 b256",  1024, 16, 4096),
        ("b2048 r16 t2048 b128",  2048, 16, 2048),
        ("b512  r16 t2048 b128",  512,  16, 2048),
    ]
    results = []
    for label, bb, r, tile in configs:
        def body(q, z, zl_, zn_, bb=bb, r=r, tile=tile):
            s, i, fl = binned_energy_topk(
                q, zql, z, zl_, 1.0, 0.5, k=K, block_b=bb, lane_split=r,
                pre_reduce=(None if bb == 0 else True), tile=tile,
                prepared=True, n_items=N, z_norms=zn_)
            return jnp.sum(s[:, :1]) * 1e-20

        try:
            per = amortised(body, ZQ, (zp, zl, zn))
            _, _, fl = binned_energy_topk(
                ZQ, zql, zp, zl, 1.0, 0.5, k=K, block_b=bb,
                lane_split=r, pre_reduce=(None if bb == 0 else True),
                tile=tile, prepared=True, n_items=N, z_norms=zn)
            nflag = int(np.asarray(jnp.sum(fl)))
            print(f"{label:<24} {per * 1e3:7.2f} ms/batch = "
                  f"{B / per:8.0f} QPS device | flags {nflag}/{B}",
                  flush=True)
            results.append((label, per, nflag))
        except Exception as e:  # noqa: BLE001
            print(f"{label:<24} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    ok = [(l, p) for l, p, nf in results if nf <= B // 256]
    if ok:
        best = min(ok, key=lambda t: t[1])
        print(f"energy best: {best[0]} at {best[1] * 1e3:.2f} ms "
              f"({B / best[1]:.0f} QPS device)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
