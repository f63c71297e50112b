"""Refinement of benchmarks/honest_sweep.py (see its docstring).

Round-1 findings (1M x 128, B=2048, honest consume-all):
  f32 default (b256 r2 d3)  15.52 ms   b1024 r8 d3  10.88 ms  <- best
  b2048 configs REGRESSED (15.4-17.2): their bins=tile/r=64 planes run
  at half-lane VPU occupancy (vregs are 8x128) — bins must stay >= 128.
  depth 4 cost ~1.3 ms over depth 3 at b1024 (extra fold level).
  bf16 is uniformly worse than f32 at equal config: the kernel is
  VPU-fold-bound and bf16 only buys MXU/HBM.

This round: bins=128 variants at larger tiles (fewer grid steps),
depth-3 bf16, a b512 middle point, and the energy kernel's
resident-block analogues (its honest B=2048 default is 24.5 ms).

Usage: nohup python benchmarks/honest_sweep2.py > /tmp/honest_sweep2.log 2>&1 &
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
    N, F, K, B = 1_000_000, 128, 10, 2048
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    ilam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    Q = jnp.asarray(rng.uniform(0.1, 1.0, (B, F)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    np.asarray(X[:1, :1])
    print("corpus uploaded", flush=True)

    from benchmarks._harness import amortised  # shared, DCE-immune

    # (label, use_bf16, block_b, lane_split, depth, tile)
    cos_configs = [
        ("f32  b1024 r8  d3 t1024",  False, 1024, 8,  0, 0),     # champion
        ("f32  b1024 r16 d3 t2048",  False, 1024, 16, 0, 2048),
        ("f32  b512  r8  d3 t1024",  False, 512,  8,  0, 0),
        ("f32  b256  r8  d3 t1024",  False, 256,  8,  0, 0),
        ("f32  b1024 r32 d3 t4096",  False, 1024, 32, 0, 4096),
        ("bf16 b1024 r8  d3 t1024",  True,  1024, 8,  0, 0),
        ("bf16 b1024 r16 d3 t2048",  True,  1024, 16, 0, 2048),
    ]

    results = []
    for label, bf16, bb, r, d, tile in cos_configs:
        def body(q, x, il, bf16=bf16, bb=bb, r=r, d=d, tile=tile):
            s, i, fl = binned_lambda_topk(
                q, qlam, x, il, 0.9, k=K, use_bf16=bf16, block_b=bb,
                lane_split=r, pre_reduce=True, depth=d, tile=tile)
            return jnp.sum(s[:, :1]) * 1e-20

        try:
            per = amortised(body, Q, (X, ilam))
            _, _, fl = binned_lambda_topk(
                Q, qlam, X, ilam, 0.9, k=K, use_bf16=bf16, block_b=bb,
                lane_split=r, pre_reduce=True, depth=d, tile=tile)
            nflag = int(np.asarray(jnp.sum(fl)))
            print(f"{label:<28} {per * 1e3:7.2f} ms/batch = "
                  f"{B / per:8.0f} QPS device | flags {nflag}/{B}",
                  flush=True)
            results.append((label, per, nflag))
        except Exception as e:  # noqa: BLE001
            print(f"{label:<28} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    ok = [(l, p) for l, p, nf in results if nf == 0]
    if ok:
        best = min(ok, key=lambda t: t[1])
        print(f"cos best 0-flag: {best[0]} at {best[1] * 1e3:.2f} ms "
              f"({B / best[1]:.0f} QPS device)", flush=True)

    # ---- energy kernel: resident-block analogues -------------------------
    G = 64
    Z = jnp.asarray(rng.normal(size=(N, G)).astype(np.float32))
    zlam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    ZQ = jnp.asarray(rng.normal(size=(B, G)).astype(np.float32))
    zql = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    np.asarray(Z[:1, :1])
    print("energy corpus uploaded", flush=True)

    e_configs = [
        ("energy auto (prod default)", 0,    0,  0),
        ("energy b512  r8  d3 t1024",  512,  8,  0),
        ("energy b1024 r8  d3 t1024",  1024, 8,  0),
        ("energy b1024 r16 d3 t2048",  1024, 16, 2048),
    ]
    eres = []
    for label, bb, r, tile in e_configs:
        def ebody(q, z, zl, bb=bb, r=r, tile=tile):
            s, i, fl = binned_energy_topk(
                q, zql, z, zl, 1.0, 0.5, k=K, block_b=bb, lane_split=r,
                pre_reduce=(None if r == 0 else True), tile=tile)
            return jnp.sum(s[:, :1]) * 1e-20

        try:
            per = amortised(ebody, ZQ, (Z, zlam))
            _, _, fl = binned_energy_topk(
                ZQ, zql, Z, zlam, 1.0, 0.5, k=K, block_b=bb, lane_split=r,
                pre_reduce=(None if r == 0 else True), tile=tile)
            nflag = int(np.asarray(jnp.sum(fl)))
            print(f"{label:<28} {per * 1e3:7.2f} ms/batch = "
                  f"{B / per:8.0f} QPS device | flags {nflag}/{B}",
                  flush=True)
            eres.append((label, per, nflag))
        except Exception as e:  # noqa: BLE001
            print(f"{label:<28} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    ok = [(l, p) for l, p, nf in eres if nf == 0]
    if ok:
        best = min(ok, key=lambda t: t[1])
        print(f"energy best 0-flag: {best[0]} at {best[1] * 1e3:.2f} ms "
              f"({B / best[1]:.0f} QPS device)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
