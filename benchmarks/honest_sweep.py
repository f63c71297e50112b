"""Honest (DCE-immune) sweep of the binned kernel's (block_b, lane_split,
depth) at B=2048, 1M x 128.

Context: benchmarks/dce_audit.py proved the consume-one amortised
harness let XLA eliminate 7 of the 8 query-block pallas_calls at
B=2048 — every prior B=2048 A/B (block-size sweep at 10M, fold tuning)
compared partially-elided programs.  The honest baseline is 15.5 ms
(f32, 132k QPS device), and the "big blocks are slower" negative result
is void.

The lever this sweep explores: a RESIDENT query block of 1024/2048 with
a deep pre-reduce lane_split.  Per (query, item) the VPU cost model is
  ~6 (score math) + 5*(r-1)/r (pre-reduce combine) + ~6*depth/r (fold)
so a deep split shrinks fold work while block_b=2048 cuts corpus HBM
streams from 8 to 1.  Narrow bins raise the >D-collision flag rate
(C(k, D+1)/bins^D per query); depth=4 restores it for ~nothing at
r >= 8.  Flags are counted from a real dispatch per config: a flagged
batch pays an exact-repair rescan, so the deepest 0-flag config wins.

Usage: nohup python benchmarks/honest_sweep.py > /tmp/honest_sweep.log 2>&1 &
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

    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk

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

    # (label, use_bf16, block_b, lane_split, pre_reduce, depth)
    configs = [
        ("f32  auto (prod default)",   False, 0,    0,  None,  0),
        ("f32  b256  r4  d3",          False, 256,  4,  True,  0),
        ("f32  b512  r4  d3",          False, 512,  4,  True,  0),
        ("f32  b1024 r8  d3",          False, 1024, 8,  True,  0),
        ("f32  b1024 r8  d4",          False, 1024, 8,  True,  4),
        ("f32  b2048 r16 d3",          False, 2048, 16, True,  0),
        ("f32  b2048 r16 d4",          False, 2048, 16, True,  4),
        ("f32  b2048 r8  d3 t2048",    False, 2048, 8,  True,  0),
        ("bf16 auto (prod default)",   True,  0,    0,  None,  0),
        ("bf16 b1024 r8  d4",          True,  1024, 8,  True,  4),
        ("bf16 b2048 r16 d4",          True,  2048, 16, True,  4),
        ("bf16 b2048 r32 d4",          True,  2048, 32, True,  4),
    ]

    results = []
    for label, bf16, bb, r, pr, d in configs:
        tile = 2048 if "t2048" in label else 0

        def body(q, x, il, bf16=bf16, bb=bb, r=r, pr=pr, d=d, tile=tile):
            s, i, fl = binned_lambda_topk(
                q, qlam, x, il, 0.9, k=K, use_bf16=bf16, block_b=bb,
                lane_split=r, pre_reduce=pr, depth=d, tile=tile)
            return jnp.sum(s[:, :1]) * 1e-20   # every row live: no DCE

        try:
            per = amortised(body, Q, (X, ilam))
            _, _, fl = binned_lambda_topk(
                Q, qlam, X, ilam, 0.9, k=K, use_bf16=bf16, block_b=bb,
                lane_split=r, pre_reduce=pr, depth=d, tile=tile)
            nflag = int(np.asarray(jnp.sum(fl)))
            qps = B / per
            print(f"{label:<28} {per * 1e3:7.2f} ms/batch = {qps:8.0f} "
                  f"QPS device | flags {nflag}/{B}", flush=True)
            results.append((label, per, nflag))
        except Exception as e:  # noqa: BLE001
            print(f"{label:<28} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    ok = [(l, p) for l, p, nf in results if nf == 0]
    if ok:
        best = min(ok, key=lambda t: t[1])
        print(f"best 0-flag: {best[0]} at {best[1] * 1e3:.2f} ms "
              f"({B / best[1]:.0f} QPS device)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
