"""One-process TPU tuning run for the pre-reduce fold defaults.

HARNESS FIXED POST-AUDIT: earlier revisions consumed out[0][:1],
which let XLA eliminate the unconsumed query-block pallas_calls at
B=2048 (benchmarks/dce_audit.py) — numbers recorded from those
revisions are elided and superseded by honest_sweep*.py.

Covers, in one device lease (cross-process A/B is unreliable while
cycling — CLAUDE.md):
  1. the SERVING-STEP amortised rate at 1M x 128 with the new auto
     defaults (f32 r2 / bf16 r8 pre-reduce) vs pre_reduce=False,
  2. deeper bf16 splits (r16, r32) the first A/B didn't reach,
  3. the ENERGY kernel's new pre-reduce folds at 1M x 64 (plain vs
     r2/r4/r8) at B=256 and B=2048.

Usage: nohup python benchmarks/fold_tune_ab.py > /tmp/fold_tune.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def amortised(fn, *args, repeats=8, outer=5):
    """Median amortised seconds/iter of fn(*args) via a lax.scan loop
    (device_time.py methodology: one dispatch per outer run)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def looped(*a):
        def body(carry, i):
            out = fn(i, *a)
            return carry + jnp.sum(out) * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(repeats))
        return c

    np.asarray(looped(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        np.asarray(looped(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / repeats


def main() -> None:
    import jax
    import jax.numpy as jnp
    from arrowspace_tpu.config import setup_cache
    setup_cache()
    from arrowspace_tpu.ops.pallas_bintopk import (binned_energy_topk,
                                                   binned_lambda_topk)

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter() - t0:.2f}s", flush=True)

    rng = np.random.default_rng(0)
    N, F, K, B = 1_000_000, 128, 10, 2048
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    ilam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    Q = jnp.asarray(rng.uniform(0.1, 1.0, (B, F)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    np.asarray(X[:1, :1])
    print("corpus uploaded", flush=True)

    # ---- 1. cosine kernel: auto default vs opt-out, deeper bf16 splits
    cos_variants = [
        ("auto f32 (r2 pre)", dict()),
        ("optout f32 plain ", dict(pre_reduce=False)),
        ("auto bf16 (r8 pre)", dict(use_bf16=True)),
        ("optout bf16 plain", dict(use_bf16=True, pre_reduce=False)),
        ("bf16 r16 pre     ", dict(use_bf16=True, lane_split=16,
                                   pre_reduce=True)),
        ("bf16 r32 pre     ", dict(use_bf16=True, lane_split=32,
                                   pre_reduce=True)),
        ("f32 r4 pre       ", dict(lane_split=4, pre_reduce=True)),
    ]
    for name, kw in cos_variants:
        def step(i, q, x, il, kw=kw):
            out = binned_lambda_topk(q + i.astype(q.dtype) * 1e-7, qlam,
                                     x, il, 0.9, k=K, **kw)
            return out[0][:, :1]
        try:
            per = amortised(step, Q, X, ilam)
            # flag sanity on one real dispatch
            _, _, fl = jax.device_get(
                binned_lambda_topk(Q, qlam, X, ilam, 0.9, k=K, **kw))
            print(f"cos {name} {per * 1e3:8.2f} ms/iter "
                  f"({B / per:8.0f} QPS dev)  flags={int(np.sum(fl))}/{B}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"cos {name} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    # ---- 2. energy kernel at 1M x 64 ------------------------------------
    G = 64
    Z = jnp.asarray(rng.normal(size=(N, G)).astype(np.float32))
    zlam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    np.asarray(Z[:1, :1])
    print("energy corpus uploaded", flush=True)
    for eb in (256, 2048):
        ZQ = jnp.asarray(rng.normal(size=(eb, G)).astype(np.float32))
        zql = jnp.asarray(rng.uniform(0, 1, (eb,)).astype(np.float32))
        en_variants = [
            ("plain        ", dict(pre_reduce=False)),
            ("auto (r2 pre)", dict()),
            ("r4 pre       ", dict(lane_split=4, pre_reduce=True)),
            ("r8 pre       ", dict(lane_split=8, pre_reduce=True)),
        ]
        for name, kw in en_variants:
            def estep(i, zq, z, il, zql=zql, kw=kw):
                out = binned_energy_topk(zq + i.astype(zq.dtype) * 1e-7,
                                         zql, z, il, 1.0, 0.5, k=K, **kw)
                return out[0][:, :1]
            try:
                per = amortised(estep, ZQ, Z, zlam)
                _, _, fl = jax.device_get(binned_energy_topk(
                    ZQ, zql, Z, zlam, 1.0, 0.5, k=K, **kw))
                print(f"energy B={eb} {name} {per * 1e3:8.2f} ms/iter "
                      f"({eb / per:8.0f} QPS dev)  "
                      f"flags={int(np.sum(fl))}/{eb}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"energy B={eb} {name} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
