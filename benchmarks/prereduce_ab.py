"""A/B: pre-reduce fold variants of the binned top-k kernel on the TPU.

HARNESS FIXED POST-AUDIT: earlier revisions consumed out[0][:1],
which let XLA eliminate the unconsumed query-block pallas_calls at
B=2048 (benchmarks/dce_audit.py) — numbers recorded from those
revisions are elided and superseded by honest_sweep*.py.

The binned kernel at large batch is fold-compute-bound on the VPU
(~25 elementwise ops per corpus element; lane_split's sequential
sub-folds keep total fold work unchanged, measured negative).  The
pre_reduce variant max-combines r lane sub-tiles into ONE fold —
fold work drops ~r×, at the cost of 3(r-1)/r combine ops and a
loser-max term in the miss detector (flag P grows ~C(k,2)·(r-1)/N,
still rare at serving scale).

Amortised lax.scan timings (device_time.py methodology).  Also checks
on-device exactness vs the plain kernel and reports flag rates on the
2048-query batch.

Usage: nohup python benchmarks/prereduce_ab.py > /tmp/prereduce_ab.log &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from arrowspace_tpu.config import setup_cache
    setup_cache()
    from arrowspace_tpu.ops.pallas_bintopk import binned_lambda_topk

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter() - t0:.2f}s", flush=True)

    rng = np.random.default_rng(0)
    N, F, K = 1_000_000, 128, 10
    X = jnp.asarray(rng.uniform(0.1, 1.0, (N, F)).astype(np.float32))
    ilam = jnp.asarray(rng.uniform(0, 1, (N,)).astype(np.float32))
    np.asarray(X[:1, :1])
    print("corpus uploaded", flush=True)

    B = 2048
    Q = jnp.asarray(rng.uniform(0.1, 1.0, (B, F)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))

    variants = [
        ("plain d3 f32", dict()),
        ("pre r2 d3 f32", dict(lane_split=2, pre_reduce=True)),
        ("pre r4 d3 f32", dict(lane_split=4, pre_reduce=True)),
        ("pre r8 d3 f32", dict(lane_split=8, pre_reduce=True)),
        ("plain d2 f32", dict(depth=2)),
        ("pre r2 d2 f32", dict(depth=2, lane_split=2, pre_reduce=True)),
        ("plain d3 bf16", dict(use_bf16=True)),
        ("pre r2 d3 bf16", dict(lane_split=2, pre_reduce=True,
                                use_bf16=True)),
        ("pre r4 d3 bf16", dict(lane_split=4, pre_reduce=True,
                                use_bf16=True)),
        ("pre r8 d3 bf16", dict(lane_split=8, pre_reduce=True,
                                use_bf16=True)),
    ]

    # ---- exactness + flags (single dispatch per variant) -----------------
    s0, i0, f0 = binned_lambda_topk(Q, qlam, X, ilam, 0.9, k=K)
    s0, i0, f0 = jax.device_get((s0, i0, f0))
    print(f"plain flags at B=2048: {int(f0.sum())}", flush=True)
    for name, kw in variants[1:]:
        if kw.get("use_bf16"):
            continue  # bf16 scores differ from f32 plain by design
        t0 = time.perf_counter()
        s, i, fl = binned_lambda_topk(Q, qlam, X, ilam, 0.9, k=K, **kw)
        s, i, fl = jax.device_get((s, i, fl))
        ok = (fl == 0) & (f0 == 0)
        iok = bool(np.array_equal(i[ok], i0[ok]))
        sok = bool(np.array_equal(s[ok], s0[ok]))
        print(f"{name:<16} compile+run {time.perf_counter()-t0:6.1f}s  "
              f"flags={int(fl.sum())}/{B}  unflagged bitwise "
              f"idx={iok} s={sok}", flush=True)

    # ---- amortised A/B ---------------------------------------------------
    def t_scan(kw, label, repeats=8):
        @jax.jit
        def looped(q, x, il):
            def body(carry, i):
                qi = q + i.astype(q.dtype) * 1e-7
                out = binned_lambda_topk(qi, qlam, x, il, 0.9, k=K, **kw)
                return carry + jnp.sum(out[0][:, :1]) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype),
                                jnp.arange(repeats))
            return c

        np.asarray(looped(Q, X, ilam))      # warm/compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(looped(Q, X, ilam))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / repeats
        print(f"{label:<18} {per * 1e3:8.2f} ms/iter  "
              f"({B / per:8.0f} QPS dev)", flush=True)
        return per

    res = {}
    for name, kw in variants:
        res[name] = t_scan(kw, name)

    base_f32 = res["plain d3 f32"]
    base_bf16 = res["plain d3 bf16"]
    for name, per in res.items():
        base = base_bf16 if "bf16" in name else base_f32
        print(f"{name:<18} {base / per:5.2f}x vs plain", flush=True)


if __name__ == "__main__":
    main()
