"""A/B: merge-kernel vs bin-accumulator streaming top-k on the real TPU.

HARNESS FIXED POST-AUDIT: earlier revisions consumed out[0][:1],
which let XLA eliminate the unconsumed query-block pallas_calls at
B=2048 (benchmarks/dce_audit.py) — numbers recorded from those
revisions are elided and superseded by honest_sweep*.py.

One process, amortised lax.scan timings (see device_time.py's
methodology note — single-dispatch RTT subtraction is too noisy for
kernel A/Bs).  Also checks on-device exactness of the binned kernel
against the XLA matmul+top_k path (Mosaic miscompilation guard).

Usage: python benchmarks/bintopk_ab.py
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
    from arrowspace_tpu.ops.pallas_topk import fused_lambda_topk
    from arrowspace_tpu.ops.search import batched_lambda_aware_topk

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

    # ---- on-device exactness check (B=256) ------------------------------
    B = 256
    Q = jnp.asarray(rng.uniform(0.1, 1.0, (B, F)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
    t0 = time.perf_counter()
    s_b, i_b, fl = binned_lambda_topk(Q, qlam, X, ilam, 0.9, k=K)
    s_b, i_b, fl = np.asarray(s_b), np.asarray(i_b), np.asarray(fl)
    print(f"binned first run (incl compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    s_x, i_x = batched_lambda_aware_topk(Q, qlam, X, ilam,
                                         jnp.float32(0.9), k=K)
    s_x, i_x = np.asarray(s_x), np.asarray(i_x)
    n_flag = int(fl.sum())
    ok = fl == 0
    idx_match = (i_b[ok] == i_x[ok]).mean()
    print(f"exactness: flags={n_flag}/{B}, unflagged idx match="
          f"{idx_match:.6f}, max |ds|="
          f"{np.abs(s_b[ok] - s_x[ok]).max():.2e}", flush=True)

    # ---- amortised A/B --------------------------------------------------
    def t_scan(op, q0, label, repeats=16):
        @jax.jit
        def looped(q, x, il):
            def body(carry, i):
                qi = q * (1.0 + carry * 0.0) + i.astype(q.dtype) * 1e-7
                out = op(qi, x, il)
                s = jnp.sum(out[0][:, :1])
                return carry + s * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype),
                                jnp.arange(repeats))
            return c

        np.asarray(looped(q0, X, ilam))      # warm/compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(looped(q0, X, ilam))
            ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / repeats
        bq = q0.shape[0]
        print(f"{label:<44} {per * 1e3:8.2f} ms/iter  "
              f"({bq / per:8.0f} QPS dev)", flush=True)
        return per

    results = {}
    for B in (256, 2048):
        Qb = jnp.asarray(rng.uniform(0.1, 1.0, (B, F)).astype(np.float32))
        qlb = jnp.asarray(rng.uniform(0, 1, (B,)).astype(np.float32))
        rep = 16 if B == 256 else 8

        results[(B, "merge", "f32")] = t_scan(
            lambda q, x, il: fused_lambda_topk(q, qlb, x, il, 0.9, k=K),
            Qb, f"B={B} merge kernel f32", rep)
        results[(B, "binned", "f32")] = t_scan(
            lambda q, x, il: binned_lambda_topk(q, qlb, x, il, 0.9, k=K),
            Qb, f"B={B} binned kernel f32", rep)
        results[(B, "merge", "bf16")] = t_scan(
            lambda q, x, il: fused_lambda_topk(q, qlb, x, il, 0.9, k=K,
                                               use_bf16=True),
            Qb, f"B={B} merge kernel bf16", rep)
        results[(B, "binned", "bf16")] = t_scan(
            lambda q, x, il: binned_lambda_topk(q, qlb, x, il, 0.9, k=K,
                                                use_bf16=True),
            Qb, f"B={B} binned kernel bf16", rep)

    for B in (256, 2048):
        for prec in ("f32", "bf16"):
            old = results[(B, "merge", prec)]
            new = results[(B, "binned", prec)]
            print(f"B={B} {prec}: merge {old*1e3:.2f} ms -> binned "
                  f"{new*1e3:.2f} ms = {old/new:.2f}x", flush=True)


if __name__ == "__main__":
    main()
