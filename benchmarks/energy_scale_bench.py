"""Energy-search scale proof: 1M-item batched energy query on one chip.

VERDICT r2 item 2: the round-2 in-memory energy scorer materialised a
(B, N, F') diffs tensor (~65 GB at 1M x 64 x 256) and could not run at
corpus scale.  This measures the chunked z-space path
(energymaps._energy_score_topk_chunked) at 1M items with a signals
graph, plus its in-memory-parity check on a 65k slice.

The index state is constructed directly (projected items + lambdas +
signals) — the energy BUILD pipeline is exercised elsewhere
(tests/test_energy.py, examples/03); this isolates the serving-path
scale claim.

Usage: python benchmarks/energy_scale_bench.py
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
    from arrowspace_tpu.energymaps import (_energy_score_topk,
                                           _energy_score_topk_chunked)

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8, 128)).sum())
    print(f"device first-touch: {time.perf_counter()-t0:.2f}s", flush=True)

    N, G, B, K = 1_000_000, 64, 256, 10
    rng = np.random.default_rng(0)
    z_items = jnp.asarray(rng.normal(size=(N, G)).astype(np.float32))
    lam = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))
    z_q = jnp.asarray(rng.normal(size=(B, G)).astype(np.float32))
    qlam = jnp.asarray(rng.uniform(0, 1, B).astype(np.float32))
    wl = jnp.asarray(1.0, jnp.float32)
    wd = jnp.asarray(0.5, jnp.float32)
    np.asarray(z_items[:1, :1])
    print("corpus (z-space) uploaded", flush=True)

    # parity: chunked vs in-memory on a 65k slice ON DEVICE.  In f32 the
    # two formulas (matmul expansion vs direct diffs) flip ranks among
    # near-ties — random gaussian data packs many at the k-th rank — so
    # the check is the same standard as the wide-features kernel test:
    # ids may differ only where both paths' scores agree to f32
    # rounding.  (The CPU/f64 suite asserts exact id equality.)
    s_m, i_m = _energy_score_topk(
        z_q, qlam, z_items[:65536], lam[:65536],
        jnp.zeros((1, 1), jnp.float32), wl, wd, k=K, use_signals=False)
    s_c, i_c = _energy_score_topk_chunked(
        z_q, qlam, z_items[:65536], lam[:65536], wl, wd, k=K)
    i_m, i_c = np.asarray(i_m), np.asarray(i_c)
    s_m, s_c = np.asarray(s_m), np.asarray(s_c)
    flips = i_m != i_c
    print(f"chunked vs in-memory at 65k on device: id match "
          f"{1.0 - flips.mean():.4f}, max |ds| at flips "
          f"{np.abs(s_m[flips] - s_c[flips]).max() if flips.any() else 0:.2e}",
          flush=True)
    np.testing.assert_allclose(s_c, s_m, atol=1e-4)  # f32 expansion-vs-diff
    assert flips.mean() < 0.05

    # 1M-scale chunked query, amortised
    def looped(q, z, il):
        def body(carry, i):
            qi = q * (1.0 + carry * 0.0) + i.astype(q.dtype) * 1e-7
            s, _ = _energy_score_topk_chunked(qi, qlam, z, il, wl, wd, k=K)
            return carry + jnp.sum(s[:1, :1]) * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), jnp.arange(8))
        return c

    jl = jax.jit(looped)
    t0 = time.perf_counter()
    np.asarray(jl(z_q, z_items, lam))
    print(f"first dispatch (maybe compiling): {time.perf_counter()-t0:.1f}s",
          flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jl(z_q, z_items, lam))
        ts.append(time.perf_counter() - t0)
    per = float(np.median(ts)) / 8
    print(f"energy chunked query 1M x {G} B={B}: {per*1e3:.2f} ms/batch = "
          f"{B/per:.0f} QPS device", flush=True)


if __name__ == "__main__":
    main()
