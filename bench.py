"""Benchmark harness.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Headline metric mirrors the reference's `lookup_topk_k=3/arrow_*/batch256`
bench (benches/base_index_bench.rs:14-140): score 256 perturbed queries
against a 150x4 corpus with alpha-blended lambda similarity and take
top-3.  The reference measures only the scoring loop (setup excluded via
iter_batched; query lambda fixed at 0.0) and its checked-in baseline is
2024.3 ms per 256-query batch at alpha=0.9
(benches/baselines/base_index_bench.json).  vs_baseline is the speedup
factor: baseline_ms / our_ms.

Supplementary numbers (build scaling mirroring base_laplacian_bench.rs and
a large-corpus λτ+query sweep) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def median_time(fn, warmup: int = 3, iters: int = 20) -> float:
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def iris_like(n: int = 150, f: int = 4, seed: int = 3) -> np.ndarray:
    """150x4 three-cluster dataset with the same shape/scale as the
    reference bench's Iris x100 (the bench cost is shape-driven)."""
    rng = np.random.default_rng(seed)
    centers = np.array([[5.0, 3.4, 1.5, 0.2],
                        [5.9, 2.8, 4.3, 1.3],
                        [6.6, 3.0, 5.6, 2.0]]) * 100.0
    labels = np.repeat(np.arange(3), n // 3)
    return centers[labels] + rng.normal(0, 20.0, (n, f))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/arrowspace_jax_cache")

    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.ops.search import batched_lambda_aware_topk

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    # ---- headline: batch-256 top-3 lambda-aware lookup ------------------
    items = iris_like()
    builder = (ArrowSpaceBuilder()
               .with_lambda_graph(1e-1, 10, 3, 2.0, None)
               .with_seed(42))
    t0 = time.perf_counter()
    aspace, gl = builder.build(items.tolist())
    log(f"index build (150x4): {time.perf_counter() - t0:.3f}s, "
        f"graph={gl.shape()}, clusters={aspace.n_clusters}")

    rng = np.random.default_rng(7)
    idx = rng.integers(0, len(items), 256)
    queries = items[idx] * 1.02
    # the reference's timed loop uses query lambda = 0.0
    qlam = np.zeros(256)

    def run_batch256():
        # public batched search API: includes the adaptive engine
        # selection (a 150-item corpus scan runs on the host — paying an
        # accelerator round trip for it would be ~1000x the compute)
        scores, top = aspace.search_lambda_aware_batch(queries, qlam, 3, 0.9)
        np.asarray(scores[:1, :1])

    ours_ms = median_time(run_batch256) * 1e3
    baseline_ms = 2024.3  # benches/baselines/base_index_bench.json batch256 α=0.9
    log(f"batch256 topk3 alpha=0.9: {ours_ms:.3f} ms "
        f"(reference {baseline_ms} ms, {baseline_ms / ours_ms:.1f}x)")

    # Emit the headline JSON line immediately: the supplementary sweeps
    # below are informational and must not jeopardise the recorded result
    # if the TPU tunnel stalls mid-run.
    print(json.dumps({
        "metric": "lookup_topk3_batch256_latency",
        "value": round(ours_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ours_ms, 1),
    }), flush=True)

    # ---- supplementary: Laplacian build scaling (stderr only) -----------
    try:
        from data_gen import vectors_data_3000  # optional local helper
    except ImportError:
        vectors_data_3000 = None
    from arrowspace_tpu.graph import GraphParams
    from arrowspace_tpu.laplacian import build_laplacian_matrix

    for n in (50, 100, 200, 400):
        rowsn = np.random.default_rng(n).uniform(0.1, 1.0, (n, 24))
        transposed = np.ascontiguousarray(rowsn.T)  # host input, as a user has it
        params = GraphParams(eps=0.5, k=6, topk=4, p=2.0, sigma=None,
                             normalise=False, sparsity_check=False)
        t = median_time(
            lambda: build_laplacian_matrix(transposed, params, n_items=n),
            warmup=2, iters=5)
        log(f"laplacian build n_items={n} d=24: {t * 1e3:.2f} ms "
            f"(reference: 1.53/5.39/20.2/84.9 ms at 50/100/200/400)")

    # ---- supplementary: large-corpus λτ + query QPS ----------------------
    # NOTE: block_until_ready can return early through the axon tunnel;
    # fetching a tiny output slice is the reliable completion barrier.
    from arrowspace_tpu.taumode import TauMode, compute_taumode_lambdas
    from arrowspace_tpu.ops.pallas_topk import fused_lambda_topk
    n_big, f_big = 1_000_000, 128
    big = jnp.asarray(
        np.random.default_rng(0).uniform(0.1, 1.0, (n_big, f_big))
        .astype(np.float32))
    a = np.random.default_rng(1).uniform(0, 1, (f_big, f_big))
    a = np.maximum(a, a.T) * (a > 0.9)
    np.fill_diagonal(a, 0)
    lap_big = jnp.asarray(np.diag(a.sum(1)) - a, dtype=jnp.float32)

    def lam_batch():
        out = compute_taumode_lambdas(big, lap_big, TauMode.median())
        np.asarray(out[:1])

    t_lam = median_time(lam_batch, warmup=2, iters=5)
    log(f"λτ batch 1M x 128: {t_lam * 1e3:.1f} ms "
        f"({n_big / t_lam / 1e6:.2f}M items/s)")

    big_lam = compute_taumode_lambdas(big, lap_big, TauMode.median())
    qb = big[:256] * 1.01
    qlam_b = compute_taumode_lambdas(qb, lap_big, TauMode.median())

    def big_query_xla():
        s, i = batched_lambda_aware_topk(qb, qlam_b, big, big_lam,
                                         jnp.asarray(0.9, jnp.float32), k=10)
        np.asarray(s[:1, :1])

    def big_query_pallas():
        s, i = fused_lambda_topk(qb, qlam_b, big, big_lam, 0.9, k=10)
        np.asarray(s[:1, :1])

    t_q = median_time(big_query_xla, warmup=2, iters=5)
    t_p = median_time(big_query_pallas, warmup=2, iters=5)
    log(f"query batch256 over 1M x 128: xla {t_q * 1e3:.2f} ms "
        f"({256 / t_q:.0f} QPS), pallas {t_p * 1e3:.2f} ms "
        f"({256 / t_p:.0f} QPS)")


if __name__ == "__main__":
    main()
