"""Pruned-path chip A/B: exact cell-screened small-batch search vs the
full-scan kernels (the "fewer pairs" frontier of STATUS r4 — the B<=16
latency band where the exact per-pair streaming scan is op-bound).

Measures on a clustered 1M x 128 corpus (1024 centers — the regime the
screen is FOR; uniform data degrades to the full scan by design):

  1. build_cells wall (device Lloyd + host metadata, one-time)
  2. pruned_topk amortised device time at B=16 (the session's padded
     block) across m_cells in {32, 64, 128}, with flag rates on
     in-distribution queries
  3. the full-scan comparators on the SAME corpus: binned kernel at
     B=256 (per-16-query cost) and the XLA oracle at B=16

Plus the canonical verify drive (80k x 64 ArrowIndex + a pruned session
smoke) so one process covers both the library surface and the kernel
numbers (one device lease — see CLAUDE.md on process cycling).

Usage: nohup python benchmarks/pruned_tpu_ab.py > /tmp/pruned_ab.log 2>&1 &
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


def verify_drive():
    """The canonical library-surface drive (skills/verify)."""
    from arrowspace_tpu import ArrowIndex
    rng = np.random.default_rng(7)
    centers = rng.uniform(0.2, 0.8, (12, 64))
    rows = centers[rng.integers(0, 12, 80_000)] \
        + rng.normal(0, 0.05, (80_000, 64))
    t0 = time.time()
    idx = ArrowIndex.build(rows, eps=1.0, k=6, topk=3, seed=11)
    log(f"verify: 80k x 64 build {time.time()-t0:.1f}s")
    q = rows[123] * 1.02
    scores, ids = idx.search(q, k=5, alpha=0.9)
    assert ids[0][0] == 123, ids
    cos = rows @ q / (np.linalg.norm(rows, axis=1) * np.linalg.norm(q))
    s64, i64 = idx.search(q, k=5, alpha=1.0, precision="f64_rescore")
    assert list(i64[0]) == list(np.argsort(-cos, kind="stable")[:5])
    res = idx.search_one(q, k=5, alpha=1.0)
    s1, i1 = idx.search(q, k=5, alpha=1.0)
    assert [(i, s) for i, s in res] == [(int(i), float(s))
                                        for i, s in zip(i1[0], s1[0])]
    idx.save("/tmp/vfy_pruned", "x")
    from arrowspace_tpu.index import ArrowIndex as AI
    AI.load("/tmp/vfy_pruned", "x")
    log("verify: search/f64_rescore/search_one/save/load OK")

    # pruned session smoke on the same index (integration on chip).
    # The session's contract is equality to the FULL SCAN AT THE
    # SESSION'S OWN query λ (the λ-prep rounding differs between the
    # in-session fused step and idx.search's host-routed prep, which
    # reorders near-ties on clustered data — same reason SearchSession
    # never claims bitwise equality to idx.search).
    from arrowspace_tpu.ops.search import batched_lambda_aware_topk
    sess = idx.make_pruned_session(batch_size=8, k=5, alpha=0.9, cap=128)
    sess.warmup()
    qb = rows[rng.integers(0, 80_000, 8)] * 1.02
    t0 = time.time()
    for _ in range(5):
        ss, ii = sess.search(qb)
    wall = (time.time() - t0) / 5
    qf = qb.astype(np.float32)
    _, _, _, qlam_step = sess._step(jnp.asarray(qf))
    so, io = batched_lambda_aware_topk(
        jnp.asarray(qf), qlam_step, idx.aspace.data, idx.aspace.lambdas,
        jnp.float32(0.9), k=5)
    so, io = np.asarray(so), np.asarray(io)
    assert np.array_equal(ii, io), (ii, io)
    np.testing.assert_allclose(ss, so, rtol=0, atol=0)
    # informational: overlap vs idx.search's host-prepped λ
    _, io2 = idx.search(qb, k=5, alpha=0.9)
    ov = np.mean([len(set(ii[r]) & set(io2[r])) / 5 for r in range(8)])
    log(f"verify: pruned session == full scan at session-λ (bitwise), "
        f"wall {wall*1e3:.1f} ms/8q, flag_rate {sess.flag_rate:.3f}, "
        f"overlap-vs-host-λ {ov:.3f}")
    return idx


def pruned_kernel_ab(n=1_000_000, f=128, k=10, b=16, centers=1024):
    from arrowspace_tpu.pruned import build_cells, pruned_topk
    from arrowspace_tpu.ops.search import batched_lambda_aware_topk
    rng = np.random.default_rng(101)
    cent = rng.normal(size=(centers, f)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    assign = rng.integers(0, centers, n)
    rows = (cent[assign] + rng.normal(0, 0.15, (n, f))).astype(np.float32)
    lam = rng.uniform(0, 1, n).astype(np.float32)
    log(f"corpus: {n} x {f}, {centers} centers")

    t0 = time.time()
    cells = build_cells(rows, lam, cap=256, seed=0, iters=8,
                        dtype=jnp.float32)
    np.asarray(cells.radius[:1])
    log(f"build_cells: {time.time()-t0:.1f}s -> {cells.n_units} units "
        f"(padded {cells.cent.shape[0]})")

    qi = rng.integers(0, n, 256)
    queries = (rows[qi] * 1.02 + rng.normal(0, 0.01, (256, f))
               ).astype(np.float32)
    qlam = lam[qi].astype(np.float32)
    qd, qld = jnp.asarray(queries[:b]), jnp.asarray(qlam[:b])

    # oracle comparator at B=16 (full-scan XLA)
    xd, xld = jnp.asarray(rows), jnp.asarray(lam)
    so, io = batched_lambda_aware_topk(qd, qld, xd, xld,
                                       jnp.float32(0.9), k=k)
    so, io = np.asarray(so), np.asarray(io)
    ms = amortised(
        lambda q, x, xl: jnp.sum(batched_lambda_aware_topk(
            q, qld, x, xl, jnp.float32(0.9), k=k)[0][:, :1]) * 1e-20,
        qd, (xd, xld)) * 1e3
    log(f"full-scan XLA oracle B={b}: {ms:6.2f} ms")

    for m_cells in (32, 64, 128):
        sp, ip, fl = pruned_topk(
            qd, qld, cells.x, cells.lam, cells.ids, cells.cent,
            cells.radius, cells.cosr, cells.sinr, cells.lam_lo,
            cells.lam_hi, 0.9, k=k, m_cells=m_cells, cap=cells.cap,
            margin=1e-3)
        sp, ip, fl = jax.device_get((sp, ip, fl))
        ok = all(np.array_equal(ip[r], io[r]) and
                 np.array_equal(sp[r], so[r])
                 for r in range(b) if not fl[r])
        # flag rate over all 256 in-distribution queries (16 blocks)
        nfl = 0
        for lo in range(0, 256, b):
            _, _, f2 = pruned_topk(
                jnp.asarray(queries[lo:lo+b]), jnp.asarray(qlam[lo:lo+b]),
                cells.x, cells.lam, cells.ids, cells.cent, cells.radius,
                cells.cosr, cells.sinr, cells.lam_lo, cells.lam_hi, 0.9,
                k=k, m_cells=m_cells, cap=cells.cap, margin=1e-3)
            nfl += int(np.asarray(f2).sum())
        ms = amortised(
            lambda q, cx, cl, ci, m_cells=m_cells: (
                lambda o: (jnp.sum(o[0][:, :1]) + jnp.sum(o[1][:, :1])
                           + jnp.sum(o[2])) * 1e-20)(
                pruned_topk(q, qld, cx, cl, ci, cells.cent, cells.radius,
                            cells.cosr, cells.sinr, cells.lam_lo,
                            cells.lam_hi, 0.9, k=k, m_cells=m_cells,
                            cap=cells.cap, margin=1e-3)),
            qd, (cells.x, cells.lam, cells.ids)) * 1e3
        log(f"pruned B={b} m_cells={m_cells:<4} {ms:6.2f} ms  "
            f"unflagged-bitwise={ok}  flag_rate {nfl}/256")

    # binned-kernel comparator at B=256 (the large-batch champion)
    try:
        from arrowspace_tpu.ops.pallas_bintopk import (
            binned_lambda_topk, prepare_binned_corpus)
        qd256 = jnp.asarray(queries)
        qld256 = jnp.asarray(qlam)
        xprep, lamprep = prepare_binned_corpus(xd, xld, bsz=256, k=k)
        ms = amortised(
            lambda q, xp, lp: jnp.sum(binned_lambda_topk(
                q, qld256, xp, lp, 0.9, k=k, prepared=True,
                n_items=n)[0][:, :1]) * 1e-20,
            qd256, (xprep, lamprep)) * 1e3
        log(f"binned kernel B=256: {ms:6.2f} ms "
            f"({ms/16:.2f} ms per 16 queries)")
    except Exception as e:  # noqa: BLE001
        log(f"binned comparator FAILED {type(e).__name__}: {str(e)[:140]}")


def main():
    log(f"device: {jax.devices()[0]}")
    verify_drive()
    pruned_kernel_ab()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
