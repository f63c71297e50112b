"""A/B: unit-granularity vs row-granularity candidate gather in
pruned_topk (r5c).

The cells layout stores each unit as a CONTIGUOUS (cap, F) block (the
build's two-key sort), but the original kernel gathered candidates as
B*M*cap individual rows (`cells_x[flat]`), which the r5 m-sweep measured
at ~10 GB/s effective — 80x below HBM.  The unit-granularity form
(`cells_x.reshape(U, cap, F)[sel]`) hands XLA one contiguous 128-KB
slice per gathered element.  The baseline below is the FULL pre-r5c
kernel (row gather + two-key sort); at HEAD pruned_topk also uses
masked top-k extraction, so the measured ratio is the COMBINED r5c
kernel win, not the gather alone (the gather-only A/B — both sides
sort-based — measured 1.26-3.9x on 2026-08-21; final DCE-hardened
figures for the combined kernel are in BENCH r5: 6.7x vs the stream
at 1M B=16, 9.7x at 10M).  Outputs are asserted
bitwise-identical on certified rows (neither change can alter
values).

Usage: nohup python benchmarks/pruned_gather_ab.py > /tmp/pga.log 2>&1 &
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from arrowspace_tpu.config import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from arrowspace_tpu.pruned import build_cells_device, pruned_topk
from bench import amortised_device_time


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


@functools.partial(jax.jit,
                   static_argnames=("k", "m_cells", "cap", "margin"))
def pruned_topk_rowgather(queries, query_lambdas, cells_x, cells_lam,
                          cells_ids, cent, radius, cosr, sinr, lam_lo,
                          lam_hi, alpha, *, k, m_cells, cap, margin):
    """The pre-r5c kernel: identical math, row-granularity gather."""
    from arrowspace_tpu.ops.bin_repair import _block_diag_dot
    from arrowspace_tpu.ops.search import _safe_unit

    b, f = queries.shape
    u = cent.shape[0]
    m = min(m_cells, u)
    dt = queries.dtype
    a = jnp.asarray(alpha, dt)
    c1 = 1.0 - a

    qhat = _safe_unit(queries)
    qa = qhat * a
    c = jnp.dot(qhat, cent.T, preferred_element_type=dt)
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - c * c))
    cap_sup = jnp.where(c >= cosr[None, :], 1.0,
                        c * cosr[None, :] + s * sinr[None, :])
    dmin = jnp.maximum(
        0.0, jnp.maximum(lam_lo[None, :] - query_lambdas[:, None],
                         query_lambdas[:, None] - lam_hi[None, :]))
    bounds = a * cap_sup - c1 * jnp.minimum(dmin, 1.0)
    bounds = jnp.where(radius[None, :] < 0.0, -3.0, bounds)
    bb, bi = jax.lax.top_k(bounds, m + 1)
    sel, next_bound = bi[:, :m], bb[:, m]

    flat = (sel[:, :, None] * cap
            + jnp.arange(cap, dtype=sel.dtype)[None, None, :]
            ).reshape(b, m * cap)
    g = cells_x[flat.reshape(-1)]                     # ROW gather
    glam = cells_lam[flat.reshape(-1)].reshape(b, m * cap)
    gids = cells_ids[flat.reshape(-1)].reshape(b, m * cap)

    acos = _block_diag_dot(qa, g.reshape(b, m * cap, f), dt)
    dl = jnp.abs(query_lambdas[:, None] - glam)
    shifted = acos - c1 * jnp.minimum(dl, 1.0)
    neg_inf = jnp.asarray(-jnp.inf, dtype=dt)
    shifted = jnp.where(gids >= 0, shifted, neg_inf)
    s_sorted, id_sorted = jax.lax.sort((-shifted, gids), num_keys=2)
    top_s = -s_sorted[:, :k]
    top_i = id_sorted[:, :k]
    kth = top_s[:, k - 1]
    flags = (next_bound + jnp.asarray(margin, dt) >= kth) \
        | ~jnp.isfinite(kth)
    return top_s + c1, top_i, flags


def main():
    N, F, CENTERS, CAP, K, ALPHA = 1_000_000, 128, 1024, 256, 10, 0.9
    rng = np.random.default_rng(0)
    cents = jnp.asarray(
        rng.uniform(0.2, 0.8, (CENTERS, F)).astype(np.float32))

    @jax.jit
    def gen(key):
        ka, kb = jax.random.split(key)
        a = jax.random.randint(ka, (N,), 0, CENTERS)
        r = cents[a] + 0.03 * jax.random.normal(kb, (N, F))
        nn = jnp.sqrt(jnp.sum(r * r, axis=1, keepdims=True))
        return r / jnp.where(nn > 0, nn, 1.0), a

    rows, assign = gen(jax.random.PRNGKey(7))
    lam = jax.random.uniform(jax.random.PRNGKey(9), (N,),
                             dtype=jnp.float32)
    np.asarray(rows[:1, :1])
    log("1M x 128 corpus on device")

    t0 = time.perf_counter()
    cells = build_cells_device(rows, lam, cap=CAP, seed=1, iters=6,
                               n_clusters=2 * CENTERS,
                               assume_normalised=True)
    np.asarray(cells.lam_hi[:1])
    log(f"cells build {time.perf_counter() - t0:.1f}s "
        f"({cells.n_units} units)")

    a0 = np.asarray(assign)
    qi = rng.choice(np.nonzero(a0 < 16)[0], 16, replace=False)
    q16 = rows[jnp.asarray(qi)] * np.float32(1.002)
    ql16 = lam[jnp.asarray(qi)]
    del rows
    big = (cells.x, cells.lam, cells.ids, cells.cent, cells.radius,
           cells.cosr, cells.sinr, cells.lam_lo, cells.lam_hi)

    for m in (8, 16, 32, 64):
        def new_fn(q, *bb):
            return pruned_topk(q, ql16, *bb, ALPHA, k=K, m_cells=m,
                               cap=CAP, margin=1e-3)

        def old_fn(q, *bb):
            return pruned_topk_rowgather(q, ql16, *bb, ALPHA, k=K,
                                         m_cells=m, cap=CAP, margin=1e-3)

        sn, inn, fn_ = jax.device_get(new_fn(q16, *big))
        so, io, fo = jax.device_get(old_fn(q16, *big))
        assert np.array_equal(inn, io) and np.array_equal(sn, so) \
            and np.array_equal(fn_, fo), f"parity broke at m={m}"
        t_new = amortised_device_time(jax, jnp, new_fn, q16, big,
                                      repeats=8)
        t_old = amortised_device_time(jax, jnp, old_fn, q16, big,
                                      repeats=8)
        log(f"m={m:3d}: unit-gather {t_new * 1e3:6.2f} ms vs row-gather "
            f"{t_old * 1e3:6.2f} ms ({t_old / t_new:.2f}x), bitwise "
            f"equal, flags {int(fn_.sum())}/16")
    log("AB-DONE")


if __name__ == "__main__":
    main()
