"""Decompose pruned_topk's post-gather-fix latency floor (r5c) and
re-measure the B=256 union against the stream now that gathers are
unit-granularity.

After the unit-gather change the B=16 kernel sits at ~3.2-3.6 ms nearly
flat in m (benchmarks/pruned_gather_ab.py) — the gather is no longer the
clock.  This bench times cumulative stage programs (each a standalone
jit, so no DCE subtleties):

  S1 bounds+select  -> consume sel
  S2 + unit gather  -> consume g
  S3 + score plane  -> consume shifted
  S4 full kernel    -> consume scores

and re-runs the union-vs-stream comparison at B=256 with S in
{128, 192, 256} (the r5 crossover said the stream's 3.7-3.9 ms could
not be beaten by candidate gathering; that conclusion priced gathers at
~10 GB/s and deserves a re-measure).

Usage: nohup python benchmarks/pruned_floor_decomp.py > /tmp/pfd.log 2>&1 &
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

from arrowspace_tpu.ops.pallas_bintopk import (binned_lambda_topk,
                                               prepare_binned_corpus)
from arrowspace_tpu.pruned import (build_cells_device, pruned_topk,
                                   pruned_topk_union)
from bench import amortised_device_time


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _stage(queries, query_lambdas, cells_x, cells_lam, cells_ids, cent,
           radius, cosr, sinr, lam_lo, lam_hi, alpha, *, k, m_cells,
           cap, margin, upto):
    """pruned_topk's body, truncated after stage `upto`."""
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
    if upto == 1:
        return (sel.astype(dt),)
    g = cells_x.reshape(-1, cap, f)[sel.reshape(-1)]
    glam = cells_lam.reshape(-1, cap)[sel.reshape(-1)].reshape(b, m * cap)
    gids = cells_ids.reshape(-1, cap)[sel.reshape(-1)].reshape(b, m * cap)
    if upto == 2:
        return (jnp.sum(g.reshape(b, -1), axis=1, keepdims=True)
                + glam[:, :1] + gids[:, :1].astype(dt),)
    acos = _block_diag_dot(qa, g.reshape(b, m * cap, f), dt)
    dl = jnp.abs(query_lambdas[:, None] - glam)
    shifted = acos - c1 * jnp.minimum(dl, 1.0)
    neg_inf = jnp.asarray(-jnp.inf, dtype=dt)
    shifted = jnp.where(gids >= 0, shifted, neg_inf)
    if upto == 3:
        return (shifted,)
    s_sorted, id_sorted = jax.lax.sort((-shifted, gids), num_keys=2)
    return (-s_sorted[:, :k],)


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
    cells = build_cells_device(rows, lam, cap=CAP, seed=1, iters=6,
                               n_clusters=2 * CENTERS,
                               assume_normalised=True)
    np.asarray(cells.lam_hi[:1])
    log(f"setup done ({cells.n_units} units)")
    big = (cells.x, cells.lam, cells.ids, cells.cent, cells.radius,
           cells.cosr, cells.sinr, cells.lam_lo, cells.lam_hi)

    a0 = np.asarray(assign)
    qi = rng.choice(np.nonzero(a0 < 16)[0], 16, replace=False)
    q16 = rows[jnp.asarray(qi)] * np.float32(1.002)
    ql16 = lam[jnp.asarray(qi)]

    # ---- stage decomposition at B=16 ----
    for m in (8, 64):
        ts = []
        for upto in (1, 2, 3, 4):
            fn = functools.partial(jax.jit(functools.partial(
                _stage, k=K, m_cells=m, cap=CAP, margin=1e-3,
                upto=upto)), )

            def run(q, *bb):
                return fn(q, ql16, *bb, jnp.float32(ALPHA))

            ts.append(amortised_device_time(jax, jnp, run, q16, big,
                                            repeats=8))
        log(f"B=16 m={m:3d} stages (cumulative ms): bounds+sel "
            f"{ts[0]*1e3:.2f}, +gather {ts[1]*1e3:.2f}, +score "
            f"{ts[2]*1e3:.2f}, full {ts[3]*1e3:.2f}")

    # ---- union B=256 vs stream, post-fix ----
    qi2 = rng.choice(np.nonzero(a0 < 16)[0], 256, replace=False)
    q256 = rows[jnp.asarray(qi2)] * np.float32(1.002)
    ql256 = lam[jnp.asarray(qi2)]

    xb, lb = prepare_binned_corpus(rows, lam, bsz=256, k=K)
    np.asarray(xb[:1, :1])

    def stream256(q, xx, ll):
        return binned_lambda_topk(q, ql256, xx, ll, ALPHA, k=K,
                                  prepared=True, n_items=N)

    t_s = amortised_device_time(jax, jnp, stream256, q256, (xb, lb),
                                repeats=8)
    del xb, lb
    log(f"stream B=256: {t_s*1e3:.2f} ms")

    for s_c in (128, 192, 256):
        def uni(q, *bb):
            return pruned_topk_union(q, ql256, *bb, ALPHA, k=K,
                                     m_vote=8, s_cells=s_c, cap=CAP,
                                     margin=1e-3)

        fl = int(np.asarray(uni(q256, *big)[2]).sum())
        t_u = amortised_device_time(jax, jnp, uni, q256, big, repeats=8)
        log(f"union B=256 S={s_c}: {t_u*1e3:.2f} ms ({t_s/t_u:.2f}x vs "
            f"stream), flags {fl}/256")
    log("DECOMP-DONE")


if __name__ == "__main__":
    main()
