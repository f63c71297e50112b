"""On-chip exactness + repair-rate validation for the r4 canonical
fma score arithmetic (VERDICT-r3 items 2/3).

After the fma rewrite, the XLA oracle (ops/search._shifted_lambda_plane),
the strided repair, the merge kernel and the chunked energy scorer all
share the kernels' exact arithmetic, so the r3 bitwise id contract must
hold ON CHIP again (the first fma A/B measured id match 0.925 against
the then-unchanged oracle — benchmarks/fma_form_ab.py log).

Sections:
 1. lambda binned+repair vs batched_lambda_aware_topk at 1M x 128
    (ids bitwise on all rows; scores bitwise on unflagged rows)
 2. merge kernel (fused_lambda_topk) vs the oracle
 3. repair-rate histogram over 20 x B=2048 batches (BENCH_r04 artifact)
 4. energy binned+strided repair vs _energy_score_topk_chunked at
    1M x 64 (ids bitwise) + the fast-form B=2048 timing (target:
    >= 150k QPS, VERDICT item 3)
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
from arrowspace_tpu.ops.bin_repair import strided_energy_repair
from arrowspace_tpu.ops.pallas_bintopk import (binned_energy_topk,
                                               binned_lambda_topk,
                                               prepare_binned_corpus,
                                               prepare_binned_energy_corpus)
from arrowspace_tpu.ops.pallas_topk import fused_lambda_topk
from arrowspace_tpu.ops.search import (batched_lambda_aware_topk,
                                       pallas_binned_topk_with_repair)
from arrowspace_tpu.energymaps import _energy_score_topk_chunked

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main(n=1_000_000, f=128, g=64, k=10):
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(11)
    alpha = 0.9

    # ---- lambda corpus -------------------------------------------------
    x = rng.normal(size=(n, f)).astype(np.float32)
    xlam = rng.uniform(0, 1, n).astype(np.float32)
    xd, xld = jnp.asarray(x), jnp.asarray(xlam)
    np.asarray(xd[:1, :1])
    log("lambda corpus uploaded")

    # 1. binned + repair vs oracle, B=256
    bsz = 256
    qh = rng.normal(size=(bsz, f)).astype(np.float32)
    qlh = rng.uniform(0, 1, bsz).astype(np.float32)
    qd, qld = jnp.asarray(qh), jnp.asarray(qlh)
    s, i = pallas_binned_topk_with_repair(qd, qld, xd, xld, alpha, k=k)
    os_, oi = batched_lambda_aware_topk(qd, qld, xd, xld,
                                        jnp.float32(alpha), k=k)
    os_h, oi_h = jax.device_get((os_, oi))
    idm = (np.asarray(i) == oi_h).mean()
    sdel = np.abs(np.asarray(s) - os_h).max()
    log(f"1. binned+repair vs oracle B=256: id match {idm:.6f}, "
        f"max |score delta| {sdel:.2e}")

    # 2. merge kernel vs oracle (one 128-query block)
    ms, mi = fused_lambda_topk(qd[:128], qld[:128], xd, xld, alpha, k=k)
    ms_h, mi_h = jax.device_get((ms, mi))
    idm2 = (mi_h == oi_h[:128]).mean()
    sdel2 = np.abs(ms_h - os_h[:128]).max()
    log(f"2. merge kernel vs oracle B=128: id match {idm2:.6f}, "
        f"max |score delta| {sdel2:.2e}")

    # 3. repair-rate histogram, 20 x B=2048 (prepared serving path)
    bsz = 2048
    xprep, lamprep = prepare_binned_corpus(xd, xld, bsz=bsz, k=k)
    counts = []
    for t in range(20):
        qh = rng.normal(size=(bsz, f)).astype(np.float32)
        qlh = rng.uniform(0, 1, bsz).astype(np.float32)
        _, _, fl = binned_lambda_topk(
            jnp.asarray(qh), jnp.asarray(qlh), xprep, lamprep, alpha,
            k=k, prepared=True, n_items=n)
        counts.append(int(np.asarray(fl).sum()))
    tot = sum(counts)
    log(f"3. repair-rate: {tot}/{20*bsz} flagged "
        f"({tot/(20*bsz):.2e}/query); per-batch {counts}")

    # ---- energy corpus -------------------------------------------------
    del xd, xld, xprep, lamprep
    z = rng.normal(size=(n, g)).astype(np.float32)
    zlam = rng.uniform(0, 1, n).astype(np.float32)
    zd, zld = jnp.asarray(z), jnp.asarray(zlam)
    np.asarray(zd[:1, :1])
    log("energy corpus uploaded")
    wl, wd = 1.0, 0.5
    wld, wdd = jnp.float32(wl), jnp.float32(wd)

    # 4a. B=2048 fast-form timing (prepared)
    zprep, zlamprep, znorm = prepare_binned_energy_corpus(
        zd, zld, bsz=bsz, k=k)
    qz = rng.normal(size=(bsz, g)).astype(np.float32)
    qzl = rng.uniform(0, 1, bsz).astype(np.float32)
    qzd, qzld = jnp.asarray(qz), jnp.asarray(qzl)
    _, _, fl = binned_energy_topk(qzd, qzld, zprep, zlamprep, wl, wd,
                                  k=k, prepared=True, n_items=n,
                                  z_norms=znorm)
    nfl = int(np.asarray(fl).sum())
    ms_t = amortised(
        lambda q, zp, lp, zn: (
            jnp.sum(binned_energy_topk(
                q, qzld, zp, lp, wl, wd, k=k, prepared=True, n_items=n,
                z_norms=zn)[0][:, :1]) * 1e-20),
        qzd, (zprep, zlamprep, znorm)) * 1e3
    log(f"4a. energy B=2048 f32 fast form: {ms_t:6.2f} ms/batch "
        f"({bsz/ms_t:.1f}k QPS), flags {nfl}/{bsz}")

    # 4b. B=256 exactness incl. strided repair vs chunked oracle
    bsz = 256
    qz = rng.normal(size=(bsz, g)).astype(np.float32)
    qzl = rng.uniform(0, 1, bsz).astype(np.float32)
    qzd, qzld = jnp.asarray(qz), jnp.asarray(qzl)
    zprep, zlamprep, znorm = prepare_binned_energy_corpus(
        zd, zld, bsz=bsz, k=k)
    s, i, fl, det = binned_energy_topk(qzd, qzld, zprep, zlamprep, wl,
                                       wd, k=k, prepared=True, n_items=n,
                                       z_norms=znorm, return_det=True)
    s_h, i_h, fl_h = jax.device_get((s, i, fl))
    s_h, i_h = s_h.copy(), i_h.copy()
    rows = np.nonzero(fl_h)[0]
    if len(rows):
        det_rows = np.asarray(det[rows])

        def full_chunked(rel):
            m = len(rel)
            pad = (-m) % 128
            zs = np.pad(qz[rows[rel]], ((0, pad), (0, 0)))
            qls = np.pad(qzl[rows[rel]], (0, pad))
            rs, ri = _energy_score_topk_chunked(
                jnp.asarray(zs), jnp.asarray(qls), zd, zld, wld, wdd, k=k)
            return np.asarray(rs)[:m], np.asarray(ri)[:m]

        fs, fi = strided_energy_repair(
            qz[rows], qzl[rows], det_rows, s_h[rows, k - 1], i_h[rows],
            zprep, zlamprep, znorm, wl, wd, k=k, n=n, prepared=True,
            fallback=full_chunked, cur_scores=s_h[rows])
        s_h[rows], i_h[rows] = fs, fi
    eo_s, eo_i = _energy_score_topk_chunked(qzd, qzld, zd, zld, wld, wdd,
                                            k=k)
    eo_sh, eo_ih = jax.device_get((eo_s, eo_i))
    idm = (i_h == eo_ih).mean()
    sdel = np.abs(s_h - eo_sh).max()
    log(f"4b. energy binned+repair vs chunked oracle B=256: id match "
        f"{idm:.6f}, max |score delta| {sdel:.2e}, flags {len(rows)}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
