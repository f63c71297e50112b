"""Live-mutation serving on the REAL chip (VERDICT-r3 item 8).

The r3 evidence for LiveSearchSession was CPU/interpret-mode only; this
session runs the full lifecycle on hardware: build 1M x 128, warm the
session, then add/update/delete/search cycles across many live counts —
proving the zero-recompile claim where it earns its name (the n_live-as-
operand binned kernel on real Mosaic) and recording mutation + query
wall latency through the tunnel (~23 ms RTT floor on every dispatch).

Zero-recompile audit: config.setup_cache() persists EVERY compiled
program (min_compile_time 0), so a stable /tmp/arrowspace_jax_cache
file count across the post-warmup mutation cycles == no fresh XLA or
Mosaic compiles on the serving path.

Usage: nohup python benchmarks/live_tpu_session.py > /tmp/live_tpu.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from arrowspace_tpu.config import setup_cache
setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CACHE_DIR = "/tmp/arrowspace_jax_cache"
T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def cache_count():
    try:
        return len(os.listdir(CACHE_DIR))
    except OSError:
        return -1


def timed(label, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    dt = (time.perf_counter() - t0) * 1e3
    log(f"{label}: {dt:8.1f} ms")
    return out, dt


def main(n=1_000_000, f=128, k=10):
    from arrowspace_tpu.index import ArrowIndex

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(23)
    centers = rng.uniform(0.2, 0.8, (256, f)).astype(np.float32)
    rows = (centers[rng.integers(0, 256, n)]
            + rng.normal(0, 0.05, (n, f))).astype(np.float32)
    log("host corpus generated")

    t0 = time.perf_counter()
    idx = ArrowIndex.build(rows, eps=1e-3, k=6, topk=3)
    log(f"1M x {f} build: {time.perf_counter()-t0:.1f}s")

    sess = idx.make_live_session(batch_size=256, k=k)
    t0 = time.perf_counter()
    sess.warmup(mutation_buckets=(1, 2, 4, 8, 16, 128))
    log(f"warmup(1..128): {time.perf_counter()-t0:.1f}s; capacity "
        f"{sess.capacity}, live {sess.nitems}")

    c0 = cache_count()
    log(f"cache entries after warmup: {c0}")

    lat = {"add1": [], "add16": [], "add128": [], "upd1": [], "del1": [],
           "search": []}
    new_ids = []

    # mutation cycles across many live counts
    for t in range(10):
        r = rng.normal(0.5, 0.1, (1, f)).astype(np.float32)
        ids, dt = timed(f"add 1 row    (live {sess.nitems})", sess.add, r)
        lat["add1"].append(dt)
        new_ids.extend(ids.tolist())
    for t in range(5):
        r = rng.normal(0.5, 0.1, (16, f)).astype(np.float32)
        ids, dt = timed(f"add 16 rows  (live {sess.nitems})", sess.add, r)
        lat["add16"].append(dt)
        new_ids.extend(ids.tolist())
    for t in range(2):
        r = rng.normal(0.5, 0.1, (128, f)).astype(np.float32)
        ids, dt = timed(f"add 128 rows (live {sess.nitems})", sess.add, r)
        lat["add128"].append(dt)
        new_ids.extend(ids.tolist())
    for t in range(10):
        r = rng.normal(0.5, 0.1, (1, f)).astype(np.float32)
        _, dt = timed(f"update 1 row (live {sess.nitems})", sess.update,
                      np.asarray(new_ids[t:t + 1], dtype=np.int64), r)
        lat["upd1"].append(dt)
    for t in range(5):
        _, dt = timed(f"delete 1 row (live {sess.nitems})", sess.delete,
                      np.asarray(new_ids[t:t + 1], dtype=np.int64))
        lat["del1"].append(dt)
    del new_ids[:5]

    # searches at several live counts, interleaved with mutations
    q = rng.normal(0.5, 0.1, (256, f)).astype(np.float32)
    for t in range(5):
        (_, ids_out), dt = timed(
            f"search B=256 (live {sess.nitems})", sess.search, q)
        lat["search"].append(dt)
        r = rng.normal(0.5, 0.1, (3, f)).astype(np.float32)
        new_ids.extend(sess.add(r).tolist())

    # self-match: a freshly added row must come back rank 0 with its id
    probe = rng.normal(0.5, 0.1, (1, f)).astype(np.float32)
    pid = sess.add(probe)[0]
    qb = np.repeat(probe, 256, axis=0)
    _, ids_out = sess.search(qb)
    ok = int(ids_out[0][0]) == int(pid)
    log(f"self-match of freshly added row: {'OK' if ok else 'FAIL'} "
        f"(got {ids_out[0][0]}, want {pid})")

    c1 = cache_count()
    log(f"cache entries after {10+5+2+10+5+5+6}+ mutations / 6 searches: "
        f"{c1} (delta {c1-c0}) -> "
        f"{'ZERO recompiles' if c1 == c0 else 'RECOMPILES OCCURRED'}")

    for key, vals in lat.items():
        if vals:
            log(f"latency {key:<7} median {np.median(vals):7.1f} ms  "
                f"min {min(vals):7.1f}  max {max(vals):7.1f}  n={len(vals)}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
