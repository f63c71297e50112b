"""Serving-path cost of the strided-bin repair vs the full-merge repair
at wide k (k=32 flags ~4-8 queries per 2048-batch at 1M x 128).

Runs ONE TPU process: builds a session over an uploaded corpus, warms it
(which now also compiles the strided-repair chunk program), streams
batches while timing each repair invocation on the fetch thread, then
re-streams with the repair swapped to the legacy full-merge path.

The stream wall itself is tunnel-RTT-bound (~25 ms/batch floor); the
number that matters is the per-flagged-batch repair cost, which lands
on the fetch thread and steals pipeline slack.
"""
import time

import numpy as np

from arrowspace_tpu.config import setup_cache
setup_cache()

import jax
import jax.numpy as jnp

from arrowspace_tpu.core import ArrowSpace
from arrowspace_tpu.graph import GraphLaplacian  # noqa: F401 (import check)


def main(n=1_000_000, f=128, k=32, bsz=2048, n_batches=12, seed=3):
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f)).astype(np.float32)
    xlam = rng.uniform(0, 1, n).astype(np.float32)

    # Minimal index shell: a real built graph is irrelevant to the
    # serving kernel A/B; the session only needs data/lambdas/laplacian.
    from arrowspace_tpu.index import ArrowIndex
    import arrowspace_tpu.graph as graph_mod

    gl = graph_mod.GraphLaplacian.__new__(graph_mod.GraphLaplacian)
    gl.matrix = jnp.asarray(np.eye(f, dtype=np.float32) * 2.0)

    aspace = ArrowSpace(nfeatures=f, nitems=n,
                        data=jnp.asarray(x),
                        lambdas=jnp.asarray(xlam))
    idx = ArrowIndex(aspace, gl)
    log("corpus on device")

    q_all = [rng.normal(size=(bsz, f)).astype(np.float32)
             for _ in range(n_batches)]

    for mode in ("strided", "merge"):
        sess = idx.make_search_session(batch_size=bsz, k=k)
        repair_times, flag_counts = [], []
        inner = sess._repair
        if mode == "strided":
            fired_hist = {}

            def timed(qb, qlam, rows, **kw):
                from arrowspace_tpu.ops.bin_repair import NEG_INF
                det_rows = kw["det_rows"]
                kth = kw["scores"][rows, k - 1]
                nf = (((det_rows >= kth[:, None]) & (det_rows > NEG_INF))
                      .sum(axis=1))
                for c in nf:
                    fired_hist[int(c)] = fired_hist.get(int(c), 0) + 1
                a = time.perf_counter()
                out = inner(qb, qlam, rows, **kw)
                repair_times.append((time.perf_counter() - a) * 1e3)
                flag_counts.append(len(rows))
                return out
        else:
            from arrowspace_tpu.ops.pallas_topk import fused_lambda_topk

            def timed(qb, qlam, rows, **kw):
                # fixed-128 host pad, like the production legacy repair:
                # fused_lambda_topk's jit is keyed on B, so a raw-count
                # call would retrace + reload per NOVEL flag count and
                # the bench would time compiles, not repairs
                a = time.perf_counter()
                m = len(rows)
                pad = (-m) % 128
                qs = np.pad(qb[rows], ((0, pad), (0, 0)),
                            constant_values=1.0).astype(np.float32)
                qls = np.pad(qlam[rows], (0, pad)).astype(np.float32)
                rs, ri = fused_lambda_topk(
                    jnp.asarray(qs), jnp.asarray(qls),
                    aspace.data, aspace.lambdas, 0.9, k=k)
                out = np.asarray(rs)[:m], np.asarray(ri)[:m]
                repair_times.append((time.perf_counter() - a) * 1e3)
                flag_counts.append(len(rows))
                return out
        sess._repair = timed
        a = time.time()
        sess.warmup()
        log(f"{mode}: warmup (step + repair program) {time.time()-a:.1f}s")
        repair_times.clear()
        flag_counts.clear()

        a = time.time()
        outs = list(sess.search_stream(q_all))
        wall = time.time() - a
        tot_flags = sum(flag_counts)
        log(f"{mode}: {n_batches} batches in {wall:.2f}s "
            f"({1e3*wall/n_batches:.1f} ms/batch, "
            f"{n_batches*bsz/wall/1e3:.1f}k QPS sustained); "
            f"flags {tot_flags} over {len(flag_counts)} batches; "
            f"repair ms/batch: {[f'{t:.1f}' for t in repair_times]}")
        if mode == "strided":
            ids_strided = np.stack([o[1] for o in outs])
            log(f"fired-bin count histogram over flagged rows: "
                f"{dict(sorted(fired_hist.items()))}")
        else:
            ids_merge = np.stack([o[1] for o in outs])

    same = (ids_strided == ids_merge).mean()
    print(f"id agreement strided vs merge: {same:.6f} "
          f"(near-tie order may differ within f32 matmul noise)",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
