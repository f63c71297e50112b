"""λ-aware search vs plain cosine (analogue of
examples/01_compare_cosine.rs).  Top-3 cosine results must match the
α=1.0 λ-aware search exactly; α<1 mixes spectral evidence in."""

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from arrowspace_tpu import ArrowSpaceBuilder, ArrowItem, init
from common import cosine_sim, protein_like_block


def main():
    init()
    db = protein_like_block()
    n_items = len(db)
    ids = [f"P{i:04d}" for i in range(n_items)]
    k = 3
    query = db[3] * 1.02

    # Baseline cosine
    base = sorted(((i, cosine_sim(query, v)) for i, v in enumerate(db)),
                  key=lambda t: -t[1])[: k + 1]
    print(f"Baseline cosine top-{k}+1:")
    for rank, (i, s) in enumerate(base):
        print(f"  {rank + 1}. idx={i} ({ids[i]}) score={s:.6f}")

    # ArrowSpace: λ-graph build
    aspace, gl = (ArrowSpaceBuilder()
                  .with_lambda_graph(1e-3, 20, k, 2.0, 1e-3 * 0.75)
                  .with_normalisation(False)
                  .with_dims_reduction(True, None)
                  .with_seed(42)
                  .build(db.tolist()))
    print(f"\nArrowSpace shape: ({aspace.nitems}, {aspace.nfeatures})")

    qlam = aspace.prepare_query_item(query, gl)
    q = ArrowItem(query, qlam)

    print("\n--- Test 1: Pure Cosine Similarity (alpha=1.0) ---")
    res_cos = aspace.search_lambda_aware(q, k + 1, 1.0)
    for rank, (i, s) in enumerate(res_cos):
        print(f"  {rank + 1}. idx={i} ({ids[i]}) score={s:.6f}")
    ids_base = [i for i, _ in base]
    ids_arrow = [i for i, _ in res_cos]
    print("Match (baseline vs Arrow cosine):",
          "OK" if ids_base == ids_arrow else "DIFF")
    assert ids_base == ids_arrow

    print("\n--- Test 2: Lambda-Aware Search (alpha=0.9) ---")
    res_lam = aspace.search_lambda_aware(q, k + 5, 0.9)
    for rank, (i, s) in enumerate(res_lam):
        print(f"  {rank + 1}. idx={i} ({ids[i]}) score={s:.6f}")
    s1 = set(ids_base)
    s2 = {i for i, _ in res_lam[: k + 1]}
    jac = len(s1 & s2) / len(s1 | s2)
    print(f"Jaccard(baseline vs λ-aware): {jac:.3f}")

    print("\n--- Test 3: Alpha Sweep ---")
    for alpha in (0.8, 0.7, 0.6, 0.55, 0.4):
        res = aspace.search_lambda_aware(q, k, alpha)
        print(f"alpha={alpha}: " + ", ".join(
            f"{i}({s:.4f})" for i, s in res))


if __name__ == "__main__":
    main()
