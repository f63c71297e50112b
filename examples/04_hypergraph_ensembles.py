"""Hypergraph clique-expansion overlay + λτ-graph ensembles.

The reference documents these capabilities without implementing them
(README.md:112-113, graph.rs:142); this example exercises the
implementation in arrowspace_tpu.hypergraph: an overlay sharpens the
spectral signal for items known to co-occur, and an ensemble fuses
rankings across perturbed (k, eps) graphs.
"""

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

from arrowspace_tpu import ArrowSpaceBuilder, ArrowItem, init
from arrowspace_tpu import eigenmaps as em
from arrowspace_tpu.hypergraph import (clique_expansion_adjacency,
                                       ensemble_params, ensemble_search,
                                       overlay_laplacian)
from data import make_moons_hd  # noqa: E402


def main():
    init()
    rows = make_moons_hd(120, noise=0.08, hd_noise=0.04, dims=16, seed=3)
    q = rows[33] * 1.02

    b = (ArrowSpaceBuilder()
         .with_lambda_graph(1.0, 5, 3, 2.0, None)
         .with_seed(13))
    b.define_result_k()
    clustered = em.start_clustering(b, rows.tolist())
    aspace = clustered.aspace
    gl = em.eigenmaps(aspace, b, clustered.centroids, clustered.n_items)
    em.compute_taumode(aspace, gl)

    # --- plain λ-aware search -------------------------------------------
    qlam = aspace.prepare_query_item(q, gl)
    base = aspace.search_lambda_aware(ArrowItem(q, qlam), 10, 0.9)
    print("base λ-aware top-10:", [i for i, _ in base])

    # --- hypergraph overlay: declare co-occurring feature groups ---------
    n = gl.shape()[0]
    hyper = clique_expansion_adjacency([[0, 1, 2, 3], [4, 5, 6]], n,
                                       weights=[1.0, 0.5])
    gl_overlaid = overlay_laplacian(gl, hyper, mix=0.3)
    em.compute_taumode(aspace, gl_overlaid)
    qlam2 = aspace.prepare_query_item(q, gl_overlaid)
    overlaid = aspace.search_lambda_aware(ArrowItem(q, qlam2), 10, 0.9)
    print("overlay  top-10:", [i for i, _ in overlaid])

    # --- ensembles: k-adjust + ε-expand rank fusion ----------------------
    grid = ensemble_params(gl.graph_params, k_adjust=(-1, 0, 1),
                           eps_expand=(1.0, 1.5))
    fused = ensemble_search(aspace, clustered.centroids, q, grid, 10, 0.9)
    print(f"ensemble ({len(grid)} graphs) top-10:", [i for i, _ in fused])
    assert fused[0][0] == 33


if __name__ == "__main__":
    main()
