"""Energy-only pipeline vs cosine/λ-aware search (analogue of
examples/03_compare_energy_cosine.rs)."""

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from arrowspace_tpu import ArrowSpaceBuilder, ArrowItem, init
from arrowspace_tpu.energymaps import EnergyParams, build_energy, search_energy
from common import cosine_sim

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from data import make_gaussian_hd  # noqa: E402


def main():
    init()
    rows = make_gaussian_hd(300, spread=0.5, dims=96, seed=11)
    q = rows[42] * 1.02
    k = 10

    # baseline cosine
    base = sorted(((i, cosine_sim(q, v)) for i, v in enumerate(rows)),
                  key=lambda t: -t[1])[:k]
    base_ids = [i for i, _ in base]
    print("cosine top-10:", base_ids)

    # standard λ-aware build
    b_std = (ArrowSpaceBuilder()
             .with_lambda_graph(1.0, 5, 3, 2.0, None)
             .with_dims_reduction(True, 1.0)
             .with_seed(5))
    aspace_s, gl_s = b_std.build(rows.tolist())
    qlam = aspace_s.prepare_query_item(q, gl_s)
    std = aspace_s.search_lambda_aware(ArrowItem(q, qlam), k, 0.9)
    std_ids = [i for i, _ in std]
    print("λ-aware (α=0.9) top-10:", std_ids)

    # energy-only build
    b_en = (ArrowSpaceBuilder()
            .with_lambda_graph(1.0, 5, 3, 2.0, None)
            .with_dims_reduction(True, 1.0)
            .with_seed(5))
    aspace_e, gl_e = build_energy(b_en, rows.tolist(), EnergyParams())
    en = search_energy(aspace_e, q, gl_e, k, 1.0, 0.5)
    en_ids = [i for i, _ in en]
    print("energy-only top-10:", en_ids)

    def recall(ids):
        return len(set(ids) & set(base_ids)) / k

    print(f"recall@{k} vs cosine: λ-aware={recall(std_ids):.2f}, "
          f"energy={recall(en_ids):.2f}")


if __name__ == "__main__":
    main()
