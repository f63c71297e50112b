"""Generate golden lambda-tau outputs from the reference's real fixtures.

Builds the canonical index over QUORA_EMBEDDS / PROTEINS_EMBEDS (the real
embedding data from src/tests/test_data.rs, extracted by
extract_reference_embeddings.py) on the CPU/f64 oracle configuration and
freezes: the graph Laplacian (COO), per-item lambda-tau values under each
tau policy, and top-k results at several alpha.  tests/test_reference_parity.py
asserts <=1e-5 rel-err against these, so any drift in the lambda-tau
semantics (tau-from-coordinates, rectified-cosine kernel, F'xF'
orientation, dispersion term, search blend) fails loudly.

Regenerate ONLY on a deliberate semantic change:
    python tests/fixtures/make_parity_goldens.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

HERE = pathlib.Path(__file__).parent


def build_goldens(rows: np.ndarray, tag: str, out: dict) -> None:
    from arrowspace_tpu.builder import ArrowSpaceBuilder
    from arrowspace_tpu.core import ArrowItem
    from arrowspace_tpu.taumode import TauMode, compute_taumode_lambdas

    n, f = rows.shape
    for mode_tag, mode in (("median", TauMode.median()),
                           ("mean", TauMode.mean()),
                           ("p75", TauMode.percentile(0.75))):
        b = (ArrowSpaceBuilder()
             .with_lambda_graph(1.0, 6, 3, 2.0, None)
             .with_synthesis(mode)
             .with_inline_sampling(None)
             .with_seed(42))
        aspace, gl = b.build(rows.tolist())
        out[f"{tag}_{mode_tag}_lambdas"] = np.asarray(aspace.lambdas,
                                                      dtype=np.float64)
        if mode_tag == "median":
            lap = np.asarray(gl.matrix, dtype=np.float64)
            r, c = np.nonzero(lap)
            out[f"{tag}_lap_rows"] = r.astype(np.int32)
            out[f"{tag}_lap_cols"] = c.astype(np.int32)
            out[f"{tag}_lap_vals"] = lap[r, c]
            out[f"{tag}_lap_shape"] = np.asarray(lap.shape, dtype=np.int64)

            # top-k at several alphas for 4 perturbed queries
            for alpha in (1.0, 0.9, 0.7):
                ids, scores = [], []
                for qi in range(4):
                    q = rows[qi] * 1.02
                    qlam = aspace.prepare_query_item(q, gl)
                    res = aspace.search_lambda_aware(
                        ArrowItem(q, qlam), 5, alpha)
                    ids.append([i for i, _ in res])
                    scores.append([s for _, s in res])
                a_tag = str(alpha).replace(".", "_")
                out[f"{tag}_top5_a{a_tag}_ids"] = np.asarray(ids,
                                                             dtype=np.int64)
                out[f"{tag}_top5_a{a_tag}_scores"] = np.asarray(scores)
            # query lambdas for the same 4 queries
            out[f"{tag}_query_lambdas"] = np.asarray(
                [aspace.prepare_query_item(rows[qi] * 1.02, gl)
                 for qi in range(4)])


def main() -> None:
    data = np.load(HERE / "reference_embeddings.npz")
    out = {}
    build_goldens(data["quora"], "quora", out)
    build_goldens(data["proteins"], "proteins", out)
    np.savez_compressed(HERE / "reference_parity_golden.npz", **out)
    print(f"wrote reference_parity_golden.npz with {len(out)} arrays")
    for k in sorted(out):
        print(" ", k, out[k].shape)


if __name__ == "__main__":
    main()
