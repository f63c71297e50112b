"""Freeze golden Parquet artifacts for schema/interop regression.

The reference persists dense matrices, sparse COO triplets and lambda
vectors as Parquet with exact schemas (reference: storage/parquet.rs:
192-338 dense, :354-519 sparse, :637-795 lambda).  These frozen files pin
our writer's output: the test suite re-reads them with today's loader
(values must match the deterministic generators below) and re-writes the
same data, asserting schema equality column by column — so any schema
drift that would break interop with reference-written artifacts fails in
CI instead of in production.

Regenerate ONLY on a deliberate schema change:
    python tests/fixtures/make_parquet_goldens.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

HERE = pathlib.Path(__file__).parent / "parquet_golden"


def dense_data() -> np.ndarray:
    return np.arange(15, dtype=np.float64).reshape(5, 3) * 0.5 - 2.0


def sparse_data() -> np.ndarray:
    m = np.zeros((6, 6))
    m[0, 1] = -0.25
    m[1, 0] = -0.25
    m[0, 0] = 0.25
    m[1, 1] = 0.25
    m[4, 5] = -1.5
    m[5, 4] = -1.5
    m[4, 4] = 1.5
    m[5, 5] = 1.5
    return m


def lambda_data() -> np.ndarray:
    return np.linspace(0.0, 1.0, 7) ** 2


def main() -> None:
    from arrowspace_tpu.storage import parquet as pq

    HERE.mkdir(parents=True, exist_ok=True)
    pq.save_dense_matrix(dense_data(), HERE, "golden_dense")
    pq.save_sparse_matrix(sparse_data(), HERE, "golden_sparse")
    pq.save_lambda(lambda_data(), HERE, "golden_lambda")
    print(f"wrote golden parquet artifacts to {HERE}")


if __name__ == "__main__":
    main()
