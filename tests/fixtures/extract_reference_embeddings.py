"""Extract the reference's real embedding fixtures as DATA.

The reference embeds real 384-d sentence-transformer embeddings from
quora-duplicates and protein embeddings as Rust constants
(reference: src/tests/test_data.rs:1-6 QUORA_EMBEDDS, :5801
PROTEINS_EMBEDS).  Fixture numbers are data, not code: this script parses
the numeric literals out of the Rust source and stores them as an .npz so
parity tests can pin this engine's lambda-tau semantics against the same
inputs the reference's tests use.

Run (requires the reference checkout):
    python tests/fixtures/extract_reference_embeddings.py
"""

import pathlib
import re

import numpy as np

SRC = pathlib.Path("/root/reference/src/tests/test_data.rs")
OUT = pathlib.Path(__file__).parent / "reference_embeddings.npz"
FLOAT = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


def extract(src: str, start: str, end: str) -> np.ndarray:
    i = src.index(start)
    j = src.index(end, i) if end else len(src)
    rows = re.findall(r"&\[([^\[\]]+)\]", src[i:j])
    out = [[float(v) for v in re.findall(FLOAT, r)] for r in rows]
    # drop the &[&[f64]] type tokens the bracket regex also catches
    return np.asarray([r for r in out if len(r) > 2], dtype=np.float64)


def main() -> None:
    src = SRC.read_text()
    quora = extract(src, "pub const QUORA_EMBEDDS", "pub const PROTEINS_EMBEDS")
    proteins = extract(src, "pub const PROTEINS_EMBEDS", "pub fn ")
    assert quora.shape == (15, 384), quora.shape
    assert proteins.shape == (10, 384), proteins.shape
    # quora rows are unit-normalised sentence embeddings
    np.testing.assert_allclose(np.linalg.norm(quora, axis=1), 1.0, rtol=1e-6)
    np.savez_compressed(OUT, quora=quora, proteins=proteins)
    print(f"wrote {OUT}: quora {quora.shape}, proteins {proteins.shape}")


if __name__ == "__main__":
    main()
