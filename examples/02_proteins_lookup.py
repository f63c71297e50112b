"""λ-band range lookup with a ZSET-style sorted index (analogue of
examples/02_proteins_lookup.rs): O(log N + M) range-by-score on λ."""

import bisect
import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from arrowspace_tpu import ArrowSpaceBuilder, init
from common import load_vectors_3000


class ZSetIndex:
    """Sorted-score index: zadd + range_byscore, mirroring the example's
    BTreeMap ZSET (examples/02_proteins_lookup.rs:180-240)."""

    def __init__(self):
        self._entries = []  # sorted list of (score, idx, id, vec)

    def zadd(self, score, idx, id_, vec):
        bisect.insort(self._entries, (score, idx, id_, vec),
                      key=lambda t: t[0] if isinstance(t, tuple) else t)

    def range_byscore(self, lo, hi, offset=0, limit=None):
        scores = [e[0] for e in self._entries]
        i0 = bisect.bisect_left(scores, lo)
        i1 = bisect.bisect_right(scores, hi)
        out = [(e[1], e[0], e[2], e[3]) for e in self._entries[i0:i1]]
        out = out[offset:]
        return out[:limit] if limit is not None else out


def main():
    init()
    ids, items = load_vectors_3000()
    # a smaller slice keeps the example quick; bump for a full run
    ids, items = ids[:800], items[:800]

    aspace, gl = (ArrowSpaceBuilder()
                  .with_lambda_graph(0.05, 12, 4, 2.0, 0.025)
                  .with_seed(7)
                  .build(items.tolist()))

    lambdas = np.asarray(aspace.lambdas)
    q_index = 3
    print(f"Querying near {ids[q_index]}")

    zset = ZSetIndex()
    for i, id_ in enumerate(ids):
        zset.zadd(float(lambdas[i]), i, id_, items[i])

    lambda_q = float(lambdas[q_index])
    band = float(lambdas.std()) / 2.0 ** 2.0
    lo, hi = lambda_q - band, lambda_q + band

    hits = zset.range_byscore(lo, hi, 0, 5)
    print(f"Query λ={lambda_q:.6f}, range [{lo:.6f}, {hi:.6f}] => "
          f"{len(hits)} hits")
    for rank, (idx, score, id_, _vec) in enumerate(hits):
        print(f"{rank + 1:2d}. λ={score:.6f} {id_} (idx={idx})")

    # cross-check with the signed range_search on the ArrowSpace itself
    from arrowspace_tpu import ArrowItem
    res = aspace.range_search(ArrowItem(items[q_index], lambda_q), gl, band)
    print(f"range_search (signed band) found {len(res)} items")


if __name__ == "__main__":
    main()
