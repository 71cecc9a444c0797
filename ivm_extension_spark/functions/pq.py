"""Product quantization (PQ) for embedding similarity at memory scale.

Reference scope note: cwida/ivm-extension has no vector surface
(README.md:33-36); this module extends the training-data-pipeline ANN
tier (functions/similarity.py) with the classic PQ/ADC design from the
public literature (Jegou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) re-expressed Spark-first.

Why PQ at 100 TB: a 64-dim float vector is 256-512 B; its PQ code is
``m`` small integers (here 16 codes of 4 bits = 8 bytes per vector).
The served index is the CODES table — a 64-128x smaller scan than the
raw vectors — and queries never touch raw neighbor vectors at all:
each query builds an m x ksub lookup table against the frozen
codebooks and every candidate's score is ``m`` table lookups + adds
(asymmetric distance computation, ADC).  The big-scan paths (encode,
ADC) are Arrow-batched numpy — Spark's higher-order functions are
CodegenFallback, i.e. always interpreted, so fold expressions on the
scan side cost ~ms/row (see SCALE_NOTES round 9) — while expression
twins (pq_codes_expr / pq_packed_sql / _adc_expr) compose the same
exact integer math inside view SQL for delta-sized relations.
Compose with the frozen IVF quantizer
(similarity.ivf_probe_cells_expr) to bucket the codes table by cell and
prune the scan — both pieces are independently maintained/tested.

EXACTNESS (what makes the key oracle-checkable): vectors are quantized
to an integer grid FIRST — ``round(x / ||x|| * 1000)`` — and the
codebooks are trained on, and rounded back to, that same grid
(scripts/train_pq_codebooks.py).  Every encode distance and every ADC
partial is then a sum of integer products: exactly representable in
int64 (and in double, |v| < 2^53) on any engine, in any summation
order.  The ADC score approximates ``cosine * 1e6`` and is emitted as
an exact BIGINT — approximation lives entirely in the quantizer, never
in the arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T

SCALE = 1000

PRETRAINED_PQ_D64_M16_K16: list[list[list[int]]] = [
    [  # subspace 0
        [-109, -148, 7, -127],
        [142, 137, -86, 89],
        [188, -3, 59, -107],
        [29, 175, 133, -1],
        [-24, 3, -130, 161],
        [31, 145, -116, -125],
        [-106, -17, 75, -15],
        [87, -198, 40, -48],
        [-78, 60, 51, -166],
        [-9, -67, 96, 153],
        [24, -112, -159, -92],
        [157, -85, -39, 107],
        [39, 6, -30, 9],
        [-194, -41, -115, 3],
        [-157, 141, 46, 92],
        [-35, -43, 230, -56],
    ],
    [  # subspace 1
        [-22, -79, -110, 104],
        [-245, -26, -72, 24],
        [1, 132, -19, 199],
        [173, -54, -98, 163],
        [111, 165, -98, -18],
        [-106, 62, 65, -4],
        [-13, 79, -207, 19],
        [-100, -123, 108, 110],
        [12, 129, 223, -30],
        [-79, -128, -8, -98],
        [57, -16, 1, -212],
        [168, 89, 97, -90],
        [76, 20, 74, 111],
        [138, -101, -137, -22],
        [-95, 123, -128, -87],
        [112, -156, 110, 22],
    ],
    [  # subspace 2
        [-193, -47, 143, 2],
        [-52, 251, -43, -26],
        [-126, -14, -67, -80],
        [20, -135, 34, 17],
        [-58, 116, 129, -59],
        [116, 10, 57, 14],
        [80, -219, 2, -146],
        [-122, -185, -44, 101],
        [-25, 59, 69, 230],
        [-127, 141, -90, 147],
        [48, -99, -149, -52],
        [68, -95, 223, 67],
        [98, 74, -45, -137],
        [11, -57, 135, -210],
        [64, 2, -141, 112],
        [212, 177, -12, 65],
    ],
    [  # subspace 3
        [-191, -101, -47, -81],
        [4, 226, -22, 21],
        [146, 110, -114, 100],
        [-61, 44, 54, 168],
        [-79, 57, -59, -12],
        [87, 113, 171, 114],
        [-130, 152, 95, -44],
        [23, -202, 38, -66],
        [166, -223, -55, 116],
        [-10, -17, -155, -152],
        [121, -5, 41, -11],
        [-64, -2, -181, 155],
        [-85, -34, 131, -131],
        [61, -106, 184, 43],
        [20, -105, -57, 98],
        [102, 92, 62, -165],
    ],
    [  # subspace 4
        [-204, 9, 84, -90],
        [-106, -201, -20, -70],
        [63, 93, 126, -87],
        [70, -139, -143, -9],
        [-142, -29, -156, 20],
        [82, 11, -150, 95],
        [-15, 50, -10, -187],
        [-11, -26, 228, 64],
        [214, 6, 89, 159],
        [12, 82, 34, 195],
        [107, -120, 85, -33],
        [41, 171, -62, 38],
        [179, 47, -32, -90],
        [-72, -82, -3, 114],
        [-99, 112, 46, 53],
        [-98, 281, 21, -69],
    ],
    [  # subspace 5
        [15, 92, 113, -88],
        [102, 48, -162, 97],
        [108, -124, -14, -32],
        [72, -80, 99, 88],
        [-75, -194, 88, 16],
        [26, -145, -126, 49],
        [-15, -100, 148, -195],
        [-1, 100, 142, 118],
        [-125, -19, 64, -57],
        [176, 81, 29, -15],
        [-206, 124, -35, -109],
        [-35, 178, -36, 110],
        [-5, 16, -117, -104],
        [-129, -2, 50, 246],
        [-128, -70, -89, 7],
        [111, 14, 36, -281],
    ],
    [  # subspace 6
        [-72, 127, 214, -49],
        [-147, 93, -162, 32],
        [-61, 212, -13, 45],
        [89, -141, 37, 126],
        [8, -126, 137, -66],
        [-85, -46, -59, -186],
        [105, 81, -114, 140],
        [-54, 2, 28, 35],
        [134, -24, -57, -7],
        [37, 149, -25, -124],
        [-118, -150, -69, 62],
        [-217, -5, 52, -100],
        [22, -58, -185, -35],
        [189, 68, 86, -105],
        [133, 172, 116, 58],
        [-96, 16, 102, 210],
    ],
    [  # subspace 7
        [75, 40, -165, -6],
        [0, 218, -68, 17],
        [166, 26, 32, -9],
        [68, 24, 229, -72],
        [-32, -141, 116, 135],
        [-35, 4, 5, 41],
        [-232, -12, 130, -34],
        [-32, -152, 92, -115],
        [78, -192, -76, -31],
        [-146, -2, -134, -90],
        [122, -95, -10, 177],
        [87, 28, -4, -231],
        [-4, 95, 165, 93],
        [-84, -66, -134, 146],
        [-66, 126, 77, -106],
        [60, 130, 6, 242],
    ],
    [  # subspace 8
        [3, -22, -107, 230],
        [81, 104, 186, 87],
        [135, -67, -153, -99],
        [3, -188, -102, 4],
        [69, 57, 116, -186],
        [109, -81, 23, 27],
        [-120, -1, 100, -106],
        [-95, -62, -76, -147],
        [-40, -108, 153, 92],
        [-28, 136, -85, -60],
        [128, 135, 6, -37],
        [-187, 107, -45, 10],
        [119, 105, -92, 121],
        [100, -133, 94, -159],
        [-227, -124, -4, 59],
        [-42, 22, 18, 110],
    ],
    [  # subspace 9
        [-168, -1, -53, -308],
        [150, 15, 53, 29],
        [-12, 16, -88, 151],
        [88, -143, -230, 78],
        [228, 147, 50, -222],
        [26, 79, 143, 205],
        [-16, -81, 60, -154],
        [-100, -42, 141, 5],
        [26, 36, 227, -125],
        [-16, 135, -183, -39],
        [-138, -179, 47, 127],
        [87, -23, -126, -113],
        [101, -177, 14, 11],
        [-54, -107, -78, -68],
        [-151, 109, -10, -13],
        [29, 206, 32, 1],
    ],
    [  # subspace 10
        [56, 19, -43, 152],
        [26, 205, 60, 21],
        [-185, -53, 99, 110],
        [-64, 66, 229, -36],
        [-174, 28, -46, -60],
        [-53, 60, -117, 49],
        [174, -2, -9, -59],
        [7, -55, -197, -52],
        [-23, -66, 145, 85],
        [-58, -180, 42, -57],
        [105, -11, 201, -45],
        [-93, -128, -83, 137],
        [55, -115, 15, -232],
        [165, -66, 63, 181],
        [106, -197, -41, 10],
        [10, 121, -77, -156],
    ],
    [  # subspace 11
        [78, -32, 161, -129],
        [-30, 124, 0, -184],
        [27, -128, -133, -90],
        [70, 29, 84, 97],
        [-132, 16, 19, 54],
        [-109, 81, 182, 11],
        [-87, -102, 1, -140],
        [-30, -139, -163, 82],
        [59, 62, -125, 13],
        [42, 210, 33, 70],
        [202, 66, -10, -55],
        [130, -146, 57, -1],
        [107, -49, -56, 189],
        [-166, 80, -128, -22],
        [-72, 73, -84, 256],
        [-78, -179, 69, 49],
    ],
    [  # subspace 12
        [56, 200, 89, -41],
        [-142, 83, -8, -11],
        [5, 95, 89, 126],
        [32, -147, 224, 146],
        [36, -18, 136, 7],
        [-102, -75, -147, -33],
        [47, -190, 42, -100],
        [161, 8, -174, -15],
        [-172, -16, -32, 199],
        [2, 12, -78, -174],
        [11, 89, -134, 120],
        [-10, 33, 136, -180],
        [293, -189, 46, -38],
        [155, 34, 17, -34],
        [-161, -109, 93, -5],
        [27, -137, -26, 109],
    ],
    [  # subspace 13
        [38, -78, 130, -182],
        [241, -157, -158, 103],
        [93, -64, 90, 168],
        [-241, 33, -61, -52],
        [-170, 6, 188, -43],
        [-63, -171, -157, 16],
        [-23, 100, -163, -86],
        [-85, -9, -65, -249],
        [30, 112, 35, -75],
        [-121, -75, -62, 135],
        [43, -106, 63, 8],
        [70, 71, -91, 99],
        [25, 147, 148, 42],
        [-111, 82, 71, 121],
        [41, -113, -93, -77],
        [214, -18, 60, -38],
    ],
    [  # subspace 14
        [161, 57, 100, -120],
        [167, -20, -45, 26],
        [-122, -10, 110, -90],
        [-46, -22, 65, 173],
        [141, -72, 49, 153],
        [11, 114, 27, 16],
        [-99, 78, -144, -121],
        [-110, -146, -83, -114],
        [17, -122, -190, 4],
        [-143, -9, -26, 56],
        [-6, 239, -142, -44],
        [45, 3, -61, -186],
        [-21, 198, 201, -128],
        [52, 47, 230, 64],
        [-28, 24, -176, 142],
        [46, -183, 54, -56],
    ],
    [  # subspace 15
        [-77, 5, 28, 35],
        [-170, -27, 25, -117],
        [48, -27, -66, 176],
        [36, 15, -151, -127],
        [60, 162, 123, -22],
        [-74, -194, -114, 11],
        [25, -168, 91, 98],
        [-12, -62, 204, -20],
        [65, 1, 46, -223],
        [171, -47, -12, -16],
        [20, -190, 61, -165],
        [21, 184, -52, 32],
        [-36, 140, -75, -142],
        [-14, 77, 109, 198],
        [-164, 85, -131, 31],
        [164, 50, -172, 56],
    ],
]


def int_unit_expr(vec_col: str) -> Column:
    """``round(x / ||x|| * SCALE)`` as array<bigint> — the integer grid
    the whole PQ path lives on.  The norm is the same sequential fold
    every sim_* oracle mirrors; a zero vector keeps "norm" 1 (all-zero
    grid point) rather than NaN."""
    n = f"sqrt(aggregate({vec_col}, 0D, (acc, x) -> acc + x * x))"
    n = f"(CASE WHEN ({n}) = 0D THEN 1D ELSE ({n}) END)"
    return F.expr(
        f"transform({vec_col}, x -> CAST(round(x / {n} * {SCALE}) AS BIGINT))"
    )


def _int_array(vals) -> str:
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def _sub_dist(ivec_col: str, start: int, dsub: int, entry) -> str:
    """Exact integer L2 distance from one subspace slice to one codebook
    entry: a single zip_with fold, all int64."""
    return (
        f"aggregate(zip_with(slice({ivec_col}, {start}, {dsub}), "
        f"{_int_array(entry)}, (x, y) -> (x - y) * (x - y)), 0L, "
        "(acc, v) -> acc + v)"
    )


def pq_codes_expr(ivec_col: str, codebooks) -> Column:
    """The m PQ codes of an integer-grid vector as array<int>: per
    subspace, argmin of the exact integer L2 distances to the ksub
    entries (ties to the lowest entry id via the struct sort — the same
    (value, id) ordering every frozen-quantizer path uses)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for s in range(m):
        ksub = len(codebooks[s])
        dists = "array(" + ",".join(
            _sub_dist(ivec_col, s * dsub + 1, dsub, e) for e in codebooks[s]
        ) + ")"
        ranked = (
            f"array_sort(zip_with({dists}, sequence(0, {ksub - 1}), "
            "(d, i) -> struct(d AS d, i AS i)))"
        )
        codes.append(f"CAST(element_at({ranked}, 1).i AS INT)")
    return F.expr("array(" + ",".join(codes) + ")")


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks=None,
    out: str = "codes",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [passthrough...,] codes) — the stored PQ index: ONE narrow
    mapInPandas pass over the vector table (scan once, write codes; no
    shuffle).  ``passthrough`` columns ride along untouched — e.g. the
    multiplicity column when encoding a CDC delta for a maintained
    index.

    Vectorized on purpose: Spark's higher-order functions (aggregate /
    zip_with / transform) are CodegenFallback — ALWAYS interpreted,
    ~1.6 ms/row for the 256 encode folds (measured; that is the cost
    profile of every fold-expression path, e.g. ivf's centroid sims).
    The Arrow batch encode is the same integer math at numpy speed
    (~us/row), so it is the serving/ingest path; the expression twins
    (pq_codes_expr / pq_packed_sql) exist for composing the encode
    INSIDE engine view SQL, where only small deltas pay the
    interpreted rate."""
    cb = PRETRAINED_PQ_D64_M16_K16 if codebooks is None else codebooks
    B = np.asarray(cb, dtype=np.int64)  # (m, ksub, dsub)
    m, ksub, dsub = B.shape
    src = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    keep = [src.schema[i] for i in range(1 + len(passthrough))]
    out_schema = T.StructType(
        [*keep, T.StructField(out, T.ArrayType(T.IntegerType()), False)]
    )

    def encode_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["__v"]), dtype=np.float64)
            # norm as the SAME sequential left fold the expression path
            # and the oracles evaluate (np.linalg.norm sums pairwise —
            # ~half of 64-dim norms differ in the last ulp, which can
            # flip a grid coordinate sitting on a .5 rounding boundary);
            # the dim-loop is the per-row fold order, vectorized across
            # the batch
            acc = np.zeros(len(X), dtype=np.float64)
            for d in range(X.shape[1]):
                acc = acc + X[:, d] * X[:, d]
            norms = np.sqrt(acc)
            norms[norms == 0] = 1.0
            # np.round is half-to-even; SQL round() is half-away —
            # replicate half-away exactly so the Arrow path and the
            # expression path produce identical grids
            scaled = X / norms[:, None] * SCALE
            IX = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(
                np.int64
            )
            S = IX.reshape(len(IX), m, dsub)
            # (b, m, ksub) exact integer L2 distances, argmin ties to
            # the lowest entry id (np.argmin returns the first minimum)
            d2 = ((S[:, :, None, :] - B[None, :, :, :]) ** 2).sum(axis=3)
            codes = d2.argmin(axis=2).astype(np.int32)
            yield pd.DataFrame(
                {
                    **{f.name: pdf[f.name] for f in keep},
                    out: list(codes),
                }
            )

    return src.mapInPandas(encode_batches, schema=out_schema)


def pq_packed_cols(
    codes_df: DataFrame, codes_col: str = "codes", drop_codes: bool = True
) -> DataFrame:
    """Append the two sign-safe packed halves (pq_lo = subspaces 0-7,
    pq_hi = 8-15, 4 bits each) to an encoded relation — plain
    element_at arithmetic, fully codegen-able (no higher-order
    functions), so packing costs nothing next to the scan."""
    def half(lo: int) -> Column:
        packed = F.lit(0).cast("long")
        for s in range(8):
            packed = packed + F.element_at(codes_col, lo + s + 1).cast(
                "long"
            ) * F.lit(16**s)
        return packed

    out = codes_df.withColumn("pq_lo", half(0)).withColumn("pq_hi", half(8))
    return out.drop(codes_col) if drop_codes else out


def _adc_expr(qiv_col: str, codes_col: str, codebooks) -> Column:
    """ADC score: sum over subspaces of dot(query subspace slice,
    codebook entry selected by the neighbor's code) — exact int64."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    parts = []
    for s in range(m):
        cbm = "array(" + ",".join(_int_array(e) for e in codebooks[s]) + ")"
        dot = (
            f"aggregate(zip_with(slice({qiv_col}, {s * dsub + 1}, {dsub}), "
            f"element_at({cbm}, element_at({codes_col}, {s + 1}) + 1), "
            "(x, y) -> x * y), 0L, (acc, v) -> acc + v)"
        )
        parts.append(f"({dot})")
    return F.expr(" + ".join(parts))


def pq_adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    codebooks=None,
    max_queries: int = 10000,
) -> DataFrame:
    """Approximate top-k via PQ/ADC: neighbors are represented ONLY by
    their m codes; each (query, candidate) score is m codebook lookups
    + integer adds.  Output (query_id, neighbor_id, adc_score, rank)
    with adc_score ~= cosine * SCALE^2, an exact BIGINT; ties break on
    neighbor id.

    Scale shape: the query matrix rides in the UDF closure (driver
    collect GATED at ``max_queries`` — the same bounded-collect
    contract ivf_assign uses for its centroids), and the CODES table —
    the only big side, 64x smaller than raw vectors — streams through
    ONE mapInPandas pass: per Arrow batch, a single int64 gather +
    matmul scores the whole batch against every query, and only each
    query's per-batch top-k survives (exact (score DESC, id ASC)
    lexsort), so the scan emits O(batches * q * k) rows, never the
    q x n pair table.  The final window re-ranks that small union —
    the global top-k under a total order is a subset of the per-batch
    top-k's.  All products are integer: the same exact BIGINT under
    any batch split.  (A per-pair SQL-expression twin, _adc_expr,
    exists for composing scores inside views; measured row-at-a-time
    it is ~50us/pair — the vectorized scan is the serving path.)"""
    cb = PRETRAINED_PQ_D64_M16_K16 if codebooks is None else codebooks
    B = np.asarray(cb, dtype=np.int64)  # (m, ksub, dsub)
    m, _ksub, dsub = B.shape
    qrows = (
        queries.select(
            F.col(id_col).alias("qid"),
            int_unit_expr(f"CAST({vec_col} AS ARRAY<DOUBLE>)").alias("qiv"),
        )
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_adc_topk collects the query side to the driver and got "
            f"over {max_queries} rows — raise max_queries deliberately or "
            "batch the queries"
        )
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.array([r["qiv"] for r in qrows], dtype=np.int64).reshape(
        len(qrows), m * dsub
    )
    v = pq_encode(vectors, id_col, vec_col, cb).toDF("nid", "codes")
    out_schema = T.StructType(
        [
            T.StructField("qid", T.LongType(), False),
            T.StructField("nid", T.LongType(), False),
            T.StructField("adc_score", T.LongType(), False),
        ]
    )

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            nids = pdf["nid"].to_numpy(dtype=np.int64)
            C = np.array(list(pdf["codes"]), dtype=np.int64)  # (b, m)
            G = B[np.arange(m)[None, :], C].reshape(len(C), m * dsub)
            scores = G @ Q.T  # (b, q) exact int64
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                col = scores[:, j]
                mask = nids != qids[j]  # self-match excluded
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                # exact (score DESC, nid ASC) — lexsort keys in reverse
                order = idx[np.lexsort((nids[idx], -col[idx]))][:k]
                out_q += [qids[j]] * len(order)
                out_n += nids[order].tolist()
                out_s += col[order].tolist()
            yield pd.DataFrame({"qid": out_q, "nid": out_n, "adc_score": out_s})

    scored = v.mapInPandas(score_batches, schema=out_schema)
    w = Window.partitionBy("qid").orderBy(
        F.col("adc_score").desc(), F.col("nid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "adc_score",
            "rank",
        )
    )


def pq_refine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int | None = None,
    codebooks=None,
) -> DataFrame:
    """The standard PQ deployment shape (FAISS "refine"): ADC ranks a
    SHORTLIST per query from the codes table alone (cheap, approximate),
    then ONLY the shortlisted candidates' raw vectors are fetched and
    re-scored with the exact rounded cosine every sim_* key emits
    (similarity.unit_vectors + the shared dot/round/tie-break contract).

    Exact work drops from O(q * n) to O(q * shortlist): the raw vector
    table is pre-filtered by a BROADCAST semi-join on the q * shortlist
    candidate ids BEFORE any normalization, so only shortlisted rows
    ever pay the norm fold — the raw-float scan the two-stage design
    exists to avoid never happens.  With shortlist ~ 20k the measured
    recall@5 on the synthetic embeddings is ~1.0 (0.92 at 5k); the
    output is fully deterministic for the frozen codebooks, so the
    oracle replays the identical pipeline value-exactly.
    """
    from ivm_extension_spark.functions.similarity import unit_vectors

    cb = PRETRAINED_PQ_D64_M16_K16 if codebooks is None else codebooks
    short = 20 * k if shortlist is None else shortlist
    cand = pq_adc_topk(vectors, queries, id_col, vec_col, short, cb).select(
        "query_id", "neighbor_id"
    )
    hit = vectors.join(
        F.broadcast(cand.select(F.col("neighbor_id").alias(id_col)).distinct()),
        id_col,
        "leftsemi",
    )
    q = unit_vectors(queries, id_col, vec_col, "query_id", "qv")
    v = unit_vectors(hit, id_col, vec_col, "neighbor_id", "nv")
    dot = F.expr(
        "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.round(dot * F.lit(10000.0)) / F.lit(10000.0)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def pq_train(
    vectors: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 8,
    sample: int = 4096,
    iters: int = 15,
    seed: int = 11,
):
    """In-cluster twin of scripts/train_pq_codebooks.py: per-subspace
    Lloyd's k-means over a bounded driver-side sample of integer-grid
    unit vectors, centroids rounded back to the grid.  The sample cap
    is the only driver-side data — training cost does not grow with
    the corpus.  Deterministic for a fixed seed."""
    rows = (
        vectors.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(sample)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    IX = np.round(X / norms[:, None] * SCALE)
    dsub = IX.shape[1] // m
    rng = np.random.RandomState(seed)
    books = []
    for s in range(m):
        S = IX[:, s * dsub : (s + 1) * dsub]
        C = S[rng.choice(len(S), size=min(ksub, len(S)), replace=False)].astype(
            np.float64
        )
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([[int(v) for v in np.round(row)] for row in C])
    return books


def pq_packed_sql(vec_col: str, codebooks=None, subspaces=None) -> str:
    """The codes of the given ``subspaces`` (default: all, if they fit)
    packed into ONE BIGINT — 4 bits per code for ksub <= 16 — as a pure
    Spark-SQL expression string: the PQ twin of similarity.ivf_cell_sql,
    usable directly inside ``CREATE IMMV``.  A maintained code index is
    just a projection view ``SELECT id, <lo half>, <hi half> FROM
    vectors`` kept current by the ordinary identity delta rule (16
    subspaces x 4 bits = 64 bits touches the sign bit of a single
    int64, so the index stores TWO 32-bit halves — still 8 bytes of
    code per vector).  The whole pipeline (unit-grid quantize,
    per-subspace argmin encode, packing) inlines into one expression;
    the grid vector binds ONCE as a lambda variable so the norm fold is
    not re-evaluated per codebook entry."""
    cb = PRETRAINED_PQ_D64_M16_K16 if codebooks is None else codebooks
    subs = list(range(len(cb))) if subspaces is None else list(subspaces)
    ksub = max(len(cb[s]) for s in subs)
    if ksub > 16:
        raise ValueError(f"packed codes need ksub <= 16, got {ksub}")
    if 4 * len(subs) > 60:
        raise ValueError(
            f"{len(subs)} subspaces need {4 * len(subs)} bits — over the "
            "signed-int64 budget; pack halves, e.g. subspaces=range(0, 8) "
            "and range(8, 16)"
        )
    dsub = len(cb[0][0])
    n = f"sqrt(aggregate({vec_col}, 0D, (acc, x) -> acc + x * x))"
    n = f"(CASE WHEN ({n}) = 0D THEN 1D ELSE ({n}) END)"
    iv = f"transform({vec_col}, x -> CAST(round(x / {n} * {SCALE}) AS BIGINT))"
    terms = []
    for pos, s_i in enumerate(subs):
        dists = "array(" + ",".join(
            _sub_dist("__piv", s_i * dsub + 1, dsub, e) for e in cb[s_i]
        ) + ")"
        ranked = (
            f"array_sort(zip_with({dists}, sequence(0, {len(cb[s_i]) - 1}), "
            "(d, i) -> struct(d AS d, i AS i)))"
        )
        terms.append(
            f"(CAST(element_at({ranked}, 1).i AS BIGINT) * {16 ** pos}L)"
        )
    packed = " + ".join(terms)
    return f"element_at(transform(array({iv}), __piv -> {packed}), 1)"
