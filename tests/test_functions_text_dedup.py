"""Semantics tests for the LLM-pipeline operators (functions/)."""

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark.functions import dedup, multimodal, similarity, text

from tests.conftest import rows


@pytest.fixture(scope="module")
def docs(spark):
    data = [
        (1, "The cat sat on the mat and the dog barked."),
        (2, "The cat sat on the mat and the dog barked!"),  # near-dup of 1
        (3, "Der Hund und die Katze sind ein Team und das ist gut."),
        (4, "completely different words here about spark engines"),
        (5, ""),
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


def test_normalized_and_tokens(spark):
    df = spark.createDataFrame([("  Hello,   WORLD!  42 ",)], "t string")
    got = df.select(
        text.normalized("t").alias("n"), text.token_count("t").alias("c")
    ).first()
    assert got["n"] == "hello world 42"
    assert got["c"] == 3


def test_fingerprint_matches_on_normalized_equal(docs):
    # docs 1 and 2 differ only in trailing punctuation → same fingerprint
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", text.fingerprint("text").alias("fp")).collect()
    }
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang_pred"] for r in text.with_lang_id(docs, "text").collect()}
    assert got[1] == "en"
    assert got[3] == "de"
    assert got[5] == "und"


def test_quality_score_bounds(docs):
    out = (
        text.with_quality(docs, "text").select("doc_id", "quality_score_ppm").collect()
    )
    for r in out:
        assert 0 <= r["quality_score_ppm"] <= 1_000_000


def test_exact_dedup_groups(docs):
    out = dedup.exact_dedup(docs, "doc_id", "text")
    groups = {r["keep_id"]: r["n_dupes"] for r in out.collect()}
    assert groups[1] == 2  # docs 1+2 collapse, keeper = min id
    assert groups[3] == 1


def test_ngram_jaccard_near_dup(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # identical after normalization
    assert all(j < 0.5 for (a, b), j in got.items() if (a, b) != (1, 2))


def test_minhash_lsh_finds_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical shingle sets → all bands agree


def test_minhash_deterministic_across_runs(docs):
    s1 = rows(dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=16))
    s2 = rows(dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=16))
    assert s1 == s2


def test_simhash_near_pairs(docs):
    pairs = dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0


def test_embedding_near_dups(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),  # near-dup of 1
            (3, [0.0, 1.0, 0.0]),     # orthogonal
        ],
        "vec_id long, embedding array<float>",
    )
    out = dedup.embedding_near_dups(vecs, "vec_id", "embedding", threshold=0.95)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(1, 2)}


def test_brute_force_topk_exact(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = vecs.filter("vec_id = 0")
    out = similarity.brute_force_topk(vecs, q, k=2).collect()
    ranked = sorted([(r["rank"], r["neighbor_id"]) for r in out])
    assert ranked == [(1, 1), (2, 2)]  # closest first; anti-parallel last


def test_lsh_topk_is_subset_of_bucket(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    data = [(i, rng.randn(8).astype(float).tolist()) for i in range(50)]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    q = vecs.filter("vec_id < 3")
    out = similarity.lsh_bucketed_topk(vecs, q, k=3, planes=2, dim=8)
    got = out.collect()
    assert len(got) > 0
    for r in got:
        assert r["query_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 3


def test_ivf_full_probe_equals_brute_force(spark):
    # n_probe = n_centroids degenerates to exact search: the recall ceiling
    import numpy as np

    rng = np.random.RandomState(1)
    data = [(i, rng.randn(8).astype(float).tolist()) for i in range(60)]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    q = vecs.filter("vec_id < 3")
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.brute_force_topk(vecs, q, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ivf_topk(
            vecs, q, k=3, n_centroids=4, n_probe=4
        ).collect()
    }
    assert ivf == exact


def test_ivf_partial_probe_reasonable_recall(spark):
    import numpy as np

    rng = np.random.RandomState(2)
    # two well-separated clusters: IVF with 1 probe must find same-cluster
    # neighbors (cells align with clusters)
    data = [(i, (rng.randn(8) * 0.05 + (5.0 if i % 2 else -5.0)).tolist()) for i in range(40)]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    q = vecs.filter("vec_id IN (0, 1)")
    out = similarity.ivf_topk(vecs, q, k=3, n_centroids=2, n_probe=1).collect()
    assert len(out) == 6
    for r in out:
        # neighbors share the query's cluster (same parity)
        assert r["neighbor_id"] % 2 == r["query_id"] % 2


def test_rolling_fingerprints_stable_under_prefix_insert(spark):
    # content-defined selection: inserting text at the FRONT leaves the
    # fingerprints of the untouched suffix intact (fixed-stride wouldn't)
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, "zzz prefix added " + base)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: set(r["fingerprints"])
        for r in text.rolling_fingerprints(df, "text", k=8, mod_p=4).collect()
    }
    assert out[1] and out[1] <= out[2]  # suffix grams all survive


def test_resize_stub_shape(spark):
    from ivm_extension_spark.functions import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "hello world " * 50), (2, "")], "doc_id long, text string"
    )
    media = mm.with_binary_payload(docs, "doc_id", "text")
    out = {r["media_id"]: r for r in mm.resize(media, width=4, height=4).collect()}
    assert len(out[1]["resized"]) == 16 and len(out[2]["resized"]) == 16
    # deterministic across runs
    again = {r["media_id"]: r for r in mm.resize(media, width=4, height=4).collect()}
    assert bytes(again[1]["resized"]) == bytes(out[1]["resized"])


def test_connected_components_clusters(spark):
    # two components: {1,2,3,4} (chain) and {10,11}; 20 isolated
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 20)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["id"]: r["cluster"]
        for r in dedup.connected_components(verts, edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_contamination_containment_not_jaccard(spark):
    # a short benchmark quote embedded in a long document: containment is
    # high (all bench shingles present) even though jaccard would be low
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    long_doc = "lorem ipsum " * 20 + "the quick brown fox jumps" + " dolor sit" * 20
    corpus = spark.createDataFrame(
        [(1, long_doc), (2, "completely unrelated words here")],
        "doc_id long, text string",
    )
    out = dedup.contamination_pairs(corpus, bench, "doc_id", "text", n=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["corpus_id"], r["bench_id"]) == (1, 100)
    assert r["containment"] == 1.0  # every bench 3-gram found


def test_chunk_tokens_coverage_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    chunks = text.chunk_tokens(df, "text", size=40, overlap=10).collect()
    # stride 30: chunks at 1..40, 31..70, 61..100 -> 3 chunks
    assert [r["chunk_id"] for r in chunks] == [0, 1, 2]
    assert all(r["chunk_tokens"] == 40 for r in chunks)
    c0, c1 = chunks[0]["chunk_text"].split(), chunks[1]["chunk_text"].split()
    assert c0[-10:] == c1[:10]  # overlap region shared
    # every token covered
    covered = set()
    for r in chunks:
        covered.update(r["chunk_text"].split())
    assert len(covered) == 100


def test_chunk_tokens_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    chunks = text.chunk_tokens(df, "text", size=40, overlap=10).collect()
    assert len(chunks) == 1
    assert chunks[0]["chunk_text"] == "a b c"
    assert chunks[0]["chunk_tokens"] == 3


def test_multimodal_payload_and_decode(docs):
    media = multimodal.with_binary_payload(docs, "doc_id", "text")
    # same shape (nullability may differ between builder and declared schema)
    assert media.schema.simpleString() == multimodal.MEDIA_SCHEMA.simpleString()
    feats = multimodal.decode_features(media, dim=4)
    got = {r["media_id"]: r for r in feats.collect()}
    assert len(got[1]["feature"]) == 4
    # deterministic: same payload → same fake feature
    assert got[1]["feature"] == got[2]["feature"] or got[1]["checksum"] != got[2]["checksum"]
    r1 = {r["media_id"]: r["feature"] for r in multimodal.decode_features(media, dim=4).collect()}
    assert r1[3] == got[3]["feature"]


def test_multimodal_decode_fail_real(docs):
    media = multimodal.with_binary_payload(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        multimodal.decode_features(media, dim=4, fail_real=True).collect()


def test_frame_sample(docs):
    media = multimodal.with_binary_payload(docs.filter("doc_id = 1"), "doc_id", "text")
    frames = multimodal.frame_sample(media, every_n_bytes=8, max_frames=4).collect()
    assert 1 <= len(frames) <= 4
    assert all(r["frame_checksum"] is not None for r in frames)


def test_repetition_stats_exact_and_shuffle_free(spark):
    import io
    from contextlib import redirect_stdout

    from ivm_extension_spark.functions import text as tx

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat again"),  # "the cat" x2
            (2, "go go go go go"),  # "go go" x4 of 4 bigrams
            (3, "word"),  # no bigrams
            (4, "a b a b a b a b"),  # "a b" x4, "b a" x3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.repetition_stats(df).collect()}
    assert (out[1]["n_tokens"], out[1]["n_distinct_tokens"]) == (10, 6)
    assert (out[1]["n_bigrams"], out[1]["top_bigram_count"]) == (9, 2)
    assert (out[2]["top_bigram_count"], out[2]["is_repetitive"]) == (4, True)
    assert (out[3]["n_bigrams"], out[3]["top_bigram_count"]) == (0, 0)
    assert out[3]["is_repetitive"] is False
    assert (out[4]["n_bigrams"], out[4]["top_bigram_count"]) == (7, 4)
    # the whole thing is one narrow projection: no exchange anywhere
    buf = io.StringIO()
    with redirect_stdout(buf):
        tx.repetition_stats(df).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_tfidf_top_terms_ranking_and_determinism(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple banana cherry"),
            (2, "banana banana banana durian"),
            (3, "apple cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_top_terms(df, "doc_id", "text", k=2, quantize=6).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"]))
    for v in by_doc.values():
        v.sort()
    # durian appears once in one doc: idf ln(3) beats banana's 3*ln(3/2)?
    # 1*ln(3)=1.0986 vs 3*ln(1.5)=1.216 -> banana ranks first in doc 2
    assert [t for _, t, _ in by_doc[2]] == ["banana", "durian"]
    # doc 3: cherry tf=3, idf ln(3/2); apple tf=1 idf ln(3/2) -> cherry first
    assert [t for _, t, _ in by_doc[3]] == ["cherry", "apple"]
    # doc 1: apple tf=2 beats banana/cherry tf=1 (same idf); tie at rank 2
    # broken by term asc -> banana
    assert [t for _, t, _ in by_doc[1]] == ["apple", "banana"]
    # quantized scores are exact integers
    assert all(isinstance(r["score"], int) for r in out)


def test_incremental_topk_update_equals_full_rescan(spark):
    import random

    rng = random.Random(3)
    dim = 8

    def vecs(ids):
        return spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in ids],
            "vec_id long, embedding array<double>",
        )

    base = vecs(range(40))
    queries = base.filter("vec_id % 10 = 0")
    state = similarity.brute_force_topk(base, queries, k=3)
    newv = vecs(range(100, 115))
    inc = similarity.incremental_topk_update(state, newv, queries, k=3)
    full = similarity.brute_force_topk(
        base.unionByName(newv), queries, k=3
    )
    assert rows(inc) == rows(full)


def test_centroid_update_matches_recompute(spark):
    import random

    rng = random.Random(5)
    dim = 6

    def vrows(ids, labels):
        return [
            (i, rng.choice(labels), [rng.uniform(-1, 1) for _ in range(dim)])
            for i in ids
        ]

    schema = "vec_id long, label string, embedding array<double>"
    base_rows = vrows(range(30), ["x", "y", "z"])
    base = spark.createDataFrame(base_rows, schema)
    state = similarity.centroid_state(base)
    # delete ALL of label z plus a few others; insert some new x/w vectors
    z_dels = [(*r, False) for r in base_rows if r[1] == "z"]
    other_dels = [(*r, False) for r in base_rows if r[1] == "x"][:2]
    ins = [(*r, True) for r in vrows(range(100, 106), ["x", "w"])]
    delta = spark.createDataFrame(
        z_dels + other_dels + ins, schema + ", _duckdb_ivm_multiplicity boolean"
    )
    new_state = similarity.centroid_update(state, delta)
    got = {r["label"]: (r["n_vectors"], r["centroid"]) for r in similarity.centroid_read(new_state).collect()}

    kept = [r for r in base_rows if not any(d[:3] == r for d in z_dels + other_dels)]
    applied = spark.createDataFrame(kept + [i[:3] for i in ins], schema)
    exp = {r["label"]: (r["n_vectors"], r["centroid"]) for r in similarity.label_centroids(applied).collect()}
    assert set(got) == set(exp) and "z" not in got and "w" in got
    for lab in got:
        assert got[lab][0] == exp[lab][0]
        for a, b in zip(got[lab][1], exp[lab][1]):
            assert abs(a - b) < 1e-9


def test_embedding_near_dups_lsh_path_matches_exact(spark):
    # planted near-dup clusters in random noise: the LSH scale path must
    # find (almost all of) the exact path's pairs with identical scores,
    # and must never touch the driver with vector data
    import random

    import numpy as np

    rng = random.Random(7)
    dim = 16
    data = []
    for base_id in range(0, 40):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        data.append((base_id, v))
        if base_id % 4 == 0:  # a near-dup: tiny perturbation
            data.append(
                (1000 + base_id, [x + rng.uniform(-0.005, 0.005) for x in v])
            )
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<double>")

    exact = dedup.embedding_near_dups(vecs, "vec_id", "embedding", threshold=0.95)
    exact_pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in exact.collect()}

    # broadcast_limit=0 forces the LSH path
    approx = dedup.embedding_near_dups(
        vecs, "vec_id", "embedding", threshold=0.95, broadcast_limit=0
    )
    approx_pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in approx.collect()}

    # subset with identical scores; ≥90% recall on this planted set
    for k, v in approx_pairs.items():
        assert k in exact_pairs and v == exact_pairs[k]
    assert len(approx_pairs) >= 0.9 * len(exact_pairs) > 0


def test_incremental_topk_apply_deletes(spark):
    # delete-path of the maintained top-k: prune + stale-query report,
    # then re-scoring ONLY the stale queries reproduces the full rescan
    import random

    rng = random.Random(5)
    dim = 8
    data = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)
    ]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    queries = vecs.filter("vec_id % 10 = 0")
    k = 3
    state = similarity.brute_force_topk(vecs, queries, "vec_id", "embedding", k=k)
    deleted = spark.createDataFrame([(3,), (7,), (11,)], "vec_id long")
    pruned, stale = similarity.incremental_topk_apply_deletes(state, deleted, k=k)

    assert pruned.filter("neighbor_id IN (3, 7, 11)").count() == 0
    stale_ids = {r["query_id"] for r in stale.collect()}
    lost = {
        r["query_id"]
        for r in state.filter("neighbor_id IN (3, 7, 11)").collect()
    }
    assert stale_ids == lost  # exactly the queries that lost a row

    vecs2 = vecs.filter("vec_id NOT IN (3, 7, 11)")
    rescored = similarity.brute_force_topk(
        vecs2,
        queries.join(stale, queries.vec_id == stale.query_id, "leftsemi"),
        "vec_id",
        "embedding",
        k=k,
    )
    kept = pruned.join(stale, on="query_id", how="left_anti")
    got = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in kept.drop("rank").unionByName(rescored.drop("rank")).collect()
    }
    exp = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.brute_force_topk(
            vecs2, queries, "vec_id", "embedding", k=k
        ).collect()
    }
    assert got == exp


def test_embedding_near_dups_delta_invariant(spark):
    # pairs(T) ⊎ CDC == pairs(T'): the incremental pair CDC under a
    # mixed insert/delete delta must reconcile exactly (ids AND scores)
    # with the exact batch recompute over the post-delta corpus
    import random

    from ivm_extension_spark.operators.rewrite import MULT_COL

    rng = random.Random(13)
    dim = 16
    data = []
    for base_id in range(0, 30):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        data.append((base_id, v))
        if base_id % 3 == 0:
            data.append(
                (1000 + base_id, [x + rng.uniform(-0.004, 0.004) for x in v])
            )
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    # delta: insert near-dup copies of the %5 vectors (new ids), delete
    # the %7==2 rows (some of which are pair endpoints)
    ins = [
        (2000 + i, [x + rng.uniform(-0.003, 0.003) for x in v], True)
        for i, v in data
        if i % 5 == 0
    ]
    dels = [(i, v, False) for i, v in data if i % 7 == 2]
    delta = spark.createDataFrame(
        ins + dels, f"vec_id long, embedding array<double>, {MULT_COL} boolean"
    )
    cdc, new_index = dedup.embedding_near_dups_delta(
        vecs, delta, "vec_id", "embedding", threshold=0.95
    )
    old_pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in dedup.embedding_near_dups(
            vecs, "vec_id", "embedding", threshold=0.95
        ).collect()
    }
    merged = dict(old_pairs)
    for r in cdc.collect():
        k = (r["id_a"], r["id_b"])
        if r[MULT_COL]:
            assert k not in merged, k  # addition must be genuinely new
            merged[k] = r["cos_sim"]
        else:
            assert merged.pop(k) == r["cos_sim"]  # retraction must exist
    new_pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in dedup.embedding_near_dups(
            new_index, "vec_id", "embedding", threshold=0.95
        ).collect()
    }
    assert merged == new_pairs and len(new_pairs) > 0
    # the new index is exactly T' = (T \ dels) ∪ ins
    assert new_index.count() == len(data) - len(dels) + len(ins)


def test_embedding_near_dups_delta_over_limit_takes_bucketed_path(spark):
    # a "delta" bigger than broadcast_limit (a backfill) must NOT be
    # collected to the driver: it routes through the deterministic LSH
    # buckets, and the CDC reconciles exactly with the LSH batch path
    # (same seeded hyperplanes) over the pre/post corpora
    import random

    from pyspark.sql import DataFrame

    from ivm_extension_spark.operators.rewrite import MULT_COL

    rng = random.Random(7)
    dim = 16
    data = []
    for base_id in range(0, 24):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        data.append((base_id, v))
        if base_id % 3 == 0:
            data.append(
                (1000 + base_id, [x + rng.uniform(-0.004, 0.004) for x in v])
            )
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    ins = [
        (2000 + i, [x + rng.uniform(-0.003, 0.003) for x in v], True)
        for i, v in data
        if i % 4 == 0
    ]
    dels = [(i, v, False) for i, v in data if i % 7 == 2]
    delta = spark.createDataFrame(
        ins + dels, f"vec_id long, embedding array<double>, {MULT_COL} boolean"
    )
    fetched = []
    orig = DataFrame.collect

    def spy(self):
        fetched.append(self)
        return orig(self)

    try:
        DataFrame.collect = spy
        cdc, new_index = dedup.embedding_near_dups_delta(
            vecs, delta, "vec_id", "embedding", threshold=0.95,
            broadcast_limit=5,
        )
        cdc_rows = orig(cdc)
    finally:
        DataFrame.collect = orig
    # the delta was never driver-collected: only the 1-row dim probes
    assert all(len(orig(f)) <= 1 for f in fetched)

    def lsh_pairs(df):
        return {
            (r["id_a"], r["id_b"]): r["cos_sim"]
            for r in dedup.embedding_near_dups(
                df, "vec_id", "embedding", threshold=0.95, broadcast_limit=0
            ).collect()
        }

    merged = lsh_pairs(vecs)
    for r in cdc_rows:
        k = (r["id_a"], r["id_b"])
        if r[MULT_COL]:
            assert k not in merged, k
            merged[k] = r["cos_sim"]
        else:
            assert merged.pop(k) == r["cos_sim"]
    assert merged == lsh_pairs(new_index) and len(merged) > 0
    assert new_index.count() == len(data) - len(dels) + len(ins)


def test_embedding_near_dups_lsh_no_driver_materialization(spark):
    # the >limit path must not collect the vector table: the only allowed
    # driver fetch is the single-row dim probe (a LIMIT 1 plan)
    import ivm_extension_spark.functions.dedup as dd
    from pyspark.sql import DataFrame

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    fetched = []
    orig = DataFrame.collect

    def spy(self):
        fetched.append(self)
        return orig(self)

    try:
        DataFrame.collect = spy
        out = dd.embedding_near_dups(
            vecs, "vec_id", "embedding", threshold=0.95, broadcast_limit=0
        )
        out_rows = orig(out)  # materialize the RESULT outside the spy
    finally:
        DataFrame.collect = orig
    # every spied collect was the 1-row dim probe
    assert all(len(orig(f)) <= 1 for f in fetched)
    assert isinstance(out_rows, list)


def test_ngram_hot_shingle_guard_drop_list(spark):
    # one stop-shingle shared by every doc must not by itself produce
    # pairs when the cap is active, and the broadcast side of the guard
    # must be the tiny hot DROP-list (anti-join), not the keep-list
    docs_data = [
        (1, "alpha beta gamma common stop shingle here"),
        (2, "delta epsilon zeta common stop shingle here"),
        (3, "alpha beta gamma unrelated tail words now"),
    ]
    docs = spark.createDataFrame(docs_data, "doc_id long, text string")

    # cap=2: 'common stop shingle' + neighbors appear in docs 1 and 2 ≤ 2 —
    # use cap=1 so anything shared by ≥2 docs is dropped
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, max_shingle_freq=1
    )
    assert pairs.count() == 0  # every shared shingle was hot

    # default cap (10k) leaves small-corpus results identical to no cap
    with_cap = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3)
    no_cap = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, max_shingle_freq=None
    )
    assert sorted(map(tuple, with_cap.collect())) == sorted(
        map(tuple, no_cap.collect())
    )

    # plan audit: the guard joins LEFT ANTI against a broadcast drop-list
    plan = with_cap._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_png_roundtrip_real_codec():
    # pure-numpy PNG encoder/decoder round trip, all supported color types
    import numpy as np

    rng = np.random.RandomState(3)
    for shape in [(5, 7), (4, 6, 3), (3, 3, 4)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        data = multimodal.encode_png(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        back = multimodal.decode_image(data)
        want = img if img.ndim == 3 else img[:, :, None]
        assert back.shape == want.shape
        assert (back == want).all()


def test_png_decode_filtered_rows():
    # decode must handle PNGs using Sub/Up/Average/Paeth row filters —
    # build one by hand with a mix of filter types
    import struct
    import zlib

    import numpy as np

    img = np.arange(48, dtype=np.uint8).reshape(4, 12)  # 4 rows, 12 wide gray
    filtered = b""
    prev = np.zeros(12, dtype=np.int64)
    for r, ft in enumerate([0, 1, 2, 3]):  # none, sub, up, average
        row = img[r].astype(np.int64)
        if ft == 0:
            enc = row.copy()
        elif ft == 1:
            enc = row.copy()
            enc[1:] = (row[1:] - row[:-1]) % 256
        elif ft == 2:
            enc = (row - prev) % 256
        else:
            enc = row.copy()
            for x in range(12):
                left = row[x - 1] if x else 0
                enc[x] = (row[x] - (left + prev[x]) // 2) % 256
        filtered += bytes([ft]) + bytes(enc.astype(np.uint8))
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 12, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(filtered))
        + chunk(b"IEND", b"")
    )
    back = multimodal.decode_image(data)
    assert (back[:, :, 0] == img).all()


def test_netpbm_and_bmp_decode():
    import struct

    import numpy as np

    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    back = multimodal.decode_image(multimodal.encode_netpbm(img))
    assert (back == img).all()
    # hand-built 24-bit bottom-up BMP, 2x2
    px = np.array([[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]], dtype=np.uint8)
    rows = b""
    for r in range(1, -1, -1):  # bottom-up
        line = b"".join(bytes(px[r, c][::-1]) for c in range(2))  # RGB->BGR
        rows += line + b"\x00" * ((4 - len(line) % 4) % 4)
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    )
    back = multimodal.decode_image(header + rows)
    assert (back == px).all()


def test_decode_features_real_image(spark):
    # a real PNG payload through the Spark mapInPandas path: dimensions
    # and mean intensity must come from the DECODED PIXELS
    import numpy as np

    img = np.full((4, 4), 100, dtype=np.uint8)
    payload = multimodal.encode_png(img)
    media = spark.createDataFrame(
        [(1, bytearray(payload), ("image/png", len(payload), "x"))],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.decode_features(media, dim=4).collect()[0]
    assert r["decoded"] is True
    assert (r["width"], r["height"], r["n_channels"]) == (4, 4, 1)
    assert abs(r["feature"][3] - (100 / 255.0)) < 1e-12
    # fail_real must NOT raise for a decodable image
    r2 = multimodal.decode_features(media, dim=4, fail_real=True).collect()[0]
    assert r2["decoded"] is True


def test_resize_real_image(spark):
    import numpy as np

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = multimodal.encode_png(img)
    media = spark.createDataFrame(
        [(1, bytearray(payload), ("image/png", len(payload), "x"))],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.resize(media, width=4, height=4).collect()[0]
    out = multimodal.decode_image(bytes(r["resized"]))
    assert out.shape == (4, 4, 1)
    # nearest-neighbor of row-major ramp: rows 0,2,4,6 / cols 0,2,4,6
    want = img[::2, ::2]
    assert (out[:, :, 0] == want).all()


def test_resize_rgba_drops_alpha(spark):
    import numpy as np

    img = np.dstack(
        [np.full((4, 4), v, dtype=np.uint8) for v in (10, 20, 30, 255)]
    )
    payload = multimodal.encode_png(img)
    media = spark.createDataFrame(
        [(1, bytearray(payload), ("image/png", len(payload), "x"))],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.resize(media, width=2, height=2).collect()[0]
    out = multimodal.decode_image(bytes(r["resized"]))
    assert out.shape == (2, 2, 3)  # alpha dropped, valid P6
    assert (out[0, 0] == [10, 20, 30]).all()


def test_decode_features_fixed_length_short_image(spark):
    import numpy as np

    img = np.full((2, 2), 100, dtype=np.uint8)  # fewer rows than dim-4
    payload = multimodal.encode_png(img)
    media = spark.createDataFrame(
        [(1, bytearray(payload), ("image/png", len(payload), "x"))],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.decode_features(media, dim=16).collect()[0]
    assert len(r["feature"]) == 16  # padded, never ragged


def test_minhash_lsh_delta_pairs_invariant(spark):
    """pairs(T) ⊎ CDC == pairs(T') for the incremental LSH dedup, under
    a delta mixing inserts (incl. a near-dup of an existing doc), a
    delete, and a delete+reinsert update of the same id."""
    from pyspark.sql import functions as F

    m = "_duckdb_ivm_multiplicity"
    base_rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today!"),  # dup of 1
        (3, "completely different text about spark and flink engines"),
        (4, "yet another unrelated document discussing query planners"),
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    delta_rows = [
        # insert: near-dup of doc 3
        (10, "completely different text about spark and flink engines.", True),
        # delete doc 2 (breaks the 1-2 pair)
        (2, base_rows[1][1], False),
        # update doc 4: delete old text, reinsert with text duplicating 1
        (4, base_rows[3][1], False),
        (4, "the quick brown fox jumps over the lazy dog today", True),
    ]
    delta = spark.createDataFrame(delta_rows, f"doc_id long, text string, {m} boolean")

    state = dedup.banded_signatures(base, "doc_id", "text", num_hashes=32, bands=8)
    cdc, new_state = dedup.minhash_lsh_delta_pairs(
        state, delta, "doc_id", "text", num_hashes=32, bands=8
    )

    old_pairs = dedup.minhash_lsh_pairs(base, "doc_id", "text", num_hashes=32, bands=8)
    applied = spark.createDataFrame(
        [base_rows[0], base_rows[2], (10, delta_rows[0][1]),
         (4, delta_rows[3][1])],
        "doc_id long, text string",
    )
    new_pairs = dedup.minhash_lsh_pairs(applied, "doc_id", "text", num_hashes=32, bands=8)

    cols = ["id_a", "id_b", "n_bands_agree"]
    merged = (
        old_pairs.withColumn("__s", F.lit(1))
        .unionByName(
            cdc.withColumn("__s", F.when(F.col(m), F.lit(1)).otherwise(F.lit(-1)))
            .drop(m)
        )
        .groupBy(*cols)
        .agg(F.sum("__s").alias("__n"))
        .filter(F.col("__n") > 0)
        .select(*cols)
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, new_pairs.select(*cols).collect())
    )
    # the planted transitions
    got_cdc = {(r["id_a"], r["id_b"], r[m]) for r in cdc.select("id_a", "id_b", m).collect()}
    assert (1, 2, False) in got_cdc        # deletion breaks the 1-2 pair
    assert (3, 10, True) in got_cdc        # inserted near-dup pairs with 3
    assert (1, 4, True) in got_cdc         # updated doc 4 now duplicates 1
    # the new state continues: next batch over new_state equals fresh index
    fresh = dedup.banded_signatures(applied, "doc_id", "text", num_hashes=32, bands=8)
    assert sorted(map(tuple, new_state.collect())) == sorted(map(tuple, fresh.collect()))


def test_minhash_md5_variant_recovers_planted_dups(spark, docs):
    """The md5 shingle-hash variant (oracle-reproducible) must behave
    like the xxhash64 default on planted near-identical docs: every
    (orig, copy) pair collides on nearly all bands."""
    from pyspark.sql import functions as F

    from ivm_extension_spark.functions.dedup import minhash_lsh_pairs

    base = docs.limit(20).select("doc_id", "text")
    copies = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = base.unionByName(copies)
    for hashed in ("xxhash64", "md5"):
        pairs = minhash_lsh_pairs(
            corpus, "doc_id", "text", num_hashes=64, bands=16, shingle_hash=hashed
        )
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        planted = {(i, i + 1000) for (i,) in base.select("doc_id").collect()}
        assert planted <= got, (hashed, planted - got)


def test_simhash_md5_variant_zero_hamming_on_exact_dups(spark, docs):
    from pyspark.sql import functions as F

    from ivm_extension_spark.functions.dedup import simhash_near_pairs

    base = docs.limit(10).select("doc_id", "text")
    copies = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"), F.col("text")
    )
    pairs = simhash_near_pairs(
        base.unionByName(copies), "doc_id", "text", max_hamming=0, shingle_hash="md5"
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(i, i + 1000) for (i,) in base.select("doc_id").collect()}
    assert planted <= got


def test_redact_pii_counts_and_placeholders(spark):
    from ivm_extension_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org and x@y.io, ssn 123-45-6789, "
                "call 555-123-4567 or 555.123.4567, host 10.0.255.3 done"),
            (2, "no pii here, just words and the number 12345"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = got[1]
    assert (r1["n_email"], r1["n_ssn"], r1["n_phone"], r1["n_ip"]) == (2, 1, 2, 1)
    assert r1["redacted"] == (
        "mail <EMAIL> and <EMAIL>, ssn <SSN>, "
        "call <PHONE> or <PHONE>, host <IP> done"
    )
    r2 = got[2]
    assert (r2["n_email"], r2["n_ssn"], r2["n_phone"], r2["n_ip"]) == (0, 0, 0, 0)
    assert r2["redacted"] == "no pii here, just words and the number 12345"


def test_boilerplate_ngram_coverage_threshold(spark):
    from ivm_extension_spark.functions.text import boilerplate_ngram_coverage

    # 10 docs: 'all rights reserved' appears in 6 (bigrams 'all rights' /
    # 'rights reserved' have df=6 >= 50% of 10); each doc also has a
    # unique bigram that must NOT be flagged
    rows = [
        (i, f"u{i} v{i} all rights reserved") for i in range(6)
    ] + [(i, f"u{i} v{i} w{i}") for i in range(6, 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_boiler"])
        for r in boilerplate_ngram_coverage(df, n=2, min_df_pct=50).collect()
    }
    # enriched docs: bigrams = u_i v_i, v_i all, all rights, rights reserved
    for i in range(6):
        assert got[i] == (4, 2), got[i]
    for i in range(6, 10):
        assert got[i] == (2, 0), got[i]


def test_boilerplate_short_docs_not_emitted(spark):
    from ivm_extension_spark.functions.text import boilerplate_ngram_coverage

    df = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in boilerplate_ngram_coverage(df, n=2).collect()}
    assert got == {2}  # single-token and empty docs have no bigrams


def test_boilerplate_index_maintained_equals_recompute(spark):
    """The maintained bigram-df index (HAVING threshold on read) equals
    the post-delta recompute, including bigrams that CROSS the
    threshold in either direction under the doc delta."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    merged = {
        (r["g"], r["df"])
        for r in entrymod._q_ivm_merge_boilerplate_index(spark, sf).collect()
    }
    from ivm_extension_spark.functions.text import (
        explode_array_barrier,
        with_word_shingles,
    )
    from ivm_extension_spark.sources import read_parquet
    from pyspark.sql import functions as F

    docs = read_parquet(spark, f"{sf}/documents.parquet")
    applied = docs.filter("NOT (doc_id % 7 = 3)").unionByName(
        docs.filter("doc_id % 10 = 0")
    )
    ex = explode_array_barrier(
        with_word_shingles(applied, "text", n=2, out="__sh"), "__sh", "g"
    )
    truth = {
        (r["g"], r["df"])
        for r in ex.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter("df >= 25")
        .collect()
    }
    assert merged == truth
    # the threshold must actually bite at this scale (data-liveness)
    below = ex.groupBy("g").agg(F.count("*").alias("df")).filter("df < 25")
    assert below.count() > 0


def test_embedding_near_dups_delta_exact_to_lsh_transition(spark):
    # an OVERSIZED delta landing on a SMALL (exact-built) index: the LSH
    # probe can only retract bucket-colliding pairs, so the CDC must
    # instead turn the state over — retract every exact pair of T,
    # insert every pair of T' by T''s own batch path.  Invariant:
    # pairs(T, exact) ⊎ CDC == pairs(T', dispatcher) bit-exactly.
    import random

    from ivm_extension_spark.operators.rewrite import MULT_COL

    rng = random.Random(21)
    dim = 16
    data = []
    for base_id in range(0, 12):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        data.append((base_id, v))
        if base_id % 3 == 0:
            data.append(
                (1000 + base_id, [x + rng.uniform(-0.004, 0.004) for x in v])
            )
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    n_index = len(data)  # 16 rows — at or under the limit below
    # backfill: more inserts than broadcast_limit, plus a few deletes
    ins = [
        (2000 + j, [x + rng.uniform(-0.003, 0.003) for x in data[j % len(data)][1]], True)
        for j in range(30)
    ]
    dels = [(i, v, False) for i, v in data if i % 7 == 2]
    delta = spark.createDataFrame(
        ins + dels, f"vec_id long, embedding array<double>, {MULT_COL} boolean"
    )
    limit = n_index  # index <= limit (exact path), delta > limit
    cdc, new_index = dedup.embedding_near_dups_delta(
        vecs, delta, "vec_id", "embedding", threshold=0.95,
        broadcast_limit=limit,
    )
    exact_old = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in dedup.embedding_near_dups(
            vecs, "vec_id", "embedding", threshold=0.95, broadcast_limit=limit
        ).collect()
    }
    merged = dict(exact_old)
    cdc_rows = cdc.collect()
    # turnover CDC: apply retractions first, then insertions
    for r in cdc_rows:
        if not r[MULT_COL]:
            k = (r["id_a"], r["id_b"])
            assert merged.pop(k) == r["cos_sim"], k
    assert merged == {}  # every exact pair was retracted
    for r in cdc_rows:
        if r[MULT_COL]:
            merged[(r["id_a"], r["id_b"])] = r["cos_sim"]
    want = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in dedup.embedding_near_dups(
            new_index, "vec_id", "embedding", threshold=0.95,
            broadcast_limit=limit,
        ).collect()
    }
    assert merged == want and len(want) > 0
    assert new_index.count() == len(data) - len(dels) + len(ins)


# --------------------------------------------------------------------------
# maintained TF-IDF index API (functions/tfidf.py) — the library surface
# the ivm_merge_tfidf driver key routes through (promoted from the entry
# file in round 7)
# --------------------------------------------------------------------------

def test_tfidf_index_views_maintained_equals_recompute(spark):
    """Drive the API directly: three IMMVs advanced through a mixed
    insert/delete delta must score identically to text.tfidf_top_terms
    over the post-delta corpus (the IVM invariant, finalize-on-read)."""
    from ivm_extension_spark import IVMEngine
    from ivm_extension_spark.functions import tfidf
    from ivm_extension_spark.functions.text import tfidf_top_terms
    from ivm_extension_spark.operators.merge import apply_delta_to_table
    from ivm_extension_spark.operators.rewrite import MULT_COL

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha alpha delta"),
            (3, "beta gamma gamma epsilon"),
            (4, "zeta zeta zeta alpha"),
        ],
        "doc_id bigint, text string",
    )
    eng = IVMEngine(spark)
    eng.register_table("documents", docs)
    # delta: duplicate doc 2 (its term bag doubles), delete doc 3 (its
    # terms leave tf AND df via the count-distinct aux state)
    d_docs = (
        docs.filter("doc_id = 2")
        .withColumn(MULT_COL, F.lit(True))
        .unionByName(docs.filter("doc_id = 3").withColumn(MULT_COL, F.lit(False)))
    )
    eng.register_delta("documents", d_docs)

    names = tfidf.tfidf_index_views(eng)
    assert names == ("tf", "dfreq", "ndocs")
    for v in names:
        eng.ivm_upsert(v)
    tf_state, df_state, nd = (eng.merge_view(v) for v in names)
    got = rows(
        tfidf.tfidf_top_k(tfidf.tfidf_scores(tf_state, df_state, nd), k=2)
    )

    post = apply_delta_to_table(docs, d_docs)
    want = rows(
        tfidf_top_terms(post, k=2, quantize=6).withColumnRenamed("id", "doc_id")
    )
    assert got == want


def test_chunk_minhash_finds_shared_segment(spark):
    """Chunk-granular near-dup (round 8): two documents share one long
    boilerplate paragraph but differ everywhere else — whole-document
    MinHash dilutes the overlap below banding, the chunk-level rollup
    must still pair them; a doc's self-similar chunks never emit an
    intra-doc pair."""
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(500)]
    boiler = " ".join(rng.choice(words) for _ in range(40))
    noise = lambda n: " ".join(rng.choice(words) for _ in range(n))  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, noise(120) + " " + boiler),
            (2, boiler + " " + noise(120)),
            (3, noise(140)),
        ],
        "doc_id bigint, text string",
    )
    out = dedup.chunk_minhash_doc_pairs(
        docs, chunk_size=16, overlap=4, num_hashes=32, bands=8
    )
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (1, 2) in got
    assert all(a != b for a, b in got)
    # whole-document banding misses the same pair at these parameters
    doc_level = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8
        ).collect()
    }
    assert (1, 2) not in doc_level


def test_knn_graph_paths_agree_and_symmetrize(spark):
    """The BLAS block path and the expression path must emit identical
    graphs (same quantization + tiebreak); mutual marks exactly the
    both-direction edges; every vector's top-1 neighbor edge exists."""
    import random

    rng = random.Random(3)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ] + [(99, [0.0] * 8)]  # zero vector: cos 0 everywhere, must not NaN-rank
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    g_blas = similarity.knn_graph(df, k=3)
    g_expr = similarity.knn_graph(df, k=3, broadcast_limit=0)
    assert sorted(map(tuple, g_blas.collect())) == sorted(
        map(tuple, g_expr.collect())
    )
    edges = {(r["src"], r["dst"]): r for r in g_blas.collect()}
    assert all(s < d for s, d in edges)
    nn = similarity.brute_force_topk(df, df, k=3)
    top1 = {(min(r["query_id"], r["neighbor_id"]), max(r["query_id"], r["neighbor_id"]))
            for r in nn.collect() if r["rank"] == 1}
    assert top1 <= set(edges)
    # mutual edges = pairs appearing in both directions of the top-k rows
    directed = {(r["query_id"], r["neighbor_id"]) for r in nn.collect()}
    for (s, d), r in edges.items():
        assert r["mutual"] == ((s, d) in directed and (d, s) in directed)


def test_knn_graph_cell_local_tier(spark):
    """Past exact_limit the graph is built cell-locally (IVF shuffle
    join, no full-set broadcast): edges keep src<dst and the EXACT
    quantized cosine values, recall is high on a clusterable set, and
    the plan contains no BroadcastExchange over the vector relation."""
    import random

    rng = random.Random(5)
    # three well-separated direction clusters → cell-local ≈ exact
    vecs = []
    for i in range(60):
        base = [0.0] * 8
        base[i % 3] = 10.0
        vecs.append((i, [b + rng.uniform(-0.5, 0.5) for b in base]))
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    g_cell = similarity.knn_graph(
        df, k=3, broadcast_limit=0, exact_limit=0, n_centroids=6, n_probe=3
    )
    g_exact = similarity.knn_graph(df, k=3)
    cell = {(r["src"], r["dst"]): r["cos_sim"] for r in g_cell.collect()}
    exact = {(r["src"], r["dst"]): r["cos_sim"] for r in g_exact.collect()}
    assert cell, "cell-local tier emitted no edges"
    assert all(s < d for s, d in cell)
    # values exact wherever an edge exists: the pair's cosine matches the
    # exact graph bit-for-bit when the same edge survives both top-ks
    shared = set(cell) & set(exact)
    assert shared and all(cell[e] == exact[e] for e in shared)
    # recall on separated clusters should be near-total
    assert len(shared) >= 0.8 * len(exact)


def test_chunk_minhash_delta_pairs_invariant(spark):
    """pairs(chunks(T)) ⊎ CDC == pairs(chunks(T')) for the chunk-grain
    incremental dedup: a delete retracts every chunk its document
    indexed; an inserted doc sharing one paragraph pairs at chunk grain;
    the advanced state equals a fresh chunk index."""
    import random

    from pyspark.sql import functions as F

    m = "_duckdb_ivm_multiplicity"
    rng = random.Random(11)
    words = [f"w{i}" for i in range(300)]
    boiler = " ".join(rng.choice(words) for _ in range(40))
    mk = lambda n: " ".join(rng.choice(words) for _ in range(n))  # noqa: E731
    base_rows = [
        (1, mk(80) + " " + boiler),
        (2, mk(90)),
        (3, boiler + " " + mk(70)),
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    delta_rows = [
        (10, mk(60) + " " + boiler, True),   # new doc sharing the paragraph
        (3, base_rows[2][1], False),          # delete doc 3 (breaks 1-3 chunk pairs)
    ]
    delta = spark.createDataFrame(delta_rows, f"doc_id long, text string, {m} boolean")
    kw = dict(chunk_size=16, overlap=4, num_hashes=32, bands=8)

    state = dedup.chunk_banded_signatures(base, "doc_id", "text", **kw)
    cdc, new_state = dedup.chunk_minhash_delta_pairs(
        state, delta, "doc_id", "text", **kw
    )

    def pairs(docs):
        ch = dedup._chunked_relation(docs, "doc_id", "text", 16, 4, 100_000)
        return dedup.minhash_lsh_pairs(ch, "cid", "chunk_text", 32, 8)

    applied = spark.createDataFrame(
        [base_rows[0], base_rows[1], (10, delta_rows[0][1])],
        "doc_id long, text string",
    )
    cols = ["id_a", "id_b", "n_bands_agree"]
    merged = (
        pairs(base).withColumn("__s", F.lit(1))
        .unionByName(
            cdc.withColumn("__s", F.when(F.col(m), F.lit(1)).otherwise(F.lit(-1)))
            .drop(m)
        )
        .groupBy(*cols)
        .agg(F.sum("__s").alias("__n"))
        .filter(F.col("__n") > 0)
        .select(*cols)
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, pairs(applied).select(*cols).collect())
    )
    got = {(r["id_a"] // 100_000, r["id_b"] // 100_000, r[m]) for r in cdc.collect()}
    assert (1, 3, False) in got   # deletion retracts the shared-paragraph pairs
    assert (1, 10, True) in got   # inserted doc pairs with 1 at chunk grain
    fresh = dedup.chunk_banded_signatures(applied, "doc_id", "text", **kw)
    assert sorted(map(tuple, new_state.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_wav_roundtrip_and_floor_duration():
    import struct

    import numpy as np

    s = ((3 * np.arange(104)) % 201 - 100).astype("<i2")
    meta = multimodal.decode_wav(multimodal.encode_wav(s, 8000, channels=2))
    assert meta == {
        "n_channels": 2,
        "sample_rate": 8000,
        "bits_per_sample": 16,
        "n_frames": 52,
        # 52 frames @ 8 kHz = 6.5 ms: FLOOR, not round — Python round()
        # is half-to-even while SQL ROUND is half-away, so .5 durations
        # would diverge across engines under either rounding
        "duration_ms": 6,
        "peak": int(np.abs(s.astype(np.int64)).max()),
        "sum_sq": int((s.astype(np.int64) ** 2).sum()),
    }
    # chunk walker: an unrelated odd-sized chunk (padded to even) before
    # fmt/data must be skipped, not break parsing
    wav = multimodal.encode_wav(s, 8000, channels=2)
    spliced = wav[:12] + b"LIST" + struct.pack("<I", 3) + b"abc\x00" + wav[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert multimodal.decode_wav(spliced) == meta


def test_wav_decode_rejections():
    import struct

    import numpy as np

    s = np.array([1, -2, 3, -4], dtype="<i2")
    good = multimodal.encode_wav(s, 8000)
    assert multimodal.decode_wav(good) is not None
    assert multimodal.decode_wav(b"hello") is None  # wrong magic
    assert multimodal.decode_wav(good[:20]) is None  # truncated chunk
    assert multimodal.decode_wav(b"RIFF" + b"\x04\x00\x00\x00" + b"WAVE") is None
    # non-PCM format tag (3 = IEEE float) rejected
    bad_fmt = bytearray(good)
    bad_fmt[20:22] = struct.pack("<H", 3)
    assert multimodal.decode_wav(bytes(bad_fmt)) is None
    # stereo data that doesn't divide into whole frames rejected
    torn = multimodal.encode_wav(np.array([1, 2, 3], dtype="<i2"), 8000, channels=2)
    assert multimodal.decode_wav(torn) is None


def test_audio_features_spark(spark):
    import numpy as np
    import pytest

    s = ((5 * np.arange(80)) % 201 - 100).astype("<i2")
    wav = multimodal.encode_wav(s, 16000, channels=1)
    media = spark.createDataFrame(
        [
            (1, bytearray(wav), ("audio/wav", len(wav), "x")),
            (2, bytearray(b"not audio"), ("text/plain", 9, "y")),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in multimodal.audio_features(media).collect()}
    good = rows[1]
    assert good["decoded"] and good["n_channels"] == 1
    assert good["sample_rate"] == 16000 and good["n_frames"] == 80
    assert good["duration_ms"] == 5  # 80/16000 s = 5 ms exactly
    assert good["peak"] == int(np.abs(s.astype(np.int64)).max())
    assert good["sum_sq"] == int((s.astype(np.int64) ** 2).sum())
    assert rows[2]["decoded"] is False and rows[2]["n_frames"] is None
    with pytest.raises(Exception, match="not a decodable PCM16"):
        multimodal.audio_features(media, fail_real=True).collect()


def test_avi_roundtrip_and_rejections():
    import numpy as np

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(4, 3, 5, 3), dtype=np.uint8)
    raw = multimodal.encode_avi(frames, rate=24000, scale=1001)
    meta = multimodal.decode_avi(raw)
    assert meta is not None
    assert (meta["width"], meta["height"], meta["n_frames"]) == (5, 3, 4)
    assert (meta["fps_num"], meta["fps_den"]) == (24000, 1001)
    assert meta["duration_ms"] == 4 * 1000 * 1001 // 24000  # floor ms
    f64 = frames.astype(np.int64)
    assert meta["pix_sum"] == int(f64.sum())
    assert meta["pix_sum_sq"] == int((f64 * f64).sum())
    assert (meta["frames"] == frames).all()
    # zero-frame clip still decodes with exact-zero stats
    empty = multimodal.decode_avi(multimodal.encode_avi(frames[:0], rate=10))
    assert empty is not None and empty["n_frames"] == 0 and empty["pix_sum"] == 0
    # rejections: wrong magic, truncation, compressed frame tag
    assert multimodal.decode_avi(b"nope") is None
    assert multimodal.decode_avi(raw[:60]) is None
    assert multimodal.decode_avi(raw.replace(b"00db", b"00dc", 1)) is None
    # frame chunk whose size disagrees with the strf header: patch the
    # BITMAPINFOHEADER width in place (strf body sits at a fixed offset
    # in our writer's layout) so the expected stride no longer matches
    import struct as _struct

    w_off = raw.index(_struct.pack("<IiiHH", 40, 5, 3, 1, 24)) + 4
    patched = raw[:w_off] + _struct.pack("<i", 6) + raw[w_off + 4 :]
    assert multimodal.decode_avi(patched) is None


def test_video_features_and_frames_spark(spark):
    import numpy as np
    import pytest

    f = np.arange(5 * 2 * 4 * 3, dtype=np.uint8).reshape(5, 2, 4, 3) % 256
    avi = multimodal.encode_avi(f, rate=15, scale=1)
    media = spark.createDataFrame(
        [
            (1, bytearray(avi), ("video/avi", len(avi), "x")),
            (2, bytearray(b"not video"), ("text/plain", 9, "y")),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in multimodal.video_features(media).collect()}
    good = rows[1]
    f64 = f.astype(np.int64)
    assert good["decoded"] and (good["width"], good["height"]) == (4, 2)
    assert good["n_frames"] == 5 and good["duration_ms"] == 5 * 1000 // 15
    assert good["pix_sum"] == int(f64.sum())
    assert good["pix_sum_sq"] == int((f64 * f64).sum())
    assert rows[2]["decoded"] is False and rows[2]["n_frames"] is None
    with pytest.raises(Exception, match="not a decodable DIB"):
        multimodal.video_features(media, fail_real=True).collect()

    # keyframe sampling: every 2nd frame, max 3 → frames 0, 2, 4; the
    # re-encoded netpbm frames feed decode_features as real images
    frames_df = multimodal.video_frames(media, every_n=2, max_frames=3)
    got = sorted(
        (r["frame_no"], r["frame_sum"]) for r in frames_df.collect()
    )
    assert got == [(k, int(f64[k].sum())) for k in (0, 2, 4)]
    refed = multimodal.decode_features(
        frames_df.select(
            F.col("media_id"),
            F.col("frame_bytes").alias("payload"),
            F.struct(
                F.lit("image/x-portable-pixmap").alias("format"),
                F.length("frame_bytes").cast("long").alias("n_bytes"),
                F.md5("frame_bytes").alias("checksum"),
            ).alias("meta"),
        ),
        dim=4,
        fail_real=True,
    ).collect()
    assert len(refed) == 3 and all(r["decoded"] for r in refed)
    assert all((r["width"], r["height"], r["n_channels"]) == (4, 2, 3) for r in refed)
