"""Text functions + LLM-pipeline extension operators (dedup, similarity)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.ext.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from uofi_payroll_etl_main_demo_spark.ext.similarity import (
    brute_force_top_k,
    lsh_bucket_top_k,
    random_hyperplane_buckets,
)
from uofi_payroll_etl_main_demo_spark.functions.text import (
    fingerprint64,
    predicted_language,
    quality_score,
    token_count,
    tokenize_ws,
    word_shingles,
)
from uofi_payroll_etl_main_demo_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    normalize_vector,
)


@pytest.fixture()
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    return spark.createDataFrame(
        [
            (0, base),
            (1, base),  # exact duplicate of 0
            (2, near),  # near duplicate of 0
            (3, "completely different words here about spark engines"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )


def test_tokenize_and_count(spark):
    df = spark.createDataFrame([("a  b\tc",), ("",), ("  ",)], "text string")
    got = df.select(
        token_count("text").alias("n"), F.size(tokenize_ws("text")).alias("s")
    ).collect()
    assert [(r["n"], r["s"]) for r in got] == [(3, 3), (0, 0), (0, 0)]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = df.select(word_shingles("text", 3).alias("s")).collect()
    assert sorted(got[0]["s"]) == ["a b c", "b c d"]
    assert got[1]["s"] == []  # shorter than k


def test_quality_score_bounds(spark, docs):
    vals = [r["q"] for r in docs.select(quality_score("text").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_predicted_language(spark):
    df = spark.createDataFrame(
        [("the cat is in the house",), ("el gato es un animal que",), ("zzz qqq",)],
        "text string",
    )
    got = [r["l"] for r in df.select(predicted_language("text").alias("l")).collect()]
    assert got == ["en", "es", "und"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("  hello world ",), ("different",)], "text string"
    )
    got = [r["f"] for r in df.select(fingerprint64("text").alias("f")).collect()]
    assert got[0] == got[1] != got[2]


def test_exact_dedup_min_survivor(docs):
    out = exact_dedup(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 2, 3, 4]  # doc 1 collapsed into doc 0


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_minhash_signature_shape_and_identity(docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, k=3).collect()}
    assert sigs[0] == sigs[1]  # identical docs -> identical signatures
    assert len(sigs[0]) == 32
    assert sigs[4] is None  # empty doc -> null signature


def test_minhash_near_dup_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(
            docs, num_hashes=32, bands=16, k=3, threshold=0.3
        ).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # near-dup candidate found and verified


def test_minhash_bucket_cap_drops_mega_buckets(docs):
    # cap of 1 drops every bucket (all useful buckets have >= 2 docs)
    none_left = minhash_near_dup_pairs(
        docs, num_hashes=32, bands=16, k=3, threshold=0.3, max_bucket_size=1
    )
    assert none_left.count() == 0


@pytest.fixture()
def skewed_corpus(spark):
    """Adversarial boilerplate skew: ~30% of the corpus is ONE repeated
    string (the classic license-header/template hot spot). Without the
    caps, the boilerplate cluster alone yields C(30,2)=435 quadratic
    candidates; with them, candidate work stays linear in corpus size.
    Two engineered near-dup docs among the uniques must survive."""
    boiler = "this document is provided as is without warranty of any kind"
    uniq = [
        f"unique text number {i} about topic {i * 7 % 13} with words "
        f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
        for i in range(68)
    ]
    near_a = "the quick brown fox jumps over the lazy dog again and again"
    near_b = "the quick brown fox jumps over the lazy cat again and again"
    rows = [(i, boiler) for i in range(30)]
    rows += [(100 + i, t) for i, t in enumerate(uniq)]
    rows += [(900, near_a), (901, near_b)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_cap_keeps_candidates_linear_under_skew(skewed_corpus):
    uncapped = minhash_near_dup_pairs(
        skewed_corpus, num_hashes=32, bands=16, k=3, threshold=0.3
    )
    # boilerplate cluster alone: C(30,2) = 435 quadratic pairs
    assert uncapped.count() >= 435
    capped = minhash_near_dup_pairs(
        skewed_corpus, num_hashes=32, bands=16, k=3, threshold=0.3,
        max_bucket_size=10,
    ).collect()
    # mega-buckets dropped -> bounded output; the engineered near-dup
    # pair (bucket size 2) survives
    assert len(capped) < 435
    assert all(r["id_a"] >= 100 for r in capped)  # no boilerplate pairs
    assert (900, 901) in {(r["id_a"], r["id_b"]) for r in capped}


def test_ngram_shingle_cap_keeps_candidates_linear_under_skew(skewed_corpus):
    capped = ngram_jaccard_pairs(
        skewed_corpus, k=3, threshold=0.3, max_shingle_freq=10
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert (900, 901) in pairs  # small-bucket near-dup retained
    assert all(a >= 100 for a, _ in pairs)  # hot shingles never pair
    assert len(pairs) < 435


def test_simhash_bucket_cap_under_skew(skewed_corpus):
    from uofi_payroll_etl_main_demo_spark.ext.dedup import (
        simhash_near_dup_pairs,
    )

    uncapped = simhash_near_dup_pairs(skewed_corpus, max_hamming=3)
    assert uncapped.count() >= 435  # identical sigs -> full clique
    capped = simhash_near_dup_pairs(
        skewed_corpus, max_hamming=3, max_bucket_size=10
    ).collect()
    assert all(r["id_a"] >= 100 for r in capped)
    assert len(capped) < 435


def test_simhash_near_dup(docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[1] and sh[4] is None
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0


def test_pretokenized_paths_match_text_paths(docs):
    """tokens_col= (the shared-tokenize path used by
    ext_dedup_method_agreement) must be value-identical to the
    text-column path for BOTH detector legs, including the zero-token
    doc's absence/null handling."""
    tok = docs.select("doc_id", tokenize_ws("text").alias("__toks"))
    for fam in ("xxhash64", "portable"):
        mh_text = sorted(
            map(
                tuple,
                minhash_near_dup_pairs(
                    docs, num_hashes=32, bands=16, k=3, threshold=0.2,
                    hash_family=fam,
                ).collect(),
            )
        )
        mh_tok = sorted(
            map(
                tuple,
                minhash_near_dup_pairs(
                    tok, num_hashes=32, bands=16, k=3, threshold=0.2,
                    hash_family=fam, tokens_col="__toks",
                ).collect(),
            )
        )
        assert mh_text == mh_tok and mh_text
        sh_text = sorted(
            map(
                tuple,
                simhash_near_dup_pairs(
                    docs, max_hamming=3, hash_family=fam
                ).collect(),
            )
        )
        sh_tok = sorted(
            map(
                tuple,
                simhash_near_dup_pairs(
                    tok, max_hamming=3, hash_family=fam, tokens_col="__toks"
                ).collect(),
            )
        )
        assert sh_text == sh_tok and sh_text
    # the simhash wrapper's zero-token restore also rides tokens_col
    sh = {
        r["doc_id"]: r["simhash"]
        for r in simhash(tok, tokens_col="__toks").collect()
    }
    assert sh[4] is None and sh[0] == sh[1]


def test_vector_functions(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [1.0, 2.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        dot_product("a", "b").alias("d"),
        cosine_similarity("a", "b").alias("c"),
        l2_norm("a").alias("n"),
    ).collect()
    assert rows[0]["d"] == 0.0 and rows[0]["c"] == 0.0
    assert rows[1]["c"] == pytest.approx(1.0)
    assert rows[1]["n"] == pytest.approx(math.sqrt(5))
    normed = df.select(normalize_vector("a").alias("u")).collect()
    assert sum(x * x for x in normed[1]["u"]) == pytest.approx(1.0)


def test_vector_unroll_edge_operands(spark):
    """The unrolled (dim=) forms must stay value-identical to the fold
    on every operand the API accepts — and fall back (never inject or
    silently NULL) on the ones the SQL encoding cannot represent:
    backticked/dotted column names, non-finite driver vectors, numpy
    arrays."""
    df = spark.createDataFrame(
        [([3.0, 4.0], ([1.0, 2.0],))],
        "a array<double>, w struct<x: array<double>>",
    )
    # dotted (nested-field) name: the unroll path would quote it as one
    # backticked identifier and fail analysis — it must fall to the
    # fold, where F.col resolves the field reference
    r = df.select(
        dot_product("a", "a", dim=2).alias("aa"),
        l2_norm("w.x", dim=2).alias("nx"),
        cosine_similarity("a", "w.x", dim=2).alias("c"),
    ).collect()[0]
    assert r["aa"] == 25.0
    assert r["nx"] == pytest.approx(math.sqrt(5))
    assert r["c"] == pytest.approx(11.0 / (5 * math.sqrt(5)))
    # non-finite driver vector: fold path preserves the IEEE value
    # (the unrolled literal encoding would reject 'inf')
    r2 = df.select(
        dot_product("a", [float("inf"), 0.0], dim=2).alias("d")
    ).collect()[0]
    assert r2["d"] == float("inf")
    # numpy query vector: accepted as a driver vector
    np = pytest.importorskip("numpy")
    r3 = df.select(
        dot_product("a", np.array([1.0, 1.0]), dim=2).alias("d")
    ).collect()[0]
    assert r3["d"] == 7.0
    # junk operand raises a clear TypeError, not an opaque HOF failure
    with pytest.raises(TypeError, match="Column, a column name"):
        df.select(dot_product("a", object()).alias("d"))


def test_brute_force_top_k_orders_by_similarity(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [-1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = [r["vec_id"] for r in brute_force_top_k(df, [1.0, 0.0], k=2).collect()]
    assert got == [0, 1]


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    exact = [r["vec_id"] for r in brute_force_top_k(emb, q, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in lsh_bucket_top_k(
            emb, q, dim=64, k=10, n_planes=4, multiprobe_hamming=2
        ).collect()
    ]
    # Synthetic embeddings are near-uniform (no cluster structure), so
    # recall ≈ fraction of buckets probed: 11/16 here. Require half.
    assert len(set(exact) & set(approx)) >= 5


def test_hyperplane_buckets_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = random_hyperplane_buckets(emb, dim=64, n_planes=8).select("vec_id", "bucket")
    b2 = random_hyperplane_buckets(emb, dim=64, n_planes=8).select("vec_id", "bucket")
    assert b1.subtract(b2).count() == 0 and b2.subtract(b1).count() == 0


def test_winnow_shared_passage_guarantee(spark):
    """Winnowing invariant: a shared run of >= k+w-1 words yields at
    least one shared fingerprint; disjoint texts share none."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        winnowed_fingerprints,
    )

    k, w = 5, 4
    shared = " ".join(f"common{i}" for i in range(k + w - 1))  # 8 words
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + shared + " delta epsilon"),
            (2, shared + " zeta eta theta iota kappa"),
            (3, " ".join(f"other{i}" for i in range(30))),
        ],
        "doc_id bigint, text string",
    )
    fps = winnowed_fingerprints(docs, k=k, w=w)
    by_doc = {
        i: {r["fp"] for r in fps.filter(f"doc_id = {i}").collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnow_short_and_empty_docs(spark):
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        winnowed_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, "just five words in here"), (2, ""), (3, "tiny")],
        "doc_id bigint, text string",
    )
    rows = winnowed_fingerprints(docs, k=5, w=4).collect()
    # doc 1 has exactly 1 shingle -> 1 fingerprint; docs 2-3 none
    assert [r["doc_id"] for r in rows] == [1]


def test_sq_rerank_recall_vs_exact(spark, sf_dir):
    """int8-quantize + rerank: with a generous candidate margin the
    two-stage result must EQUAL the exact top-k (rerank restores exact
    ordering; only candidate-set misses could diverge)."""
    from uofi_payroll_etl_main_demo_spark.ext.similarity import sq_rerank_top_k

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    exact = [r["vec_id"] for r in brute_force_top_k(emb, q, k=10).collect()]
    staged = [
        r["vec_id"]
        for r in sq_rerank_top_k(emb, q, k=10, candidates=100).collect()
    ]
    assert staged == exact
    # tight margin (candidates == k) may lose recall but never order:
    tight = [
        r["vec_id"] for r in sq_rerank_top_k(emb, q, k=10, candidates=10).collect()
    ]
    assert len(set(tight) & set(exact)) >= 7


def test_chunk_documents_windows_and_overlap(spark):
    from uofi_payroll_etl_main_demo_spark.ext.textstats import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(100))),  # 100 toks -> 2 chunks
            (2, "only three words"),  # short -> 1 partial chunk
            (3, ""),  # empty -> no rows
        ],
        "doc_id bigint, text string",
    )
    rows = chunk_documents(docs, size=64, stride=48).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_tokens"] for r in c1] == [64, 52]
    # overlap: chunk 1 starts at token 48 (0-based), i.e. "w48"
    assert c1[1]["chunk_text"].split()[0] == "w48"
    assert c1[0]["chunk_text"].split()[-1] == "w63"
    assert by_doc[2][0]["n_tokens"] == 3
    # every token of doc 1 appears in at least one chunk
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(100)}


# ------------------- portable (md5 double-hashing) family ----------------


def test_portable_minhash_matches_python_reference(spark):
    """Pin the portable family's exact values against an independent
    hashlib computation: sig[i] = min over shingles of b1 + i*b2 where
    b1/b2 are the first/second 13 hex chars of md5(shingle)."""
    import hashlib

    text = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    sig = minhash_signatures(
        docs, k=3, num_hashes=8, hash_family="portable"
    ).collect()[0]["sig"]
    toks = text.split()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    expected = []
    for i in range(8):
        vals = []
        for s in shingles:
            h = hashlib.md5(s.encode()).hexdigest()
            vals.append(int(h[:13], 16) + i * int(h[13:26], 16))
        expected.append(min(vals))
    assert list(sig) == expected


def test_portable_simhash_matches_python_reference(spark):
    """Pin the portable 64-bit simhash bit-for-bit against hashlib:
    bits 0-51 from md5 hex chars 1-13, bits 52-63 from chars 14-16."""
    import hashlib

    text = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = simhash(docs, hash_family="portable").collect()[0]["simhash"]
    balances = [0] * 64
    for t in text.split():
        h = hashlib.md5(t.encode()).hexdigest()
        h1, h2 = int(h[:13], 16), int(h[13:16], 16)
        for b in range(64):
            bit = (h1 >> b) & 1 if b < 52 else (h2 >> (b - 52)) & 1
            balances[b] += 1 if bit else -1
    expected = 0
    for b in range(64):
        if balances[b] > 0:
            expected |= 1 << b
    if expected >= 1 << 63:  # signed 64-bit wrap, as Spark's long
        expected -= 1 << 64
    assert got == expected


def test_portable_minhash_pairs_find_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(
            docs,
            num_hashes=32,
            bands=16,
            k=3,
            threshold=0.3,
            hash_family="portable",
        ).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs always band together
    assert (0, 2) in pairs  # near-dup candidate found and verified


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        unigram_surprisal,
    )

    rows = [(i, "the the the the") for i in range(9)] + [
        (100, "zyzzyva qwertyuiop")
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r.asDict() for r in unigram_surprisal(df).collect()
    }
    # corpus: 'the' x36, rare tokens x1 each, total 38
    # sb('the') = floor(log2(38//36)) = 0; sb(rare) = floor(log2(38)) = 5
    assert out[0]["surprisal_milli_bits"] == 0
    assert out[100]["surprisal_milli_bits"] == 5000
    assert out[100]["n_tokens"] == 2
    # empty docs are absent, not zero-scored
    empty = spark.createDataFrame([(1, " "), (2, "a b")], ["doc_id", "text"])
    assert [r["doc_id"] for r in unigram_surprisal(empty).collect()] == [2]


def test_semantic_dedup_drops_near_identical_vectors(spark):
    from uofi_payroll_etl_main_demo_spark.ext.clusters import dedup_survivors
    from uofi_payroll_etl_main_demo_spark.ext.similarity import all_pairs_above

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    near = [0.999] + [0.001] * (dim - 1)
    far = [0.0] * (dim - 1) + [1.0]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["vec_id", "embedding"]
    ).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    pairs = all_pairs_above(emb, dim=dim, threshold=0.95, n_planes=2)
    kept = dedup_survivors(emb, pairs, id_col="vec_id")
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 3]


def _bpe_reference(texts, n_merges, min_pair_freq=2):
    """Pure-Python Sennrich BPE: the trusted reference the Spark job is
    pinned against (same tie-break: freq desc, then lexicographic)."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), freq = top
        if freq < min_pair_freq:
            break
        merges.append((rank, a, b, a + b, freq))
        new_vocab = Counter()
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += f
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark):
    from uofi_payroll_etl_main_demo_spark.ext.bpe import bpe_merges

    texts = [
        "low lower lowest low low",
        "new newer newest new new newer",
        "the slow slower slowest slow",
        "wide wider widest wide wide",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in bpe_merges(df, n_merges=6).orderBy("rank").collect()
    ]
    want = _bpe_reference(texts, 6)
    assert got == want
    assert len(got) >= 3  # non-trivial merge chain (incl. merged symbols)
    # learned merges must include a rank-2+ merge built ON a previous
    # merge output (the recursive property that makes BPE BPE)
    prior = {m[3] for m in got}
    assert any(m[1] in prior or m[2] in prior for m in got[1:])


def test_bpe_encode_matches_reference_and_roundtrips(spark):
    from uofi_payroll_etl_main_demo_spark.ext.bpe import bpe_encode, bpe_merges

    texts = [
        "low lower lowest low low",
        "new newer newest new new newer",
        "the slow slower slowest slow",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe_merges(df, n_merges=6).orderBy("rank").collect()
    ]
    out = {
        r["doc_id"]: r for r in bpe_encode(df, merges).collect()
    }

    def ref_encode_word(w):
        ranks = {p: i for i, p in enumerate(merges)}
        sym = list(w)
        while len(sym) > 1:
            cands = [
                (ranks[(sym[i], sym[i + 1])], i)
                for i in range(len(sym) - 1)
                if (sym[i], sym[i + 1]) in ranks
            ]
            if not cands:
                break
            r, _ = min(cands)
            a, b = merges[r]
            o, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    o.append(a + b); i += 2
                else:
                    o.append(sym[i]); i += 1
            sym = o
        return sym

    for i, t in enumerate(texts):
        want = [s for w in t.lower().split() for s in ref_encode_word(w)]
        assert list(out[i]["tokens"]) == want
        assert out[i]["n_tokens"] == len(want)
        # lossless: concatenating tokens reproduces the words
        assert "".join(want) == t.lower().replace(" ", "")
    # merges actually compress: fewer tokens than characters
    assert all(
        out[i]["n_tokens"] < len(t.replace(" ", "")) for i, t in enumerate(texts)
    )


def test_incremental_simhash_new_old_only(spark):
    from uofi_payroll_etl_main_demo_spark.ext.dedup import (
        incremental_simhash_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words entirely unrelated")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(100, base + " extra"), (101, base),
         (102, base + " tiny change here")],
        ["doc_id", "text"],
    )
    got = {
        (r["new_id"], r["old_id"]): r["hamming"]
        for r in incremental_simhash_pairs(
            corpus, batch, max_hamming=3, hash_family="portable"
        ).collect()
    }
    # identical doc must match at distance 0; every pair is new x old
    assert got[(101, 1)] == 0
    assert all(n >= 100 and o < 100 for n, o in got)
    # new x new near-dups (100 vs 101) must NOT be emitted
    assert not any(n >= 100 and o >= 100 for n, o in got)


def test_dup_ngram_stats_known_overlap(spark):
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        dup_ngram_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),   # shingles {a b c, b c d}
            (2, "a b c e"),   # shingles {a b c, b c e}
            (3, "x y z w"),   # disjoint
            (4, "too short"), # < k tokens -> no row
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup_shingles"], r["dup_fraction"])
        for r in dup_ngram_stats(docs, k=3).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5), 3: (2, 0, 0.0)}
    assert 4 not in got


def test_dup_ngram_stats_clique_costs_postings_not_pairs(spark):
    # the metric must not expand pairs: a 30-copy clique yields 30 rows
    # with dup_fraction 1.0, not C(30,2) joined anything
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        dup_ngram_stats,
    )

    base = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [(i, base) for i in range(30)], ["doc_id", "text"]
    )
    out = dup_ngram_stats(docs, k=3).collect()
    assert len(out) == 30
    assert all(r["dup_fraction"] == 1.0 for r in out)


def test_boilerplate_stats_hot_vs_cold(spark):
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        boilerplate_stats,
    )

    footer = "copyright acme corp all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, "unique alpha content here " + footer),
            (2, "different beta words now " + footer),
            (3, "third gamma body text " + footer),
            (4, "totally unrelated document nothing shared"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in boilerplate_stats(docs, k=3, min_docs=3).collect()
    }
    # footer 3-grams hit all three docs; unique bodies do not
    assert got[1]["n_boilerplate"] >= 4
    assert 0 < got[1]["boilerplate_fraction"] < 1
    assert got[4]["n_boilerplate"] == 0
    assert got[4]["boilerplate_fraction"] == 0.0


def test_cms_estimate_dominates_exact(spark):
    from uofi_payroll_etl_main_demo_spark.ext.sketches import (
        heavy_hitters_report,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = heavy_hitters_report(docs, top_n=10, width=256, depth=3).collect()
    assert len(rows) == 10
    # one-sided error: the sketch can only over-count
    assert all(r["cms_count"] >= r["exact_count"] for r in rows)
    # narrow width forces visible collisions somewhere OR exact match;
    # either way a 4x wider sketch must not be less accurate
    wide = {
        r["term"]: r["cms_count"]
        for r in heavy_hitters_report(
            docs, top_n=10, width=1024, depth=3
        ).collect()
    }
    for r in rows:
        assert wide[r["term"]] <= r["cms_count"]


def test_dedup_recall_report_bounds(spark):
    from uofi_payroll_etl_main_demo_spark import queries as R

    r = R.q_dedup_recall_report(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_common"] <= min(r["n_exact"], r["n_approx"])
    # verified minhash pairs all satisfy the threshold -> precision 1.0
    assert r["precision"] == 1.0
    assert 0.0 <= r["recall"] <= 1.0


def test_bigram_surprisal_semantics(spark):
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        bigram_surprisal,
    )

    # corpus: "a b" twice, "a c" once, "z" once.
    # bigram counts: (a,b)=2, (a,c)=1; ctx(a)=3.
    # sb(a,b)=floor(log2(3//2))=0; sb(a,c)=floor(log2(3//1))=1.
    # unigram: total=7; cnt(a)=3 -> sb1=floor(log2(7//3))=1;
    # cnt(z)=1 -> sb1=floor(log2(7))=2.
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "z")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bigram_milli_bits"])
        for r in bigram_surprisal(docs).collect()
    }
    assert got[1] == (2, (1 + 0) * 1000 // 2)
    assert got[2] == (2, (1 + 0) * 1000 // 2)
    assert got[3] == (2, (1 + 1) * 1000 // 2)
    assert got[4] == (1, 2 * 1000 // 1)


def test_source_quality_panel_repartition_invariant(spark):
    """Decimal-sum discipline proof: the per-source health panel must
    be bit-identical under different shuffle widths (double sums would
    drift at the last ulp and break the oracle hash)."""
    from uofi_payroll_etl_main_demo_spark import queries as R

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, R.q_source_quality_panel(spark, sf).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = sorted(map(tuple, R.q_source_quality_panel(spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_minhash_prod_full_recall_on_fixtures(spark):
    """Pin that xxhash64-family banding achieves FULL recall on the
    driver fixtures — the property that makes the exact n-gram Jaccard
    SQL a value-exact oracle for ``ext_minhash_pairs_prod``
    (queries.py REGISTRY). If a fixture or banding change breaks this,
    fix the oracle registration together with this test.

    Covers EVERY scale factor the correctness driver can run at
    (sf0.001 / sf0.01 / sf0.1 are the generated fixture set) so a
    driver-sf change can't silently flip a benign recall drop into a
    red hash-mismatch row."""
    import os

    from uofi_payroll_etl_main_demo_spark import queries as R

    fixture_sfs = [
        d
        for d in (
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        )
        if os.path.isdir(d)
    ]
    # a missing fixture tree must FAIL, not green-light vacuously —
    # this test is the documented justification for the prod oracle
    assert fixture_sfs, "no driver fixture directories found"
    for sf in fixture_sfs:
        prod = set(
            map(tuple, R.q_minhash_pairs_prod(spark, sf).collect())
        )
        exact = set(map(tuple, R.q_ngram_jaccard(spark, sf).collect()))
        assert prod == exact, sf


# ------------------- adversarial-input hardening (round 4) ----------------

_WS_CHARS = " \t\n\r\f\x0b"


def _ref_tokenize(text):
    """Pure-Python mirror of tokenize_ws / the oracle _TOKS: split by
    the explicit portable whitespace class, drop empty elements."""
    import re

    if text is None:
        return None
    return [t for t in re.split("[" + _WS_CHARS + "]+", text) if t != ""]


def test_tokenize_ws_matches_reference_on_hostile_text(spark):
    """Differential vs the Python mirror over hostile strings: control
    characters (incl. U+000B where Java and RE2 \\s disagree), unicode
    letters, NBSP (NOT whitespace under the portable class), long runs,
    empties. Any phantom empty token or class drift fails here."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_ws

    atom = st.sampled_from(
        ["a", "bb", "é", "漢字", " ", " ", "\t", "\n", "\r\n",
         "\x0b", "\f", "!", "x" * 300, ""]
    )
    texts = st.lists(atom, min_size=0, max_size=12).map("".join)

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(texts, min_size=1, max_size=8))
    def check(batch):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "i long, text string"
        )
        got = {
            r["i"]: r["toks"]
            for r in df.select(
                "i", tokenize_ws("text").alias("toks")
            ).collect()
        }
        for i, t in enumerate(batch):
            assert got[i] == _ref_tokenize(t), repr(t)

    check()


def test_shingles_match_reference_on_hostile_text(spark):
    """shingles_from_tokens == the Python k-gram set over reference
    tokens, including short docs (< k tokens -> []) and docs whose
    only content is whitespace."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.functions.text import (
        shingles_from_tokens,
        tokenize_ws,
    )

    atom = st.sampled_from(
        ["w", "oo", "\t", "\n", " ", "\x0b", "", "q" * 50]
    )
    texts = st.lists(atom, min_size=0, max_size=10).map(" ".join)

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts)
    def check(text):
        k = 3
        df = spark.createDataFrame([(text,)], "text string")
        got = (
            df.select(tokenize_ws("text").alias("__toks"))
            .select(shingles_from_tokens(F.col("__toks"), k).alias("sh"))
            .collect()[0]["sh"]
        )
        toks = _ref_tokenize(text)
        want = list(
            dict.fromkeys(
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            )
        )
        assert got == want, repr(text)

    check()


def test_chunk_documents_hostile_properties(spark):
    """chunk_documents invariants on pathological docs: empty and
    whitespace-only docs yield NO rows; chunk_idx is dense from 0;
    every chunk has 1..size tokens; non-overlapping chunks (stride ==
    size) reconstruct the exact token stream."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_documents,
    )

    atom = st.sampled_from(["t1", "t2", "zz", "\n", "\t", " ", "\x0b"])
    texts = st.lists(atom, min_size=0, max_size=40).map(" ".join)

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts)
    def check(text):
        size, stride = 4, 4
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, size=size, stride=stride).collect(),
            key=lambda r: r["chunk_idx"],
        )
        toks = _ref_tokenize(text)
        if not toks:
            assert rows == []
            return
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert all(1 <= r["n_tokens"] <= size for r in rows)
        rebuilt = [
            t for r in rows for t in r["chunk_text"].split(" ") if t != ""
        ]
        assert rebuilt == toks, repr(text)

    check()


def test_pathological_fixture_slice_runs_everywhere(spark):
    """The registry's adversarial docs flow through the heavier text
    operators without error and with sane outputs (doc-level stats on
    the pathological slice, incl. the 5000-char megatoken)."""
    from uofi_payroll_etl_main_demo_spark import queries as R
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        document_stats,
    )

    df = spark.createDataFrame(
        R._PATHOLOGICAL_TEXTS, "doc_id long, text string"
    )
    stats = {r["doc_id"]: r for r in document_stats(df).collect()}
    assert stats[9_000_004]["n_tokens"] == 0  # empty
    assert stats[9_000_005]["n_tokens"] == 0  # whitespace-only
    assert stats[9_000_009]["n_tokens"] == 1  # megatoken
    assert stats[9_000_010]["n_tokens"] == 2000
    assert stats[9_000_006]["n_tokens"] == 3  # U+000B separated


# ------------------- round-5 additions: rewrite + vocab panel -------------


def test_chunk_dedup_rewrite_semantics(spark):
    """An exact duplicate document loses every chunk to its earlier
    twin; a unique document reconstructs to its whitespace-normalized
    text; empty docs stay empty rows with zero chunks."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
    )

    base = " ".join(f"w{i}" for i in range(80))  # 80 tokens -> 3 chunks @32
    rows = [
        (1, base),
        (2, base),            # exact dup of doc 1 -> fully removed
        (3, "unique words only here"),
        (4, ""),              # empty -> 0 chunks, '' text
        (5, "  \n\t "),       # whitespace-only -> 0 chunks
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in chunk_dedup_rewrite(df, size=32).collect()
    }
    assert len(out) == 5
    norm = " ".join(base.split())
    assert out[1]["n_chunks"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["text_clean"] == norm
    assert out[2]["n_chunks"] == 3 and out[2]["n_kept"] == 0
    assert out[2]["text_clean"] == ""
    assert out[3]["n_kept"] == 1
    assert out[3]["text_clean"] == "unique words only here"
    for d in (4, 5):
        assert out[d]["n_chunks"] == 0 and out[d]["text_clean"] == ""


def test_chunk_dedup_rewrite_keep_first_order(spark):
    """Survivorship is by (doc_id, chunk_idx): the lowest doc_id keeps
    a shared chunk regardless of input row order."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
    )

    shared = "tok " * 32
    rows = [(9, shared), (2, shared), (5, shared)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(3)
    out = {r["doc_id"]: r["n_kept"] for r in chunk_dedup_rewrite(df, size=32).collect()}
    assert out == {2: 1, 5: 0, 9: 0}


def test_vocab_panel_invariants(spark, sf_dir):
    """hapax <= vocab <= total; top-term share consistent; panel is
    shuffle-width invariant."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import vocab_panel
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_parquet_table,
    )

    docs = read_parquet_table(spark, sf_dir, "documents")
    rows = vocab_panel(docs).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hapax_count"] <= r["vocab_size"] <= r["total_tokens"]
        assert 0 < r["top_term_share"] <= 1
        assert abs(r["type_token_ratio"] - round(r["vocab_size"] / r["total_tokens"], 6)) < 1e-9
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = vocab_panel(docs).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_image_dhash_twin_invariance(spark):
    """Bytewise-different, luminance-identical twins hash identically;
    every (2g, 2g+1) twin pair appears at hamming 0 in the banded
    pair output (perceptual-dedup contract of image_dhash +
    hamming_pairs_64)."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=16)
    # twins carry different bytes
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert payloads[0] != payloads[1]
    sigs = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    for g in range(8):
        assert sigs[2 * g] == sigs[2 * g + 1]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs_64(
            image_dhash(media), "media_id", "dhash", max_hamming=3
        ).collect()
    }
    for g in range(8):
        assert pairs[(2 * g, 2 * g + 1)] == 0


def test_image_dhash_smaller_than_grid_matches_nan_law(spark):
    """Images SMALLER than the 8×9 grid must hash, not crash (the
    reduceat offsets clamp exactly), and every bit touching an empty
    block is False — the old NaN-mean semantics. Oracle: the per-block
    float loop, recomputed in-test."""
    import numpy as np

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        ppm_bytes,
    )

    rng = np.random.RandomState(7)
    geoms = [(4, 9), (8, 5), (3, 4), (1, 1), (16, 18)]
    pixels = [
        rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for h, w in geoms
    ]
    rows = [(i, ppm_bytes(px)) for i, px in enumerate(pixels)]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}

    def oracle(px):
        gray = px.astype(np.float64).mean(axis=2)
        rb = np.array_split(np.arange(gray.shape[0]), 8)
        cb = np.array_split(np.arange(gray.shape[1]), 9)
        with np.errstate(invalid="ignore"):
            m = np.array(
                [
                    [
                        gray[np.ix_(rr, cc)].mean() if len(rr) and len(cc)
                        else np.nan
                        for cc in cb
                    ]
                    for rr in rb
                ]
            )
        hv = 0
        for r in range(8):
            for c in range(8):
                a, b = m[r, c], m[r, c + 1]
                if not np.isnan(a) and not np.isnan(b) and b > a:
                    hv |= 1 << (r * 8 + c)
        return hv - (1 << 64) if hv >= 1 << 63 else hv

    for i, px in enumerate(pixels):
        assert got[i] == oracle(px), (i, geoms[i])
    # an over-64-bit grid refuses loudly instead of aliasing bits
    import pytest as _pytest

    with _pytest.raises(ValueError, match="64"):
        image_dhash(media, grid_rows=16)


def test_image_whash_invariances(spark):
    """The WHT hash's contracts: (a) channel-sum-identical twins hash
    identically; (b) GLOBAL BRIGHTNESS SCALING is invariant (every
    coefficient and the median scale together) — the case that
    distinguishes it from a mean-threshold hash; (c) structural edits
    flip bits; (d) undersized images hit the loud/quarantine paths."""
    import numpy as np
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        _gradient_pixels,
        image_whash,
        ppm_bytes,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=8)
    sigs = {r["media_id"]: r["whash"] for r in image_whash(media).collect()}
    for g in range(4):
        assert sigs[2 * g] == sigs[2 * g + 1]
    assert len(set(sigs.values())) > 1

    base = (_gradient_pixels(0, 18, 16) % 100).astype(np.uint8)
    doubled = (base.astype(np.int64) * 2).astype(np.uint8)
    edited = base.copy()
    edited[4:12, 4:12] = 255  # structural edit
    meta = {"modality": "image", "mime": "image/x-portable-pixmap",
            "width": 18, "height": 16, "duration_ms": None,
            "sample_rate": None}
    df = spark.createDataFrame(
        [
            (0, ppm_bytes(base), meta),
            (1, ppm_bytes(doubled), meta),
            (2, ppm_bytes(edited), meta),
        ],
        MEDIA_SCHEMA,
    )
    s = {r["media_id"]: r["whash"] for r in image_whash(df).collect()}
    assert s[0] == s[1]  # brightness-scale invariant
    assert s[0] != s[2]  # structural edit moves coefficients

    tiny = spark.createDataFrame(
        [(9, ppm_bytes(np.zeros((4, 4, 3), dtype=np.uint8)), meta)],
        MEDIA_SCHEMA,
    )
    with _pytest.raises(Exception):
        image_whash(tiny).collect()  # smaller than 8x8, on_error=raise
    assert image_whash(tiny, on_error="skip").count() == 0
    with _pytest.raises(ValueError):
        image_whash(df, on_error="maybe")


def test_audio_spectral_hash_gain_invariance(spark):
    """The spectral hash's contract: polarity AND positive gain leave
    the dominant-sequency sequence unchanged (|a·Y| keeps its argmax)
    while a structural edit moves it; plus the Hadamard closed form
    ``H[u][t] = (-1)^popcount(u&t)`` the SQL oracle builds from, and
    the guard rails."""
    import numpy as np

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        _hadamard,
        audio_spectral_hash,
        wav_bytes_pcm16,
    )

    H = _hadamard(64)
    u, t = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    pop = np.vectorize(lambda a: bin(a).count("1"))(u & t)
    assert (H == np.where(pop % 2 == 0, 1, -1)).all()

    j = np.arange(64 * 8, dtype=np.int64)
    base = ((j * j * 17 + j * 5) % 401) - 200
    edited = base.copy()
    edited[100:140] = 1999  # structural edit in window 1/2
    meta = {"modality": "audio", "mime": "audio/wav", "width": None,
            "height": None, "duration_ms": 64, "sample_rate": 8000}
    df = spark.createDataFrame(
        [
            (0, wav_bytes_pcm16(base, 8000), meta),
            (1, wav_bytes_pcm16(base * 16, 8000), meta),
            (2, wav_bytes_pcm16(-base, 8000), meta),
            (3, wav_bytes_pcm16(edited, 8000), meta),
        ],
        MEDIA_SCHEMA,
    )
    s = {r["media_id"]: r["shash"]
         for r in audio_spectral_hash(df, window_samples=64).collect()}
    assert s[0] == s[1] == s[2]  # gain + polarity invariant
    assert s[0] != s[3]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        audio_spectral_hash(df, window_samples=48)  # not a power of two
    with _pytest.raises(ValueError):
        audio_spectral_hash(df, on_error="maybe")
    short = spark.createDataFrame(
        [(9, wav_bytes_pcm16(base[:64], 8000), meta)], MEDIA_SCHEMA
    )
    assert audio_spectral_hash(short, on_error="skip").count() == 0


def test_video_keyframes_scene_starts(spark):
    """Keyframes over the scene fixture are exactly the scene starts
    (first frame NULL-hamming, boundaries >= threshold); a corrupt
    mid-scene frame quarantines under skip without inventing a
    keyframe (the lag compares across the gap — within a scene the
    distance over the gap is still 0)."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        synthetic_scene_videos,
        video_keyframes,
    )

    frames = synthetic_scene_videos(spark, n_videos=4)
    kf = video_keyframes(frames, min_hamming=8).collect()
    got = {(r["video_id"], r["frame_idx"]): r["hamming_prev"] for r in kf}
    assert set(got) == {(v, f) for v in range(4) for f in (0, 4, 8, 12)}
    for (v, f), h in got.items():
        assert (h is None) == (f == 0)
        if h is not None:
            assert h >= 22  # measured boundary band

    # corrupt one MID-SCENE frame (video 0, frame 5): it quarantines,
    # and frame 6 compares to frame 4 (same scene, distance 0) — no
    # phantom keyframe appears, none disappears
    corrupted = frames.withColumn(
        "payload",
        F.when(
            (F.col("video_id") == 0) & (F.col("frame_idx") == 5),
            F.lit(b"P6 garbage"),
        ).otherwise(F.col("payload")),
    )
    kf2 = video_keyframes(corrupted, min_hamming=8, on_error="skip")
    got2 = {
        (r["video_id"], r["frame_idx"]) for r in kf2.collect()
    }
    assert got2 == set(got)
    with pytest.raises(Exception):
        video_keyframes(corrupted, min_hamming=8).collect()


def test_audio_energy_hash_polarity_invariance(spark):
    """Polarity-inverted twins (different bytes) hash identically and
    pair at hamming 0; the fingerprint is non-degenerate (patterns
    differ across groups)."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import hamming_pairs_64
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_energy_hash,
        synthetic_patterned_audio,
    )

    media = synthetic_patterned_audio(spark, n=12)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert payloads[0] != payloads[1]
    sigs = {r["media_id"]: r["ehash"] for r in audio_energy_hash(media).collect()}
    for g in range(6):
        assert sigs[2 * g] == sigs[2 * g + 1]
    assert len(set(sigs.values())) > 1
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs_64(
            audio_energy_hash(media), "media_id", "ehash", max_hamming=3
        ).collect()
    }
    for g in range(6):
        assert pairs[(2 * g, 2 * g + 1)] == 0


def test_mulaw_codec_exactness():
    """G.711 mu-law codec pins (no Spark): codeword roundtrip (0x7F is
    the standard negative-zero alias of 0xFF), the public ±32124 /
    zero extremes, full-int16-range quantization-error bound, sign
    symmetry, exact container decode, and dispatcher routing."""
    import numpy as np
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        decode_audio,
        decode_wav_mulaw,
        mulaw_compress,
        mulaw_expand,
        mulaw_wav_bytes,
        wav_bytes_pcm16,
    )

    b = np.arange(256, dtype=np.uint8)
    rt = mulaw_compress(mulaw_expand(b))
    # every codeword survives except negative zero, which canonicalizes
    # to positive zero (both decode to 0 — the G.711 alias)
    assert (rt[b != 0x7F] == b[b != 0x7F]).all()
    assert rt[0x7F] == 0xFF and mulaw_expand([0x7F])[0] == 0
    assert mulaw_expand(mulaw_compress([32767]))[0] == 32124
    assert mulaw_expand(mulaw_compress([-32768]))[0] == -32124
    assert mulaw_expand(mulaw_compress([0]))[0] == 0
    assert len(np.unique(mulaw_expand(b))) == 255

    k = np.arange(-32768, 32768, dtype=np.int64)
    y = mulaw_expand(mulaw_compress(k))
    x0 = np.abs(np.clip(k, -32635, 32635)) + 132
    step = 8 * (1 << (np.frexp(x0.astype(np.float64))[1] - 8))
    assert (np.abs(y - np.clip(k, -32635, 32635)) <= step).all()
    km = np.arange(0, 32636, dtype=np.int64)
    assert (
        mulaw_expand(mulaw_compress(-km)) == -mulaw_expand(mulaw_compress(km))
    ).all()

    pcm = ((np.arange(800, dtype=np.int64) ** 2 * 17 + 31) % 401) - 200
    wav = mulaw_wav_bytes(pcm, 8000)
    x, sr = decode_wav_mulaw(wav)
    assert sr == 8000
    assert (np.rint(x * 32767.0).astype(np.int64)
            == mulaw_expand(mulaw_compress(pcm))).all()
    xd, _ = decode_audio(wav)
    assert (xd == x).all()
    xp, _ = decode_audio(wav_bytes_pcm16(pcm, 8000))
    assert (np.rint(xp * 32767.0).astype(np.int64) == pcm).all()
    with _pytest.raises(ValueError):
        decode_audio(b"not a wav at all")
    # unsupported format code (e.g. 3 = IEEE float) raises the stub
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", 0)
    with _pytest.raises(NotImplementedError):
        decode_audio(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_alaw_codec_exactness():
    """G.711 A-law codec pins (no Spark): full 256-codeword roundtrip
    (A-law has NO negative-zero alias — 0x55/0xD5 decode to -8/+8, so
    all 256 decoded values are distinct and zero is never produced),
    the public ±32256 extremes, per-segment quantization-error bound
    over the full int16 range, the documented sign ASYMMETRY
    (``-m - 1`` folding), exact container decode, and dispatcher
    routing of format code 6."""
    import numpy as np

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        alaw_compress,
        alaw_expand,
        alaw_wav_bytes,
        decode_audio,
        decode_wav_alaw,
    )

    b = np.arange(256, dtype=np.uint8)
    assert (alaw_compress(alaw_expand(b)) == b).all()
    dec = alaw_expand(b)
    assert len(np.unique(dec)) == 256 and (dec != 0).all()
    assert np.abs(dec).min() == 8
    assert alaw_expand(alaw_compress([32767]))[0] == 32256
    assert alaw_expand(alaw_compress([-32768]))[0] == -32256
    assert alaw_expand(alaw_compress([0]))[0] == 8  # +0 quantizes up

    k = np.arange(-32768, 32768, dtype=np.int64)
    y = alaw_expand(alaw_compress(k))
    m = k >> 3
    v = np.where(m >= 0, m, -m - 1)
    aend = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])
    seg = np.minimum(np.searchsorted(aend, v, side="left"), 7)
    step = np.where(seg == 0, 16, 16 << seg)
    assert (np.abs(y - k) <= step).all()
    # sign asymmetry: k and -k decode to magnitudes differing only at
    # multiples of 8 (the -m-1 fold), by at most one quantization step
    km = np.arange(1, 32636, dtype=np.int64)
    yp = alaw_expand(alaw_compress(km))
    yn = alaw_expand(alaw_compress(-km))
    off8 = km[(yp != -yn)]
    assert (off8 % 8 == 0).all() and len(off8) > 0

    pcm = ((np.arange(800, dtype=np.int64) ** 2 * 17 + 31) % 401) - 200
    wav = alaw_wav_bytes(pcm, 8000)
    x, sr = decode_wav_alaw(wav)
    assert sr == 8000
    assert (np.rint(x * 32767.0).astype(np.int64)
            == alaw_expand(alaw_compress(pcm))).all()
    xd, _ = decode_audio(wav)
    assert (xd == x).all()


def _adpcm_scalar_reference(pcm, spb=25):
    """Independent row-at-a-time IMA ADPCM round trip — a direct port
    of the spec pseudocode (encoder feeding its own reconstruction),
    for differential-testing the vectorized implementation."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
    )

    out = []
    for b in range(0, len(pcm), spb):
        block = pcm[b : b + spb]
        pred, idx = int(block[0]), 0
        out.append(pred)
        for s in block[1:]:
            step = _IMA_STEP_TABLE[idx]
            delta = int(s) - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib]))
            out.append(pred)
    return out


def test_adpcm_codec_exactness():
    """IMA ADPCM codec pins (no Spark): vectorized encode+decode vs an
    independent scalar spec port over hostile signals (white noise,
    steps, clipping ramps), container round trip, header fidelity
    (decoder honors the stored step index), dispatcher routing of
    format code 17, and the loud failure paths."""
    import numpy as np
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        adpcm_decode_blocks,
        adpcm_encode_blocks,
        adpcm_wav_bytes,
        decode_audio,
        decode_wav_adpcm,
    )

    rng_like = (np.arange(2000, dtype=np.int64) ** 3 * 2654435761) % 65536 - 32768
    signals = [
        ((np.arange(1000, dtype=np.int64) ** 2 * 17) % 401) - 200,  # noise
        np.repeat([0, 30000, -30000, 5], 250).astype(np.int64),  # steps
        np.clip(np.arange(1000, dtype=np.int64) * 70 - 33000, -32768, 32767),
        rng_like[:2000],  # full-range noise exercises the clamps
    ]
    for sig in signals:
        preds, nibs = adpcm_encode_blocks(sig, 25)
        y = adpcm_decode_blocks(preds, np.zeros(len(preds)), nibs)
        assert list(y) == _adpcm_scalar_reference(sig, 25)

    pcm = signals[3]
    wav = adpcm_wav_bytes(pcm, 8000)
    x, sr = decode_wav_adpcm(wav)
    assert sr == 8000
    preds, nibs = adpcm_encode_blocks(pcm, 25)
    assert (np.rint(x * 32767.0).astype(np.int64)
            == adpcm_decode_blocks(preds, np.zeros(len(preds)), nibs)).all()
    xd, _ = decode_audio(wav)
    assert (xd == x).all()
    # 4:1-ish compression: 16 bytes per 25 samples vs 50 bytes PCM16
    n_data = len(pcm) // 25 * 16
    assert n_data * 3 < len(pcm) * 2

    # the decoder honors the header's step index (not an assumed 0)
    import struct

    hacked = bytearray(wav)
    data_at = wav.index(b"data") + 8
    hacked[data_at + 2] = 40  # first block's step index
    y2 = np.rint(decode_wav_adpcm(bytes(hacked))[0] * 32767.0).astype(np.int64)
    y1 = np.rint(x * 32767.0).astype(np.int64)
    assert (y2[:25] != y1[:25]).any() and (y2[25:] == y1[25:]).all()

    with _pytest.raises(ValueError):
        adpcm_encode_blocks(np.arange(26), 25)  # not block-aligned
    with _pytest.raises(ValueError):
        decode_wav_adpcm(wav[:-3])  # truncated mid-block


def test_adpcm_vectorized_equals_scalar_reference_fuzz():
    """Hypothesis fuzz: the block-vectorized ADPCM round trip equals
    the scalar spec port on arbitrary int16 signals (clamps, step
    extremes, every index-table branch)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        adpcm_decode_blocks,
        adpcm_encode_blocks,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=25,
            max_size=200,
        ).map(lambda xs: xs[: len(xs) - len(xs) % 25])
    )
    def check(sig):
        sig = np.asarray(sig, dtype=np.int64)
        preds, nibs = adpcm_encode_blocks(sig, 25)
        y = adpcm_decode_blocks(preds, np.zeros(len(preds)), nibs)
        assert list(y) == _adpcm_scalar_reference(sig, 25)

    check()


def test_cdc_spans_invariants_fuzz():
    """Hypothesis fuzz of the CDC law: spans always tile the text, and
    an edit at position i never moves a boundary that lies more than a
    window before it (locality — the property shift-robust chunking
    is FOR)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.ext.cdc import cdc_chunk_spans

    @settings(max_examples=60, deadline=None)
    @given(st.text(min_size=0, max_size=400), st.data())
    def check(text, data):
        spans = cdc_chunk_spans(text)
        at = 0
        for s, ln in spans:
            assert s == at and ln >= 1
            at += ln
        assert at == len(text)
        if len(text) > 10:
            i = data.draw(st.integers(0, len(text) - 1))
            c = data.draw(st.characters())
            edited = text[:i] + c + text[i + 1 :]
            before = {s for s in cdc_chunk_spans(text) if s[0] + s[1] <= i - 7}
            before_e = {
                s for s in cdc_chunk_spans(edited) if s[0] + s[1] <= i - 7
            }
            assert before == before_e

    check()


def test_mulaw_audio_pipeline_differential(spark):
    """mu-law clips ride the SAME energy-hash path as PCM: polarity
    twins still collapse after lossy quantization, and every hash
    matches an independent pure-Python mirror built from the
    seg-threshold (searchsorted) formulation of g711.c — a different
    formulation than the frexp encoder, so the two laws can't share a
    bug."""
    import numpy as np

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_energy_hash,
        synthetic_patterned_audio,
    )

    media = synthetic_patterned_audio(spark, n=12, codec="mulaw")
    sigs = {r["media_id"]: r["ehash"] for r in audio_energy_hash(media).collect()}
    seg_end = np.array([255, 511, 1023, 2047, 4095, 8191, 16383, 32767])
    for i in range(12):
        g = i // 2
        j = np.arange(64 * 50, dtype=np.int64)
        k = ((g * 31 + j * j * 17 + (j // 50) * 29) % 401) - 200
        if i % 2 == 1:
            k = -k
        x0 = np.minimum(np.abs(k), 32635) + 132
        exp = np.searchsorted(seg_end, x0)  # first seg_end >= x0
        p2 = 1 << exp
        y = np.where(k < 0, -1, 1) * (
            ((x0 // (8 * p2)) % 16 * 8 + 132) * p2 - 132
        )
        e = (y[: 64 * 50] ** 2).reshape(64, 50).sum(axis=1)
        hv = 0
        for w in range(63):
            if e[w + 1] > e[w]:
                hv |= 1 << w
        assert sigs[i] == hv, i
    for g in range(6):
        assert sigs[2 * g] == sigs[2 * g + 1]
    assert len(set(sigs.values())) > 1


def test_media_hash_on_error_quarantine(spark):
    """Corrupt payloads: on_error='skip' drops the row (job survives),
    default 'raise' surfaces the failure, bad mode rejected."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        audio_energy_hash,
        image_dhash,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=4)
    corrupt = spark.createDataFrame(
        [(99, b"P6\n18 16\n255\ntruncated", None)], media.schema
    )
    both = media.unionByName(corrupt)
    ok = image_dhash(both, on_error="skip").collect()
    assert sorted(r["media_id"] for r in ok) == [0, 1, 2, 3]
    with _pytest.raises(Exception):
        image_dhash(both, on_error="raise").collect()
    with _pytest.raises(ValueError):
        image_dhash(both, on_error="quarantine")
    with _pytest.raises(ValueError):
        audio_energy_hash(both, on_error="bogus")


def test_video_near_dup_pairs_twins_and_threshold(spark):
    """Re-encode twin videos match on every frame (fraction 1.0);
    unrelated videos don't pair; threshold filters partial matches."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        synthetic_video_frame_images,
        video_near_dup_pairs,
    )

    frames = synthetic_video_frame_images(spark, n_videos=8, frames=8)
    pairs = {
        (r["vid_a"], r["vid_b"]): r["match_fraction"]
        for r in video_near_dup_pairs(
            frames, n_frames=8, min_match_fraction=0.5
        ).collect()
    }
    for g in range(4):
        assert pairs[(2 * g, 2 * g + 1)] == 1.0
    # every surviving pair satisfies the threshold
    assert all(v >= 0.5 for v in pairs.values())


def test_png_roundtrip_every_filter_and_color_type():
    """decode_png is LOSSLESS for every scanline filter (0-4) and
    handles gray (replicated) and RGBA (alpha dropped) streams."""
    import struct
    import zlib

    import numpy as np

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        decode_png,
        png_bytes,
    )

    h, w = 16, 18
    r = np.arange(h).reshape(-1, 1)
    c = np.arange(w).reshape(1, -1)
    px = np.stack(
        [(r * 7 + c * 13) % 256, (r * 3 + c * c) % 256, (r + c * 31) % 256],
        axis=2,
    ).astype(np.uint8)
    for ft in (0, 1, 2, 3, 4, "cycle"):
        out = decode_png(png_bytes(px, filter_type=ft))
        assert out.shape == (h, w, 3)
        assert (out == px).all(), f"filter {ft} not lossless"

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # grayscale (color type 0): replicated onto 3 channels
    gray = ((r * 5 + c * 11) % 256).astype(np.uint8)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    payload = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()
    # RGBA (color type 6): alpha dropped
    rgba = np.dstack([px, ((r + c) % 256).astype(np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    payload = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == px).all()


def test_png_roundtrip_property():
    """Hypothesis: ANY uint8 image round-trips losslessly through
    png_bytes → decode_png under every filter type and arbitrary
    (h, w) — the decoder's unfiltering recurrences are exercised on
    adversarial pixel content, not just the fixture law."""
    import numpy as np
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        decode_png,
        png_bytes,
    )

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
        ft=st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
    )
    def roundtrip(h, w, seed, ft):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_png(png_bytes(px, filter_type=ft)) == px).all()

    roundtrip()


def test_png_corruption_is_loud():
    """Truncation at any layer and CRC damage raise (so on_error='skip'
    can quarantine); unsupported variants are principled stubs."""
    import numpy as np
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        decode_png,
        png_bytes,
    )

    px = (np.arange(16 * 18 * 3).reshape(16, 18, 3) % 256).astype(np.uint8)
    good = png_bytes(px)
    for bad in (good[:20], good[: len(good) // 2], good[:-6]):
        with _pytest.raises(Exception):
            decode_png(bad)
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # damage IDAT body → CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))
    with _pytest.raises(NotImplementedError):
        decode_png(b"\xff\xd8\xff\xe0 not a png")


def test_bmp_roundtrip_and_dispatch(spark):
    """BMP: lossless roundtrip (incl. the 4-byte row-padding widths),
    top-down negative-height decode, loud truncation, and the same
    dHash as the PPM twin through the decode_image dispatch."""
    import struct

    import numpy as np
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        bmp_bytes,
        decode_bmp,
        image_dhash,
        ppm_bytes,
        synthetic_gradient_images,
    )

    for w in (5, 6, 7, 8):  # every padding remainder
        r = np.arange(16).reshape(-1, 1)
        c = np.arange(w).reshape(1, -1)
        px = np.stack(
            [(r * 7 + c) % 256, (r + c * 13) % 256, (r * 3 + c * 5) % 256],
            axis=2,
        ).astype(np.uint8)
        assert (decode_bmp(bmp_bytes(px)) == px).all(), w
    # top-down variant: flip the height sign and the row order
    good = bytearray(bmp_bytes(px))
    h = struct.unpack_from("<i", good, 22)[0]
    struct.pack_into("<i", good, 22, -h)
    off = struct.unpack_from("<I", good, 10)[0]
    stride = (px.shape[1] * 3 + 3) // 4 * 4
    body = bytes(good[off:])
    flipped = b"".join(
        body[r * stride : (r + 1) * stride]
        for r in range(h - 1, -1, -1)
    )
    assert (decode_bmp(bytes(good[:off]) + flipped) == px).all()
    with _pytest.raises(ValueError):
        decode_bmp(bmp_bytes(px)[:-10])
    # dispatch parity: BMP payload hashes identically to the PPM twin
    media = synthetic_gradient_images(spark, n=4)
    import pyspark.sql.functions as _F  # noqa: N811

    def reencode(payload):
        from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
            decode_ppm,
        )

        return bmp_bytes(decode_ppm(bytes(payload)))

    rows = [(r["media_id"], reencode(r["payload"])) for r in media.collect()]
    bmp_media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    h_ppm = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    h_bmp = {r["media_id"]: r["dhash"] for r in image_dhash(bmp_media).collect()}
    assert h_ppm == h_bmp


def test_png_dhash_equals_ppm_dhash(spark):
    """PNG decode is lossless ⇒ the dHash of every PNG-encoded image
    equals its PPM twin's bit-for-bit — and a truncated PNG quarantines
    through the same on_error path as corrupt PPM."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images,
        synthetic_gradient_images_png,
    )

    ppm = synthetic_gradient_images(spark, n=12)
    png = synthetic_gradient_images_png(spark, n=12)
    h_ppm = {r["media_id"]: r["dhash"] for r in image_dhash(ppm).collect()}
    h_png = {r["media_id"]: r["dhash"] for r in image_dhash(png).collect()}
    assert h_ppm == h_png
    truncated = png.withColumn(
        "payload",
        F.when(F.col("media_id") == 0, F.expr("substring(payload, 1, 30)"))
        .otherwise(F.col("payload")),
    )
    kept = image_dhash(truncated, on_error="skip").collect()
    assert sorted(r["media_id"] for r in kept) == list(range(1, 12))


def test_media_null_payload_contract(spark):
    """NULL payloads: 'raise' fails LOUD (a null row must not silently
    vanish from the loud mode); 'skip' quarantines them like corrupt
    bytes — distinguishable via the anti-join quarantine pattern."""
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        image_resize_blockmean,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=4)
    nullrow = spark.createDataFrame([(99, None, None)], media.schema)
    both = media.unionByName(nullrow)
    ok = image_dhash(both, on_error="skip").collect()
    assert sorted(r["media_id"] for r in ok) == [0, 1, 2, 3]
    with _pytest.raises(Exception):
        image_dhash(both, on_error="raise").collect()
    with _pytest.raises(Exception):
        image_resize_blockmean(both, 4, 4, on_error="raise").collect()


def test_video_near_dup_decoded_denominator(spark):
    """match_fraction divides by frames ACTUALLY decoded: corrupt a
    frame of video 1 under on_error='skip' and the twin pair (0,1)
    keeps fraction n_match/greatest(n_a, n_b) = 7/8 — never >1.0, and
    the lost frame visibly lowers the score instead of being masked.
    The declared-count path (n_frames=) is a loud validation: it must
    fail when a video decodes fewer frames than declared. The
    frame_idx packing assert must be LIVE (not pruned away)."""
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        synthetic_video_frame_images,
        video_near_dup_pairs,
    )

    frames = synthetic_video_frame_images(spark, n_videos=4, frames=8)
    corrupt_one = frames.withColumn(
        "payload",
        F.when(
            (F.col("video_id") == 1) & (F.col("frame_idx") == 3),
            F.lit(b"P6\nbad"),
        ).otherwise(F.col("payload")),
    )
    pairs = {
        (r["vid_a"], r["vid_b"]): (r["n_match"], r["match_fraction"])
        for r in video_near_dup_pairs(
            corrupt_one, min_match_fraction=0.5, on_error="skip"
        ).collect()
    }
    assert pairs[(0, 1)] == (7, 0.875)  # 7 matches / max(8, 7) frames
    assert pairs[(2, 3)] == (8, 1.0)
    # declared-count validation fails loud on the short video
    with _pytest.raises(Exception):
        video_near_dup_pairs(
            corrupt_one, n_frames=8, min_match_fraction=0.5, on_error="skip"
        ).collect()
    # packing assert is live: an out-of-range frame_idx fails the job
    oob = frames.withColumn(
        "frame_idx",
        F.when(F.col("frame_idx") == 0, F.lit(2_000_000)).otherwise(
            F.col("frame_idx")
        ),
    )
    with _pytest.raises(Exception):
        video_near_dup_pairs(oob, min_match_fraction=0.5).collect()


def test_distributed_render_twins_and_distinct_patterns(spark):
    """Executor-side renderer: odd twins hash identical to their even
    neighbor; distinct pattern groups produce distinct hashes (no
    small-period recurrence across the probe range)."""
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        render_gradient_images_distributed,
    )

    media = render_gradient_images_distributed(spark, 40)
    sigs = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    assert len(sigs) == 40
    for g in range(20):
        assert sigs[2 * g] == sigs[2 * g + 1]
    # cross-pattern DISTINCTNESS is the probe's entropy guarantee — a
    # low-entropy pixel-law regression (the 0-rows-at-32x incident in
    # BASELINE.md) must fail here, not in the probe
    assert len(set(sigs.values())) == 20


def test_incremental_hamming_new_old_only(spark):
    """Incremental media CDC: every batch twin reports its corpus base
    at hamming 0; output contains ONLY new×old pairs (no old-old,
    no new-new)."""
    from uofi_payroll_etl_main_demo_spark.ext.dedup import (
        incremental_hamming_pairs_64,
    )
    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        image_dhash,
        synthetic_gradient_images,
    )

    sigs = image_dhash(synthetic_gradient_images(spark, n=16))
    corpus = sigs.filter(F.col("media_id") % 2 == 0)
    batch = sigs.filter(F.col("media_id") % 2 == 1)
    rows = incremental_hamming_pairs_64(
        corpus, batch, "media_id", "dhash", max_hamming=3
    ).collect()
    got = {(r["new_id"], r["old_id"]): r["hamming"] for r in rows}
    for g in range(8):
        assert got[(2 * g + 1, 2 * g)] == 0
    assert all(n % 2 == 1 and o % 2 == 0 for n, o in got)


def test_hashed_bow_embedding_properties(spark):
    """Hashed BOW embeddings: unit norm, dim-16, null on empty, and
    equal for permuted token order (bag semantics)."""
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        hashed_bow_buckets,
        hashed_bow_embedding_from_buckets,
    )

    df = spark.createDataFrame(
        [(0, "alpha beta gamma alpha"), (1, "gamma alpha alpha beta"),
         (2, ""), (3, "solo")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id",
            hashed_bow_embedding_from_buckets(
                hashed_bow_buckets("text")
            ).alias("v"),
        ).collect()
    }
    assert rows[2] is None
    assert rows[0] == rows[1]  # bag-of-words: order-invariant
    for d in (0, 1, 3):
        v = rows[d]
        assert len(v) == 16
        assert abs(sum(x * x for x in v) - 1.0) < 1e-12  # unit norm


def test_image_resize_blockmean_roundtrip(spark):
    """Resize: output payloads are decodable PPMs at the target dims;
    values equal the numpy block-mean mirror; resized images feed
    image_dhash unchanged."""
    import numpy as np

    from uofi_payroll_etl_main_demo_spark.ext.multimodal import (
        decode_ppm,
        image_dhash,
        image_resize_blockmean,
        synthetic_gradient_images,
    )

    media = synthetic_gradient_images(spark, n=4)
    originals = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    out = {
        r["media_id"]: r
        for r in image_resize_blockmean(media, 9, 8).collect()
    }
    assert len(out) == 4
    for mid, r in out.items():
        px = decode_ppm(bytes(r["payload"]))
        assert px.shape == (8, 9, 3)
        # mirror: block-mean + round-half-up of the original
        full = decode_ppm(originals[mid]).astype(np.float64)
        rb = np.array_split(np.arange(full.shape[0]), 8)
        cb = np.array_split(np.arange(full.shape[1]), 9)
        for rr in range(8):
            for cc in range(9):
                m = full[np.ix_(rb[rr], cb[cc])].mean(axis=(0, 1))
                exp = np.floor(m + 0.5).astype(np.uint8)
                assert (px[rr, cc] == exp).all()
    # downstream compatibility
    hashed = image_dhash(
        image_resize_blockmean(media, 9, 8).select("media_id", "payload")
    )
    assert hashed.count() == 4


def test_chunk_dedup_rewrite_shuffle_width_invariant(spark, sf_dir):
    """The rewrite output (including reassembled text) is identical
    under different shuffle widths — keep-first is (doc_id, chunk_idx)
    ordered, never partition-ordered."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
    )
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_parquet_table,
    )

    docs = read_parquet_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, chunk_dedup_rewrite(docs, size=32).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = sorted(map(tuple, chunk_dedup_rewrite(docs, size=32).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_chunk_dedup_rewrite_hash_window_is_narrow(spark, sf_dir):
    """The global keep-first window shuffles KEYS ONLY: the
    hashpartitioning(__h) exchange must not carry chunk_text (a
    multi-KB column through the skew-prone exchange) — text flows
    through exactly one id-partitioned reassembly exchange."""
    import re

    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
    )
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_parquet_table,
    )
    from uofi_payroll_etl_main_demo_spark.plans.inspect import formatted_plan

    docs = read_parquet_table(spark, sf_dir, "documents")
    plan = formatted_plan(chunk_dedup_rewrite(docs, size=32))
    window_exchanges = [
        m for m in re.finditer(
            r"Exchange\n(?:.*\n)*?Arguments: hashpartitioning\(__h", plan
        )
    ]
    assert window_exchanges, "expected a __h-partitioned exchange"
    for m in window_exchanges:
        seg = plan[m.start() : m.end() + 200]
        inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", seg)
        assert inp and "chunk_text" not in inp.group(1), seg[:300]


def test_chunk_dedup_rewrite_byte_cap_quarantine(spark):
    """max_chunk_bytes: a multi-MB single-line (single-token) document
    is QUARANTINED — excluded from the output before any wide stage —
    while every clean document's rewrite is byte-identical to the
    uncapped run; default (None) keeps the hostile doc."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
    )

    hostile = "x" * 2_000_000  # one 2 MB token: unsplittable chunk
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta " * 20),
            (2, "alpha beta gamma delta " * 20),  # full dup of 1
            (3, hostile),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    capped = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_clean"])
        for r in chunk_dedup_rewrite(df, max_chunk_bytes=65536).collect()
    }
    assert set(capped) == {1, 2, 4}  # doc 3 quarantined
    uncapped = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_clean"])
        for r in chunk_dedup_rewrite(df).collect()
    }
    assert set(uncapped) == {1, 2, 3, 4}
    assert uncapped[3][2] == hostile  # default preserves the hostile doc
    for d in (1, 2, 4):
        assert capped[d] == uncapped[d]
    # dedup intact: doc 2 (full dup of doc 1) keeps nothing; doc 1's
    # middle chunk is an intra-doc dup of its first (period-4 text), so
    # 2 of 3 chunks survive
    assert capped[2] == (3, 0, "")
    assert capped[1][0] == 3 and capped[1][1] == 2


def test_rewrite_valve_and_report_agree(spark, sf_dir):
    """The byte-cap valve and the quarantine report share one guard
    expression — the ids the report flags at cap X are EXACTLY the ids
    the capped rewrite excludes."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
        max_tumbling_chunk_bytes,
    )
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_parquet_table,
    )

    docs = read_parquet_table(spark, sf_dir, "documents")
    cap = 170
    flagged = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", max_tumbling_chunk_bytes("text", 32).alias("mb")
        )
        .filter(F.col("mb") > cap)
        .collect()
    }
    assert flagged  # the fixture corpus trips this cap
    out_ids = {
        r["doc_id"]
        for r in chunk_dedup_rewrite(docs, max_chunk_bytes=cap).collect()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert all_ids - out_ids == flagged


def test_hashed_bow_agg_matches_column_builder(spark):
    """The corpus-level explode+agg embedder (codegen path) is
    numerically identical to the Column-builder form."""
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        hashed_bow_embeddings,
    )
    from uofi_payroll_etl_main_demo_spark.functions.text import (
        hashed_bow_buckets,
        hashed_bow_embedding_from_buckets,
    )
    from uofi_payroll_etl_main_demo_spark.io.readers import (
        read_parquet_table,
    )

    docs = read_parquet_table(spark, "/root/testdata/sf0.001", "documents")
    a = {r["doc_id"]: r["v"] for r in hashed_bow_embeddings(docs).collect()}
    bk = docs.select("doc_id", hashed_bow_buckets("text").alias("__b"))
    b = {
        r["doc_id"]: r["v"]
        for r in bk.select(
            "doc_id",
            hashed_bow_embedding_from_buckets("__b").alias("v"),
        ).collect()
        if r["v"] is not None
    }
    assert a == b


def test_bloom_prefilter_superset_and_exactness(spark):
    """Bloom membership is a superset of exact membership (zero false
    negatives); with a tiny filter false positives appear and are
    still deterministic (build twice -> identical words)."""
    from uofi_payroll_etl_main_demo_spark.ext.sketches import (
        bloom_build_words,
        bloom_might_contain,
    )

    vals = spark.createDataFrame(
        [(f"item-{i}",) for i in range(50)], "s string"
    )
    probes = spark.createDataFrame(
        [(f"item-{i}",) for i in range(40, 140)], "s string"
    )
    w1 = bloom_build_words(vals, "s", m_bits=256, k=3)
    w2 = bloom_build_words(vals, "s", m_bits=256, k=3)
    assert w1 == w2  # deterministic build
    import pyspark.sql.functions as _F

    got = {
        r["s"]: r["hit"]
        for r in probes.select(
            "s", bloom_might_contain(w1, _F.col("s"), 256, 3).alias("hit")
        ).collect()
    }
    # no false negatives on true members
    assert all(got[f"item-{i}"] for i in range(40, 50))
    # tiny m with 50 items -> some false positives, but not everything
    fp = [i for i in range(50, 140) if got[f"item-{i}"]]
    assert 0 < len(fp) < 100


def test_hashed_bow_dim_mismatch_fails_loud(spark):
    """Buckets built with a larger dim than the embedder expects must
    raise, not silently normalize a token-dropping embedding."""
    import pytest as _pytest

    from uofi_payroll_etl_main_demo_spark.functions.text import (
        hashed_bow_buckets,
        hashed_bow_embedding_from_buckets,
    )

    df = spark.createDataFrame(
        [(i, f"word{i} tok{i*7} item{i*13} thing{i*31}") for i in range(40)],
        "doc_id bigint, text string",
    )
    bad = df.select(
        hashed_bow_embedding_from_buckets(
            hashed_bow_buckets("text", dim=64), dim=16
        ).alias("v")
    )
    with _pytest.raises(Exception):
        bad.collect()


def test_chunk_dedup_rewrite_matches_python_mirror_on_hostile_text(spark):
    """Differential vs a pure-Python mirror over hostile corpora:
    control characters (incl. U+000B), unicode, huge single tokens,
    duplicate chunks within AND across docs, empties."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        chunk_dedup_rewrite,
    )

    WS = " \t\n\r\f\x0b"

    def mirror(rows, size):
        import re

        seen = set()
        out = {}
        for doc_id, text in sorted(rows):
            toks = [t for t in re.split("[" + WS + "]+", text) if t]
            chunks = [
                " ".join(toks[i : i + size])
                for i in range(0, len(toks), size)
            ]
            kept = []
            for ch in chunks:
                if ch not in seen:
                    seen.add(ch)
                    kept.append(ch)
            out[doc_id] = (len(chunks), len(kept), " ".join(kept))
        return out

    atom = st.sampled_from(
        ["tok", "x" * 500, "é漢", "\x0b", "\n", " ", "a b c d ", ""]
    )
    texts = st.lists(atom, min_size=0, max_size=30).map("".join)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(texts, min_size=1, max_size=6))
    def check(docs):
        rows = [(i, t) for i, t in enumerate(docs)]
        # duplicate the first doc under a later id: cross-doc dedup case
        rows.append((len(docs), docs[0]))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_clean"])
            for r in chunk_dedup_rewrite(df, size=4).collect()
        }
        assert got == mirror(rows, 4)

    check()


def test_bpe_encode_splits_on_portable_whitespace_only(spark):
    """bpe_encode must split words with the SAME explicit whitespace
    class as tokenize_ws / the SQL twin — Python str.split() also
    breaks on NBSP/U+2028, which would diverge from the trainer's
    vocabulary on exotic-whitespace documents."""
    from uofi_payroll_etl_main_demo_spark.ext.bpe import bpe_encode

    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id bigint, text string"
    )
    out = bpe_encode(df, []).collect()[0]
    # NBSP and LINE SEPARATOR stay INSIDE tokens; only the space splits
    assert out["n_tokens"] == len("a b") + len("c d") + 1


def test_chunk_documents_tumbling_fast_path_matches_windowed(spark, sf_dir):
    """The tumbling regex fast path (stride == size) and the general
    token-array windowed form emit identical rows AND schema over the
    real corpus plus the pathological fixtures — one chunking law, two
    physical plans (the fast path is 5.5× cheaper; BASELINE.md r9)."""
    from uofi_payroll_etl_main_demo_spark import queries as R
    from uofi_payroll_etl_main_demo_spark.ext.textstats import (
        _chunk_documents_windowed,
        chunk_documents,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text").unionByName(
        spark.createDataFrame(R._PATHOLOGICAL_TEXTS, "doc_id long, text string")
    )
    fast = chunk_documents(docs, size=32, stride=32)
    slow = _chunk_documents_windowed(docs, "text", "doc_id", 32, 32)
    # names + types (the fast path's chunk_idx is non-nullable —
    # posexplode's pos — which is strictly stronger, not a divergence)
    assert [(f.name, f.dataType) for f in fast.schema] == [
        (f.name, f.dataType) for f in slow.schema
    ]
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )


# ------------------------------------------------------------- DSIR --


def _dsir_expected(rows, target_langs, n_buckets=1024):
    """Reference implementation of the exact DSIR law (ext/dsir.py) in
    plain python: portable md5 buckets, Laplace counts, floor-log2 via
    int.bit_length, signed per-token difference."""
    import hashlib

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:13], 16) % n_buckets

    toks = []  # (doc_id, tgt, bucket)
    for doc_id, text, lang in rows:
        if not text.strip():
            continue
        for tok in text.split():
            toks.append((doc_id, lang in target_langs, bucket(tok)))
    cnt_r: dict[int, int] = {}
    cnt_t: dict[int, int] = {}
    for _d, tgt, b in toks:
        cnt_r[b] = cnt_r.get(b, 0) + 1
        if tgt:
            cnt_t[b] = cnt_t.get(b, 0) + 1
    r_tot = len(toks) + n_buckets
    t_tot = sum(cnt_t.values()) + n_buckets
    wb = {
        b: (r_tot // (cnt_r[b] + 1)).bit_length()
        - 1
        - ((t_tot // (cnt_t.get(b, 0) + 1)).bit_length() - 1)
        for b in cnt_r
    }
    out = {}
    for doc_id, _t, b in toks:
        n, s = out.get(doc_id, (0, 0))
        out[doc_id] = (n + 1, s + wb[b])
    return {
        d: (n, s, round(s * 1000.0 / n, 6)) for d, (n, s) in out.items()
    }


def test_dsir_weights_match_reference_law_exactly(spark):
    from uofi_payroll_etl_main_demo_spark.ext.dsir import dsir_weights

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog ate the homework", "en"),
        (3, "der hund und die katze", "de"),
        (4, "le chat et le chien", "fr"),
        (5, "the cat und der dog", "de"),
        (6, "   ", "en"),  # whitespace-only: no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dsir_bits_sum"],
            r["dsir_milli_bits"],
        )
        for r in dsir_weights(df, F.col("lang") == "en").collect()
    }
    assert got == _dsir_expected(rows, {"en"})
    assert 6 not in got


def test_dsir_target_docs_rank_above_offdomain(spark):
    """On the fixture corpus, English documents must score higher on
    average than non-English ones under an English target model — the
    selector's whole point."""
    from uofi_payroll_etl_main_demo_spark.ext.dsir import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = dsir_weights(docs, F.col("lang") == "en")
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_milli_bits").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_dsir_select_is_topk_of_panel_under_the_ordering_law(spark):
    from uofi_payroll_etl_main_demo_spark.ext.dsir import (
        dsir_select,
        dsir_weights,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tgt = F.col("lang") == "en"
    panel = dsir_weights(docs, tgt).collect()
    want = sorted(
        (
            (-r["dsir_milli_bits"], -r["n_tokens"], r["doc_id"])
            for r in panel
        ),
    )[:25]
    got = [
        (-r["dsir_milli_bits"], -r["n_tokens"], r["doc_id"])
        for r in dsir_select(docs, tgt, take=25).collect()
    ]
    assert got == want
