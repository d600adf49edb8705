"""Training-data pipeline operators: dedup, text stats, ANN, multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from communitydetection_jl_spark.operators.ann import (
    brute_force_topk,
    ivf_topk,
    lsh_near_pairs,
)
from communitydetection_jl_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from communitydetection_jl_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    resize_plan,
    synth_media,
)
from communitydetection_jl_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)

DOCS_SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "while the hunter is watching the field with great patience today"
    )
    near = base.replace("great patience", "endless patience")
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1
        (4, "der hund läuft schnell und die katze ist nicht da für den mann"),
        (5, "le chat est dans la maison et le chien est pour une promenade avec des amis"),
        (6, "completely different content about spark dataframes and shuffle partitions here"),
        (7, "  THE   Quick Brown fox jumps over the lazy dog and runs far away "
            "while the hunter is watching the field with great patience today"),
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_exact_dedup(spark, docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    # doc 7 normalizes to doc 1's text (case/whitespace) → group of 3
    assert g.n_dups == 3 and g.keep_id == 1
    kept = exact_dedup(docs)
    assert kept.count() == 5
    assert kept.filter(F.col("doc_id").isin(2, 7)).count() == 0


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = minhash_lsh_pairs(docs, threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found and (1, 7) in found  # exact dups: est 1.0
    assert (1, 3) in found  # near dup
    assert all({a, b} != {4, 5} for a, b in found)


def test_minhash_signature_properties(spark, docs):
    sig = minhash_signatures(docs, num_hashes=32)
    rows = {r.id: r.sig for r in sig.collect()}
    assert rows[1] == rows[2]  # identical text → identical signature
    agree_13 = sum(a == b for a, b in zip(rows[1], rows[3])) / 32
    agree_16 = sum(a == b for a, b in zip(rows[1], rows[6])) / 32
    assert agree_13 > 0.5 > agree_16


def test_simhash_near_and_far(spark, docs):
    sh = {r.id: r.simhash for r in simhash(docs).collect()}
    assert sh[1] == sh[2]
    ham13 = bin((sh[1] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    ham16 = bin((sh[1] ^ sh[6]) & ((1 << 64) - 1)).count("1")
    assert ham13 < ham16
    pairs = simhash_pairs(docs, max_hamming=8).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found and (1, 3) in found


def test_ngram_jaccard(spark, docs):
    cand = spark.createDataFrame([(1, 2), (1, 3), (1, 6)], "id_a long, id_b long")
    j = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, cand).collect()}
    assert j[(1, 2)] == pytest.approx(1.0)
    assert 0.5 < j[(1, 3)] < 1.0
    assert j[(1, 6)] < 0.05


def test_token_count(spark, docs):
    tc = {r.id: (r.ws_tokens, r.bpe_tokens) for r in token_count(docs).collect()}
    assert tc[1][0] == len(
        "the quick brown fox jumps over the lazy dog and runs far away "
        "while the hunter is watching the field with great patience today".split()
    )
    assert tc[1][1] >= tc[1][0]  # BPE-ish splits at least as fine


def test_language_id(spark, docs):
    pred = {r.id: r.pred_lang for r in language_id(docs).collect()}
    assert pred[1] == "en" and pred[4] == "de" and pred[5] == "fr"


def test_quality_score(spark):
    rows = [
        (1, "A well formed english sentence with reasonable length and the usual words in it."),
        (2, "@@## $$%% ^^&& !!?? ~~||"),
        (3, "short"),
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    q = {r.id: r.quality for r in quality_score(df).collect()}
    assert q[1] > 0.5
    assert q[2] < 0.3
    assert q[3] == 0.0  # below min length


def test_fingerprint_stability(spark, docs):
    fp = {r.id: r.fp64 for r in fingerprint(docs).collect()}
    assert fp[1] == fp[2] == fp[7]
    assert fp[1] != fp[6]


# ---------------------------------------------------------------- ANN --

@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # 20: near-copy of 0; 21: exact copy of 1
    rows.append((20, [float(x) for x in base[0] + 0.01 * rng.standard_normal(16)]))
    rows.append((21, [float(x) for x in base[1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, vectors):
    queries = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = brute_force_topk(vectors, queries, k=3).orderBy("rank").collect()
    assert top[0].vec_id == 0 and top[0].cosine == pytest.approx(1.0, abs=1e-6)
    assert top[1].vec_id == 20  # the near-copy
    assert top[1].cosine > 0.99


def test_lsh_near_pairs(spark, vectors):
    pairs = lsh_near_pairs(vectors, dim=16, threshold=0.95, bits=8, num_bands=4)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 20) in found and (1, 21) in found


def test_ivf_topk_contains_true_neighbor(spark, vectors):
    queries = vectors.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = ivf_topk(vectors, queries, dim=16, k=3, bits=8).collect()
    ids = [r.vec_id for r in sorted(got, key=lambda r: r.rank)]
    assert ids[0] in (1, 21) and ids[1] in (1, 21)


# ---------------------------------------------------------- multimodal --

def test_multimodal_plumbing(spark):
    media = synth_media(spark, n=12)
    feats = decode_features(media, feat_dim=8)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r.feature) == 8 for r in rows)
    # determinism: same payload → same feature
    again = {r.media_id: r.feature for r in decode_features(media, feat_dim=8).collect()}
    first = {r.media_id: r.feature for r in rows}
    assert again == first

    frames = frame_sample(media, every_n=16)
    assert frames.count() > 0
    plan = resize_plan(media, max_side=64).collect()
    assert all(max(r.target_width, r.target_height) <= 64 for r in plan)


def test_multimodal_real_decode_is_stubbed(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(Exception):
        decode_features(media, deterministic_fake=False).collect()
