"""Hypothesis property tests for the plan-fork kernels (VERDICT r4 #8):

- the bitset/prefix/all-pairs Jaccard triple must agree EXACTLY across
  the max_vocab cutover (the dictionary-probe fork at 63/64/65 distinct
  tokens is where a capacity off-by-one hides — r4 shipped one);
- the tiled block-grid kNN join must be bit-identical to the one-block
  kernel for adversarial shapes (empty, single-vector, more blocks than
  rows, non-square grids).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)

_UNIVERSE = [f"t{i:02d}" for i in range(68)]


@settings(**_SETTINGS)
@given(
    data=st.data(),
    universe_size=st.integers(min_value=61, max_value=68),
    threshold=st.sampled_from([0.5, 0.8, 0.95]),
)
def test_jaccard_triple_agrees_across_vocab_cutover(
    spark, data, universe_size, threshold
):
    from poc_spark.operators.dedup import (
        jaccard_bitset_pairs,
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    universe = _UNIVERSE[:universe_size]
    n_docs = data.draw(st.integers(min_value=2, max_value=8))
    docs = [
        (i, " ".join(sorted(data.draw(
            st.sets(st.sampled_from(universe), min_size=0, max_size=universe_size)
        ))))
        for i in range(n_docs)
    ]
    # one doc holds the whole universe so the distinct-token count (the
    # dictionary-probe result) is exactly universe_size — pinning which
    # side of the 64-token cutover this example exercises
    docs.append((n_docs, " ".join(universe)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    ap = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=threshold).collect()
    }
    bit = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_bitset_pairs(df, threshold=threshold).collect()
    }
    pref = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(df, threshold=threshold).collect()
    }
    assert bit == ap
    assert pref == ap


@settings(**_SETTINGS)
@given(
    data=st.data(),
    n_vecs=st.integers(min_value=0, max_value=24),
    dim=st.integers(min_value=1, max_value=5),
    query_blocks=st.integers(min_value=1, max_value=5),
    corpus_blocks=st.integers(min_value=1, max_value=5),
    k=st.integers(min_value=1, max_value=4),
)
def test_tiled_knn_equals_one_block_adversarial_shapes(
    spark, data, n_vecs, dim, query_blocks, corpus_blocks, k
):
    from poc_spark.operators.similarity import knn_join_blocked, knn_join_tiled

    rows = [
        (
            i,
            [
                float(data.draw(st.integers(min_value=1, max_value=7)))
                for _ in range(dim)
            ],
        )
        for i in range(n_vecs)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = {
        (r["id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in knn_join_blocked(df, k=k).collect()
    }
    tiled = {
        (r["id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in knn_join_tiled(
            df, k=k, query_blocks=query_blocks, corpus_blocks=corpus_blocks
        ).collect()
    }
    assert tiled == one  # exact, including float bits
