"""BPE merge training (ext/bpe.py) against the hand-computable classic
corpus — every merge and tie-break checkable on paper."""

from __future__ import annotations

import pytest

from beeper_matric_etl_tool_spark.ext.bpe import (
    EOW,
    bpe_segment,
    bpe_token_counts,
    train_bpe_merges,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # the Sennrich-style toy corpus: word frequencies chosen so the merge
    # order (and its lexicographic tie-breaks) is fully hand-derivable
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    return spark.createDataFrame(
        [(i, t[0]) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_merge_order_and_tiebreaks(corpus):
    """Hand-derivation: pair counts peak at 9 for (e,s), (s,t), (t,EOW)
    — the lexicographic tie-break picks (e,s) first, then the merged
    symbols cascade (es,t) -> (est,EOW); the 7-count tie (l,o)/(o,w)
    again resolves left-asc; then (lo,w)."""
    merges = train_bpe_merges(corpus, n_merges=5)
    assert merges == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", EOW, 9),
        ("l", "o", 7),
        ("lo", "w", 7),
    ]


def test_min_pair_count_stops_early(corpus, spark):
    one_word = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    # every pair in the single hapax word has count 1 < 2 -> no merges
    assert train_bpe_merges(one_word, n_merges=5, min_pair_count=2) == []
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe_merges(one_word, n_merges=0)


def test_segment_unseen_word(corpus, spark):
    """The point of BPE: 'lowest' never occurs in the corpus but
    segments into learned units [low, est</w>]."""
    merges = train_bpe_merges(corpus, n_merges=5)
    out = bpe_segment(
        spark.createDataFrame([("lowest",)], "word string"), merges
    ).first()
    assert out["pieces"] == ["low", "est" + EOW]


def test_token_counts_weight_by_occurrence(corpus, spark):
    merges = train_bpe_merges(corpus, n_merges=5)
    docs = spark.createDataFrame(
        [(1, "lowest lowest newest"), (2, "low")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    # lowest -> [low, est</w>] = 2 pieces, twice; newest -> n e w est</w>
    # = 4 pieces; low -> [low, </w>] = 2 pieces
    assert got == {1: 2 + 2 + 4, 2: 2}


def test_segment_udf_matches_fold_path(corpus, spark):
    """The pandas_udf production segmenter (rank-priority) must agree
    with the fold path (merge-order application) on every corpus word
    AND on unseen words."""
    from beeper_matric_etl_tool_spark.ext.bpe import bpe_segment_udf

    merges = train_bpe_merges(corpus, n_merges=5)
    words = spark.createDataFrame(
        [("low",), ("lower",), ("newest",), ("widest",), ("lowest",),
         ("west",), ("x",)],
        "word string",
    )
    fold = {r["word"]: r["pieces"] for r in bpe_segment(words, merges).collect()}
    udf = {
        r["word"]: r["pieces"] for r in bpe_segment_udf(words, merges).collect()
    }
    assert udf == fold


def test_bpe_encode_ids_roundtrip_and_determinism(corpus, spark):
    """bpe_encode_ids: ids map through the lexicographic piece vocab,
    documents reconstruct exactly, and the mapping is identical under a
    different input partitioning (shard-independent tokenizer
    artifact)."""
    from beeper_matric_etl_tool_spark.ext.bpe import bpe_encode_ids

    merges = train_bpe_merges(corpus, n_merges=5)
    encoded, vocab = bpe_encode_ids(corpus, merges)
    id2piece = {r["piece_id"]: r["piece"] for r in vocab.collect()}
    # vocab ids are the dense 0..n-1 lexicographic ranks
    assert sorted(id2piece) == list(range(len(id2piece)))
    assert [id2piece[i] for i in sorted(id2piece)] == sorted(id2piece.values())

    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    rows = {r["doc_id"]: r for r in encoded.collect()}
    assert set(rows) == set(texts)
    for d, r in rows.items():
        pieces = [id2piece[i] for i in r["token_ids"]]
        assert "".join(pieces) == texts[d].replace(" ", EOW) + EOW
        assert r["n_pieces"] == len(pieces)
        # the trained merges compress below character count
        assert r["n_pieces"] < len(texts[d]) + 1

    encoded2, vocab2 = bpe_encode_ids(corpus.repartition(7), merges)
    assert sorted(map(tuple, vocab2.collect())) == sorted(
        map(tuple, vocab.collect())
    )
    assert {r["doc_id"]: tuple(r["token_ids"]) for r in encoded2.collect()} == {
        d: tuple(r["token_ids"]) for d, r in rows.items()
    }


def test_pack_token_sequences_assembles_in_pack_order(spark):
    """pack_token_sequences flattens each pack's docs in the salted pack
    order with doc_ids/doc_lens bookkeeping — the collator contract."""
    from pyspark.sql import functions as F

    from beeper_matric_etl_tool_spark.ext.bpe import bpe_encode_ids
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        pack_by_budget,
        pack_token_sequences,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "low lower low"),
            (2, "en", "newest widest"),
            (3, "en", "low newest low widest low"),
            (4, "es", "lower lower"),
        ],
        "doc_id long, lang string, text string",
    )
    merges = train_bpe_merges(docs, n_merges=4)
    encoded, vocab = bpe_encode_ids(docs, merges)
    packed = pack_by_budget(
        docs.withColumn("n_tokens_packed", F.size(F.split("text", " "))),
        token_col="n_tokens_packed",
        budget=8,
        partition_cols=("lang",),
    )
    seqs = pack_token_sequences(packed, encoded)
    by_doc = {r["doc_id"]: r for r in encoded.collect()}
    for r in seqs.collect():
        # order bookkeeping agrees with the payload
        assert r["doc_lens"] == [by_doc[d]["n_pieces"] for d in r["doc_ids"]]
        flat = [i for d in r["doc_ids"] for i in by_doc[d]["token_ids"]]
        assert r["token_ids"] == flat
        assert r["n_pieces"] == sum(r["doc_lens"])
    # every doc appears exactly once across packs
    seen = sorted(d for r in seqs.collect() for d in r["doc_ids"])
    assert seen == [1, 2, 3, 4]


def test_bpe_encode_ids_ignores_split_artifacts(spark):
    """Trailing/doubled spaces and empty text must not inject phantom
    EOW-only tokens: the '' word the split artifact produces is
    filtered, and a wordless document emits NO encoded row (the
    pack_token_sequences drop path)."""
    from beeper_matric_etl_tool_spark.ext.bpe import bpe_encode_ids

    docs = spark.createDataFrame(
        [(1, "low low"), (2, "low  low "), (3, ""), (4, " ")],
        "doc_id long, text string",
    )
    merges = train_bpe_merges(docs, n_merges=2)
    encoded, vocab = bpe_encode_ids(docs, merges)
    rows = {r["doc_id"]: r for r in encoded.collect()}
    assert set(rows) == {1, 2}
    # doc 2's doubled/trailing spaces change nothing about its ids —
    # without the '' filter it would gain a phantom EOW-only token
    assert rows[2]["token_ids"] == rows[1]["token_ids"]
    assert rows[2]["n_pieces"] == rows[1]["n_pieces"]


def test_tokenizer_artifact_roundtrip(corpus, spark, tmp_path):
    """save_tokenizer/load_tokenizer: the (merges, vocab) pair survives a
    disk roundtrip byte-identically, encodes new shards id-compatibly,
    and enforces the local-path + artifact-presence contracts."""
    from beeper_matric_etl_tool_spark.ext.bpe import (
        bpe_encode_ids,
        load_tokenizer,
        save_tokenizer,
    )

    merges = train_bpe_merges(corpus, n_merges=5)
    _encoded, vocab = bpe_encode_ids(corpus, merges)
    path = str(tmp_path / "tok")
    save_tokenizer(merges, vocab, path)
    merges2, vocab2 = load_tokenizer(spark, path)
    assert merges2 == merges
    assert sorted(map(tuple, vocab2.collect())) == sorted(
        map(tuple, vocab.collect())
    )

    with pytest.raises(ValueError, match="URI scheme"):
        save_tokenizer(merges, vocab, "s3://bucket/tok")
    with pytest.raises(FileNotFoundError, match="_MERGES"):
        load_tokenizer(spark, str(tmp_path / "nope"))
