"""Byte-pair-encoding merge training over the corpus (SURVEY §2.12 text
tier) — the tokenizer-FITTING stage of a training-data pipeline (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units" — public method, Spark-first implementation).

The scale insight that makes distributed BPE tractable: after ONE corpus
pass that reduces text to (word, count), every training iteration runs
over the WORD VOCABULARY — a relation orders of magnitude smaller than
the corpus (heaps' law: ~1e6-1e8 distinct words against 1e12 tokens) and
one that never grows during training. The 100 TB corpus is touched
exactly once; the n_merges-iteration loop costs n_merges
vocabulary-sized jobs (explode pairs → weighted count → argmax), the
same driver-loop shape as `ext/clustering.py:kmeans`.

Determinism contract: merge selection is argmax by (pair count DESC,
left symbol ASC, right symbol ASC) — integer counts, lexicographic
tie-break, no RNG — so the learned merge table is a pure function of the
corpus. Merge APPLICATION is the classic greedy leftmost scan, expressed
as one `F.aggregate` fold per merge over the symbol array (the fold
references only bound attributes — the Catalyst re-inlining hazard
`ext/quality.py:_max_multiplicity` documents does not apply), with a
`localCheckpoint` per iteration so the driver loop's lineage stays flat
instead of nesting n_merges folds into one plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.text import tokens

#: end-of-word marker (appended as a standalone final symbol): makes
#: "est" at a word's end a DIFFERENT unit from "est" mid-word — the
#: Sennrich convention that lets the tokenizer learn suffixes.
EOW = "</w>"


def _merge_fold(syms, a: str, b: str):
    """Greedy leftmost application of one merge (a, b) → a+b over a
    symbol array: a single left fold — if the running output ends with
    `a` and the next symbol is `b`, replace the tail with the merged
    symbol, else append. The merged symbol is strictly longer than
    either part, so it can never falsely re-trigger the same merge on
    its own output ("aaa" under (a,a) → [aa, a], the standard greedy
    result)."""
    merged = F.lit(a + b)
    empty = F.array().cast("array<string>")

    def step(out, x):
        can = (
            (F.size(out) > 0)
            & (F.element_at(out, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            can,
            F.concat(F.slice(out, 1, F.size(out) - 1), F.array(merged)),
        ).otherwise(F.concat(out, F.array(x)))

    return F.aggregate(syms, empty, step)


def _chars(col):
    """Character array of a string column. Spark's split(limit=-1) keeps
    a trailing empty element ('ab' -> [a, b, '']) — filter it out."""
    return F.filter(F.split(col, "(?!^)"), lambda x: x != F.lit(""))


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, ct) — the ONE corpus-sized pass of BPE training."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("ct"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, ct, syms): characters plus the end-of-word marker."""
    return words.select(
        "word",
        "ct",
        F.concat(_chars(F.col("word")), F.array(F.lit(EOW))).alias("syms"),
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 20,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn the top ``n_merges`` BPE merges: [(left, right, count), …]
    in merge order. Stops early when the best remaining pair's weighted
    count drops below ``min_pair_count`` (merging singleton pairs would
    just memorize hapax words). The corpus is scanned once; each
    iteration is vocabulary-sized (module docstring)."""
    if n_merges < 1:
        raise ValueError(f"train_bpe_merges: n_merges={n_merges} must be >= 1")
    # LAZY checkpoints (r13): the best-pair aggregation below full-scans
    # `state`, so each iteration's ONE action materializes the checkpoint
    # it reads — an eager checkpoint here would double the actions per
    # merge (materialize job + best-pair job). The parent's blocks must
    # therefore outlive the child until the child HAS materialized: we
    # unpersist the grandparent after the best-pair action, never the
    # direct parent of a still-lazy frame.
    state = _initial_symbols(word_counts(docs, text_col)).localCheckpoint(
        eager=False
    )
    merges: list[tuple[str, str, int]] = []
    grandparent: DataFrame | None = None
    for _ in range(n_merges):
        pairs = state.select(
            "ct",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("ct").alias("n"))
            .orderBy(
                F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc()
            )
            .first()
        )
        # `state` is materialized now — its parent's blocks are no longer
        # needed for recomputation and can go.
        if grandparent is not None:
            grandparent.unpersist()
            grandparent = None
        if best is None or best["n"] < min_pair_count:
            break
        a, b = best["p"]["a"], best["p"]["b"]
        merges.append((a, b, best["n"]))
        grandparent = state
        state = state.select(
            "word", "ct", _merge_fold(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=False)
    if grandparent is not None:
        grandparent.unpersist()
    state.unpersist()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "pieces",
) -> DataFrame:
    """Apply a learned merge table to a word column: adds ``out_col``
    (array<string> of subword pieces, EOW marker on the last piece).
    Merges apply in training order — the defining BPE property — each as
    one fold; the plan is merges-deep but column-local (no shuffle, no
    Python)."""
    syms = F.concat(_chars(F.col(word_col)), F.array(F.lit(EOW)))
    for m in merges:
        syms = _merge_fold(syms, m[0], m[1])
    return df.withColumn(out_col, syms)


def bpe_token_counts(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bpe_tokens) — the sequence-length accounting a packing
    budget actually needs once a real tokenizer exists: piece count per
    document under the learned merges. One explode to words, one
    vocabulary-sized segmentation join (each DISTINCT word is segmented
    once, then joined back by word — piece counting never refolds per
    occurrence), one count-sum back per document."""
    words = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
    per_word = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("__n")
    )
    vocab = per_word.select("word").distinct()
    pieces = bpe_segment(vocab, merges).select(
        "word", F.size("pieces").alias("__pieces")
    )
    return (
        per_word.join(pieces, on="word")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__pieces")).alias("n_bpe_tokens"))
    )


def bpe_encode_ids(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Encode every document to integer token ids under a learned merge
    table — the tokenize step of the trainer handoff (a model consumes
    id sequences, not piece strings). Returns ``(encoded, vocab)``:

    - ``encoded``: (id_col, ``token_ids`` array<int>, ``n_pieces``) —
      the document's pieces in reading order as vocabulary ids;
    - ``vocab``: (``piece``, ``piece_id``) — piece_id is the 0-based
      rank of the piece string in lexicographic order over the corpus's
      DISTINCT pieces. Deterministic given (corpus, merges): re-runs and
      different partitionings produce identical mappings, so shards of
      one corpus can be encoded independently against the same merges
      and agree. Persist ``vocab`` next to the merge table — together
      they ARE the tokenizer artifact.

    Scale shape: segmentation cost is paid on the DISTINCT-word relation
    (``bpe_segment_udf``, the production path — see its docstring), and
    the piece inventory is |alphabet| + n_merges rows, so the id-assign
    window sorts a VOCABULARY-sized relation in one task (bounded by
    construction, like the codebook collects the round-5 audit class
    documents) and broadcasts it back. Per-document reassembly is two
    (id, position)-keyed aggregations — token positions ride inside
    rows, never alone through a shuffle."""
    from pyspark.sql import Window

    # filter the F.split trailing-'' artifact (empty text, doubled or
    # trailing spaces): a '' word would otherwise enter the vocabulary,
    # segment to the bare EOW piece, and inject a phantom token into the
    # emitted id stream. Documents with no real words therefore emit NO
    # encoded row — pack_token_sequences drops them, as documented there.
    words_pos = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("__wpos", "word")
    ).filter(F.col("word") != "")
    vocab_words = words_pos.select("word").distinct()
    seg = bpe_segment_udf(vocab_words, merges)
    vocab = (
        seg.select(F.explode("pieces").alias("piece"))
        .distinct()
        .withColumn(
            "piece_id", F.row_number().over(Window.orderBy("piece")) - 1
        )
    )
    word_ids = (
        seg.select("word", F.posexplode("pieces").alias("__ppos", "piece"))
        .join(F.broadcast(vocab), on="piece")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__ppos", "piece_id"))),
                lambda s: s["piece_id"],
            ).alias("__wids")
        )
    )
    encoded = (
        words_pos.join(word_ids, on="word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__wpos", "__wids"))),
                    lambda s: s["__wids"],
                )
            ).alias("token_ids")
        )
        .withColumn("n_pieces", F.size("token_ids"))
    )
    return encoded, vocab


def save_tokenizer(
    merges: list,
    vocab: DataFrame,
    path: str,
) -> None:
    """Persist the tokenizer artifact — the (merge table, piece vocab)
    pair that :func:`bpe_encode_ids` derives — so shards, later batches
    and the training job itself all tokenize under ONE frozen mapping:
    ``_MERGES.json`` (ordered [left, right, count] rows; JSON because the
    table is merge-ORDER-sensitive and driver-resident by construction)
    plus ``vocab/`` parquet (piece, piece_id). Same POSIX-local side-file
    contract as the index families (sinks.py "Filesystem contract")."""
    import json

    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "save_tokenizer")
    os.makedirs(path, exist_ok=True)
    vocab.write.mode("overwrite").parquet(os.path.join(path, "vocab"))
    with open(os.path.join(path, "_MERGES.json"), "w") as fh:
        json.dump([[m[0], m[1], int(m[2]) if len(m) > 2 else 0] for m in merges], fh)


def load_tokenizer(spark, path: str) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Read back a :func:`save_tokenizer` artifact: (merges in training
    order, vocab frame). Encoding new batches against the loaded pair —
    `bpe_segment_udf(new_words, merges)` joined through the FROZEN vocab
    — keeps shard outputs id-compatible with the original corpus (a
    piece absent from the frozen vocab means the merges/vocab pair is
    stale: re-fit, don't improvise ids)."""
    import json

    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "load_tokenizer")
    merges_path = os.path.join(path, "_MERGES.json")
    if not os.path.exists(merges_path):
        raise FileNotFoundError(
            f"tokenizer at {path!r} has no _MERGES.json — not an artifact "
            f"written by save_tokenizer"
        )
    with open(merges_path) as fh:
        merges = [tuple(m) for m in json.load(fh)]
    vocab = spark.read.parquet(os.path.join(path, "vocab"))
    return merges, vocab


def bpe_segment_udf(
    df: DataFrame,
    merges: list,
    word_col: str = "word",
    out_col: str = "pieces",
) -> DataFrame:
    """The production twin of :func:`bpe_segment` for REAL merge tables:
    a 30k-merge vocabulary would nest 30k folds into one Catalyst plan
    (analysis/codegen explodes long before execution), so this variant
    ships the merge table into an Arrow-batched pandas_udf once per
    executor and applies the standard rank-priority algorithm — repeat-
    edly merge the best-ranked adjacent pair present — per word. Same
    output as the fold path on any merge table (pinned in tests): rank
    priority and greedy-leftmost-per-merge produce identical segmenta-
    tions because earlier merges always outrank later ones. Python-per-
    word cost is paid on the DISTINCT-word relation (see
    bpe_token_counts), not per occurrence."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rank = {(m[0], m[1]): i for i, m in enumerate(merges)}

    def seg_one(word: str) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_i, best_r = -1, len(rank)
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]), len(rank))
                if r < best_r:
                    best_i, best_r = i, r
            if best_i < 0 or best_r >= len(rank):
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    # annotations assigned as real objects: the module-level
    # `from __future__ import annotations` stringifies inline hints,
    # which pandas_udf's signature inspection cannot resolve
    def _seg(col):
        return col.map(seg_one)

    _seg.__annotations__ = {"col": pd.Series, "return": pd.Series}
    seg = pandas_udf(T.ArrayType(T.StringType()))(_seg)

    return df.withColumn(out_col, seg(F.col(word_col)))
