"""Persisted PASSAGE-ATTRIBUTION index — positioned window fingerprints
with the build/probe/append lifecycle, so "which lake document was this
passage cut from" is a corpus-text-scan-free probe (r12; the text twin
of `ext/containment_index.py`, completing the containment tier's
batch-demo → lake-capability move on the text plane).

`text.passage_attribution` re-tokenizes and re-fingerprints the WHOLE
corpus per query — right for an investigation over a snapshot, wrong at
steady state where the question arrives one suspect passage at a time.
The index amortizes the corpus pass:

  build:   one tokenize+fingerprint pass over the corpus →
           `windows/` parquet (doc_id, pos, fp — 16-byte md5 + an int
           per stored window; volume = n_tokens/corpus_hop rows, the
           honest cost of POSITIONED attribution, thinned by the hop)
           plus `_META.json` freezing (k, corpus_hop, columns) — windows
           fingerprinted under a different k or tokenization cannot vote
           consistently with the stored ones.
  probe:   `attribute_against_index` fingerprints ONLY the probe
           passages (hop 1) and joins the stored windows — the corpus
           TEXT is never scanned (plan-pinned: no text column in any
           probe plan), then the constant-offset vote. Verdicts are the
           batch op's verbatim (same window derivation, same vote).
  append:  accepted documents extend `windows/` under the frozen
           config; staged appends are ingest-batch dynamic overwrites
           (replay replaces; `exclude_batch` partition-pruned), the
           shared index-family discipline, with compaction via
           `compact_batched_tables`.

Scale: probes shuffle (16-byte fp, id, int) rows; candidates ride one
fingerprint equi-join (AQE broadcasts small probe sides); the vote
groups matched pairs only. The stored relation is the text analog of
the media unit-signature table — positions make it bigger than the
dedup index's per-doc shingle SETS, and that is the feature: sets
answer "is it a dup", positions answer "cut from WHERE".

Filesystem contract: `_META.json` via plain `os`/`open` — the sinks
family's POSIX-local assumption (`sinks._require_local_path`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.media_index import (
    BATCH_COL,
    BOOTSTRAP_BATCH,
    UNSTAGED_BATCH,
    _write,
)
from beeper_matric_etl_tool_spark.ext.text import token_window_fingerprints

_META_FILE = "_META.json"

#: the stored window relation's contract columns
WINDOW_COLUMNS = ("doc_id", "pos", "fp")


def _corpus_windows(docs: DataFrame, meta: dict) -> DataFrame:
    """Derive the positioned window relation under a frozen config — ONE
    shared derivation for build, append and (at hop 1) the probe side,
    so they can never drift."""
    return token_window_fingerprints(
        docs,
        meta["k"],
        meta["corpus_hop"],
        meta["id_col"],
        meta["text_col"],
        "doc_id",
        normalize=meta.get("normalize", True),
    ).select(
        "doc_id", F.col("doc_id_p").alias("pos"), F.col("__fp").alias("fp")
    )


def build_passage_index(
    corpus: DataFrame,
    path: str,
    k: int = 8,
    corpus_hop: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> None:
    """Build and persist the index from the corpus (one tokenize pass).
    ``k`` is the window length (must exceed the corpus's boilerplate
    shingle length — the attribution op's noise note); ``corpus_hop``
    the storage-volume knob (hop h stores 1/h of the windows; a
    verbatim cut still attributes at its exact offset with ~1/h of the
    votes, because the probe side slides at hop 1)."""
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "build_passage_index")
    if k < 2:
        raise ValueError(f"build_passage_index: k={k} must be >= 2")
    if corpus_hop < 1:
        raise ValueError(
            f"build_passage_index: corpus_hop={corpus_hop} must be >= 1"
        )
    meta = {
        "k": int(k),
        "corpus_hop": int(corpus_hop),
        "id_col": id_col,
        "text_col": text_col,
        # the curate() stage-0 discipline, frozen: windows fingerprinted
        # under a different canonicalization cannot vote with stored ones
        "normalize": bool(normalize),
        "layout": "ingest-batch-partitioned",
    }
    _write(
        _corpus_windows(corpus, meta),
        os.path.join(path, "windows"),
        "overwrite",
        BOOTSTRAP_BATCH,
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _META_FILE), "w") as fh:
        json.dump(meta, fh)


def read_meta(path: str) -> dict:
    """Read the index's frozen window config (filesystem + layout gates,
    the shared index-family discipline)."""
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "read_meta(passage_index)")
    meta_path = os.path.join(path, _META_FILE)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"passage index at {path!r} has no {_META_FILE} — not an index "
            f"built by build_passage_index"
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("layout") != "ingest-batch-partitioned" or "k" not in meta:
        raise ValueError(
            f"passage index at {path!r} is not an ingest-batch-partitioned "
            f"passage index — rebuild with build_passage_index"
        )
    return meta


def append_passage_index(
    docs: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """Append ACCEPTED documents' windows under the frozen config.
    ``batch_id=None`` appends unstaged (partition −2; replays duplicate
    window rows — they inflate vote counts on replayed content, so
    streaming callers MUST stage); a staged ``batch_id >= 0`` is a
    dynamic partition overwrite of its own batch — replay-safe."""
    meta = read_meta(path)
    if batch_id is None:
        mode, part = "append", UNSTAGED_BATCH
    else:
        if batch_id < 0:
            raise ValueError(
                f"append_passage_index: batch_id={batch_id} is reserved "
                f"(-1 build, -2 unstaged) — staged batch ids must be >= 0"
            )
        mode, part = "overwrite", batch_id
    _write(
        _corpus_windows(docs, meta), os.path.join(path, "windows"), mode, part
    )


def append_passage_index_windows(
    windows: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """Append ALREADY-DERIVED hop-1 windows (doc_id, pos, fp — the
    probe side's frame, renamed) — the tokenize-free twin of
    :func:`append_passage_index`, mirroring the containment index's
    signature-level append (r13; the r12 verdict's consistency nit: the
    streaming screen re-tokenized novel docs the probe had just
    windowed). The frame MUST be hop-1 under the index's frozen
    (k, normalize) — this function thins it to the index's
    ``corpus_hop`` itself (window starts are 1, 1+hop, …, so the
    hop-h subset of a hop-1 frame IS the hop-h derivation), which is
    what makes the reuse correct at any hop, not just hop 1."""
    meta = read_meta(path)
    if batch_id is None:
        mode, part = "append", UNSTAGED_BATCH
    else:
        if batch_id < 0:
            raise ValueError(
                f"append_passage_index_windows: batch_id={batch_id} is "
                f"reserved (-1 build, -2 unstaged) — staged batch ids "
                f"must be >= 0"
            )
        mode, part = "overwrite", batch_id
    hop = int(meta["corpus_hop"])
    if hop > 1:
        windows = windows.filter((F.col("pos") - 1) % hop == 0)
    _write(
        windows.select("doc_id", "pos", "fp"),
        os.path.join(path, "windows"),
        mode,
        part,
    )


def compact_passage_index(
    spark: SparkSession, path: str, preserve_last: bool = True
) -> dict[str, int]:
    """Fold accumulated per-batch window partitions into the bootstrap
    partition — the shared small-file fix (`compact_batched_tables`),
    same `preserve_last` replay shield and crash-healing swap."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        compact_batched_tables,
    )
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "compact_passage_index")
    read_meta(path)  # asserts this IS a passage index first
    return compact_batched_tables(spark, path, ("windows",), preserve_last)


def delete_from_passage_index(
    spark: SparkSession, path: str, ids
) -> dict[str, int]:
    """Remove documents' windows from the persisted passage index —
    the takedown cascade (DMCA/GDPR), touched partitions only, shared
    core `dedup_index.delete_from_batched_tables`. After deletion a
    passage cut from the removed doc no longer attributes to it."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        delete_from_batched_tables,
    )
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "delete_from_passage_index")
    read_meta(path)  # asserts this IS a passage index first
    return delete_from_batched_tables(
        spark, path, ("windows",), "doc_id", ids
    )


def drop_passage_index_batches(
    spark: SparkSession, path: str, batch_ids
) -> dict[str, int]:
    """Roll back whole ingest batches (a poisoned micro-batch) from the
    window table — `dedup_index.drop_index_batches` semantics."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        drop_index_batches,
    )

    read_meta(path)
    return drop_index_batches(spark, path, ("windows",), batch_ids)


def passage_index_report(spark: SparkSession, path: str) -> dict:
    """Ops data card over the window table (`dedup_index.index_report`)."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import index_report

    read_meta(path)
    return index_report(spark, path, ("windows",))


def attribute_against_index(
    probes: DataFrame,
    spark: SparkSession,
    path: str,
    min_matches: int = 2,
    exclude_batch: int | None = None,
    probe_id_col: str = "doc_id",
    text_col: str | None = None,
) -> DataFrame:
    """"Which lake document was this passage cut from" — fingerprint the
    probe passages (hop 1, the frozen k), join the STORED windows, run
    the constant-offset vote: (probe_id, doc_id, offset, n_matched),
    the batch op's contract verbatim. The corpus text is never scanned
    — the probe plan reads `windows/` only (plan-pinned in tests).
    ``exclude_batch`` hides one ingest_batch partition
    (partition-pruned) — the replay discipline. ``text_col=None`` uses
    the index's frozen text column for the probe side too."""
    meta = read_meta(path)
    pw = token_window_fingerprints(
        probes,
        meta["k"],
        1,
        probe_id_col,
        text_col if text_col is not None else meta["text_col"],
        "probe_id",
        normalize=meta.get("normalize", True),
    )
    return attribute_windows_against_index(
        pw, spark, path, min_matches=min_matches, exclude_batch=exclude_batch
    )


def attribute_windows_against_index(
    probe_windows: DataFrame,
    spark: SparkSession,
    path: str,
    min_matches: int = 2,
    exclude_batch: int | None = None,
) -> DataFrame:
    """The vote core over an ALREADY-DERIVED hop-1 probe window frame
    (probe_id, probe_id_p, __fp) — split out (r13) so the streaming
    screen can window each micro-batch ONCE and feed both the probe
    and the append-novel path (`append_passage_index_windows`) off the
    same frame, the containment screen's one-decode discipline applied
    to the text plane."""
    meta = read_meta(path)
    if min_matches < 1:
        raise ValueError(
            f"attribute_windows_against_index: min_matches={min_matches} "
            f"must be >= 1"
        )
    pw = probe_windows
    ref = spark.read.parquet(os.path.join(path, "windows"))
    if exclude_batch is not None:
        ref = ref.filter(F.col(BATCH_COL) != F.lit(int(exclude_batch)))
    return (
        pw.join(
            ref.select(
                F.col("doc_id").alias("ref_id"),
                F.col("pos").alias("ref_id_p"),
                F.col("fp").alias("__fp"),
            ),
            on="__fp",
        )
        .groupBy(
            "probe_id",
            F.col("ref_id").alias(meta["id_col"]),
            (F.col("ref_id_p") - F.col("probe_id_p")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") >= min_matches)
    )
