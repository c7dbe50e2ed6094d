"""Persisted passage-attribution index (ext/passage_index.py): build the
corpus windows once, attribute probes without any corpus text scan
(plan-pinned), staged appends replay-safe, shared compaction — the text
twin of the containment index's lifecycle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.passage_index import (
    append_passage_index,
    attribute_against_index,
    build_passage_index,
    compact_passage_index,
    read_meta,
)


@pytest.fixture()
def corpus_on_disk(spark, tmp_path):
    """Corpus WRITTEN TO PARQUET and read back, so a corpus text scan
    would be identifiable in probe plans."""
    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [
            (7, " ".join(f"w{i}" for i in range(60))),
            (8, " ".join(f"x{i}" for i in range(60))),
        ],
        "doc_id long, text string",
    ).write.parquet(path)
    return spark.read.parquet(path)


def _probe(spark, pid, text):
    return spark.createDataFrame([(pid, text)], "doc_id long, text string")


def test_build_probe_no_corpus_text_scan(spark, tmp_path, corpus_on_disk):
    idx = str(tmp_path / "pidx")
    build_passage_index(corpus_on_disk, idx, k=8)
    assert read_meta(idx)["k"] == 8

    cut = " ".join(f"w{i}" for i in range(10, 30))
    hits = attribute_against_index(_probe(spark, 900, cut), spark, idx)
    rows = hits.collect()
    assert [
        (r.probe_id, r.doc_id, r.offset, r.n_matched) for r in rows
    ] == [(900, 7, 10, 13)]  # batch-op verdict, verbatim

    # plan pin: the corpus TEXT never enters the probe plan — only the
    # stored window relation (fp/pos) is read
    # the probe's own text appears (LocalTableScan of the probe side);
    # the PARQUET scans must read the stored fp/pos windows only —
    # a corpus text scan would show a text column in a FileScan
    import re

    plan = hits._jdf.queryExecution().executedPlan().toString()

    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    assert scans and all("text" not in sc for sc in scans)

    # the batch op agrees bit-for-bit
    from beeper_matric_etl_tool_spark.ext.text import passage_attribution

    batch = passage_attribution(
        _probe(spark, 900, cut), corpus_on_disk, k=8
    ).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, rows))


def test_staged_append_replay_exclusion_compact(spark, tmp_path, corpus_on_disk):
    idx = str(tmp_path / "pidx")
    build_passage_index(corpus_on_disk, idx, k=8)
    new_doc = spark.createDataFrame(
        [(20, " ".join(f"y{i}" for i in range(40)))], "doc_id long, text string"
    )
    append_passage_index(new_doc, idx, batch_id=5)

    cut = " ".join(f"y{i}" for i in range(4, 24))
    probes = _probe(spark, 901, cut)
    rows = attribute_against_index(probes, spark, idx).collect()
    assert [(r.doc_id, r.offset, r.n_matched) for r in rows] == [(20, 4, 13)]
    # the replay discipline: excluding batch 5 hides its windows
    assert (
        attribute_against_index(probes, spark, idx, exclude_batch=5).count()
        == 0
    )

    # replaying the staged append REPLACES batch 5 (vote counts stable —
    # an unstaged duplicate would have doubled n_matched)
    append_passage_index(new_doc, idx, batch_id=5)
    rows2 = attribute_against_index(probes, spark, idx).collect()
    assert [(r.doc_id, r.offset, r.n_matched) for r in rows2] == [(20, 4, 13)]

    # compaction folds batches (preserve_last shields the newest staged)
    append_passage_index(
        spark.createDataFrame(
            [(30, " ".join(f"z{i}" for i in range(20)))],
            "doc_id long, text string",
        ),
        idx,
        batch_id=9,
    )
    n_all = spark.read.parquet(os.path.join(idx, "windows")).count()
    counts = compact_passage_index(spark, idx)
    assert counts == {"windows": n_all}
    parts = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(idx, "windows"))
        if d.startswith("ingest_batch=")
    }
    assert parts == {-1, 9}
    rows3 = attribute_against_index(probes, spark, idx).collect()
    assert [(r.doc_id, r.offset, r.n_matched) for r in rows3] == [(20, 4, 13)]


def test_hopped_index_and_guards(spark, tmp_path, corpus_on_disk):
    idx = str(tmp_path / "pidx_h")
    build_passage_index(corpus_on_disk, idx, k=8, corpus_hop=2)
    cut = " ".join(f"w{i}" for i in range(10, 30))
    rows = attribute_against_index(_probe(spark, 900, cut), spark, idx).collect()
    # hop 2 stores half the windows; exact offset, ~half the votes
    assert [(r.doc_id, r.offset, r.n_matched) for r in rows] == [(7, 10, 7)]

    with pytest.raises(ValueError, match="k="):
        build_passage_index(corpus_on_disk, str(tmp_path / "bad"), k=1)
    with pytest.raises(FileNotFoundError, match="no _META.json"):
        read_meta(str(tmp_path / "nowhere"))
    with pytest.raises(ValueError, match="reserved"):
        append_passage_index(corpus_on_disk, idx, batch_id=-1)


def test_streaming_attribution_screen(spark, tmp_path, corpus_on_disk):
    """Real readStream -> foreachBatch run of the passage screen: a
    novel batch appends its windows; a later passage cut from the
    streamed-in doc AND one cut from the bootstrap corpus are both
    attributed at exact offsets; hit docs are not appended; replaying a
    batch keeps vote counts stable; a fresh checkpoint against the
    staged index fails the binding gate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beeper_matric_etl_tool_spark.streaming.attribution import (
        start_attribution_stream,
    )

    idx = str(tmp_path / "pidx")
    build_passage_index(corpus_on_disk, idx, k=8)
    src = tmp_path / "src"
    src.mkdir()
    hits_dir = str(tmp_path / "hits")

    def emit(q, name, rows):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, str(src / name))
        q.processAllAvailable()

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q = start_attribution_stream(
        stream, idx, hits_dir, str(tmp_path / "ckpt"), append_novel=True
    )
    try:
        novel_text = " ".join(f"n{i}" for i in range(50))
        emit(q, "b0.parquet", [(500, novel_text)])  # novel -> appended

        emit(
            q,
            "b1.parquet",
            [
                (600, " ".join(f"w{i}" for i in range(10, 30))),  # bootstrap
                (601, " ".join(f"n{i}" for i in range(5, 25))),   # streamed
            ],
        )
        h = {
            r.probe_id: (r.doc_id, r.offset, r.n_matched)
            for r in spark.read.parquet(hits_dir).collect()
        }
        assert h == {600: (7, 10, 13), 601: (500, 5, 13)}
        # hit docs were NOT appended; the novel doc was (batch 0)
        win = spark.read.parquet(os.path.join(idx, "windows"))
        assert {
            r.doc_id for r in win.select("doc_id").distinct().collect()
        } == {7, 8, 500}
    finally:
        q.stop()

    with pytest.raises(Exception, match="checkpoint"):
        start_attribution_stream(
            stream, idx, hits_dir, str(tmp_path / "ckpt2")
        )


def test_read_only_screens_share_one_index(spark, tmp_path, corpus_on_disk):
    """r13 read-only screen mode: TWO concurrent read-only attribution
    screens share ONE frozen index (the decontamination shape — N
    ingest feeds vs one eval-set index). Neither takes the index
    binding; each binds its own hits_dir; the index gains no partitions
    and no _STREAM.json; verdicts equal the batch op's. A read-only
    writer with append_novel is rejected at construction, and a second
    checkpoint against the SAME hits_dir still fails the (relocated)
    binding gate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beeper_matric_etl_tool_spark.streaming.attribution import (
        attribution_batch_writer,
        start_attribution_stream,
    )

    idx = str(tmp_path / "pidx_ro")
    build_passage_index(corpus_on_disk, idx, k=8)

    with pytest.raises(ValueError, match="read_only"):
        attribution_batch_writer(
            idx, str(tmp_path / "h0"), append_novel=True, read_only=True
        )

    def emit(src, q, name, rows):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, str(src / name))
        q.processAllAvailable()

    cut7 = " ".join(f"w{i}" for i in range(10, 30))
    cut8 = " ".join(f"x{i}" for i in range(20, 40))
    queries, srcs, hits = [], [], []
    try:
        for n in (1, 2):
            src = tmp_path / f"src{n}"
            src.mkdir()
            srcs.append(src)
            hits.append(str(tmp_path / f"hits{n}"))
            stream = spark.readStream.schema(
                "doc_id long, text string"
            ).parquet(str(src))
            queries.append(
                start_attribution_stream(
                    stream,
                    idx,
                    hits[-1],
                    str(tmp_path / f"ckpt{n}"),
                    read_only=True,
                )
            )
        emit(srcs[0], queries[0], "a.parquet", [(600, cut7)])
        emit(srcs[1], queries[1], "b.parquet", [(700, cut8)])
        h1 = {
            r.probe_id: (r.doc_id, r.offset, r.n_matched)
            for r in spark.read.parquet(hits[0]).collect()
        }
        h2 = {
            r.probe_id: (r.doc_id, r.offset, r.n_matched)
            for r in spark.read.parquet(hits[1]).collect()
        }
        assert h1 == {600: (7, 10, 13)}
        assert h2 == {700: (8, 20, 13)}
    finally:
        for q in queries:
            q.stop()

    # the shared index is untouched: bootstrap partition only, unbound
    win_parts = {
        d
        for d in os.listdir(os.path.join(idx, "windows"))
        if d.startswith("ingest_batch=")
    }
    assert win_parts == {"ingest_batch=-1"}
    assert not os.path.exists(os.path.join(idx, "_STREAM.json"))

    # the relocated gate: a FRESH checkpoint against screen 1's
    # hits_dir is still rejected (batch-id collision protection)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(srcs[0])
    )
    with pytest.raises(Exception, match="checkpoint"):
        start_attribution_stream(
            stream, idx, hits[0], str(tmp_path / "ckpt_fresh"), read_only=True
        )


def test_append_windows_equals_text_append_at_any_hop(spark, tmp_path):
    """r13 window-reuse: appending the probe side's ALREADY-DERIVED
    hop-1 window frame stores rows BIT-IDENTICAL to re-tokenizing the
    text under the index's corpus_hop — pinned at hop 3, where the
    function must thin the frame itself (window starts 1, 1+h, ...)."""
    from beeper_matric_etl_tool_spark.ext.passage_index import (
        append_passage_index_windows,
    )
    from beeper_matric_etl_tool_spark.ext.text import (
        token_window_fingerprints,
    )

    corpus = spark.createDataFrame(
        [(7, " ".join(f"w{i}" for i in range(40)))], "doc_id long, text string"
    )
    doc = spark.createDataFrame(
        [(9, " ".join(f"z{i}" for i in range(30)))], "doc_id long, text string"
    )

    idx_a = str(tmp_path / "pidx_text")
    idx_b = str(tmp_path / "pidx_wins")
    for idx in (idx_a, idx_b):
        build_passage_index(corpus, idx, k=8, corpus_hop=3)
    append_passage_index(doc, idx_a, batch_id=0)

    pw = token_window_fingerprints(doc, 8, 1, "doc_id", "text", "probe_id")
    append_passage_index_windows(
        pw.select(
            F.col("probe_id").alias("doc_id"),
            F.col("probe_id_p").alias("pos"),
            F.col("__fp").alias("fp"),
        ),
        idx_b,
        batch_id=0,
    )

    def rows(idx):
        return sorted(
            (r.doc_id, r.pos, r.fp, r.ingest_batch)
            for r in spark.read.parquet(os.path.join(idx, "windows")).collect()
        )

    assert rows(idx_a) == rows(idx_b)
    # the thinning actually happened: hop 3 stores positions 1, 4, 7, …
    stored = {r[1] for r in rows(idx_b) if r[0] == 9}
    assert stored == {1, 4, 7, 10, 13, 16, 19, 22}  # 30 tokens, k=8
