"""Persisted media-signature index — the build/probe/append lifecycle of
media near-dup at steady state (SURVEY §2.12 multimodal tier; the media
analog of ext/dedup_index.py's text lifecycle).

A media lake's dominant cost is the DECODE: every signature pass walks
pixel/PCM/frame bytes. `curate_media` and the *_near_dup_pairs operators
re-decode the whole corpus every run — fine for a one-shot curation,
wrong at steady state where yesterday's lake is already decoded. The
index amortizes it:

  build:   ONE decode pass over the kept corpus → `signatures/` parquet
           (doc_id, modality, bits[sig_bits], width/height/n_frames) — a
           few hundred bytes per media object regardless of media size —
           plus `_META.json` pinning the signature config (method AND
           width; width drives banding selectivity, see
           multimodal.DEFAULT_SIG_BITS).
  probe:   `media_dedup_against_index` decodes ONLY the new batch, bands
           batch + index signatures together (modality inside the band
           key, so an image can never band against an audio clip), and
           verifies exact hamming on candidates. The reference media
           bytes are NEVER touched — the plan's only Python stages are
           the new batch's decodes (plan-pinned in tests). Callers that
           ALREADY derived signatures (the curation funnel returns its
           frames) use `media_dedup_signatures_against_index` — the
           decode-free core the streaming writer composes (r11: exactly
           one decode per payload per micro-batch, spy-pinned).
  append:  accepted survivors extend `signatures/` — one decode pass via
           `append_media_index`, or ZERO via
           `append_media_index_signatures` over already-derived frames
           (in-plan width assertion); the next probe sees them without
           any rebuild.

Config is part of the index, not the call: the image hash method
(dhash/ahash) and the signature width are written to `_META.json` at
build time and validated at probe/append — signatures computed under a
different method band differently and would silently change decisions.
``max_hamming``/``bands`` stay probe-time OVERRIDES: both sides band
fresh at probe time, so there is no stored banding to mismatch (the
pigeonhole guarantee is enforced per probe) — but their DEFAULTS come
from the meta (r11): ``bands_hint`` (derived at build —
corpus-estimate-sized or the smallest divisor clearing the
width-coupled radius) and ``max_hamming_hint`` (a pinned build radius),
so an estimate-sized index drives its own probes with nothing
hand-picked.

Layout: `signatures/` is hive-partitioned by ``ingest_batch`` exactly
like the text dedup index (build −1, unstaged appends −2, staged appends
their batch id): a staged append is a dynamic partition OVERWRITE of its
own batch — replays replace instead of duplicating — and a probe can
EXCLUDE one batch (partition-pruned) so a replayed micro-batch sees
exactly the state its first attempt saw.

Filesystem contract: `_META.json` is written with plain `os`/`open` —
the same POSIX-local assumption as the sinks family; scheme-prefixed
paths fail with the contract error up front (`sinks._require_local_path`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.dedup import simhash_cross_candidates
from beeper_matric_etl_tool_spark.ext.multimodal import (
    DEFAULT_SIG_BITS,
    audio_fingerprint_bits,
    default_media_hamming,
    dispatch_modality,
    image_perceptual_bits,
    video_hash_bits,
)

_META_FILE = "_META.json"

#: hive partition column (shared convention with ext/dedup_index.py)
BATCH_COL = "ingest_batch"
BOOTSTRAP_BATCH = -1
UNSTAGED_BATCH = -2

#: the stored signature relation's contract columns
SIGNATURE_COLUMNS = ("doc_id", "modality", "bits", "width", "height", "n_frames")


def media_signatures(
    with_payload: DataFrame,
    id_col: str = "doc_id",
    image_method: str = "dhash",
    n_bits: int = DEFAULT_SIG_BITS,
) -> DataFrame:
    """(doc_id, modality, bits, width, height, n_frames) — ONE decode pass
    over a mixed-media frame: JVM magic-byte dispatch, then each
    modality's signature stage. The shared derivation for build, append
    AND the probe's batch side, so the three can never drift. Dead-letter
    rows (unknown container, corrupt body, too-short media) are EXCLUDED
    — an index stores only comparable signatures; callers that need the
    drop audit run `curate_media`, which reports them."""
    d = dispatch_modality(with_payload).select(
        F.col(id_col).alias("doc_id"), "payload", "modality"
    )
    img = image_perceptual_bits(
        d.filter(F.col("modality") == "image"), method=image_method, n_bits=n_bits
    ).select(
        "doc_id",
        F.lit("image").alias("modality"),
        "bits",
        "width",
        "height",
        F.lit(None).cast("int").alias("n_frames"),
        "error",
    )
    aud = audio_fingerprint_bits(
        d.filter(F.col("modality") == "audio"), n_bits=n_bits
    ).select(
        "doc_id",
        F.lit("audio").alias("modality"),
        "bits",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.col("n_frames"),
        "error",
    )
    vid = video_hash_bits(
        d.filter(F.col("modality") == "video"), n_bits=n_bits
    ).select(
        "doc_id",
        F.lit("video").alias("modality"),
        "bits",
        "width",
        "height",
        F.col("n_video_frames").alias("n_frames"),
        "error",
    )
    return (
        img.unionByName(aud)
        .unionByName(vid)
        .filter(F.col("error").isNull())
        .select(*SIGNATURE_COLUMNS)
    )


def _write(df: DataFrame, path: str, mode: str, batch_id: int) -> None:
    """Write signatures under their ``ingest_batch`` partition (the
    dedup_index staging discipline: static overwrite at build, dynamic
    partition overwrite for staged appends)."""
    writer = df.withColumn(
        BATCH_COL, F.lit(int(batch_id)).cast("long")
    ).write.mode(mode)
    if mode == "overwrite" and batch_id != BOOTSTRAP_BATCH:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(BATCH_COL).parquet(path)


def build_media_index(
    with_payload: DataFrame,
    path: str,
    id_col: str = "doc_id",
    image_method: str = "dhash",
    sig_bits: int | None = None,
    corpus_estimate: int | None = None,
    max_hamming: int | None = None,
) -> None:
    """Build and persist the index from the already-kept media corpus
    (one decode pass). The signature config is frozen in `_META.json`
    for the index's lifetime.

    SIZING: pass ``corpus_estimate`` (the expected steady-state object
    count — count it or estimate it once, the LSH plane rule's
    discipline) and the width AND a probe-time ``bands_hint`` are
    derived by `multimodal.scaled_media_banding_for`; every probe/search
    entry then defaults its ``bands`` (and, for a pinned radius, its
    ``max_hamming``) from the stored hints — nothing hand-picked at
    probe time. ``max_hamming`` here PINS an absolute radius for the
    sizing (the explicit precision choice that unlocks width-scaled
    selectivity — the 10⁹-object lake pins e.g. 15 and gets 576 bits in
    16×36-bit bands; see `scaled_media_banding_for` for why the coupled
    default instead raises past ~10⁸) and is stored as
    ``max_hamming_hint`` so probes resolve the SAME radius the index
    was sized for. ``sig_bits`` pins the width explicitly instead (the
    bands hint is then the smallest divisor of the width that keeps the
    width-coupled radius un-capped — a fixed 16 would make e.g. a
    324-bit index unusable, 324 % 16 != 0); passing BOTH sig_bits and
    corpus_estimate raises — two sources of truth for a frozen
    parameter is how width drift starts."""
    from beeper_matric_etl_tool_spark.ext.multimodal import (
        scaled_media_banding_for,
    )
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "build_media_index")
    if image_method not in ("dhash", "ahash"):
        raise ValueError(f"build_media_index: unknown image_method {image_method!r}")
    if corpus_estimate is not None and sig_bits is not None:
        raise ValueError(
            "build_media_index: pass corpus_estimate OR sig_bits, not both — "
            "the estimate derives the width (scaled_media_banding_for); an "
            "explicit width that disagrees would silently misband every probe"
        )
    if corpus_estimate is not None:
        sig_bits, bands_hint = scaled_media_banding_for(
            corpus_estimate, max_hamming=max_hamming
        )
    else:
        sig_bits = DEFAULT_SIG_BITS if sig_bits is None else sig_bits
        # smallest divisor whose recall cap (bands-1) clears the
        # width-coupled radius — a fixed 16 would freeze an unusable
        # (non-dividing) or silently-capped config at widths != 256
        h = max_hamming if max_hamming is not None else max(
            12, (15 * sig_bits) // 256
        )
        bands_hint = next(
            (b for b in range(h + 1, sig_bits + 1) if sig_bits % b == 0),
            sig_bits,  # degenerate tiny widths: every-bit bands, still valid
        )
    sigs = media_signatures(
        with_payload, id_col=id_col, image_method=image_method, n_bits=sig_bits
    )
    _write(sigs, os.path.join(path, "signatures"), "overwrite", BOOTSTRAP_BATCH)
    meta = {
        "image_method": image_method,
        "n_bits": sig_bits,
        "id_col": id_col,
        "layout": "ingest-batch-partitioned",
        "bands_hint": bands_hint,
    }
    if corpus_estimate is not None:
        meta["corpus_estimate"] = int(corpus_estimate)
    if max_hamming is not None:
        meta["max_hamming_hint"] = int(max_hamming)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _META_FILE), "w") as fh:
        json.dump(meta, fh)


def read_meta(path: str) -> dict:
    """Read the index's frozen signature config (filesystem contract
    guarded first, like the text index)."""
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "read_meta(media_index)")
    meta_path = os.path.join(path, _META_FILE)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"media index at {path!r} has no {_META_FILE} — not an index "
            f"built by build_media_index"
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("layout") != "ingest-batch-partitioned":
        raise ValueError(
            f"media index at {path!r} is not ingest-batch-partitioned — "
            f"rebuild with build_media_index"
        )
    return meta


def append_media_index(
    accepted: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """Append a batch of ACCEPTED media (e.g. `media_dedup_against_index`
    survivors after ingestion): one decode pass under the index's stored
    config. ``batch_id=None`` appends unstaged (partition −2; a replayed
    append duplicates rows — harmless for decisions, witness selection is
    a content-based minimum, but wasteful). A staged ``batch_id >= 0`` is a dynamic
    partition overwrite of its own batch — replay-safe. Callers that
    already hold the batch's signature frames (the curation funnel
    returns them) should use :func:`append_media_index_signatures`
    instead — this entry exists for payload-only callers and pays one
    decode pass for it."""
    meta = read_meta(path)
    sigs = media_signatures(
        accepted, id_col=meta["id_col"], image_method=meta["image_method"],
        n_bits=meta["n_bits"],
    )
    append_media_index_signatures(sigs, path, batch_id=batch_id)


def append_media_index_signatures(
    sigs: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """The decode-free append: extend ``signatures/`` with
    ALREADY-DERIVED signature frames (the `media_signatures` /
    `curate_media_with_signatures` contract shape — doc_id, modality,
    bits, width, height, n_frames). CONTRACT: the frames must have been
    derived under the index's frozen config (width AND image method) —
    the streaming writer guarantees it by construction (it forces the
    funnel's ``sig_bits``/``image_method`` from this index's meta and
    rejects caller overrides); hand-rolled callers that appended frames
    of a different width would poison banding selectivity silently, so
    the stored width is asserted against the frames' array length in the
    write plan (a mismatched row fails the job, not the lake).
    Staging semantics are :func:`append_media_index`'s."""
    meta = read_meta(path)
    n_bits = int(meta["n_bits"])
    checked = sigs.select(*SIGNATURE_COLUMNS).withColumn(
        "bits",
        F.when(F.size("bits") == n_bits, F.col("bits")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"append_media_index_signatures: signature width "
                        f"mismatch — index {path!r} is frozen at {n_bits} "
                        f"bits, got "
                    ),
                    F.size("bits").cast("string"),
                )
            )
        ),
    )
    if batch_id is None:
        mode, part = "append", UNSTAGED_BATCH
    else:
        if batch_id < 0:
            raise ValueError(
                f"append_media_index_signatures: batch_id={batch_id} is "
                f"reserved (-1 build, -2 unstaged) — staged batch ids must "
                f"be >= 0"
            )
        mode, part = "overwrite", batch_id
    _write(checked, os.path.join(path, "signatures"), mode, part)


def rank_media_variants(
    probe_sigs: DataFrame,
    ref_sigs: DataFrame,
    max_hamming: int | None = None,
    k: int = 10,
    bands: int = 16,
    n_bits: int = DEFAULT_SIG_BITS,
) -> DataFrame:
    """The relational core of :func:`media_search`, over signature frames
    (doc_id, modality, bits) — banded cross candidates, exact hamming,
    bounded per-probe top-k window with the (hamming, ref_id)
    deterministic order. Factored out so the ranked-retrieval semantics
    are testable and oracle-checkable without a filesystem index.
    ``max_hamming=None`` resolves via
    `multimodal.default_media_hamming(n_bits, bands)` — width-scaled."""
    from pyspark.sql import Window

    if max_hamming is None:
        max_hamming = default_media_hamming(n_bits, bands)
    pairs = simhash_cross_candidates(
        probe_sigs.select("doc_id", "modality", "bits"),
        ref_sigs.select("doc_id", "modality", "bits"),
        max_hamming=max_hamming,
        bands=bands,
        n_bits=n_bits,
        key_cols=("modality",),
        cache=False,
    )
    w = Window.partitionBy("doc_id").orderBy("hamming", "ref_id")
    return (
        pairs.join(probe_sigs.select("doc_id", "modality"), on="doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc_id").alias("probe_id"),
            "ref_id",
            "modality",
            "hamming",
            "rank",
        )
    )


def media_search(
    probes: DataFrame,
    spark: SparkSession,
    path: str,
    max_hamming: int | None = None,
    k: int = 10,
    bands: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Ranked variant retrieval over the persisted index: for each probe
    payload, the up-to-``k`` closest indexed media of the SAME modality
    within ``max_hamming`` — (probe_id, ref_id, modality, hamming, rank),
    rank 1 = closest, ties broken by ref_id (deterministic). "Find every
    variant of this image in the lake, closest first."

    This is bounded-radius retrieval, not unbounded k-NN — candidates
    come from the banding equi-join, so recall is total WITHIN
    ``max_hamming ≤ bands-1`` (enforced) and zero beyond it; an
    unbounded nearest search over hamming signatures would need an
    all-pairs scan the banded plan exists to avoid. Probes decode once;
    the index side is the signature scan (no reference media bytes, the
    probe-plan discipline of `media_dedup_against_index`). The top-k cut
    is a bounded per-probe window over candidate rows only.
    ``max_hamming=None`` resolves via
    `multimodal.default_media_hamming(meta n_bits, bands)`;
    ``bands=None`` via the index's stored ``bands_hint`` (the
    corpus-sized build rule — see `build_media_index`)."""
    meta = read_meta(path)
    if bands is None:
        bands = int(meta.get("bands_hint", 16))
    if max_hamming is None:
        # explicit None check, not truthiness: max_hamming=0 is a
        # legitimate pinned radius (exact-dup-only index) and must not
        # fall through to the width-coupled default
        h = meta.get("max_hamming_hint")
        if h is not None:
            max_hamming = int(h)  # pinned-radius index
    ref = spark.read.parquet(os.path.join(path, "signatures")).select(
        F.col("doc_id"), "modality", "bits"
    )
    probe_sigs = media_signatures(
        probes, id_col=id_col, image_method=meta["image_method"],
        n_bits=meta["n_bits"],
    ).localCheckpoint(eager=True)
    return rank_media_variants(
        probe_sigs, ref,
        max_hamming=max_hamming, k=k, bands=bands, n_bits=meta["n_bits"],
    )


def compact_media_index(
    spark: SparkSession, path: str, preserve_last: bool = True
) -> dict[str, int]:
    """Fold the accumulated per-batch signature partitions into the
    bootstrap partition — the text index's small-file fix applied to the
    media index (same core: `dedup_index.compact_batched_tables`, same
    `preserve_last` replay shield for the one uncommitted micro-batch a
    stopped stream can leave behind, same crash-healing two-rename
    swap). Decisions are unaffected: the probe unions all partitions
    either way and witness selection is content-based."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        compact_batched_tables,
    )
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "compact_media_index")
    read_meta(path)  # asserts this IS a media index before touching anything
    return compact_batched_tables(spark, path, ("signatures",), preserve_last)


def delete_from_media_index(
    spark: SparkSession, path: str, ids
) -> dict[str, int]:
    """Remove documents' signatures from the persisted media index —
    the takedown cascade (DMCA/GDPR), touched partitions only, shared
    core `dedup_index.delete_from_batched_tables` (same crash-healing
    rename discipline as compaction). After deletion a re-upload of the
    removed media no longer drops as its near-dup."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        delete_from_batched_tables,
    )
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "delete_from_media_index")
    read_meta(path)  # asserts this IS a media index first
    return delete_from_batched_tables(
        spark, path, ("signatures",), "doc_id", ids
    )


def drop_media_index_batches(
    spark: SparkSession, path: str, batch_ids
) -> dict[str, int]:
    """Roll back whole ingest batches (a poisoned micro-batch) from the
    signature table — `dedup_index.drop_index_batches` semantics."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        drop_index_batches,
    )

    read_meta(path)
    return drop_index_batches(spark, path, ("signatures",), batch_ids)


def media_index_report(spark: SparkSession, path: str) -> dict:
    """Ops data card over the signature table (`dedup_index.index_report`)."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import index_report

    read_meta(path)
    return index_report(spark, path, ("signatures",))


def media_dedup_against_index(
    new_media: DataFrame,
    spark: SparkSession,
    path: str,
    max_hamming: int | None = None,
    bands: int | None = None,
    exclude_batch: int | None = None,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Incremental media near-dup against the PERSISTED index:
    ``(survivors, dropped)`` over the new batch, where dropped rows carry
    (doc_id, modality, ref_id, hamming) — the witness is the CLOSEST
    matching index doc (minimum hamming, ties broken by smallest
    ref_id), so a dedup-threshold post-filter on witness hamming sees
    the true nearest distance. ONLY the new batch is decoded; the index
    side is a parquet scan of (id, modality, sig_bits small ints) —
    reference media bytes never enter the plan (plan-pinned in tests).

    Banding keys include the modality, so cross-modality collisions are
    impossible by construction. ``max_hamming``/``bands`` are probe-time
    knobs (both sides band fresh); the pigeonhole recall guarantee is
    enforced per probe. ``exclude_batch`` hides one ingest_batch
    partition (partition-pruned) — the streaming replay discipline
    shared with the text index. Batch rows whose payload is undecodable
    SURVIVE the probe (they have no signature to compare; the curation
    funnel, not the index probe, is where undecodables are dropped).
    ``max_hamming=None`` resolves via
    `multimodal.default_media_hamming(meta n_bits, bands)`; ``bands=None``
    via the index's stored ``bands_hint``."""
    # ONE decode pass over the batch: the checkpoint is consumed by the
    # banding join AND the witness join-back (cache=False in the core —
    # this materialization already cut the decode lineage)
    meta = read_meta(path)
    batch_sigs = media_signatures(
        new_media, id_col=id_col, image_method=meta["image_method"],
        n_bits=meta["n_bits"],
    ).localCheckpoint(eager=True)
    dropped = media_dedup_signatures_against_index(
        batch_sigs, spark, path,
        max_hamming=max_hamming, bands=bands, exclude_batch=exclude_batch,
    )
    survivors = new_media.join(
        dropped.select(F.col("doc_id").alias(id_col)), on=id_col, how="left_anti"
    )
    return survivors, dropped


def media_dedup_signatures_against_index(
    batch_sigs: DataFrame,
    spark: SparkSession,
    path: str,
    max_hamming: int | None = None,
    bands: int | None = None,
    exclude_batch: int | None = None,
) -> DataFrame:
    """The decode-free probe core: near-dup the batch's ALREADY-DERIVED
    signature frames (`media_signatures` / `curate_media_with_signatures`
    shape — at least doc_id, modality, bits) against the persisted
    index, returning the dropped relation (doc_id, modality, ref_id,
    hamming) with the closest-match witness (min hamming, ties to the
    smallest ref_id). Survivors are whatever the caller anti-joins this
    against — payloads, signature frames, or ids.

    This is the entry the streaming writer composes with the funnel:
    `curate_media_with_signatures` already decoded the batch once, so
    probing its frames here makes the whole micro-batch cost exactly one
    decode per payload (spy-pinned in tests). CONTRACT: the frames must
    be derived under the index's frozen config (width and image method);
    the writer enforces it by construction. Banding, recall guarantee,
    modality-keyed candidates, ``exclude_batch`` replay pruning and the
    ``max_hamming=None`` width-scaled default are
    `media_dedup_against_index`'s, verbatim — that function is now this
    core plus one batch decode."""
    meta = read_meta(path)
    if bands is None:
        bands = int(meta.get("bands_hint", 16))
    ref = spark.read.parquet(os.path.join(path, "signatures"))
    if exclude_batch is not None:
        ref = ref.filter(F.col(BATCH_COL) != F.lit(int(exclude_batch)))
    ref_sigs = ref.select(F.col("doc_id"), "modality", "bits")
    if max_hamming is None:
        # a pinned-radius index resolves the SAME radius it was sized
        # for — explicit None check: a pinned radius of 0 (exact-dup-
        # only) is falsy but present, and must not silently widen to
        # the width-coupled default
        h = meta.get("max_hamming_hint")
        max_hamming = (
            int(h) if h is not None
            else default_media_hamming(meta["n_bits"], bands)
        )
    pairs = simhash_cross_candidates(
        batch_sigs.select("doc_id", "modality", "bits"),
        ref_sigs,
        max_hamming=max_hamming,
        bands=bands,
        n_bits=meta["n_bits"],
        key_cols=("modality",),
        cache=False,
    )
    # closest-match witness: min over (hamming, ref_id) structs orders
    # lexicographically — minimum distance first, smallest ref_id on ties
    # (deterministic; a threshold post-filter on witness hamming sees the
    # true nearest distance, not an arbitrary matching doc's)
    witness = pairs.groupBy("doc_id").agg(
        F.min(F.struct("hamming", "ref_id")).alias("__w")
    ).select(
        "doc_id", F.col("__w.ref_id").alias("ref_id"),
        F.col("__w.hamming").alias("hamming"),
    )
    return (
        batch_sigs.join(witness, on="doc_id", how="inner")
        .select("doc_id", "modality", "ref_id", "hamming")
    )
