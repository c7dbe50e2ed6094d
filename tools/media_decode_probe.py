#!/usr/bin/env python
"""Decode-tax probe: measures what the round-11 SINGLE-DECODE streaming
media funnel actually buys per micro-batch.

Same batch, same index, two compositions:

  payload_path (the r10 writer shape): curate_media decides the batch
      (one decode per payload), then the kept PAYLOADS go to
      media_dedup_against_index (re-derives signatures = second decode
      of every keep) and the survivors' payloads to append_media_index
      (third decode of every survivor).
  signature_path (the r11 writer shape): curate_media_with_signatures
      decides AND returns the signature frames; the probe
      (media_dedup_signatures_against_index) and the append
      (append_media_index_signatures) run on those frames — zero
      additional decodes.

Both paths produce IDENTICAL survivor sets (asserted); the media is
sized so decode dominates (512x512 BMPs, 80k-sample WAVs, 24-frame
256x64 AVIs), which is the honest regime — the design doc's whole point
is that decode is the media lake's dominant cost.

Usage: python tools/media_decode_probe.py [n_docs] [families]
(defaults 240, 8). Prints one JSON line.

Round-11 measured (local[32], 240 docs, median of 3): dup-heavy batch
(families=8, 23 keeps) payload 33.7 s vs signature 23.9 s — 1.41x. At
high keep rates (families=80, 231 keeps) the shared bench VM's jitter
swamps the wall-clock effect (identical signature-path code sampled
18.7-55.6 s within one run), so the high-keep number is NOT claimed
from this probe; the structural account stands independently — the
payload path decodes every keep 2 extra times (probe + append), and
the signature path's ZERO re-decodes is spy-pinned in
tests/test_media_index.py::test_streaming_funnel_single_decode (every
payload-decoding entry poisoned), which is the guarantee that matters
at 100 TB where decode dominates.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from beeper_matric_etl_tool_spark import get_spark  # noqa: E402
from beeper_matric_etl_tool_spark.ext import multimodal as xmm  # noqa: E402
from beeper_matric_etl_tool_spark.ext.media_index import (  # noqa: E402
    append_media_index,
    append_media_index_signatures,
    build_media_index,
    media_dedup_against_index,
    media_dedup_signatures_against_index,
)

IMG_W, IMG_H = 512, 512
WAV_N = 80_000
AVI_W, AVI_H, AVI_N = 256, 64, 24


def payload_of(i: int, families: int = 8) -> bytes:
    """Mixed batch: modality round-robin, ``families`` families per
    modality, every second member the edited near-dup form (within-batch
    dups), plus the seed-0 originals colliding with the index. A
    ``families`` >= n/3 makes every doc unique — the high-keep-rate
    steady state where the payload path's re-decode tax is maximal."""
    m, j = i % 3, i // 3
    seed, variant = j % families, (j // families) % 2
    if m == 0:
        return xmm.make_gradient_bmp(
            IMG_W, IMG_H, seed, (IMG_W // 2) if variant else None
        )
    if m == 1:
        return xmm.make_saw_wav(WAV_N, seed, (1000, 2000) if variant else None)
    return xmm.make_gradient_avi(
        AVI_W, AVI_H, AVI_N, seed,
        (AVI_W // 2) if variant else None, (9, 18) if variant else None,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    families = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    os.environ.setdefault("SPARK_GRAFT_AQE", "1")
    spark = get_spark(app_name="media-decode-probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="media-decode-probe-")
    try:
        # index = the seed-0..1 originals (so some batch keeps drop there)
        idx_src = spark.createDataFrame(
            [(10_000 + k, bytearray(payload_of(k, families))) for k in range(6)],
            "doc_id long, payload binary",
        )
        batch = spark.createDataFrame(
            [(i, bytearray(payload_of(i, families))) for i in range(n)],
            "doc_id long, payload binary",
        ).localCheckpoint(eager=True)

        def run_payload_path(idx: str) -> set[int]:
            decisions = xmm.curate_media(batch)
            keeps = decisions.filter(F.col("decision") == "keep").select("doc_id")
            kept_payloads = batch.join(keeps, on="doc_id")
            survivors, _ = media_dedup_against_index(
                kept_payloads, spark, idx, exclude_batch=0
            )
            survivors = survivors.localCheckpoint(eager=True)
            append_media_index(
                survivors.select("doc_id", "payload"), idx, batch_id=0
            )
            return {r.doc_id for r in survivors.select("doc_id").collect()}

        def run_signature_path(idx: str) -> set[int]:
            decisions, sigs = xmm.curate_media_with_signatures(batch)
            keeps = decisions.filter(F.col("decision") == "keep").select("doc_id")
            kept_sigs = sigs.join(keeps, on="doc_id")
            dropped = media_dedup_signatures_against_index(
                kept_sigs, spark, idx, exclude_batch=0
            )
            survivor_sigs = kept_sigs.join(
                dropped.select("doc_id"), on="doc_id", how="left_anti"
            ).localCheckpoint(eager=True)
            append_media_index_signatures(survivor_sigs, idx, batch_id=0)
            return {r.doc_id for r in survivor_sigs.select("doc_id").collect()}

        out = {"n_docs": n, "families": families, "media": {
            "bmp": f"{IMG_W}x{IMG_H}", "wav_samples": WAV_N,
            "avi": f"{AVI_W}x{AVI_H}x{AVI_N}",
        }}
        results: dict[str, set[int]] = {}
        for name, fn in (
            ("payload_path", run_payload_path),
            ("signature_path", run_signature_path),
        ):
            samples = []
            for rep in range(3):
                idx = os.path.join(work, f"idx-{name}-{rep}")
                build_media_index(idx_src, idx)
                t0 = time.perf_counter()
                results[name] = fn(idx)
                samples.append(round(time.perf_counter() - t0, 3))
            out[name] = {
                "median_sec": round(statistics.median(samples), 3),
                "samples": samples,
            }
        # cost-only: both compositions decide identically
        assert results["payload_path"] == results["signature_path"], (
            "survivor sets diverged — the probe is measuring different "
            "semantics, not different costs"
        )
        out["identical_survivors"] = len(results["payload_path"])
        out["speedup"] = round(
            out["payload_path"]["median_sec"]
            / out["signature_path"]["median_sec"], 2,
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
