#!/usr/bin/env python
"""Banding-entropy probe: the reproducible evidence behind the round-10
banding scale fixes (BASELINE.md "Media curation funnel" row).

Emulates the candidate-pair generation of `ext/dedup.py`'s pigeonhole
banding over a planted acoustic-fingerprint corpus (the same family
structure the media_curation scale probe uses) under four configurations,
NumPy-only so the counts are exact and the run takes seconds:

  1. 64-bit signatures, contiguous bands      — 4-bit band values: the
     config that wedged the original probe (candidates ~ n²/16 per band)
  2. 256-bit, contiguous bands + skew guard   — still blown up: adjacent-
     comparison fingerprints concentrate entropy regionally, so the
     contiguous sub-slices of the remainder collide too
  3. 256-bit, interleaved bands + skew guard  — the shipped default
  4. AUTO-SCALED (`scaled_media_banding_for(n)`) — the corpus-sized
     rule: (sig_bits, bands) derived from the corpus estimate alone, no
     hand-picked parameters; the leg that demonstrates candidate counts
     stay ~linear at the next decade (round 11)
  5. direct n²/2 for reference

Candidate counts are the cost driver (each candidate pays one exact
hamming verify + a shuffle row); recall within max_hamming is total under
every configuration (pigeonhole holds for any fixed bit partition), so
the configurations differ ONLY in cost.

Usage: python tools/banding_probe.py [n_docs]     (default 20000)
Prints one JSON line.

Round-11 measured results (this tool, this corpus — exact counts):

  n_docs   default (256b/16 bands, interleaved+guard)   auto_scaled
   5,000      438,108                                      246,388 (324b/18)
  20,000    5,941,714                                    2,936,250 (400b/20)
  50,000   28,731,247                                   14,067,946 (400b/20)

The auto rule (scaled_media_banding_for: width >= ceil(log2 n)+4,
bands >= max_hamming+1) halves candidates vs the fixed default at every
probed size with zero hand-picked parameters. Growth is ~n^1.7 on this
corpus for BOTH configs — NOT the random-signature linear regime,
honestly: every doc is a seed-sloped sawtooth, so fingerprints share
band values structurally (related seeds produce correlated
adjacent-bin comparisons), which no width can fully decorrelate; the
skew guard is what bounds the worst of it (sub_band_path carries 23 %
of candidates at 50k). On a real media corpus (independent content)
the collision floor is the random term the width rule sizes against.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from beeper_matric_etl_tool_spark.ext import multimodal as xmm  # noqa: E402


def corpus(n: int, bits: int) -> np.ndarray:
    """The media_curation probe's planted corpus: family = id//4 (two
    exact copies each of an original and a re-leveled edit)."""
    bins = bits // 2 + 1
    sigs = np.empty((n, bits), dtype=np.int8)
    for i in range(n):
        fam, var = i // 4, i % 2
        frames, _, _ = xmm._wav_samples(
            xmm.make_saw_wav(3300, fam, (1022, 1222) if var else None)
        )
        mono = frames.astype(np.int64).sum(axis=1)
        sigs[i] = xmm._afp_of(mono, bins)
    return sigs


def count_candidates(
    sigs: np.ndarray, bands: int, cap: int | None, interleave: bool, sub_bands: int
) -> dict:
    """Candidate pairs under one banding configuration (cap=None = no
    skew guard: every bucket joins directly)."""
    n, n_bits = sigs.shape
    width = n_bits // bands
    if interleave:
        perm = [b + j * bands for b in range(bands) for j in range(width)]
        sigs = sigs[:, perm]
    small = big = big_buckets = 0
    for b in range(bands):
        sl = sigs[:, b * width : (b + 1) * width]
        keys = [v.tobytes() for v in np.packbits(sl.astype(np.uint8), axis=1)]
        idx: dict[bytes, list[int]] = {}
        for i, k in enumerate(keys):
            idx.setdefault(k, []).append(i)
        for rows in idx.values():
            g = len(rows)
            if cap is None or g <= cap:
                small += g * (g - 1) // 2
                continue
            big_buckets += 1
            rest = np.delete(sigs[np.array(rows)], slice(b * width, (b + 1) * width), axis=1)
            rl = rest.shape[1]
            sw = rl // sub_bands
            for s in range(sub_bands):
                a, e = s * sw, (s + 1) * sw if s < sub_bands - 1 else rl
                sub = Counter(
                    v.tobytes()
                    for v in np.packbits(rest[:, a:e].astype(np.uint8), axis=1)
                )
                big += sum(g2 * (g2 - 1) // 2 for g2 in sub.values())
    return {
        "candidates": int(small + big),
        "small_path": int(small),
        "sub_band_path": int(big),
        "oversized_buckets": int(big_buckets),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cap, r = 256, 15
    s64 = corpus(n, 64)
    s256 = corpus(n, 256)
    out = {
        "n_docs": n,
        "all_pairs": n * (n - 1) // 2,
        "bits64_contiguous_noguard": count_candidates(
            s64, bands=16, cap=None, interleave=False, sub_bands=r + 1
        ),
        "bits256_contiguous_guarded": count_candidates(
            s256, bands=16, cap=cap, interleave=False, sub_bands=r + 1
        ),
        "bits256_interleaved_guarded": count_candidates(
            s256, bands=16, cap=cap, interleave=True, sub_bands=r + 1
        ),
    }
    # the corpus-sized auto rule: width/bands from the estimate alone
    auto_bits, auto_bands = xmm.scaled_media_banding_for(n, max_hamming=r)
    s_auto = s256 if auto_bits == 256 else corpus(n, auto_bits)
    out["auto_scaled"] = {
        "sig_bits": auto_bits,
        "bands": auto_bands,
        **count_candidates(
            s_auto, bands=auto_bands, cap=cap, interleave=True, sub_bands=r + 1
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
