#!/usr/bin/env python
"""Audio containment alignment probe (r12) — the measurement behind the
landmark design decision, recorded as a reusable tool.

Two legs, pure numpy (the unit kernels run driver-side on synthetic
signals; no Spark session needed):

1. ``shift_hamming``: fingerprint hamming of a 2048-sample window vs the
   same window shifted by d samples, d swept across the hop. The result
   that killed the overlapping-probe-hop idea from the r11 verdict: the
   integer-exact fingerprint has NO sub-hop shift tolerance — on this
   noise corpus a 4-sample shift (0.2 % of the window) already scores
   66/256 and a 16-sample shift 172/256, at or past the unrelated-
   window floor (~126), so no finite probe-hop overlap can bring a
   mis-aligned cut inside any useful radius.

2. ``landmark_catch``: for cut offsets swept across [0, hop), whether
   the landmark-anchored containment finds the cut (>= min_matches
   shared anchors at hamming 0) and at the EXACT offset. Expected: every
   swept offset caught — anchors move with the content, so alignment is
   irrelevant by construction.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from beeper_matric_etl_tool_spark.ext.media_subseq import (  # noqa: E402
    _landmark_positions,
)
from beeper_matric_etl_tool_spark.ext.multimodal import _afp_of  # noqa: E402

W = 2048          # window (= hop in the non-overlapping default)
BINS = 129        # 256-bit fingerprint
SPACING = 300     # landmark min_spacing
CLIP_LEN = 6144   # 3 windows
N = 40_000


def main() -> None:
    mono = np.int64(np.random.RandomState(42).randint(-32768, 32768, N))

    base_pos = 8192
    base = _afp_of(mono[base_pos : base_pos + W], BINS)
    shift_rows = []
    for d in (0, 4, 16, 64, 256, 512, 1024):
        other = _afp_of(mono[base_pos + d : base_pos + d + W], BINS)
        shift_rows.append(
            {"shift": d, "hamming": sum(a != b for a, b in zip(base, other))}
        )
    noise_floor = sum(
        a != b
        for a, b in zip(base, _afp_of(mono[20_000 : 20_000 + W], BINS))
    )

    track_lms = _landmark_positions(mono, SPACING, W)
    track_fp = {
        q: _afp_of(mono[q : q + W], BINS) for q in track_lms
    }
    catch_rows = []
    for cut in range(7000, 7000 + W, W // 8):  # 8 offsets sweeping one hop
        clip = mono[cut : cut + CLIP_LEN]
        votes = 0
        for q in _landmark_positions(clip, SPACING, W):
            tq = q + cut
            if tq in track_fp and track_fp[tq] == _afp_of(
                clip[q : q + W], BINS
            ):
                votes += 1
        catch_rows.append(
            {"cut": cut, "votes": votes, "caught": votes >= 2}
        )

    print(
        json.dumps(
            {
                "window": W,
                "shift_hamming": shift_rows,
                "noise_floor_hamming": noise_floor,
                "landmark_spacing": SPACING,
                "landmark_catch": catch_rows,
                "all_offsets_caught": all(r["caught"] for r in catch_rows),
            }
        )
    )


if __name__ == "__main__":
    main()
