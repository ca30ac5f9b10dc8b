"""Measure 16-bit band-bucket occupancy for hash64_canonical_dedup.

VERDICT r06 watch item: the m11/m12 pigeonhole banding keys each of its
4 bands on 16 bits, so a band has at most 65,536 bucket keys — the
exact-dup CONTRACTION absorbs duplicate-class skew (identical content →
one node), but DISTINCT-hash volume still divides over only 65,536
buckets per band, so per-bucket candidate lists grow ~N/65k and the
candidate-pair stage grows ~N²/32k.  This probe measures where that
law actually bites:

1. EMPIRICAL: the distinct-hash count and measured per-band bucket
   occupancy of m11's own fingerprint law at a given corpus size (the
   pixel law is id-periodic mod 256, so the contraction collapses any
   corpus to ≤256 distinct hashes — occupancy ≤ 1-2 per bucket; the
   planted hot-dup classes never reach the banding stage at all).
2. SYNTHETIC worst case: N UNIFORM-RANDOM distinct 64-bit hashes
   (zero exact dups — the adversarial input for the contraction),
   banded 4×16 bits; reports the bucket-occupancy distribution, the
   exact candidate-pair count Σ_bands Σ_buckets C(n,2), and the
   measured constant against the model candidates ≈ N²/32768.

Recorded conclusion (SCALE.md): at N ≤ ~10⁷ distinct hashes the
candidate stage is fine (≤ ~3 G pairs spread over the cluster); at
N ~ 10⁹ it is ~3×10¹³ pairs — the mitigation is a WIDER fingerprint
(128-bit hash → 4×32-bit bands caps per-band keys at 2³², restoring
candidates ≈ N²/2³³), not more bands (pigeonhole needs ≥ max_hamming+1
bands, and narrower bands make occupancy worse).

Usage: python tools/band_occupancy.py [N ...]   (default 1e5 1e6 4e6)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _ahash64_of_id(i: int, width: int = 32, height: int = 16) -> int:
    """Numpy replay of render_pgm_payloads' pixel law + ahash_64's bit
    law (operators/multimodal.py) — pixel = (id*31 + idx*7) % 256,
    8x8 block sums, bit k iff 64*cell > total."""
    idx = np.arange(width * height, dtype=np.int64)
    img = ((i * 31 + idx * 7) % 256).reshape(height, width)
    cells = img.reshape(8, height // 8, 8, width // 8).sum(axis=(1, 3)).ravel()
    total = int(cells.sum())
    h = 0
    for k in range(64):
        if cells[k] * 64 > total:
            h |= 1 << k
    return h


def m11_empirical(n_docs: int) -> dict:
    """Replay m11's pixel+ahash law for ``n_docs`` ids and report
    distinct hashes + per-band occupancy after contraction (the pixel
    law is id-periodic mod 256, so ≤256 distinct hashes exist at ANY
    corpus size — the contraction absorbs the rest)."""
    distinct_ids = np.unique(np.arange(n_docs, dtype=np.int64) % 256)
    hashes = np.unique(
        np.asarray([_ahash64_of_id(int(i)) for i in distinct_ids], dtype=np.uint64)
    )
    occ = occupancy(hashes)
    occ["n_members"] = n_docs
    return occ


def occupancy(h: "np.ndarray") -> dict:
    n = len(h)
    out = {"n_distinct": int(n), "bands": []}
    total_cand = 0
    for b in range(4):
        keys = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        _, counts = np.unique(keys, return_counts=True)
        cand = int((counts.astype(np.int64) * (counts - 1) // 2).sum())
        total_cand += cand
        out["bands"].append(
            {
                "band": b,
                "buckets_used": int(len(counts)),
                "max_bucket": int(counts.max()),
                "mean_bucket": round(float(counts.mean()), 2),
                "candidate_pairs": cand,
            }
        )
    out["total_candidate_pairs"] = total_cand
    out["model_pairs_n2_over_32768"] = int(n * n / 32768)
    return out


def occupancy128(w0: "np.ndarray", w1: "np.ndarray") -> dict:
    """m13's banding law: 4×32-bit bands over a 128-bit fingerprint
    (two uint64 words, 2 bands each) — the recorded mitigation,
    measured instead of argued."""
    n = len(w0)
    out = {"n_distinct": int(n), "bands": []}
    total_cand = 0
    for b in range(4):
        word = w0 if b < 2 else w1
        keys = (word >> np.uint64(32 * (b % 2))) & np.uint64(0xFFFFFFFF)
        _, counts = np.unique(keys, return_counts=True)
        cand = int((counts.astype(np.int64) * (counts - 1) // 2).sum())
        total_cand += cand
        out["bands"].append(
            {
                "band": b,
                "buckets_used": int(len(counts)),
                "max_bucket": int(counts.max()),
                "candidate_pairs": cand,
            }
        )
    out["total_candidate_pairs"] = total_cand
    out["model_pairs_n2_over_2e33"] = int(n * n / 2**33)
    return out


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000, 4_000_000]
    rng = np.random.default_rng(42)
    report = {"synthetic": [], "synthetic_128": [], "m11_empirical": None}
    for n in sizes:
        h = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
        h = np.unique(h)
        t0 = time.perf_counter()
        occ = occupancy(h)
        occ["probe_sec"] = round(time.perf_counter() - t0, 3)
        report["synthetic"].append(occ)
        # the same adversarial distinct-hash volume under m13's
        # 128-bit / 4×32-bit-band law (full-width uniform words: both
        # uint64 halves drawn over [0, 2^64))
        w0 = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64) * np.uint64(2) + (
            rng.integers(0, 2, size=n, dtype=np.int64).astype(np.uint64)
        )
        w1 = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64) * np.uint64(2) + (
            rng.integers(0, 2, size=n, dtype=np.int64).astype(np.uint64)
        )
        t0 = time.perf_counter()
        occ128 = occupancy128(w0, w1)
        occ128["probe_sec"] = round(time.perf_counter() - t0, 3)
        report["synthetic_128"].append(occ128)
    try:
        report["m11_empirical"] = m11_empirical(50_000)
    except ImportError:
        pass
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
