"""Perceptual image hashing + near-duplicate image dedup.

dhash_image is pinned against an independent naive Python mirror; the
banded-hamming join is pinned against brute-force all-pairs (the
pigeonhole-exactness claim both the operator docstring and the DuckDB
oracle rely on); the planted-pair fixture is checked end-to-end through
the REAL PNG decode path.
"""

import numpy as np
import pytest

from marginaliasearch_spark.operators import multimodal as mm
from marginaliasearch_spark.operators.dedup import hamming_band_pairs


def _naive_dhash(img: np.ndarray) -> int:
    """Independent mirror: explicit loops, no numpy reductions."""
    h, w = img.shape[:2]
    bh, bw = h // 8, w // 8
    sums = [[0] * 8 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            sums[y // bh][x // bw] += int(img[y, x, 0]) + int(img[y, x, 1]) + int(
                img[y, x, 2]
            )
    val = 0
    for r in range(8):
        for c in range(8):
            if sums[r][c] > sums[r][(c + 1) % 8]:
                val |= 1 << (r * 8 + c)
    return val - (1 << 64) if val >= 1 << 63 else val


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_dhash_matches_naive_mirror():
    rng = np.random.RandomState(7)
    for _ in range(20):
        img = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
        assert mm.dhash_image(img) == _naive_dhash(img)
    # 16x16 (different block size) and a constant image (all bits 0)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert mm.dhash_image(img) == _naive_dhash(img)
    assert mm.dhash_image(np.full((32, 32, 3), 100, np.uint8)) == 0


def test_dhash_crops_nondivisible_dims():
    """Arbitrary real-world sizes hash via a deterministic top-left crop
    to the largest multiple-of-8 dims (a single odd-sized image must not
    kill a corpus-scale dedup job); sub-8x8 stays a hard error."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (30, 33, 3), dtype=np.uint8)
    assert mm.dhash_image(img) == mm.dhash_image(img[:24, :32])
    with pytest.raises(ValueError):
        mm.dhash_image(np.zeros((7, 64, 3), np.uint8))


def test_dhash_shift_invariance_properties():
    """A uniform brightness shift must not change the hash (comparisons
    are relative); a heavy localized edit must change it."""
    rng = np.random.RandomState(11)
    img = rng.randint(60, 196, size=(32, 32, 3), dtype=np.uint8)
    h0 = mm.dhash_image(img)
    assert mm.dhash_image(img + 20) == h0
    assert mm.dhash_image(img - 20) == h0
    edited = img.copy()
    edited[0:16, 0:16] = 255
    assert mm.dhash_image(edited) != h0


def test_banded_equals_allpairs(spark):
    rng = np.random.RandomState(3)
    base = rng.randint(-(2**62), 2**62, size=40).tolist()
    # plant close pairs at controlled hamming distances
    rows = [(i, int(h)) for i, h in enumerate(base)]
    for k, d in enumerate([0, 1, 7, 8, 12]):
        h = base[k]
        flipped = h ^ sum(1 << (5 * j + 2) for j in range(d))
        flipped = flipped - (1 << 64) if flipped >= 1 << 63 else flipped
        rows.append((100 + k, int(flipped)))
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = {
        (r.media_a, r.media_b, r.hamming)
        for r in hamming_band_pairs(df, "media_id", "dhash", 7, "media").collect()
    }
    want = {
        (a, ha, b, hb)
        for a, ha in rows
        for b, hb in rows
        if a < b and _ham(ha, hb) <= 7
    }
    want = {(a, b, _ham(ha, hb)) for a, ha, b, hb in want}
    assert got == want
    # the d=8 and d=12 plants must NOT appear (hamming > budget)
    assert all(p[2] <= 7 for p in got)
    assert (2, 102, 7) in got and not any(b == 103 for _, b, _ in got)


def test_planted_pairs_end_to_end(spark):
    """Real-PNG fixture through decode → dhash → banded dedup: exactly
    the 32 planted (i, i+32) pairs, regardless of input partitioning."""
    media = mm.synth_phash_media(spark, n=64)
    hashes = mm.dhash_features(media.repartition(7), fake=False)
    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in mm.phash_dedup(hashes, max_hamming=7).collect()
    }
    assert set(pairs) == {(i, i + 32) for i in range(32)}
    assert all(h <= 7 for h in pairs.values())


# --- audio fingerprint twin -------------------------------------------------


def _naive_afp(samples) -> int:
    """Independent mirror of afp_fingerprint: explicit loops/ints."""
    n = len(samples)
    e = [0] * 64
    c = [0] * 64
    for t in range(n):
        k = (64 * t + 63) // n
        e[k] += abs(int(samples[t]))
        c[k] += 1
    val = 0
    for k in range(64):
        j = (k + 1) % 64
        if e[k] * c[j] > e[j] * c[k]:
            val |= 1 << k
    return val - (1 << 64) if val >= 1 << 63 else val


def test_afp_matches_naive_mirror():
    rng = np.random.RandomState(13)
    for n in (64, 100, 4321, 5000):
        s = rng.randint(-32768, 32768, size=n).astype(np.int64)
        assert mm.afp_fingerprint(s) == _naive_afp(s)
    assert mm.afp_fingerprint(np.full(1000, 5, np.int64)) == 0


def test_afp_gain_invariance():
    """Scaling every sample by the same positive factor must not change
    the fingerprint (comparisons are relative means)."""
    rng = np.random.RandomState(17)
    s = rng.randint(-8000, 8000, size=4444).astype(np.int64)
    h = mm.afp_fingerprint(s)
    assert mm.afp_fingerprint(s * 3) == h
    assert mm.afp_fingerprint(s * 4) == h


def test_afp_planted_pairs_end_to_end(spark):
    """Real-WAV fixture through decode → fingerprint → banded dedup:
    exactly the 32 planted (i, i+32) clip pairs."""
    media = mm.synth_afp_media(spark, n=64)
    hashes = mm.afp_features(media.repartition(5), fake=False)
    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in mm.afp_dedup(hashes, max_hamming=7).collect()
    }
    assert set(pairs) == {(i, i + 32) for i in range(32)}
    assert all(h <= 7 for h in pairs.values())


# --- video fingerprint twin --------------------------------------------------


def test_dhash_plane_consistency():
    """dhash_image == dhash_plane over the channel-sum plane (the
    delegation contract), and luma planes hash like 2-D images."""
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert mm.dhash_image(img) == mm.dhash_plane(
        img.astype(np.int64).sum(axis=2)
    )


def test_y4m_mono_roundtrip():
    rng = np.random.RandomState(29)
    frames = rng.randint(0, 256, size=(5, 32, 32), dtype=np.uint8)
    dec, fps = mm.decode_video(mm.encode_y4m_mono(frames, fps=10))
    assert (dec == frames).all() and fps == 10.0


def test_video_planted_pairs_end_to_end(spark):
    """Real-y4m fixture through decode → per-frame dhash → aligned banded
    join: exactly the 16 planted (i, i+16) pairs, all 8 frames matched."""
    media = mm.synth_vfp_media(spark, n=32)
    fps = mm.video_fingerprints(media.repartition(5))
    got = {
        (r.media_a, r.media_b): r.n_frames
        for r in mm.video_neardup_pairs(fps, max_hamming=7, min_frames=6).collect()
    }
    assert got == {(i, i + 16): 8 for i in range(16)}


def test_video_neardup_counts_against_bruteforce(spark):
    """Matched-frame COUNT equals brute-force all-pairs at a hamming
    budget where partial matches occur (max_hamming=2 over the fixture:
    some planted frames exceed 2 bits, exercising the HAVING cut)."""
    media = mm.synth_vfp_media(spark, n=16)
    fps = mm.video_fingerprints(media)
    rows = fps.collect()
    hs: dict[int, dict[int, int]] = {}
    for r in rows:
        hs.setdefault(r.media_id, {})[r.frame_idx] = r.fhash
    want = {}
    for a in hs:
        for b in hs:
            if a < b:
                c = sum(
                    1
                    for f in hs[a]
                    if _ham(hs[a][f], hs[b][f]) <= 2
                )
                if c >= 3:
                    want[(a, b)] = c
    got = {
        (r.media_a, r.media_b): r.n_frames
        for r in mm.video_neardup_pairs(fps, max_hamming=2, min_frames=3).collect()
    }
    assert got == want and len(got) > 0
