"""Production-scale vocabulary: 1M words, depth 6 (VERDICT r2 item 6).

The reference loads a ~1M-word, 145 MB ORBvoc.txt through DBoW2
(/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338); the
real file is absent from this environment, so a synthesized vocabulary of
the same shape (k=10, L=6 -> 10^6 words; the text file comes out the same
~146 MB) proves loader speed, memory, transform latency, and
KeyFrameDatabase query latency at scale.  Reference numbers to beat:
place-recognition DB query 7.15 +/- 3.97 ms (ExecMean.txt:39).

The text artifact is cached under ~/.cache so repeat nightly runs skip the
~1 min generate+save.
"""

import os
import time

import numpy as np
import pytest

from orbslam3_tpu.vocab.keyframe_database import KeyFrameDatabase
from orbslam3_tpu.vocab.vocabulary import BinaryVocabulary

pytestmark = pytest.mark.slow

_CACHE = os.path.expanduser("~/.cache/orbvoc_synth_1m.txt")


@pytest.fixture(scope="module")
def voc_1m():
    if not os.path.exists(_CACHE):
        os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
        v = BinaryVocabulary.synthesize(k=10, depth=6, seed=3)
        v.save_orbvoc_text(_CACHE + ".tmp")
        os.replace(_CACHE + ".tmp", _CACHE)
    t0 = time.perf_counter()
    v = BinaryVocabulary.load_orbvoc_text(_CACHE)
    load_s = time.perf_counter() - t0
    return v, load_s


def test_loads_1m_words_fast(voc_1m):
    v, load_s = voc_1m
    assert v.n_words == 1_000_000
    assert len(v.word_id) == 1_111_111
    assert os.path.getsize(_CACHE) > 140e6  # same scale as the real file
    # DBoW2's text loader takes tens of seconds on this file size; the
    # vectorized parse should stay comfortably within that
    assert load_s < 120, f"1M-word load took {load_s:.1f}s"


def test_transform_latency_at_1m_words(voc_1m):
    v, _ = voc_1m
    rng = np.random.default_rng(0)
    d = rng.integers(0, 256, (1000, 32), np.uint8)
    bow, feat = v.transform(d)  # warm
    t0 = time.perf_counter()
    n_rep = 5
    for _ in range(n_rep):
        bow, feat = v.transform(d)
    ms = (time.perf_counter() - t0) * 1e3 / n_rep
    # descriptors are random -> they spread over distinct words
    assert len(bow) > 900
    assert all(len(ix) for ix in feat.values())
    assert abs(sum(bow.values()) - 1.0) < 1e-6  # L1-normalized
    # generous bound (contended CI): measured ~16 ms/frame idle
    assert ms < 150, f"transform {ms:.1f} ms/frame at 1M words"


def test_kfdb_query_latency_at_scale(voc_1m):
    """KeyFrameDatabase with >1k keyframes at 1M words: query flavours
    return and stay within a generous multiple of the reference's 7.15 ms
    (ExecMean.txt:39)."""
    v, _ = voc_1m
    rng = np.random.default_rng(1)

    class KF:
        __slots__ = ("id", "bow_vec", "feat_vec", "bad", "loop_score",
                     "reloc_score", "desc")

        def __init__(self, i, bow):
            self.id = i
            self.bow_vec = bow
            self.feat_vec = None
            self.bad = False

        def get_connected_keyframes(self):
            return []

        def get_best_covisibility_keyframes(self, n):
            return []

    db = KeyFrameDatabase(v)
    n_kfs = 1200
    # ~25% shared structure so queries traverse populated posting lists
    base = rng.integers(0, 256, (250, 32), np.uint8)
    kfs = []
    for i in range(n_kfs):
        own = rng.integers(0, 256, (750, 32), np.uint8)
        bow, _ = v.transform(np.vstack([base, own]))
        kf = KF(i, bow)
        kfs.append(kf)
        db.add(kf)

    class Q:
        bow_vec = kfs[600].bow_vec

    t0 = time.perf_counter()
    n_rep = 5
    for _ in range(n_rep):
        cands = db.detect_relocalization_candidates(Q)
    ms = (time.perf_counter() - t0) * 1e3 / n_rep
    assert len(cands) >= 1  # at least the identical-bow keyframe
    assert any(k.id == 600 for k in cands)
    # reference: 7.15 +/- 3.97 ms at 176 KFs / 1M words; measured ~6.5 ms
    # here at 6.8x the database size (numpy posting buffers) — gate leaves
    # ~4x headroom for CI contention
    assert ms < 25, f"reloc query {ms:.2f} ms at {n_kfs} KFs"
