"""audio_features: exact-integer parity against an independent per-clip
numpy reference over real encoded WAV bytes, plus edge conventions
(sign(0), partial last window, stereo flattening)."""

import numpy as np

from gregor_spark.ops.media import audio_features, make_wav_pcm16, synthetic_media_wav


def _ref(samples, window=16):
    s = np.asarray(samples, dtype=np.int64).reshape(-1)
    n = s.size
    neg = s < 0
    zc = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
    sq = s * s
    mwe = max(
        (int(sq[k : k + window].sum()) for k in range(0, n, window)), default=0
    )
    return (
        n,
        int(np.abs(s).max()) if n else 0,
        int(np.abs(s).sum()),
        int(sq.sum()),
        zc,
        mwe,
    )


def test_audio_features_synthetic_parity(spark):
    out = {
        r.media_id: (
            r.n_samples, r.peak, r.sum_abs, r.energy,
            r.zero_crossings, r.max_window_energy,
        )
        for r in audio_features(synthetic_media_wav(spark, 150)).collect()
    }
    assert len(out) == 150
    for mid in range(150):
        n = mid % 50 + 20
        s = ((mid * 17 + np.arange(n, dtype=np.int64) * 11) % 4096) - 2048
        assert out[mid] == _ref(s), mid
    # the fixture must exercise both signs and crossings
    assert any(v[4] > 0 for v in out.values())


def test_audio_features_edge_conventions(spark):
    import pandas as pd

    cases = {
        0: np.array([0, -1, 0, 1, 0, -1], dtype=np.int16),      # sign(0)=+
        1: np.array([5] * 17, dtype=np.int16),                   # partial blk
        2: np.array([-2048], dtype=np.int16),                    # single
    }
    rows = [
        (mid, "d", "audio", make_wav_pcm16(s), {"width": None, "height": None,
                                                "sample_rate": 16000,
                                                "n_frames": None})
        for mid, s in cases.items()
    ]
    from gregor_spark.ops.media import MEDIA_SCHEMA

    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "doc_id", "kind", "payload", "meta"]),
        MEDIA_SCHEMA,
    )
    got = {
        r.media_id: (
            r.n_samples, r.peak, r.sum_abs, r.energy,
            r.zero_crossings, r.max_window_energy,
        )
        for r in audio_features(media).collect()
    }
    for mid, s in cases.items():
        assert got[mid] == _ref(s), mid
    # explicit convention pin: [0,-1,0,1,0,-1] has signs +,-,+,+,+,-
    # under sign(0)=+ → 3 sign changes
    assert got[0][4] == 3
    # 17 samples of 5: window 16 + window 1 → loudest block is 16*25
    assert got[1][5] == 16 * 25
