"""wav/HDF5 IO round trips and segment-sampler invariants (C9/C10)."""

import numpy as np
import pytest

from shallow_wavenet_tpu.data import read_hdf5, read_wav, write_hdf5, write_wav
from shallow_wavenet_tpu.data.dataset import (
    SegmentSampler,
    Utterance,
    pad_batch_for_decode,
    read_file_list,
    shard_list,
)
from shallow_wavenet_tpu.data.synthetic import make_corpus, speaker_of, synth_utterance


def test_wav_roundtrip(tmp_path):
    x = synth_utterance(0, 16000, 0.25)
    p = tmp_path / "a.wav"
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)


def test_hdf5_roundtrip(tmp_path):
    p = tmp_path / "f.h5"
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    write_hdf5(p, "feats", a)
    write_hdf5(p, "feats", a * 2)  # overwrite
    np.testing.assert_array_equal(read_hdf5(p, "feats"), a * 2)
    with pytest.raises(KeyError):
        read_hdf5(p, "nope")


def test_make_corpus_and_lists(tmp_path):
    lists = make_corpus(tmp_path, n_train=3, n_eval=1, sample_rate=8000,
                        duration_s=0.2, n_speakers=2)
    assert len(lists["train"]) == 3
    got = read_file_list(tmp_path / "train.scp")
    assert got == lists["train"]
    assert speaker_of(lists["train"][0]) in (0, 1)


def test_shard_list_partitions():
    items = list(range(10))
    shards = [shard_list(items, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == items


def _toy_utts(n=3, t=4000, hop=80, nm=8, seed=0):
    rng = np.random.default_rng(seed)
    utts = []
    for i in range(n):
        wav = rng.standard_normal(t).astype(np.float32) * 0.1
        feats = rng.standard_normal((t // hop, nm)).astype(np.float32)
        utts.append(Utterance(wav=wav, feats=feats, speaker=i))
    return utts


def test_segment_sampler_shapes_and_alignment():
    hop, seg, rf = 80, 800, 130
    s = SegmentSampler(_toy_utts(hop=hop), batch_size=4, segment_length=seg,
                       hop_length=hop, receptive_field=rf, seed=1)
    b = next(s)
    pad = -(-rf // hop) * hop
    assert b["x"].shape == (4, pad + seg)
    assert b["cond"].shape == (4, (pad + seg) // hop, 8)
    assert b["speaker"].shape == (4,)


def test_segment_sampler_deterministic_and_resumable():
    kw = dict(batch_size=2, segment_length=800, hop_length=80,
              receptive_field=100, seed=7)
    s1 = SegmentSampler(_toy_utts(), **kw)
    s2 = SegmentSampler(_toy_utts(), **kw)
    b1, b2 = next(s1), next(s2)
    np.testing.assert_array_equal(b1["x"], b2["x"])
    # state save/restore reproduces the stream
    st = s1.state()
    a = next(s1)
    s2.set_state(st)
    np.testing.assert_array_equal(a["x"], next(s2)["x"])


def test_pad_batch_for_decode():
    utts = _toy_utts(n=2, t=4000)
    utts[1].feats = utts[1].feats[:30]
    cond, nf, ns = pad_batch_for_decode(utts, hop_length=80)
    assert cond.shape == (2, 50, 8)
    assert list(nf) == [50, 30]
    assert list(ns) == [4000, 2400]
    assert np.all(cond[1, 30:] == 0)


def test_make_corpus_seed_changes_content(tmp_path):
    """--corpus-seed gives genuinely different utterances (the fine-tune
    demo's 'new data'); same seed reproduces bit-identical wavs."""
    import numpy as np

    from shallow_wavenet_tpu.data.audio_io import read_wav
    from shallow_wavenet_tpu.data.synthetic import make_corpus

    a = make_corpus(tmp_path / "a", n_train=1, n_eval=1, sample_rate=8000,
                    seed=1)
    b = make_corpus(tmp_path / "b", n_train=1, n_eval=1, sample_rate=8000,
                    seed=2)
    c = make_corpus(tmp_path / "c", n_train=1, n_eval=1, sample_rate=8000,
                    seed=1)
    wa, _ = read_wav(a["train"][0])
    wb, _ = read_wav(b["train"][0])
    wc, _ = read_wav(c["train"][0])
    assert not np.array_equal(wa, wb)
    np.testing.assert_array_equal(wa, wc)


def _write_raw_wav(path, frames: bytes, *, ch: int, sw: int, sr: int):
    import wave

    with wave.open(str(path), "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sw)
        w.setframerate(sr)
        w.writeframes(frames)


def test_read_wav_24bit(tmp_path):
    """24-bit PCM, incl. negative values and both extremes."""
    vals = np.array([0, 1, -1, 8388607, -8388608, 4194304], np.int64)
    raw = b"".join(int(v).to_bytes(3, "little", signed=True) for v in vals)
    p = tmp_path / "w24.wav"
    _write_raw_wav(p, raw, ch=1, sw=3, sr=16000)
    x, sr = read_wav(p)
    np.testing.assert_allclose(x, vals / 8388607.0, atol=2e-7)
    assert sr == 16000


def test_read_wav_8_and_32bit(tmp_path):
    p8 = tmp_path / "w8.wav"
    _write_raw_wav(p8, bytes([128, 255, 0, 192]), ch=1, sw=1, sr=8000)
    x, _ = read_wav(p8)
    np.testing.assert_allclose(x, [0.0, 1.0, -128 / 127.0, 64 / 127.0],
                               atol=1e-6)
    vals = np.array([0, 2147483647, -2147483648], "<i4")
    p32 = tmp_path / "w32.wav"
    _write_raw_wav(p32, vals.tobytes(), ch=1, sw=4, sr=8000)
    x, _ = read_wav(p32)
    np.testing.assert_allclose(x, vals / 2147483647.0, atol=1e-6)


def test_read_wav_stereo_downmix(tmp_path):
    left = np.array([10000, -10000, 0], "<i2")
    right = np.array([20000, 10000, 0], "<i2")
    inter = np.stack([left, right], axis=1).reshape(-1)
    p = tmp_path / "st.wav"
    _write_raw_wav(p, inter.tobytes(), ch=2, sw=2, sr=16000)
    x, _ = read_wav(p)
    np.testing.assert_allclose(x, (left + right) / 2 / 32767.0, atol=1e-6)


def test_read_wav_resample_on_load(tmp_path):
    """A 440 Hz tone at 48 kHz read with target_sr=16000 keeps its
    frequency and amplitude (polyphase resampler sanity)."""
    from shallow_wavenet_tpu.data.audio_io import resample

    sr_in, sr_out, f = 48000, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    tone = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    p = tmp_path / "tone48k.wav"
    write_wav(p, tone, sr_in)
    x, sr = read_wav(p, target_sr=sr_out)
    assert sr == sr_out and len(x) == sr_out
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    assert abs(np.argmax(spec) - f) <= 1          # 1 Hz bins
    mid = x[2000:-2000]
    np.testing.assert_allclose(np.max(np.abs(mid)), 0.5, atol=0.01)
    # identity when rates already match
    y = resample(tone, sr_in, sr_in)
    np.testing.assert_array_equal(y, tone)


def test_speechlike_corpus(tmp_path):
    """The harder corpus style: has silence, voiced and unvoiced regions,
    and a sample-resolution F0 ground-truth track."""
    from shallow_wavenet_tpu.data.synthetic import synth_utterance_speechlike

    wav, f0, voiced = synth_utterance_speechlike(7, 16000, duration_s=2.0)
    assert wav.shape == f0.shape == voiced.shape == (32000,)
    assert voiced.any() and (~voiced).any()
    assert (f0[voiced] >= 80.0).all() and (f0[voiced] <= 300.0).all()
    # silence really present: some all-quiet stretch outside voiced regions
    frame = np.abs(wav.reshape(-1, 160)).max(axis=1)
    assert (frame < 1e-4).any()
    lists = make_corpus(tmp_path, n_train=2, n_eval=1, sample_rate=8000,
                        style="speechlike")
    assert len(lists["train"]) == 2


def test_silence_boost_oversamples_silence():
    """data.silence_boost redirects that fraction of draws to segments
    containing >=10% silent frames; boost=0 must leave the draw stream
    bit-identical (checkpoint/resume compatibility)."""
    from shallow_wavenet_tpu.data.dataset import SegmentSampler, Utterance

    rng = np.random.default_rng(0)
    hop, seg = 80, 800
    # one utterance: loud half, silent half
    wav = np.concatenate([
        rng.uniform(-0.5, 0.5, 4000).astype(np.float32),
        np.zeros(4000, np.float32)])
    feats = rng.standard_normal((100, 8)).astype(np.float32)
    utts = [Utterance(wav=wav, feats=feats)]
    kw = dict(batch_size=4, segment_length=seg, hop_length=hop,
              receptive_field=127, seed=3)

    def silent_frac(sampler, n=50):
        hits = 0
        for _ in range(n):
            b = next(sampler)
            tail = b["x"][:, -seg:]
            fe = (tail.reshape(tail.shape[0], -1, hop) ** 2).mean(axis=-1)
            hits += int(((fe < 1e-8).mean(axis=1) >= 0.1).sum())
        return hits / (n * 4)

    base = silent_frac(SegmentSampler(utts, **kw))
    boosted = silent_frac(SegmentSampler(utts, silence_boost=0.8, **kw))
    assert boosted > base + 0.2, (base, boosted)
    # boost=0: identical stream to the knob-less sampler
    a = SegmentSampler(utts, **kw)
    b = SegmentSampler(utts, silence_boost=0.0, **kw)
    for _ in range(5):
        np.testing.assert_array_equal(next(a)["x"], next(b)["x"])
