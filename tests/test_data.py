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
