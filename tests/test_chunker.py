import numpy as np

from audio_processor_tpu.pipeline.chunker import (
    Chunk, chunk_batch, chunk_boundaries, pick_bucket, speaker_views,
    split_audio,
)


def test_chunk_boundaries_basic():
    # 60 s @ 16 kHz, 25 s chunks, 1 s overlap -> starts at 0, 24, 48 s.
    sr = 16000
    bounds = chunk_boundaries(60 * sr, 25 * sr, 24 * sr)
    assert bounds == [
        (0, 25 * sr),
        (24 * sr, 49 * sr),
        (48 * sr, 60 * sr),
    ]


def test_chunk_boundaries_short_signal_single_chunk():
    bounds = chunk_boundaries(100, 400, 384)
    assert bounds == [(0, 100)]


def test_chunk_boundaries_exact_fit_no_trailing_chunk():
    # Ends exactly at a boundary: loop stops once end >= total
    # (reference audio_processor.py:157-158).
    bounds = chunk_boundaries(400, 400, 384)
    assert bounds == [(0, 400)]


def test_chunk_boundaries_empty():
    assert chunk_boundaries(0, 400, 384) == []


def test_speaker_views_stereo():
    wf = np.stack([np.ones(10, np.float32), np.zeros(10, np.float32)])
    mixed, agent, client = speaker_views(wf)
    assert np.allclose(mixed, 0.5)
    assert np.allclose(agent, 1.0)
    assert np.allclose(client, 0.0)


def test_speaker_views_mono():
    wf = np.arange(10, dtype=np.float32)
    mixed, agent, client = speaker_views(wf)
    assert np.allclose(mixed, wf)
    assert np.allclose(agent, wf)
    assert np.allclose(client, wf)


def test_split_audio_times(stereo_call):
    sr = 16000
    chunks = split_audio(stereo_call, sr, "call.wav",
                         chunk_duration_sec=4.0, overlap_sec=1.0)
    # 10 s signal, 4 s chunks, 3 s step: 0-4, 3-7, 6-10.
    assert [(c.start_time, c.end_time) for c in chunks] == [
        (0.0, 4.0), (3.0, 7.0), (6.0, 10.0)]
    assert all(c.file_name == "call.wav" for c in chunks)
    assert chunks[0].chunk_idx == 0 and chunks[-1].chunk_idx == 2
    # Overlap region is shared.
    np.testing.assert_allclose(chunks[0].mixed[3 * sr:], chunks[1].mixed[:sr])


def test_pick_bucket():
    buckets = [16000 * 5, 16000 * 10, 16000 * 25]
    assert pick_bucket(100, buckets) == 16000 * 5
    assert pick_bucket(16000 * 5, buckets) == 16000 * 5
    assert pick_bucket(16000 * 5 + 1, buckets) == 16000 * 10
    assert pick_bucket(16000 * 100, buckets) == 16000 * 25  # clamp


def test_chunk_batch_dense_views(stereo_call):
    sr = 16000
    chunks = split_audio(stereo_call, sr, "call.wav",
                         chunk_duration_sec=4.0, overlap_sec=1.0)
    batches = chunk_batch(chunks, bucket_samples=[4 * sr])
    assert len(batches) == 1
    b = batches[0]
    assert b.audio.shape == (3, 3, 4 * sr)
    assert b.audio.dtype == np.float32
    assert list(b.lengths) == [4 * sr] * 3
    # View order: mixed, agent, client.
    c0 = b.chunks[0]
    np.testing.assert_allclose(b.audio[0, 0], c0.mixed)
    np.testing.assert_allclose(b.audio[0, 1], c0.agent)
    np.testing.assert_allclose(b.audio[0, 2], c0.client)


def test_chunk_batch_pads_short_chunks():
    sr = 100
    c = Chunk("f.wav", 0, 0.0, 0.5,
              mixed=np.ones(50, np.float32),
              agent=np.ones(50, np.float32),
              client=np.ones(50, np.float32))
    [b] = chunk_batch([c], bucket_samples=[100])
    assert b.audio.shape == (1, 3, 100)
    assert b.lengths[0] == 50
    assert np.all(b.audio[0, :, 50:] == 0)


def test_chunk_batch_groups_by_bucket():
    mk = lambda n, i: Chunk("f.wav", i, 0, 0,
                            mixed=np.zeros(n, np.float32),
                            agent=np.zeros(n, np.float32),
                            client=np.zeros(n, np.float32))
    batches = chunk_batch([mk(10, 0), mk(90, 1), mk(120, 2)],
                          bucket_samples=[100, 200])
    assert len(batches) == 2
    assert batches[0].bucket_len == 100 and len(batches[0]) == 2
    assert batches[1].bucket_len == 200 and len(batches[1]) == 1
