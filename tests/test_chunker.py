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


def test_streaming_chunker_equals_split_audio():
    """Property: feeding arbitrary piece sizes through
    StreamingChunker yields chunk-for-chunk identical output to a
    one-shot split_audio (boundaries, indices, views), including the
    final-short-chunk and exact-end rules."""
    from audio_processor_tpu.pipeline.chunker import StreamingChunker

    rng = np.random.default_rng(0)
    sr = 16000
    for trial in range(60):
        dur = rng.uniform(0.05, 12.0)
        n = int(sr * dur)
        ch = int(rng.integers(1, 3))
        x = rng.standard_normal((ch, n)).astype(np.float32) * 0.1
        cd = float(rng.choice([2.0, 4.0, 25.0 / 8]))
        ov = float(rng.choice([0.0, 0.5, 1.0]))
        if ov >= cd:
            ov = 0.5 * cd
        ref = split_audio(x, sr, "stream", cd, ov)
        sc = StreamingChunker(sr, "stream", cd, ov)
        got = []
        i = 0
        while i < n:
            step = int(rng.integers(
                1, max(2, int(sr * rng.uniform(0.01, 3.0)))))
            got += sc.feed(x[:, i:i + step])
            i += step
        got += sc.flush()
        assert len(got) == len(ref), (trial, dur, cd, ov)
        for a, b in zip(got, ref):
            assert a.chunk_idx == b.chunk_idx
            assert a.start_time == b.start_time
            assert a.end_time == b.end_time
            np.testing.assert_array_equal(a.agent, b.agent)
            np.testing.assert_array_equal(a.client, b.client)


def test_streaming_chunker_memory_bounded():
    """Internal buffer never holds more than ~one chunk window."""
    from audio_processor_tpu.pipeline.chunker import StreamingChunker

    sr = 16000
    sc = StreamingChunker(sr, "s", 4.0, 1.0)
    rng = np.random.default_rng(1)
    for _ in range(100):
        sc.feed(rng.standard_normal((2, sr)).astype(np.float32))
        if sc._buf is not None:
            assert sc._buf.shape[1] <= sc.chunk_samples + sr
