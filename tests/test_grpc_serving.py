"""gRPC front-end of the serving mode (grpc_serving.py): same
micro-batcher + fused device program as the HTTP server, exposed as
``audio_processor_tpu.v1.AudioProcessor`` via generic method handlers
(no generated service stubs). Beyond the reference (batch/cron only,
run_cron.sh:12)."""

import threading

import numpy as np
import pytest

pytest.importorskip("grpc")

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.grpc_serving import GrpcClient, GrpcInferenceServer
from audio_processor_tpu.serving import InferenceService

from tests.test_engine_e2e import tiny_engine
from tests.test_serving import _wav_bytes


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        enable_mixed_precision=False,
        chunk_duration_sec=4.0, overlap_sec=1.0,
        length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
        extras={"serve_batch_window_ms": 30.0})


@pytest.fixture(scope="module")
def grpc_server(cfg):
    service = InferenceService(cfg, asr_engine=tiny_engine(cfg))
    server = GrpcInferenceServer(service, port=0)
    server.start()
    yield server
    server.stop()
    service.close()


@pytest.fixture(scope="module")
def client(grpc_server):
    c = GrpcClient(f"127.0.0.1:{grpc_server.bound_port}")
    yield c
    c.close()


def test_health(client):
    r = client.health()
    assert r.ok and r.status == "serving"


def test_transcribe_roundtrip(client):
    resp = client.transcribe(_wav_bytes(dur=4.0), timeout=120.0)
    assert resp.duration_seconds == pytest.approx(4.0, abs=0.01)
    assert resp.num_chunks >= 1 and len(resp.chunks) == resp.num_chunks
    for c in resp.chunks:
        assert c.error == ""
        assert c.end_time > c.start_time
    # joined transcript equals the chunk texts joined
    joined = " ".join(c.transcription_chunk for c in resp.chunks).strip()
    assert resp.transcription == joined


def test_matches_http_service_output(cfg, grpc_server, client):
    """gRPC and a direct service call produce identical transcripts
    (same engine, same program)."""
    payload = _wav_bytes(dur=4.0, seed=1)
    direct = grpc_server.service.transcribe_bytes(payload)
    resp = client.transcribe(payload, timeout=120.0)
    assert resp.transcription == direct["transcription"]
    assert resp.agent_transcription == direct["agent_transcription"]
    assert resp.client_transcription == direct["client_transcription"]
    assert resp.num_chunks == direct["num_chunks"]


def test_concurrent_grpc_requests(client):
    results = [None] * 6
    def call(i):
        results[i] = client.transcribe(_wav_bytes(dur=2.0), timeout=120.0)
    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r.num_chunks >= 1 for r in results)


def test_bad_payload_maps_to_invalid_argument(client):
    import grpc

    with pytest.raises(grpc.RpcError) as exc:
        client.transcribe(b"not audio at all", timeout=30.0)
    assert exc.value.code() in (grpc.StatusCode.INVALID_ARGUMENT,
                                grpc.StatusCode.INTERNAL)


def test_stats(client):
    s = client.stats()
    assert s["requests"] >= 1 and s["batches"] >= 1


def test_backpressure_maps_to_resource_exhausted(grpc_server, client):
    """A full pending queue aborts the RPC with RESOURCE_EXHAUSTED —
    the gRPC equivalent of the HTTP 503 + Retry-After path (the chip
    load test, tools/load_test_serving.py, proves the same live)."""
    import grpc

    service = grpc_server.service
    old_cap = service.max_pending_chunks
    service.max_pending_chunks = 1
    try:
        wav = _wav_bytes(dur=8.0)   # 3 chunks at the 4s/1s geometry
        codes = []

        def hit():
            try:
                client.transcribe(wav, timeout=60.0)
                codes.append("OK")
            except grpc.RpcError as e:
                codes.append(e.code().name)

        threads = [threading.Thread(target=hit) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert "RESOURCE_EXHAUSTED" in codes, codes
    finally:
        service.max_pending_chunks = old_cap


def test_streaming_transcribe_matches_unary(cfg, grpc_server, client):
    """Live-streamed PCM produces the SAME chunk boundaries and
    transcripts as the whole-file unary path (StreamingChunker is
    split_audio-equivalent; the chunks share one micro-batcher)."""
    from tests.conftest import make_stereo_call

    wf = make_stereo_call(dur=10.0)                  # [2, T] float
    pcm = np.clip(np.round(wf * 32768.0), -32768,
                  32767).astype(np.int16)

    # stream in uneven pieces (odd sizes exercise rebuffering)
    rng = np.random.default_rng(0)
    pieces, i = [], 0
    while i < pcm.shape[1]:
        n = int(rng.integers(1000, 30000))
        pieces.append(pcm[:, i:i + n])
        i += n
    got = list(client.streaming_transcribe(pieces, channels=2,
                                           timeout=300.0))

    direct = grpc_server.service.transcribe_bytes(
        _wav_bytes_from(pcm))
    assert len(got) == direct["num_chunks"]
    for g, d in zip(got, direct["chunks"]):
        assert g.start_time == pytest.approx(d["start_time"])
        assert g.end_time == pytest.approx(d["end_time"])
        assert g.transcription_chunk == d["transcription_chunk"]
        assert g.agent_transcription == d["agent_transcription"]
        assert g.client_transcription == d["client_transcription"]


def _wav_bytes_from(pcm: np.ndarray) -> bytes:
    import io as _io

    from audio_processor_tpu.io import wav as wav_mod

    buf = _io.BytesIO()
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "x.wav"
        wav_mod.write(p, pcm.astype(np.float32) / 32768.0, 16000)
        return p.read_bytes()


def test_streaming_transcribe_mono_and_empty(client):
    """Mono streams duplicate ch0 into both speaker views; an empty
    stream yields no chunks (clean final marker)."""
    rng = np.random.default_rng(1)
    mono = (rng.standard_normal(16000 * 4) * 6000).astype(np.int16)
    got = list(client.streaming_transcribe([mono], channels=1,
                                           timeout=120.0))
    assert len(got) >= 1
    assert all(c.agent_transcription == c.client_transcription
               for c in got)
    stats = client.stats()
    assert stats["stream_chunks"] >= len(got)
    assert stats["stream_audio_seconds"] > 0
    empty = list(client.streaming_transcribe([], channels=2,
                                             timeout=60.0))
    assert empty == []


def test_streaming_rejects_wrong_rate(client):
    import grpc

    pcm = np.zeros(8000, np.int16)
    with pytest.raises(grpc.RpcError) as exc:
        list(client.streaming_transcribe([pcm], sample_rate=8000,
                                         channels=1, timeout=60.0))
    assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_concurrent_streams_and_unary_do_not_cross(cfg, grpc_server,
                                                   client):
    """4 concurrent streams with DIFFERENT audio + interleaved unary
    bodies share one micro-batcher; every stream must get exactly its
    own chunk sequence (boundaries from its own length, transcripts
    equal to its solo run)."""
    import grpc  # noqa: F401  (ensures grpc importable in threads)

    from tests.conftest import make_stereo_call

    rng = np.random.default_rng(3)
    durs = [6.0, 8.5, 10.0, 7.25]
    streams = []
    for d in durs:
        wf = make_stereo_call(dur=d)
        pcm = np.clip(np.round(wf * 32768.0), -32768,
                      32767).astype(np.int16)
        pieces, i = [], 0
        while i < pcm.shape[1]:
            n = int(rng.integers(5000, 40000))
            pieces.append(pcm[:, i:i + n])
            i += n
        streams.append(pieces)

    # solo reference runs (serialized)
    solo = [list(client.streaming_transcribe(p, channels=2,
                                             timeout=300.0))
            for p in streams]

    results = {}
    errs = []

    def run_stream(i):
        try:
            results[i] = list(client.streaming_transcribe(
                streams[i], channels=2, timeout=300.0))
        except Exception as e:  # pragma: no cover
            errs.append(repr(e))

    def run_unary():
        try:
            client.transcribe(_wav_bytes(dur=4.0), timeout=300.0)
        except Exception as e:  # pragma: no cover
            errs.append(repr(e))

    threads = [threading.Thread(target=run_stream, args=(i,),
                                daemon=True) for i in range(4)]
    threads += [threading.Thread(target=run_unary, daemon=True)
                for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    assert set(results) == {0, 1, 2, 3}
    for i in range(4):
        assert len(results[i]) == len(solo[i]), (i, len(results[i]))
        for got, want in zip(results[i], solo[i]):
            assert got.start_time == want.start_time
            assert got.end_time == want.end_time
            assert got.transcription_chunk == want.transcription_chunk


def test_streaming_mid_frame_message_splits(client):
    """Raw-byte messages split at ARBITRARY boundaries (mid-int16,
    mid-frame) must produce identical results to frame-aligned
    streaming — a dropped half-frame would swap the stereo channels
    for the rest of the stream (partial frames carry across
    messages)."""
    from tests.conftest import make_stereo_call

    wf = make_stereo_call(dur=6.0)
    pcm = np.clip(np.round(wf * 32768.0), -32768,
                  32767).astype(np.int16)
    raw = np.ascontiguousarray(pcm.T).tobytes()  # interleaved stream

    rng = np.random.default_rng(3)
    pieces, i = [], 0
    while i < len(raw):
        n = int(rng.integers(1, 40001))          # any byte count
        pieces.append(raw[i:i + n])
        i += n
    assert any(len(p) % 4 for p in pieces)       # real mid-frame cuts

    got = list(client.streaming_transcribe(pieces, channels=2,
                                           timeout=300.0))
    aligned = list(client.streaming_transcribe([pcm], channels=2,
                                               timeout=300.0))
    assert len(got) == len(aligned) >= 1
    for g, a in zip(got, aligned):
        assert g.transcription_chunk == a.transcription_chunk
        assert g.agent_transcription == a.agent_transcription
        assert g.client_transcription == a.client_transcription
