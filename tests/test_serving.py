"""Online serving mode (serving.py): HTTP transcription with request
micro-batching into the fused device program. Beyond the reference
(which is batch/cron only, run_cron.sh:12)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.io import wav
from audio_processor_tpu.serving import InferenceService, serve

from tests.conftest import make_stereo_call
from tests.test_engine_e2e import tiny_engine


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        enable_mixed_precision=False,
        chunk_duration_sec=4.0, overlap_sec=1.0,
        length_buckets_sec=(2.0, 4.0), chunk_batch_size=4,
        extras={"serve_batch_window_ms": 30.0})


@pytest.fixture(scope="module")
def server(cfg, tmp_path_factory):
    srv = serve(cfg, host="127.0.0.1", port=0, asr_engine=tiny_engine(cfg))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.service.close()
    srv.server_close()


def _wav_bytes(dur=4.0, seed=0):
    buf = io.BytesIO()
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "x.wav"
        wav.write(p, make_stereo_call(dur=dur), 16000)
        return p.read_bytes()


def _post(port, payload, path="/v1/transcribe"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=payload,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    port = server.server_address[1]
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        assert r.status == 200
        assert json.loads(r.read()) == {"status": "ok"}


def test_transcribe_roundtrip(server):
    port = server.server_address[1]
    status, out = _post(port, _wav_bytes(dur=6.0))
    assert status == 200
    assert out["num_chunks"] == 2          # 4 s chunks, 1 s overlap, 6 s
    assert abs(out["duration_seconds"] - 6.0) < 0.01
    for key in ("transcription", "agent_transcription",
                "client_transcription", "chunks", "latency_seconds"):
        assert key in out
    assert all(c["error"] == "" for c in out["chunks"])
    # waveforms/features must not leak into the JSON
    assert not any(k.endswith("_waveform") for c in out["chunks"]
                   for k in c)


def test_concurrent_requests_are_batched(server):
    port = server.server_address[1]
    n = 6
    results = [None] * n
    errs = []

    def call(i):
        try:
            results[i] = _post(port, _wav_bytes(dur=4.0))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    before = dict(server.service.stats)
    threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errs
    assert all(r is not None and r[0] == 200 for r in results)
    after = dict(server.service.stats)
    assert after["requests"] - before["requests"] == n
    # micro-batching: fewer device batches than requests
    assert after["batches"] - before["batches"] < n


def test_bad_payload_is_rejected(server):
    port = server.server_address[1]
    try:
        status, out = _post(port, b"this is not audio at all")
    except urllib.error.HTTPError as e:
        status, out = e.code, json.loads(e.read())
    assert status == 400
    assert "error" in out


def test_ogg_payload(server):
    from tests.vorbis_encoder import make_stereo_stream

    port = server.server_address[1]
    status, out = _post(port, make_stereo_stream(n_packets=24, seed=3))
    assert status == 200
    assert out["num_chunks"] >= 1


def test_service_direct_api(cfg):
    svc = InferenceService(cfg, asr_engine=tiny_engine(cfg))
    try:
        out = svc.transcribe_bytes(_wav_bytes(dur=4.0))
        assert out["num_chunks"] == 1
    finally:
        svc.close()


def test_stats_latency_percentiles(server):
    port = server.server_address[1]
    _post(port, _wav_bytes(dur=4.0))
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["p50_latency_seconds"] > 0
    assert stats["p95_latency_seconds"] >= stats["p50_latency_seconds"]


def test_metrics_endpoint(server):
    port = server.server_address[1]
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    assert "# TYPE audio_processor_requests counter" in body
    assert "audio_processor_pending_chunks" in body


def test_overload_backpressure(cfg):
    """Requests beyond serve_max_pending_chunks get a clean 503 with
    Retry-After instead of unbounded queue growth."""
    from audio_processor_tpu.serving import ServerOverloaded

    svc = InferenceService(
        cfg.replace(extras={**cfg.extras,
                            "serve_max_pending_chunks": 1,
                            "serve_warmup": False}),
        asr_engine=tiny_engine(cfg))
    try:
        # Occupy the queue directly (bypass the worker by pausing it):
        # simplest deterministic path — claim the whole budget.
        with svc._stats_lock:
            svc._pending_chunks = 1
        with pytest.raises(ServerOverloaded):
            svc.transcribe_bytes(_wav_bytes(dur=4.0))
        assert svc.stats["rejected_overload"] == 1
        # Release the budget: the service accepts requests again.
        with svc._stats_lock:
            svc._pending_chunks = 0
        out = svc.transcribe_bytes(_wav_bytes(dur=4.0))
        assert out["num_chunks"] >= 1
    finally:
        svc.close(drain_timeout=5)


def test_overload_maps_to_http_503(cfg):
    srv = serve(cfg.replace(extras={**cfg.extras,
                                    "serve_max_pending_chunks": 1,
                                    "serve_warmup": False}),
                host="127.0.0.1", port=0, asr_engine=tiny_engine(cfg))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        with srv.service._stats_lock:
            srv.service._pending_chunks = 1
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(port, _wav_bytes(dur=4.0))
        assert exc.value.code == 503
        assert exc.value.headers.get("Retry-After") == "5"
    finally:
        srv.shutdown()
        srv.service.close(drain_timeout=5)
        srv.server_close()


def test_gsm_wav_payload(server):
    """A mono GSM 6.10 (WAV49) request body decodes (io/gsm.py),
    resamples 8 kHz -> 16 kHz and transcribes with the mono->both-
    speakers view semantics (split_audio duplicates ch0)."""
    import pytest as _pytest

    from audio_processor_tpu.io import gsm as gsm_mod

    if not gsm_mod.libgsm_available():  # body construction needs it
        _pytest.skip("libgsm encoder unavailable in image")
    from tests.test_gsm import _encode_wav49_payload, _gsm_wav_bytes

    rng = np.random.default_rng(4)
    pcm = (rng.standard_normal(8000 * 2) * 6000).astype(np.int16)
    body = _gsm_wav_bytes(_encode_wav49_payload(pcm), len(pcm))
    port = server.server_address[1]
    status, out = _post(port, body)
    assert status == 200
    assert out["num_chunks"] >= 1
    assert out["duration_seconds"] == pytest.approx(2.0, abs=0.05)


def test_opus_payload(server):
    """Ogg/Opus request bodies decode in-process (io/opus.py: libopus
    ctypes fast path or the first-party RFC 6716 fallback) — the
    serving surface accepts the reference's third container format
    without ffmpeg (reference shells out: audio_processor.py:76-86)."""
    from tests.opus_encoder import encode_ogg_opus, encoder_available

    if not encoder_available():   # body construction needs the encoder
        import pytest as _pytest

        _pytest.skip("libopus encoder unavailable in image")
    t = np.arange(int(1.2 * 48000)) / 48000.0
    pcm = np.stack([0.25 * np.sin(2 * np.pi * 220 * t),
                    0.25 * np.sin(2 * np.pi * 330 * t)], axis=1)
    body = encode_ogg_opus(pcm.astype(np.float32), channels=2)
    port = server.server_address[1]
    status, out = _post(port, body)
    assert status == 200
    assert out["num_chunks"] >= 1


def test_flac_payload(server):
    """FLAC request bodies (raw fLaC container) decode through the
    first-party decoder (io/flac.py) on the serving surface."""
    from tests.flac_encoder import encode_flac

    t = np.arange(int(1.5 * 16000)) / 16000.0
    pcm = np.stack([0.4 * np.sin(2 * np.pi * 220 * t),
                    0.4 * np.sin(2 * np.pi * 330 * t)], axis=1)
    ints = np.clip(np.round(pcm * 32767), -32768, 32767).astype(np.int64)
    body = encode_flac(ints, 16000, 16, block_size=4096,
                       ch_mode="mid_side", plan=("lpc", 8, 14))
    port = server.server_address[1]
    status, out = _post(port, body)
    assert status == 200
    assert out["num_chunks"] >= 1


def _multipart(fields):
    """fields: {name: (filename or None, bytes)} -> (body, content_type)."""
    boundary = "testboundary7429"
    parts = []
    for name, (fname, data) in fields.items():
        disp = f'form-data; name="{name}"'
        if fname:
            disp += f'; filename="{fname}"'
        parts.append(
            f"--{boundary}\r\nContent-Disposition: {disp}\r\n"
            f"Content-Type: application/octet-stream\r\n\r\n"
            .encode() + data + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def _post_openai(port, fields, path="/v1/audio/transcriptions"):
    body, ctype = _multipart(fields)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type", ""), e.read()


def test_openai_transcriptions_json(server):
    """OpenAI-compatible route: multipart file upload -> {'text': ...}
    matching the native route's joined transcription."""
    port = server.server_address[1]
    wav_b = _wav_bytes(dur=6.0)
    st, ctype, raw = _post_openai(
        port, {"file": ("call.wav", wav_b), "model": (None, b"whisper-1")})
    assert st == 200 and "json" in ctype
    out = json.loads(raw)
    assert set(out) == {"text"}
    _, native = _post(port, wav_b)
    assert out["text"] == native["transcription"]


def test_openai_transcriptions_text_and_verbose(server):
    port = server.server_address[1]
    wav_b = _wav_bytes(dur=6.0)
    st, ctype, raw = _post_openai(
        port, {"file": ("c.wav", wav_b),
               "response_format": (None, b"text")})
    assert st == 200 and ctype.startswith("text/plain")
    text = raw.decode().strip()

    st, _, raw = _post_openai(
        port, {"file": ("c.wav", wav_b),
               "response_format": (None, b"verbose_json")})
    assert st == 200
    out = json.loads(raw)
    assert out["task"] == "transcribe"
    assert out["text"] == text
    assert abs(out["duration"] - 6.0) < 0.01
    assert len(out["segments"]) == 2      # 4 s chunks, 1 s overlap
    assert out["segments"][0]["start"] == 0.0
    assert out["segments"][1]["end"] > out["segments"][0]["end"]
    assert all(set(s) == {"id", "start", "end", "text"}
               for s in out["segments"])


def test_openai_transcriptions_errors(server):
    port = server.server_address[1]
    # missing file part
    st, _, raw = _post_openai(port, {"model": (None, b"whisper-1")})
    assert st == 400 and b"file" in raw
    # not multipart at all
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/audio/transcriptions",
        data=b"rawbytes", headers={"Content-Type":
                                   "application/octet-stream"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            st = r.status
    except urllib.error.HTTPError as e:
        st = e.code
    assert st == 400
    # bad response_format
    st, _, raw = _post_openai(
        port, {"file": ("c.wav", _wav_bytes(dur=4.0)),
               "response_format": (None, b"srt")})
    assert st == 400
