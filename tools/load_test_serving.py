#!/usr/bin/env python
"""Serving load test on the real chip.

Starts the HTTP server with the full-geometry fused engine, drives it
with N concurrent clients for D seconds, then exercises the failure
modes. Reports:

  - sustained serving RTFx (audio seconds acked / wall seconds)
  - p50/p95 request latency (server-side, from /v1/stats)
  - a deliberate backpressure trip (expect HTTP 503 + Retry-After)
  - SIGTERM-style drain under load (in-flight requests complete, new
    ones are refused)

Usage: python tools/load_test_serving.py [clients=8] [seconds=120]
                                         [audio_sec=20]
"""

import json
import sys
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SR = 16000
PORT = 18080


def make_wav_bytes(audio_sec: float, seed: int) -> bytes:
    import io
    import struct

    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * audio_sec)) / SR
    wav = np.stack([
        0.2 * np.sin(2 * np.pi * (200 + 20 * seed) * t),
        0.2 * np.sin(2 * np.pi * (300 + 20 * seed) * t),
    ]) + 0.05 * rng.standard_normal((2, t.shape[0]))
    pcm = np.clip(np.round(wav.T * 32767), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    buf = io.BytesIO()
    buf.write(b"RIFF")
    buf.write(struct.pack("<I", 36 + len(payload)))
    buf.write(b"WAVEfmt ")
    buf.write(struct.pack("<IHHIIHH", 16, 1, 2, SR, SR * 4, 4, 16))
    buf.write(b"data")
    buf.write(struct.pack("<I", len(payload)))
    buf.write(payload)
    return buf.getvalue()


def post(path: str, body: bytes, timeout: float = 600.0):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}", data=body,
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def get(path: str):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{PORT}{path}", timeout=30) as r:
        return json.loads(r.read())


def main():
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    audio_sec = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.serving import serve
    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    cfg = PipelineConfig(transcription_model="",
                         logs_folder="/tmp/serve_logs",
                         extras={"serve_warmup": "all"})
    print("starting server (warmup compiles all buckets)...", flush=True)
    server = serve(cfg, host="127.0.0.1", port=PORT)
    srv_thread = threading.Thread(target=server.serve_forever,
                                  daemon=True)
    srv_thread.start()

    payloads = [make_wav_bytes(audio_sec, i) for i in range(n_clients)]
    print(f"load: {n_clients} clients x {duration:.0f}s, "
          f"{audio_sec:.0f}s stereo per request", flush=True)

    stop = threading.Event()
    counters = {"ok": 0, "err": 0, "s503": 0, "audio": 0.0}
    lock = threading.Lock()

    def client(i: int):
        while not stop.is_set():
            try:
                status, out = post("/v1/transcribe", payloads[i])
                with lock:
                    counters["ok"] += 1
                    counters["audio"] += out["duration_seconds"]
            except urllib.error.HTTPError as e:
                with lock:
                    if e.code == 503:
                        counters["s503"] += 1
                    else:
                        counters["err"] += 1
                time.sleep(0.2)
            except Exception:
                with lock:
                    counters["err"] += 1
                time.sleep(0.2)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    for t in threads:
        t.start()
    time.sleep(duration)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    wall = time.perf_counter() - t0

    stats = get("/v1/stats")
    rtfx = counters["audio"] / wall
    print(f"\nsustained: {counters['ok']} requests ok, "
          f"{counters['audio']:.0f} audio-s in {wall:.0f}s wall "
          f"-> serving RTFx {rtfx:.1f}")
    print(f"errors: {counters['err']}  503s during steady load: "
          f"{counters['s503']}")
    print(f"server latency p50 {stats['p50_latency_seconds']}s "
          f"p95 {stats['p95_latency_seconds']}s; batches "
          f"{stats['batches']}, chunks {stats['chunks']}")

    # ---- backpressure trip -------------------------------------------
    print("\nbackpressure trip: shrinking queue cap + burst...",
          flush=True)
    server.service.max_pending_chunks = 2
    got_503 = 0
    burst_threads = []
    results = []

    def burst():
        try:
            status, _ = post("/v1/transcribe", payloads[0])
            results.append(status)
        except urllib.error.HTTPError as e:
            results.append(e.code)

    for _ in range(6):
        th = threading.Thread(target=burst, daemon=True)
        burst_threads.append(th)
        th.start()
    for th in burst_threads:
        th.join(timeout=120)
    got_503 = sum(1 for s in results if s == 503)
    print(f"burst of 6 x {audio_sec:.0f}s against cap=2 chunks: "
          f"{got_503} x 503, {sum(1 for s in results if s == 200)} x 200")
    assert got_503 >= 1, "backpressure never tripped"
    server.service.max_pending_chunks = 32 * 16

    # ---- gRPC arm: sanity + RESOURCE_EXHAUSTED backpressure ----------
    print("\ngRPC arm: starting gRPC front-end on the same engine...",
          flush=True)
    try:
        import grpc

        from audio_processor_tpu.grpc_serving import (GrpcClient,
                                                      GrpcInferenceServer)

        gsrv = GrpcInferenceServer(server.service, PORT + 1)
        gsrv.start()
        client_g = GrpcClient(f"127.0.0.1:{gsrv.bound_port}")
        t0 = time.perf_counter()
        g_ok, g_audio = 0, 0.0
        for i in range(4):
            resp = client_g.transcribe(payloads[i % n_clients])
            g_ok += 1
            g_audio += resp.duration_seconds
        g_wall = time.perf_counter() - t0
        print(f"gRPC sanity: {g_ok} requests, {g_audio:.0f} audio-s in "
              f"{g_wall:.1f}s -> RTFx {g_audio / g_wall:.1f}")

        print("gRPC backpressure: shrinking queue cap + burst...",
              flush=True)
        server.service.max_pending_chunks = 2
        g_results = []

        def g_burst():
            try:
                client_g.transcribe(payloads[0])
                g_results.append("OK")
            except grpc.RpcError as e:
                g_results.append(e.code().name)

        g_threads = [threading.Thread(target=g_burst, daemon=True)
                     for _ in range(6)]
        for th in g_threads:
            th.start()
        for th in g_threads:
            th.join(timeout=120)
        n_exhausted = sum(1 for s in g_results
                          if s == "RESOURCE_EXHAUSTED")
        print(f"gRPC burst of 6 x {audio_sec:.0f}s against cap=2 "
              f"chunks: {n_exhausted} x RESOURCE_EXHAUSTED, "
              f"{sum(1 for s in g_results if s == 'OK')} x OK")
        assert n_exhausted >= 1, "gRPC backpressure never tripped"
        server.service.max_pending_chunks = 32 * 16

        # streaming arm: 2 concurrent live streams, results must match
        # the unary path for the same audio
        print("gRPC streaming: 2 concurrent live PCM streams...",
              flush=True)
        rng = np.random.default_rng(7)
        t = np.arange(int(SR * 60.0)) / SR
        wav60 = np.stack([
            np.sin(2 * np.pi * 220 * t) * 0.3
            + 0.02 * rng.standard_normal(t.size),
            np.sin(2 * np.pi * 330 * t) * 0.3], 0)
        pcm = np.clip(np.round(wav60 * 32768), -32768,
                      32767).astype(np.int16)
        pieces = [pcm[:, i:i + SR] for i in range(0, pcm.shape[1], SR)]

        s_out = {}

        def one_stream(tag):
            t0 = time.perf_counter()
            chunks = list(client_g.streaming_transcribe(
                pieces, channels=2, timeout=600.0))
            s_out[tag] = (len(chunks), time.perf_counter() - t0)

        s_threads = [threading.Thread(target=one_stream, args=(i,),
                                      daemon=True) for i in range(2)]
        t0 = time.perf_counter()
        for th in s_threads:
            th.start()
        for th in s_threads:
            th.join(timeout=600)
        s_wall = time.perf_counter() - t0
        assert len(s_out) == 2, f"streams finished: {s_out}"
        n0, _ = s_out[0]
        assert all(n == n0 for n, _ in s_out.values()), s_out
        print(f"streaming: 2 x 60s stereo streams -> {n0} chunks each "
              f"in {s_wall:.1f}s wall (RTFx "
              f"{2 * 60.0 / s_wall:.1f} incl. stream pacing)")
        gsrv.stop()
    except ImportError:
        print("grpcio not importable here; gRPC arm skipped")

    # ---- drain under load --------------------------------------------
    print("\ndrain under load (SIGTERM semantics)...", flush=True)
    inflight_result = {}

    def inflight():
        try:
            status, out = post("/v1/transcribe", payloads[1])
            inflight_result["status"] = status
        except Exception as e:
            inflight_result["status"] = repr(e)

    th = threading.Thread(target=inflight, daemon=True)
    th.start()
    time.sleep(0.2)               # let it enter the queue
    server.service.close(drain_timeout=60)
    th.join(timeout=120)
    print(f"in-flight request during drain -> {inflight_result}")
    assert inflight_result.get("status") == 200, \
        "in-flight request must complete during drain"
    try:
        post("/v1/transcribe", payloads[0], timeout=10)
        print("ERROR: post-drain request accepted")
    except Exception as e:
        print(f"post-drain request correctly refused: {type(e).__name__}")
    server.shutdown()
    print("\nload test complete")


if __name__ == "__main__":
    main()
