#!/usr/bin/env python
"""Benchmark on the real chip. Prints ONE JSON line.

Two timed workloads over the same 24 synthetic 2-channel 3-minute
PCM16 calls (BASELINE.md config 5: 8-file batches; 24 calls so the
3-stage pipeline overlap amortizes sweep head/tail):

- ``asr_rtfx``: scan -> decode -> chunk -> fused fbank+ASR(3 views)+
  acoustic-features -> CTC text (the reference hot loop,
  services/audio_processor.py:247-309).
- ``e2e_rtfx`` (headline) + ``files_per_hour``: the FULL config-5
  pipeline — scan -> decode -> chunk -> fused ASR+features -> text
  BERT x2 (DarijaBERT geometry) -> SVC/RF -> late fusion ->
  call-level aggregation -> SQLite + CSV + run reports — i.e.
  DataProcessor.run() (reference: services/pipeline.py:477-530 +
  sentiment_analysis.py:65-167).

All models run with synthetic weights at PRODUCTION geometry (full
w2v-bert-2.0 encoder, full DarijaBERT classifiers, SVC with RBF
kernel + 100-tree RandomForest on 38-dim features); checkpoints for
the real weights aren't shipped in this image. Weight values don't
change the device work per audio second.

vs_baseline: the reference README claims ~600 files/hour on an
80GB-GPU host (README.md:91) with typical call-center files of ~3 min,
i.e. ~30 audio-hours/hour => baseline e2e RTFx 30 (see BASELINE.md).
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

BASELINE_RTFX = 30.0
BASELINE_FILES_PER_HOUR = 600.0
NUM_CALLS = 24   # >= 3 sweeps of 8-file batches: head/tail amortized
CALL_SEC = 180.0  # 3 minutes
SR = 16000
TIMED_SWEEPS = 5  # best-of AND p50-of-5 both reported

CLIENT_LABELS = ["content", "mécontent", "neutre", "très mécontent"]
AGENT_LABELS = ["aggressive", "courtois", "neutre", "sec"]


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_calls(dir_: Path):
    """NUM_CALLS synthetic 2-channel 3-minute calls, written as 16-bit
    PCM WAV — the reference's own wire format (it transcodes every
    input to pcm_s16le, services/audio_processor.py:76-86). ~11 MiB
    per call."""
    from audio_processor_tpu.io import wav

    rng = np.random.default_rng(0)
    t = np.arange(int(SR * CALL_SEC)) / SR
    paths = []
    for i in range(NUM_CALLS):
        agent = 0.05 * rng.standard_normal(t.shape[0]) + \
            0.2 * np.sin(2 * np.pi * (180 + 10 * i) * t)
        client = 0.05 * rng.standard_normal(t.shape[0]) + \
            0.2 * np.sin(2 * np.pi * (240 + 10 * i) * t)
        p = dir_ / f"call_{i}.wav"
        wav.write(p, np.stack([agent, client]).astype(np.float32), SR)
        paths.append(p)
    return paths


# Rotating >=5-char French phrases injected when a synthetic-weight CTC
# transcript falls under the reference's 5-char skip (see
# EngagedSentimentAnalyzer).
INJECT_TEXTS = [
    "bonjour je vous appelle pour un probleme de facturation",
    "merci beaucoup pour votre aide je suis tres content",
    "le service ne fonctionne plus depuis hier soir",
    "je voudrais resilier mon abonnement immediatement",
    "pouvez vous verifier ma derniere facture svp",
    "l agent a ete tres courtois et professionnel",
    "c est inadmissible j attends depuis une heure",
    "tout est rentre dans l ordre merci pour votre patience",
]


class EngagedSentimentAnalyzer:
    """Guarantees the sentiment stage actually engages in the timed
    region. With random synthetic weights the CTC transcripts can fall
    under the reference-preserved 5-char skip
    (sentiment_analysis.py:1099), which silently skips text BERT — and
    the acoustic result is gated on text (:140-142) — so a "full
    pipeline" sweep could degenerate to ASR+plumbing without failing.
    Any short transcript is replaced with a rotating >=5-char phrase
    BEFORE analysis, and engagement (non-empty text + fusion
    predictions) is counted so the bench can assert >=90% coverage.
    Device work is identical to production: BERT x2 + SVC/RF + fusion
    run for every chunk."""

    def __init__(self, inner):
        self._inner = inner
        self.text_analyzer = inner.text_analyzer
        self.acoustic_analyzer = inner.acoustic_analyzer
        self.chunks_seen = 0
        self.text_engaged = 0
        self.fusion_engaged = 0
        self._n_injected = 0

    def set_database_manager(self, db):
        self._inner.set_database_manager(db)

    def reset_counters(self):
        self.chunks_seen = self.text_engaged = self.fusion_engaged = 0

    def engagement(self):
        n = max(1, self.chunks_seen)
        return self.text_engaged / n, self.fusion_engaged / n

    def analyze_batch_sentiment(self, chunks):
        for c in chunks:
            if c.get("error"):
                continue
            for k in ("agent_transcription", "client_transcription"):
                t = c.get(k) or ""
                if len(t.strip()) < 5:
                    c[k] = INJECT_TEXTS[self._n_injected
                                        % len(INJECT_TEXTS)]
                    self._n_injected += 1
        out = self._inner.analyze_batch_sentiment(chunks)
        for c in out:
            self.chunks_seen += 1
            if c.get("agent_text_sentiment") and \
                    c.get("client_text_sentiment"):
                self.text_engaged += 1
            if c.get("agent_fusion_sentiment") and \
                    c.get("client_fusion_sentiment"):
                self.fusion_engaged += 1
        return out


def make_text_model(d: Path, labels, seed: int):
    """Random-weight BertForSequenceClassification at DarijaBERT
    geometry (SI2M-Lab/DarijaBERT: vocab 80k, hidden 768, 12 layers)
    — the reference's text-sentiment backbone
    (services/sentiment_analysis.py:952-975)."""
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import (BertForSequenceClassification,
                              BertTokenizerFast)

    torch.manual_seed(seed)
    cfg = HFBertConfig(
        vocab_size=80000, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, num_labels=len(labels),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        id2label={i: l for i, l in enumerate(labels)},
        label2id={l: i for i, l in enumerate(labels)})
    model = BertForSequenceClassification(cfg)
    model.eval()
    model.save_pretrained(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        [chr(c) for c in range(ord("a"), ord("z") + 1)] + \
        ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)] + \
        [f"tok{i}" for i in range(80000 - 57)]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(str(d / "vocab.txt"), lowercase=True) \
        .save_pretrained(d)


def make_acoustic_models(base: Path):
    """SVC (client) + RandomForest (agent) + scalers on 38-dim
    features, production-scale (reference loads these via joblib,
    sentiment_analysis.py:563-601)."""
    import joblib
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2000, 38))
    for labels, kind in ((CLIENT_LABELS, "svc"), (AGENT_LABELS, "forest")):
        y = np.asarray(labels)[rng.integers(0, len(labels), x.shape[0])]
        xc = x + rng.standard_normal((len(labels), 38))[
            np.searchsorted(np.asarray(labels), y)]
        scaler = StandardScaler().fit(xc)
        xs = scaler.transform(xc)
        if kind == "svc":
            model = SVC(kernel="rbf", probability=True,
                        random_state=0).fit(xs, y)
        else:
            model = RandomForestClassifier(
                n_estimators=100, random_state=0).fit(xs, y)
        joblib.dump(model, base / f"{kind}_model.joblib")
        joblib.dump(scaler, base / f"{kind}_scaler.joblib")


def run_asr_bench(engine, cfg, input_dir: Path):
    from audio_processor_tpu.io.decode import load_audio
    from audio_processor_tpu.io.scanner import AudioFileScanner
    from audio_processor_tpu.pipeline.chunker import split_audio

    # Warm-up: compile every bucket used by a full call shape.
    paths = sorted(input_dir.glob("*.wav"))
    warm = split_audio(load_audio(paths[0])[0], SR, "warm.wav",
                       cfg.chunk_duration_sec, cfg.overlap_sec)
    engine.transcribe_chunks(warm)

    # Three timed passes; report the best (the tunneled-TPU transport
    # shows 2x run-to-run swings from unrelated host activity).
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        files = AudioFileScanner(cfg).scan_files_parallel(input_dir)
        all_chunks = []
        for f in files:
            waveform, sr = load_audio(f)
            assert sr == SR
            all_chunks.extend(split_audio(
                waveform, sr, f.name,
                cfg.chunk_duration_sec, cfg.overlap_sec))
        results = engine.transcribe_chunks(all_chunks)
        dt = min(dt, time.perf_counter() - t0)
    assert len(results) == len(all_chunks) and all(
        r["error"] == "" for r in results)
    return dt


def run_encoder_bench(engine):
    """Device-resident encoder timing (inputs pre-staged in HBM, no
    host<->device transfer in the timed region): the noise-robust
    number on this image's tunneled transport, whose 2x phase-level
    swings dominate the end-to-end metrics. 48 rows = 16 chunks x 3
    speaker views = 400 s of audio per batch."""
    import jax
    import jax.numpy as jnp

    from audio_processor_tpu.models import wav2vec2bert as w2v

    cfg_m = engine.model_cfg
    B, L = 3 * 16, 1280  # 16 chunks x 3 views, 25 s bucket
    audio_sec = 16 * 25.0
    rng = np.random.default_rng(0)
    feats = jax.device_put(rng.standard_normal(
        (B, L, cfg_m.feature_projection_input_dim)).astype(np.float32))
    mask = jax.device_put(np.ones((B, L), bool))
    impl = engine.attention_impl

    @jax.jit
    def fwd(p, f, m):
        return jnp.sum(w2v.forward(p, cfg_m, f, m, dtype=jnp.bfloat16,
                                   attention_impl=impl))

    float(fwd(engine.params, feats, mask))  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd(engine.params, feats, mask))
        best = min(best, time.perf_counter() - t0)
    return audio_sec / best, best


def run_e2e_bench(engine, analyzer, make_cfg, input_dir: Path,
                  work: Path):
    """Config-5 full pipeline via DataProcessor.run(); one warm-up
    sweep (compiles text/acoustic programs), then TIMED_SWEEPS timed
    sweeps with fresh markers/DB/outputs. Returns (best, p50) sweep
    seconds — best-of because the tunneled transport shows 2x
    run-to-run swings from unrelated host activity, p50 so cross-round
    comparisons aren't phase-lucky. Each timed sweep asserts the
    sentiment stage engaged on >=90% of chunks (text AND fusion
    predictions non-empty) — see EngagedSentimentAnalyzer."""
    from audio_processor_tpu.host.db import DatabaseManager
    from audio_processor_tpu.pipeline.engine import DataProcessor

    timings = []
    phases = ["warmup"] + [f"timed{i+1}" for i in range(TIMED_SWEEPS)]
    for phase in phases:
        out = work / f"out_{phase}"
        cfg = make_cfg(input_folder=str(input_dir),
                       output_folder=str(out),
                       db_path=str(work / f"{phase}.sqlite"))
        db = DatabaseManager(cfg)
        analyzer.set_database_manager(db)
        proc = DataProcessor(cfg, db_manager=db, asr_engine=engine,
                             sentiment_analyzer=analyzer)
        analyzer.reset_counters()
        t0 = time.perf_counter()
        n = proc.run()
        dt = time.perf_counter() - t0
        proc.close()
        db.close()
        assert n == NUM_CALLS, f"{phase}: {n}/{NUM_CALLS} succeeded"
        assert proc.stats["errors"] == 0
        text_rate, fusion_rate = analyzer.engagement()
        assert analyzer.chunks_seen >= NUM_CALLS, \
            f"{phase}: sentiment saw only {analyzer.chunks_seen} chunks"
        assert text_rate >= 0.9 and fusion_rate >= 0.9, (
            f"{phase}: sentiment engagement too low "
            f"(text {text_rate:.2f}, fusion {fusion_rate:.2f}) — "
            "the timed region is not exercising the full pipeline")
        if phase == "warmup":
            log(f"e2e warmup sweep {dt:.1f}s")
            continue
        csvs = list(out.glob("optimized_results_*.csv"))
        assert csvs and csvs[0].stat().st_size > 0
        log(f"e2e {phase} sweep {dt:.1f}s (text {text_rate:.2f}, "
            f"fusion {fusion_rate:.2f} engaged)")
        timings.append(dt)
    return min(timings), float(np.percentile(timings, 50))


def probe_device(timeout_s=300.0):
    """Fail fast when the TPU tunnel is down (exit code 3 = retryable).

    Backend init (`jax.devices()`) through a dead tunnel hangs for
    tens of minutes with no output; bound it so a broken transport
    yields a clear non-zero exit instead of a silent stall. The
    probe runs in a daemon thread because a hung PJRT client call
    cannot be interrupted — on timeout the process hard-exits. A
    backend-init *error* (e.g. "UNAVAILABLE: TPU backend setup
    error", seen during the round-3 outage) exits 3 as well — both
    shapes are transient tunnel failures the parent retry loop in
    __main__ recovers from.
    """
    import threading

    devs, errs = [], []

    def _probe():
        import jax

        try:
            devs.append(jax.devices())
        except Exception as e:  # backend init failed outright
            errs.append(e)

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout_s)
    import os

    if errs:
        log(f"FATAL: jax backend init failed: {errs[0]!r} — "
            f"TPU tunnel down/unreachable (retryable)")
        os._exit(3)
    if not devs:
        log(f"FATAL: jax.devices() did not return within "
            f"{timeout_s:.0f}s — TPU tunnel down/unreachable; "
            f"no measurement possible (retryable)")
        os._exit(3)
    log(f"devices: {devs[0]}")


def main():
    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.pipeline.asr_engine import ASREngine
    from audio_processor_tpu.pipeline.sentiment import SentimentAnalyzer
    from audio_processor_tpu.utils.system import enable_compilation_cache

    probe_device()

    # Compiles through this image's tunnel are ~10x slower than cached
    # reloads; persist them so repeat benches spend time measuring,
    # not compiling.
    enable_compilation_cache()

    with tempfile.TemporaryDirectory() as td:
        work = Path(td)
        input_dir = work / "input"
        input_dir.mkdir()
        make_calls(input_dir)

        log("building synthetic production-geometry sentiment models")
        models = work / "models"
        client_dir, agent_dir = models / "client", models / "agent"
        client_dir.mkdir(parents=True)
        agent_dir.mkdir()
        make_text_model(client_dir, CLIENT_LABELS, 0)
        make_text_model(agent_dir, AGENT_LABELS, 1)
        make_acoustic_models(models)

        def make_cfg(**kw):
            return PipelineConfig(
                transcription_model="", chunk_batch_size=16,
                file_batch_size=8,
                # Config 5 IS "8-file batches" (BASELINE.md). The
                # reference's 23 MB payload cap (config.yaml:25) sizes
                # batches for float32 GPU decode buffers and never
                # packs 8 PCM16 calls; scaled to actual 11 MiB files
                # it admits the full 8-file batch, which packs the
                # 25 s bucket into clean 16/16/16/8 sub-batches (zero
                # padding rows vs 24% padded device seconds at 2-file
                # batches — measured +60% e2e, tools/ab_async.py:
                # interleaved best 312 vs 194 RTFx).
                max_batch_size_mb=92.0,
                logs_folder=str(work / "logs"),
                database_type="sqlite",
                client_text_model_path=str(client_dir),
                agent_text_model_path=str(agent_dir),
                client_acoustic_model_path=str(models / "svc_model.joblib"),
                client_acoustic_scaler_path=str(
                    models / "svc_scaler.joblib"),
                agent_acoustic_model_path=str(
                    models / "forest_model.joblib"),
                agent_acoustic_scaler_path=str(
                    models / "forest_scaler.joblib"),
                save_csv_results=True,
                **kw)

        cfg = make_cfg(input_folder=str(input_dir),
                       output_folder=str(work / "out_asr"),
                       db_path=str(work / "asr.sqlite"))
        log("loading ASR engine (full w2v-bert-2.0 geometry)")
        engine = ASREngine(cfg)  # full-size geometry, synthetic weights
        log("ASR-only timed loop")
        asr_dt = run_asr_bench(engine, cfg, input_dir)

        log("device-resident encoder timing")
        encoder_rtfx, encoder_dt = run_encoder_bench(engine)
        log(f"encoder {encoder_dt*1e3:.0f} ms/48x25s batch "
            f"-> RTFx {encoder_rtfx:.0f}")

        log("building sentiment analyzer")
        analyzer = EngagedSentimentAnalyzer(SentimentAnalyzer(cfg))
        assert analyzer.text_analyzer.models_available
        assert analyzer.acoustic_analyzer.models_available
        log("config-5 full-pipeline run")
        e2e_dt, e2e_p50 = run_e2e_bench(engine, analyzer, make_cfg,
                                        input_dir, work)

    audio_hours = NUM_CALLS * CALL_SEC / 3600.0
    asr_rtfx = audio_hours / (asr_dt / 3600.0)
    e2e_rtfx = audio_hours / (e2e_dt / 3600.0)
    files_per_hour = NUM_CALLS / (e2e_dt / 3600.0)
    print(json.dumps({
        "metric": "e2e_rtfx",
        "value": round(e2e_rtfx, 2),
        "unit": "audio_hours/hour/chip",
        "vs_baseline": round(e2e_rtfx / BASELINE_RTFX, 2),
        "asr_rtfx": round(asr_rtfx, 2),
        "encoder_rtfx": round(encoder_rtfx, 2),
        "files_per_hour": round(files_per_hour, 1),
        "files_per_hour_vs_baseline": round(
            files_per_hour / BASELINE_FILES_PER_HOUR, 2),
        # p50 of the TIMED_SWEEPS timed sweeps: the trust-but-verify
        # companion to the best-of headline on this 2x-swing transport.
        "e2e_rtfx_p50": round(audio_hours / (e2e_p50 / 3600.0), 2),
        "files_per_hour_p50": round(NUM_CALLS / (e2e_p50 / 3600.0), 1),
    }))


def run_with_retries(attempts=5, backoff_s=(120.0, 300.0, 600.0)):
    """Re-exec the bench in fresh child processes until one survives
    device init.

    The driver runs `python bench.py` exactly once per round; in round
    3 a transient tunnel outage at snapshot time turned the whole
    round's scoreboard into `rc=3, parsed=null` (BENCH_r03.json). A
    dead-tunnel probe (exit code 3) is the ONLY retryable failure —
    assertion failures, crashes, and interrupts propagate immediately.
    Fresh subprocesses are required because a failed PJRT backend init
    poisons the process (JAX caches the dead backend). Worst case
    ~5x300 s probes + ~27 min backoff ≈ 52 min before giving up
    (the round-3 outage that nulled the scoreboard lasted hours —
    a wider window costs nothing when the tunnel is healthy, since
    a live probe returns in seconds).

    The child's stdout (the ONE JSON line) passes through unmodified;
    all bench logging is on stderr.
    """
    import os
    import subprocess

    env = dict(os.environ, BENCH_CHILD="1")
    rc = 3
    for attempt in range(attempts):
        if attempt:
            wait = backoff_s[min(attempt - 1, len(backoff_s) - 1)]
            log(f"tunnel down on attempt {attempt}/{attempts}; "
                f"retrying in {wait:.0f}s")
            time.sleep(wait)
        rc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                            env=env).returncode
        if rc != 3:
            return rc
    log(f"FATAL: TPU tunnel unreachable across {attempts} attempts")
    return rc


def _device_alive(timeout_s=90.0) -> bool:
    """Can the chip still execute? A tiny compiled op with a host
    fetch, bounded by a daemon thread (a dead PJRT call hangs)."""
    import threading

    ok = []

    def _probe():
        try:
            import jax
            import jax.numpy as jnp

            jax.devices()
            ok.append(float(jnp.sum(jnp.ones((8, 8)))) == 64.0)
        except Exception:
            ok.append(False)

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(ok and ok[0])


def _child_main() -> int:
    """Run the bench; map mid-run tunnel deaths to the retryable exit
    code.

    probe_device() only guards *init* — the tunnel can also die
    mid-measurement (hours-long outages observed on this infra).
    Mid-run failures surface in two shapes: exceptions that escape
    main(), and engine-swallowed device errors that fail the sweep's
    assertions (DataProcessor catches device exceptions into
    stats['errors']). Classification is by CURRENT tunnel state, not
    error text: on ANY failure, re-probe the device — if the chip no
    longer answers, the failure is infrastructural (exit 3, retried
    in a fresh subprocess); if the chip still executes, it's a
    genuine bug and propagates as an ordinary failure.
    """
    import os

    try:
        return main() or 0
    except BaseException as e:  # noqa: BLE001 — classify by re-probe
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        if not _device_alive():
            log(f"FATAL: device unreachable after mid-run failure "
                f"({type(e).__name__}: {str(e)[:300]}) — classifying "
                f"as tunnel outage (retryable)")
            os._exit(3)
        raise


if __name__ == "__main__":
    import os

    if os.environ.get("BENCH_CHILD"):
        sys.exit(_child_main())
    sys.exit(run_with_retries())
