#!/usr/bin/env python
"""Profile the VAD message path at production geometry on the TPU.

The reference runs this stack (pyannote VAD -> merge/pad/window ->
per-segment mono transcription, services/speech_segment.py:190-326) on
its accelerator; this script times the TPU-native equivalent on a
synthetic 2-channel 3-minute call:

  1. PyanNet sliding-window VAD (models/vad.pyannet_probs_windowed,
     production geometry, synthetic weights) for both speakers.
  2. binarize -> merge -> pad -> window (host).
  3. Batched mono transcription of the segments through the
     full-geometry ASR engine (transcribe_mono_segments).

Prints per-phase seconds and a message_rtfx (processed audio seconds /
wall seconds, counting BOTH speaker channels as processed audio, which
is the work the reference performs per call).

Usage: python tools/profile_message_path.py [n_calls=4] [call_sec=180]
       python tools/profile_message_path.py [n_calls] [call_sec] ab
           — interleaved in-process A/B of the ASR phase: serial
           per-bucket dispatch->fetch (pre-r5) vs dispatch-all-buckets
           (transcribe_mono_segments), the only comparison valid under
           the tunnel's 2x phase-level swings (CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

SR = 16000


def synth_call(call_sec: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * call_sec)) / SR
    # speech-ish bursts over silence so the VAD has real segments
    wav = np.zeros((2, t.shape[0]), np.float32)
    for ch in range(2):
        pos = 0.0
        while pos < call_sec - 4.0:
            dur = float(rng.uniform(2.0, 8.0))
            s, e = int(pos * SR), int(min(call_sec, pos + dur) * SR)
            f0 = float(rng.uniform(120, 300))
            seg = np.sin(2 * np.pi * f0 * t[s:e]) * \
                (0.5 + 0.5 * np.sin(2 * np.pi * 3.1 * t[s:e]))
            wav[ch, s:e] = 0.3 * seg + 0.02 * rng.standard_normal(e - s)
            pos += dur + float(rng.uniform(1.5, 5.0))
    # Quantize to int16-exact values: production audio is PCM16-decoded
    # (engine + bench), so message rows ride the int16 wire format
    # (half the upload bytes). Raw floats here would force float32
    # uploads and overstate the transfer cost.
    return np.round(np.clip(wav, -1.0, 0.999) * 32768.0) / 32768.0


def ab_asr_phase(engine, seg, channels, audio_sec):
    """Interleaved A/B of the message-path ASR phase: A = serial
    per-bucket dispatch->fetch (the pre-r5 transcribe_mono_segments),
    B = dispatch-all-buckets-then-fetch (current). Segments are formed
    once; only the transcription phase is timed, alternating
    A/B/A/B within one process."""
    import numpy as np

    from audio_processor_tpu.pipeline.chunker import Chunk, chunk_batch

    per_channel = seg.get_speech_segments_multi(channels, SR)
    segments = [s for segs in per_channel for s in segs]
    waves = [np.asarray(s["segment_waveform"]).reshape(-1)
             for s in segments]
    print(f"A/B over {len(waves)} segments "
          f"({sum(w.shape[0] for w in waves) / SR:.0f}s of audio)",
          flush=True)

    def serial():
        mono = [np.asarray(w, np.float32).reshape(-1) for w in waves]
        chunks = [Chunk(file_name="", chunk_idx=i, start_time=0.0,
                        end_time=0.0, mixed=w, agent=w, client=w)
                  for i, w in enumerate(mono)]
        texts = {}
        for batch in chunk_batch(chunks, engine.bucket_samples):
            rows = np.zeros((len(batch), batch.bucket_len), np.float32)
            for j, c in enumerate(batch.chunks):
                t = int(batch.lengths[j])
                rows[j, :t] = c.mixed[:t]
            out = engine._run_rows(rows, batch.lengths, batch.bucket_len)
            for j, c in enumerate(batch.chunks):
                texts[c.chunk_idx] = out[j]
        return [texts.get(i, "") for i in range(len(waves))]

    def overlap():
        return engine.transcribe_mono_segments(waves)

    # Warmup both arms (compile + transport warm-in); identical raw
    # transcripts are a correctness gate, not just a perf comparison.
    a0, b0 = serial(), overlap()
    assert a0 == b0, "serial and overlapped transcripts differ"
    serial(), overlap()

    times = {"serial": [], "overlap": []}
    for r in range(6):
        for name, fn in (("serial", serial), ("overlap", overlap)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"round {r} {name:8s}: {dt:6.2f}s "
                  f"(asr-phase rtfx {audio_sec / dt:.0f})", flush=True)
    for name, ts in times.items():
        best, med = min(ts), sorted(ts)[len(ts) // 2]
        print(f"{name:8s}: best {best:.2f}s med {med:.2f}s "
              f"(asr-phase rtfx best {audio_sec / best:.0f} "
              f"med {audio_sec / med:.0f})", flush=True)


def main():
    n_calls = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    call_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 180.0
    print("devices:", jax.devices(), flush=True)

    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.models import vad as vad_mod
    from audio_processor_tpu.pipeline.asr_engine import ASREngine
    from audio_processor_tpu.pipeline.segmenter import SpeechSegment
    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    cfg = PipelineConfig(transcription_model="", logs_folder="/tmp/logs")
    print("loading full-geometry ASR engine (synthetic weights)",
          flush=True)
    engine = ASREngine(cfg)

    seg = SpeechSegment(cfg, asr_engine=engine)
    # Inject a production-geometry PyanNet (no checkpoint in image).
    vcfg = vad_mod.PyanNetConfig()
    seg._vad_cfg = vcfg
    seg._vad_params = vad_mod.init_pyannet(jax.random.PRNGKey(0), vcfg)

    calls = [synth_call(call_sec, i) for i in range(n_calls)]

    # Warmup: compile VAD window shapes + mono ASR buckets.
    print("warmup (compiles)...", flush=True)
    t0 = time.perf_counter()
    msgs = []
    for ch in range(2):
        s = seg.get_speech_segments(calls[0][ch], SR,
                                    "agent" if ch == 0 else "client")
        msgs.extend(seg.transcribe_segments_batched(s, SR))
    print(f"warmup {time.perf_counter()-t0:.1f}s "
          f"({len(msgs)} segments)", flush=True)

    # Standalone VAD probe (outside the timed loop) to split device
    # VAD cost from the host merge/window logic.
    t0 = time.perf_counter()
    seg.vad_probs(calls[0][0], SR)
    vad_one = time.perf_counter() - t0
    print(f"vad_probs alone: {vad_one:.2f}s per {call_sec:.0f}s channel",
          flush=True)

    # Engine regime (engine._run_message_path): VAD/window per
    # channel, then ONE batched transcription over every segment of
    # the whole file batch — a lone channel's few windows would
    # otherwise pad to a full device batch each.
    #
    # The tunneled transport swings 2-5x across process phases
    # (CLAUDE.md) — a single timed sweep is not comparable across
    # processes. Run 2 untimed warm-in sweeps, then 5 timed sweeps,
    # and report per-sweep + best + p50.
    channels = [(wav[ch], label) for wav in calls
                for ch, label in ((0, "agent"), (1, "client"))]
    audio_sec = n_calls * call_sec * 2  # both speaker channels

    def one_sweep():
        phases = {}
        t_all = time.perf_counter()
        t0 = time.perf_counter()
        per_channel = seg.get_speech_segments_multi(channels, SR)
        phases["vad+window"] = time.perf_counter() - t0
        batch_segments = [s for segs in per_channel for s in segs]
        t0 = time.perf_counter()
        out = seg.transcribe_segments_batched(batch_segments, SR)
        phases["asr"] = time.perf_counter() - t0
        return phases, len(out), time.perf_counter() - t_all

    if len(sys.argv) > 3 and sys.argv[3] == "ab":
        return ab_asr_phase(engine, seg, channels, audio_sec)

    for w in range(2):
        _, n_segments, tw = one_sweep()
        print(f"warm-in sweep {w}: {tw:.2f}s", flush=True)

    totals, all_phases = [], []
    for it in range(5):
        phases, n_segments, total = one_sweep()
        totals.append(total)
        all_phases.append(phases)
        print(f"sweep {it}: vad+window {phases['vad+window']:.2f}s "
              f"asr {phases['asr']:.2f}s total {total:.2f}s "
              f"rtfx {audio_sec / total:.1f}", flush=True)

    best = min(totals)
    p50 = sorted(totals)[len(totals) // 2]
    k = totals.index(best)
    print(f"\ncalls={n_calls} x {call_sec:.0f}s (x2 speakers), "
          f"segments={n_segments}")
    for key in ("vad+window", "asr"):
        print(f"  {key:10s} {all_phases[k][key]:7.2f}s (best sweep)")
    print(f"  total      {best:7.2f}s best / {p50:7.2f}s p50")
    print(f"message_rtfx = {audio_sec / best:.1f} "
          f"(p50 {audio_sec / p50:.1f})")


if __name__ == "__main__":
    sys.exit(main())
