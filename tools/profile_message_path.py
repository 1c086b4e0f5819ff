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
    return wav


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
    phases = {"vad+window": 0.0, "asr": 0.0}
    n_segments = 0
    t_all = time.perf_counter()
    channels = [(wav[ch], label) for wav in calls
                for ch, label in ((0, "agent"), (1, "client"))]
    t0 = time.perf_counter()
    per_channel = seg.get_speech_segments_multi(channels, SR)
    phases["vad+window"] += time.perf_counter() - t0
    batch_segments = [s for segs in per_channel for s in segs]
    t0 = time.perf_counter()
    out = seg.transcribe_segments_batched(batch_segments, SR)
    phases["asr"] += time.perf_counter() - t0
    n_segments = len(out)
    total = time.perf_counter() - t_all

    audio_sec = n_calls * call_sec * 2  # both speaker channels
    print(f"\ncalls={n_calls} x {call_sec:.0f}s (x2 speakers), "
          f"segments={n_segments}")
    for k, v in phases.items():
        print(f"  {k:10s} {v:7.2f}s")
    print(f"  total      {total:7.2f}s")
    print(f"message_rtfx = {audio_sec / total:.1f}")


if __name__ == "__main__":
    sys.exit(main())
