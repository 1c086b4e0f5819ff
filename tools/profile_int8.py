#!/usr/bin/env python
"""A/B the int8 W8A8 encoder path vs the default bf16 path on the
real chip: same 8x3-min synthetic calls as bench.py, ASR hot loop
only. Run: python tools/profile_int8.py"""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod
    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.io.decode import load_audio
    from audio_processor_tpu.pipeline.asr_engine import ASREngine
    from audio_processor_tpu.pipeline.chunker import split_audio
    from audio_processor_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    audio_sec = bench_mod.NUM_CALLS * bench_mod.CALL_SEC

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        paths = bench_mod.make_calls(tmp)
        waves = [load_audio(p)[0] for p in paths]

        texts = {}
        for mode in ("none", "int8"):
            cfg = PipelineConfig(transcription_model="",
                                 chunk_batch_size=16,
                                 quantization=mode)
            engine = ASREngine(cfg)
            chunks = []
            for p, w in zip(paths, waves):
                chunks.extend(split_audio(w, 16000, p.name,
                                          cfg.chunk_duration_sec,
                                          cfg.overlap_sec))
            engine.transcribe_chunks(chunks)  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = engine.transcribe_chunks(chunks)
                best = min(best, time.perf_counter() - t0)
            assert all(x["error"] == "" for x in r)
            texts[mode] = ["|".join((x["transcription_chunk"],
                                     x["agent_transcription"],
                                     x["client_transcription"]))
                           for x in r]
            print(f"{mode:5s}: {best:.2f}s  RTFx {audio_sec / best:.1f}",
                  flush=True)

        # Transcript agreement at full geometry (synthetic weights are
        # a WORST case for quantization: no training regularities).
        import difflib

        ratios = [difflib.SequenceMatcher(None, a, b).ratio()
                  for a, b in zip(texts["none"], texts["int8"])]
        exact = np.mean([a == b for a, b in
                         zip(texts["none"], texts["int8"])])
        print(f"transcript char-similarity: mean {np.mean(ratios):.4f} "
              f"min {np.min(ratios):.4f}; exact-match {exact:.2%}",
              flush=True)


if __name__ == "__main__":
    main()
