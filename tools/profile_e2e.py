#!/usr/bin/env python
"""Stage-level breakdown of the ASR hot loop on the real chip:
decode, chunk, host prep, H2D upload, fused device program, fetch +
CTC text decode. Guides where the next RTFx comes from."""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    sys.path.insert(0, "/root/repo")
    import bench as bench_mod
    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.io.decode import load_audio
    from audio_processor_tpu.pipeline.asr_engine import ASREngine, _SubBatch
    from audio_processor_tpu.pipeline.chunker import chunk_batch, split_audio
    from audio_processor_tpu.models.tokenizer import batch_decode

    cfg = PipelineConfig(transcription_model="", chunk_batch_size=16)
    engine = ASREngine(cfg)
    print("attention impl:", engine.attention_impl, flush=True)

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        paths = bench_mod.make_calls(tmp)

        t0 = time.perf_counter()
        waves = [load_audio(p)[0] for p in paths]
        t_decode = time.perf_counter() - t0

        t0 = time.perf_counter()
        chunks = []
        for p, (w) in zip(paths, waves):
            chunks.extend(split_audio(w, 16000, p.name,
                                      cfg.chunk_duration_sec,
                                      cfg.overlap_sec))
        t_chunk = time.perf_counter() - t0
        print(f"decode {t_decode*1e3:.0f} ms, chunk {t_chunk*1e3:.0f} ms, "
              f"{len(chunks)} chunks", flush=True)

        batches = chunk_batch(chunks, engine.bucket_samples)
        subs = []
        for b in batches:
            for i in range(0, len(b), engine.device_chunks):
                subs.append(_SubBatch(b, i, i + min(engine.device_chunks,
                                                    len(b) - i)))
        print(f"{len(subs)} device batches, bucket lens "
              f"{[s.bucket_len for s in subs]}", flush=True)

        # Host prep
        t0 = time.perf_counter()
        prepped = [engine._prepare_fused_buffer(s) for s in subs]
        t_prep = time.perf_counter() - t0
        print(f"host prep {t_prep*1e3:.0f} ms total", flush=True)

        # Warm up compile (one per bucket/shape)
        for s, pre in zip(subs, prepped):
            out = engine._fused_fn(s.bucket_len)(engine.params, *pre)
            _ = np.asarray(out[0])

        # Upload only
        t0 = time.perf_counter()
        dev = [(jax.device_put(b), jax.device_put(l)) for b, l in prepped]
        for b, l in dev:
            float(b[0, 0, 0]); float(l[0])
        t_upload = time.perf_counter() - t0
        mb = sum(b.nbytes for b, _ in prepped) / 1e6
        print(f"upload {t_upload*1e3:.0f} ms for {mb:.1f} MB "
              f"({mb/max(t_upload,1e-9):.0f} MB/s)", flush=True)

        # Device-only (inputs resident); per-sub fn (bucket lengths
        # differ between subs)
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [engine._fused_fn(s.bucket_len)(engine.params, b, l)
                    for s, (b, l) in zip(subs, dev)]
            for o in outs:
                _ = float(o[0][0, 0])
            t_device = time.perf_counter() - t0
        print(f"device fused x{len(dev)} {t_device*1e3:.0f} ms "
              f"({t_device/len(dev)*1e3:.0f} ms/batch)", flush=True)

        # Fetch + text decode
        t0 = time.perf_counter()
        n_texts = 0
        for o in outs:
            ids = np.asarray(o[0])
            mask = np.asarray(o[1])
            texts = batch_decode(ids, engine.vocab, mask)
            n_texts += len(texts)
        t_fetch = time.perf_counter() - t0
        print(f"fetch+ctc-decode {t_fetch*1e3:.0f} ms ({n_texts} texts)",
              flush=True)

        total = t_decode + t_chunk + t_prep + t_upload + t_device + t_fetch
        audio = bench_mod.NUM_CALLS * bench_mod.CALL_SEC
        print(f"serial total {total:.2f} s -> RTFx {audio/total:.0f} "
              f"(pipelined loop overlaps some of these)", flush=True)


if __name__ == "__main__":
    main()
