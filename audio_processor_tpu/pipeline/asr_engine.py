"""TPU ASR engine: chunks -> transcripts.

The device program per (bucket_length, device_batch) pair is a single
jitted function: raw audio -> fbank frontend -> Wav2Vec2Bert encoder ->
greedy CTC ids. The three speaker views (mixed/agent/client) of every
chunk are rows of one batch, so one forward pass replaces the
reference's three sequential forwards per batch
(services/audio_processor.py:269-272). Static length buckets replace
dynamic pad-to-longest (audio_processor.py:253-261) so XLA compiles
once per bucket.

Weights: converted from an HF checkpoint directory when
``config.transcription_model`` points at one; otherwise a randomly
initialized model with the default Darija vocabulary (synthetic mode,
for benchmarks and tests — clearly logged).
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.dsp.fbank import log_mel_frontend
from audio_processor_tpu.models import wav2vec2bert as w2v
from audio_processor_tpu.models.tokenizer import CTCVocab, batch_decode
from audio_processor_tpu.pipeline.chunker import Chunk, chunk_batch
from audio_processor_tpu.utils.text import remove_special_characters

logger = logging.getLogger(__name__)


class ASREngine:
    def __init__(self, config, params=None, model_cfg=None,
                 vocab: Optional[CTCVocab] = None, mesh=None):
        self.config = config
        self.dtype = (jnp.bfloat16 if config.get("enable_mixed_precision",
                                                 True) else jnp.float32)
        self.mesh = mesh
        if params is None:
            params, model_cfg, vocab = self._load_or_init()
        self.params = params
        self.model_cfg = model_cfg
        self.vocab = vocab or CTCVocab.darija_default()
        sr = int(config.get("target_sample_rate", 16000))
        self.bucket_samples = tuple(
            int(b * sr) for b in config.get(
                "length_buckets_sec", (5.0, 10.0, 15.0, 20.0, 25.0)))
        # Device batch = chunks_per_batch * 3 views.
        self.device_batch = int(config.get("chunk_batch_size", 16)) * 3
        self._jit_cache: Dict[int, callable] = {}

    # ------------------------------------------------------------------
    def _load_or_init(self):
        model_path = self.config.get("transcription_model", "")
        if model_path and Path(model_path).exists():
            from audio_processor_tpu.models.convert_hf import (
                load_w2v_bert_from_pretrained,
            )

            logger.info("Converting HF checkpoint from %s", model_path)
            params, cfg, vocab_dict = load_w2v_bert_from_pretrained(model_path)
            params = jax.tree.map(jnp.asarray, params)
            vocab = (CTCVocab(vocab_dict) if vocab_dict
                     else CTCVocab.darija_default())
            return params, cfg, vocab
        logger.warning(
            "transcription_model path %r not found — using randomly "
            "initialized weights (synthetic mode)", model_path)
        vocab = CTCVocab.darija_default()
        cfg = w2v.W2VBertConfig(vocab_size=len(vocab))
        params = w2v.init_params(jax.random.PRNGKey(0), cfg)
        return params, cfg, vocab

    # ------------------------------------------------------------------
    def _device_fn(self, bucket_len: int):
        """One compiled program per bucket length."""
        fn = self._jit_cache.get(bucket_len)
        if fn is not None:
            return fn
        cfg, dtype = self.model_cfg, self.dtype

        @jax.jit
        def run(params, audio, lengths):
            feats, mask = log_mel_frontend(audio, lengths)
            logits = w2v.forward(params, cfg, feats, mask, dtype=dtype)
            ids = w2v.greedy_ctc_ids(logits, mask, cfg.pad_token_id)
            return ids, mask

        self._jit_cache[bucket_len] = run
        return run

    def _run_rows(self, rows: np.ndarray, lengths: np.ndarray,
                  bucket_len: int) -> List[str]:
        """Transcribe [N, L] audio rows (padded to bucket_len)."""
        fn = self._device_fn(bucket_len)
        out_texts: List[str] = []
        B = self.device_batch
        n = rows.shape[0]
        for i in range(0, n, B):
            sl_rows = rows[i:i + B]
            sl_len = lengths[i:i + B]
            valid = sl_rows.shape[0]
            if valid < B:  # pad to the static device batch
                pad = B - valid
                sl_rows = np.concatenate(
                    [sl_rows, np.zeros((pad, bucket_len), np.float32)])
                sl_len = np.concatenate(
                    [sl_len, np.full((pad,), bucket_len, np.int32)])
            ids, mask = fn(self.params, sl_rows, sl_len)
            texts = batch_decode(np.asarray(ids)[:valid], self.vocab,
                                 np.asarray(mask)[:valid])
            out_texts.extend(texts)
        return out_texts

    # ------------------------------------------------------------------
    def transcribe_chunks(self, chunks: Sequence[Chunk]) -> List[Dict]:
        """Adds transcription_chunk / agent_transcription /
        client_transcription to every chunk (reference result contract,
        services/audio_processor.py:288-296)."""
        if not chunks:
            return []
        results: Dict[int, Dict] = {}
        batches = chunk_batch(
            chunks, self.bucket_samples,
            sort_by_length=bool(self.config.get("enable_length_bucketing",
                                                True)))
        for batch in batches:
            n = len(batch)
            rows = batch.audio.reshape(n * 3, batch.bucket_len)
            lengths = np.repeat(batch.lengths, 3).astype(np.int32)
            try:
                texts = self._run_rows(rows, lengths, batch.bucket_len)
            except Exception as e:  # pragma: no cover - device failure
                logger.error("ASR batch failed (bucket %d): %s",
                             batch.bucket_len, e)
                for c in batch.chunks:
                    results[id(c)] = {
                        "transcription_chunk": "",
                        "agent_transcription": "",
                        "client_transcription": "",
                        "error": str(e),
                    }
                continue
            for j, c in enumerate(batch.chunks):
                results[id(c)] = {
                    "transcription_chunk":
                        remove_special_characters(texts[3 * j]),
                    "agent_transcription":
                        remove_special_characters(texts[3 * j + 1]),
                    "client_transcription":
                        remove_special_characters(texts[3 * j + 2]),
                    "error": "",
                }
        out = []
        for c in chunks:
            row = {
                "file_name": c.file_name,
                "chunk_idx": c.chunk_idx,
                "start_time": c.start_time,
                "end_time": c.end_time,
                "agent_waveform": c.agent,
                "client_waveform": c.client,
            }
            row.update(results.get(id(c), {
                "transcription_chunk": "", "agent_transcription": "",
                "client_transcription": "", "error": "missing_result",
            }))
            out.append(row)
        return out

    # ------------------------------------------------------------------
    def transcribe_mono_segments(self, waves: List[np.ndarray]) -> List[str]:
        """Transcribe variable-length mono segments (VAD message path,
        reference: services/speech_segment.py:190-290)."""
        if not waves:
            return []
        mono = [np.asarray(w, np.float32).reshape(-1) for w in waves]
        chunks = [
            Chunk(file_name="", chunk_idx=i, start_time=0.0, end_time=0.0,
                  mixed=w, agent=w, client=w)
            for i, w in enumerate(mono)
        ]
        texts: Dict[int, str] = {}
        for batch in chunk_batch(chunks, self.bucket_samples):
            n = len(batch)
            rows = batch.audio[:, 0, :]  # mono view only
            out = self._run_rows(rows, batch.lengths, batch.bucket_len)
            for j, c in enumerate(batch.chunks):
                texts[c.chunk_idx] = out[j]
        return [texts.get(i, "") for i in range(len(waves))]
