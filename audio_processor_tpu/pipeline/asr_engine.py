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

import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.dsp.fbank import log_mel_frontend
from audio_processor_tpu.models import wav2vec2bert as w2v
from audio_processor_tpu.models.tokenizer import (
    CTCVocab, batch_decode, decode_words,
)
from audio_processor_tpu.pipeline.chunker import Chunk, chunk_batch
from audio_processor_tpu.utils.text import remove_special_characters

logger = logging.getLogger(__name__)


def _pad_seq_to_128(feats: jnp.ndarray, mask: jnp.ndarray):
    """Pad the feature-frame axis to a multiple of 256 (the flash_rel
    kernel streams kv in 256-column steps; padding is masked so logits
    of valid frames are unchanged — tested in test_wav2vec2bert)."""
    L = feats.shape[1]
    pad = (-L) % 256
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return feats, mask


class _SubBatch:
    """Slice view over a ChunkBatch. ``audio`` stays lazy so the fused
    path (which uploads raw agent/client rows) never materializes the
    dense [N, 3, L] host tensor."""

    def __init__(self, batch, start: int, end: int):
        self.bucket_len = batch.bucket_len
        self.chunks = batch.chunks[start:end]
        self.lengths = batch.lengths[start:end]
        self._batch = batch
        self._span = (start, end)

    @property
    def audio(self):
        s, e = self._span
        return self._batch.audio[s:e]

    def __len__(self) -> int:
        return len(self.chunks)


class ASREngine:
    def __init__(self, config, params=None, model_cfg=None,
                 vocab: Optional[CTCVocab] = None, mesh=None):
        self.config = config
        self.dtype = (jnp.bfloat16 if config.get("enable_mixed_precision",
                                                 True) else jnp.float32)
        self.mesh = mesh
        if params is None:
            params, model_cfg, vocab = self._load_or_init()
        # Opt-in W8A8 int8 inference: per-channel weight + per-token
        # activation quantization on the encoder's dense matmuls
        # (models/wav2vec2bert.quantize_params). The v5e MXU runs
        # int8 at 2x its bf16 rate; logits stay within ~1e-2 relative
        # of the fp path (test_quant). Off by default — the parity
        # contract (bit-matched transcripts) holds for the default
        # bf16/fp32 path.
        self.quantization = str(config.get("quantization", "none"))
        if self.quantization == "int8":
            logger.info("int8 W8A8 inference enabled")
            params = w2v.quantize_params(params)
        elif self.quantization not in ("none", ""):
            raise ValueError(
                f"unknown quantization mode {self.quantization!r} "
                "(expected 'none' or 'int8')")
        self.params = params
        self.model_cfg = model_cfg
        self.vocab = vocab or CTCVocab.darija_default()
        sr = int(config.get("target_sample_rate", 16000))
        self.bucket_samples = tuple(
            int(b * sr) for b in config.get(
                "length_buckets_sec", (5.0, 10.0, 15.0, 20.0, 25.0)))
        # A chunk longer than the largest bucket would be silently
        # truncated by the dense batcher; extend the bucket set
        # instead. The message path's VAD windows (capped at
        # vad_max_segment_sec by extract_windows) flow through the
        # same buckets, so they get the same guard.
        chunk_samples = int(float(config.get("chunk_duration_sec", 25.0))
                            * sr)
        if config.get("enable_message_path", False):
            chunk_samples = max(chunk_samples, int(
                float(config.get("vad_max_segment_sec", 25.0)) * sr))
        if chunk_samples > max(self.bucket_samples):
            logger.warning(
                "longest chunk/VAD segment (%s samples) exceeds the "
                "largest length bucket; adding a %d-sample bucket",
                chunk_samples, chunk_samples)
            self.bucket_samples = tuple(
                sorted(set(self.bucket_samples) | {chunk_samples}))
        # Device batch = chunks_per_batch * 3 views; with a mesh the
        # batch scales by the data-parallel degree and shards over it.
        data_par = 1 if mesh is None else int(mesh.devices.shape[0])
        self.device_chunks = int(config.get("chunk_batch_size", 16)) \
            * data_par
        self.device_batch = self.device_chunks * 3
        # int16 wire format halves host->device bytes; lossless for
        # PCM16-sourced audio (the call-center format). Disable for
        # exact float parity on synthetic float inputs.
        self.int16_transfers = bool(config.get("int16_transfers", True))
        self.fuse_acoustic_features = bool(
            config.get("fuse_acoustic_features", True))
        # Word-level CTC timestamps (beyond the reference's plain
        # text): adds {mixed,agent,client}_words to every chunk row.
        self.emit_word_timestamps = bool(
            config.get("emit_word_timestamps", False))
        # Message-path decoding: 1 = greedy (reference parity);
        # >1 = CTC prefix beam search over the log posteriors
        # (models/ctc_beam.py) for the VAD-segmented mono transcripts.
        self.beam_width = int(config.get("beam_width", 1))
        self.beam_word_bonus = float(config.get("beam_word_bonus", 0.0))
        from audio_processor_tpu.dsp.fbank import HOP_LENGTH, STRIDE

        self._frame_sec = HOP_LENGTH * STRIDE / sr  # 20 ms encoder frame
        # Flash attention with in-kernel relative bias (pallas) on TPU
        # — measured 1.02 s vs 1.43 s per 48x1280 batch for the stock
        # flash kernel with a precomputed [B,H,L,L] bias, and 2.27 s
        # for XLA einsum attention (tools/profile_attn.py, v5e). The
        # XLA path is the behavioral reference (and the CPU/test path).
        impl_cfg = config.get("attention_impl", "auto")
        if impl_cfg == "auto":
            impl_cfg = ("flash_rel" if jax.default_backend()
                        not in ("cpu",) else "xla")
        self.attention_impl = impl_cfg
        self._jit_cache: Dict = {}
        # (bucket_len, device_rows) pairs already dispatched at least
        # once in this process — warmup() skips these, so calling it
        # repeatedly (every DataProcessor.run, every serving start)
        # costs nothing after the first sweep.
        self._warmed: set = set()

    # ------------------------------------------------------------------
    def _load_or_init(self):
        model_path = self.config.get("transcription_model", "")
        if model_path and Path(model_path).exists():
            from audio_processor_tpu.models.checkpoint import (
                load_or_convert_w2v_bert,
            )

            logger.info("Loading checkpoint from %s", model_path)
            params, cfg, vocab_dict = load_or_convert_w2v_bert(model_path)
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
    def _mono_fn(self, bucket_len: int, beam: bool):
        """One compiled mono-rows program per (bucket, head): the body
        (dequantize -> fbank -> pad -> w2v forward) is shared so the
        greedy and beam message-path numerics can't drift apart; only
        the output head differs (greedy CTC ids vs log posteriors)."""
        key = ("logits", bucket_len) if beam else bucket_len
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        cfg, dtype = self.model_cfg, self.dtype
        impl = self.attention_impl

        @jax.jit
        def run(params, audio, lengths):
            x = audio.astype(jnp.float32)
            if audio.dtype == jnp.int16:   # wire format (half H2D)
                x = x * (1.0 / 32768.0)
            feats, mask = log_mel_frontend(x, lengths)
            feats, mask = _pad_seq_to_128(feats, mask)
            logits = w2v.forward(params, cfg, feats, mask, dtype=dtype,
                                 attention_impl=impl)
            if beam:
                return jax.nn.log_softmax(logits, axis=-1), mask
            ids = w2v.greedy_ctc_ids(logits, mask, cfg.pad_token_id)
            return ids, mask

        self._jit_cache[key] = run
        return run

    def _device_fn(self, bucket_len: int):
        """Greedy mono-rows program (see _mono_fn)."""
        return self._mono_fn(bucket_len, beam=False)

    def _logits_fn(self, bucket_len: int):
        """Log-posterior variant of the mono program (beam decoding)."""
        return self._mono_fn(bucket_len, beam=True)

    def _fused_fn(self, bucket_len: int):
        """Fused per-chunk-batch program: one upload of the two raw
        channels (reflect-pre-padded, optionally int16) serves the
        whole device side — mixed-view construction, fbank, the
        Wav2Vec2Bert forward for all three views, greedy CTC ids, AND
        the 38-dim acoustic sentiment features. This is the transfer-
        optimal layout: the reference uploads the same audio five
        times (3 ASR views f32 + 2 acoustic views), we upload it once.
        """
        key = ("fused", bucket_len)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        cfg, dtype = self.model_cfg, self.dtype
        impl = self.attention_impl
        from audio_processor_tpu.dsp.acoustic_features import (
            PAD, extract_features_batch,
        )

        def raw(params, buf, lengths):
            # buf: [N, 2, bucket+2*PAD] (agent, client), int16 or f32.
            x = buf.astype(jnp.float32)
            if buf.dtype == jnp.int16:
                x = x / 32768.0
            N = x.shape[0]
            agent = x[:, 0, PAD:PAD + bucket_len]
            client = x[:, 1, PAD:PAD + bucket_len]
            mixed = (agent + client) * 0.5
            rows = jnp.stack([mixed, agent, client],
                             axis=1).reshape(3 * N, bucket_len)
            row_lens = jnp.repeat(lengths, 3)
            feats, mask = log_mel_frontend(rows, row_lens)
            feats, mask = _pad_seq_to_128(feats, mask)
            logits = w2v.forward(params, cfg, feats, mask, dtype=dtype,
                                 attention_impl=impl)
            ids = w2v.greedy_ctc_ids(logits, mask, cfg.pad_token_id)
            af = extract_features_batch(
                x.reshape(2 * N, -1), jnp.repeat(lengths, 2))
            return ids, mask, af.reshape(N, 2, -1)

        if self.mesh is None:
            run = jax.jit(raw)
        else:
            # SPMD: chunk batch shards over the mesh 'data' axis;
            # params stay replicated (or tensor-parallel if placed so).
            from jax.sharding import NamedSharding, PartitionSpec as P

            run = jax.jit(raw, in_shardings=(
                None,
                NamedSharding(self.mesh, P("data", None, None)),
                NamedSharding(self.mesh, P("data"))))
        self._jit_cache[key] = run
        return run

    def warmup(self, all_buckets: bool = False,
               tail_sizes: Optional[Sequence[int]] = None,
               message_rows: Optional[bool] = None) -> int:
        """Compile the chunk programs BEFORE the timeout-bounded batch
        loop runs: a cold full-model compile takes minutes through a
        slow toolchain and would otherwise be indistinguishable from a
        hung device dispatch (it trips the reference-parity 300 s
        batch timeout, pipeline.py:409). Compiles the full-batch + the
        tail-batch shapes for the top length bucket (``all_buckets``
        covers every bucket). Returns the number of shapes dispatched;
        shapes already dispatched in this process are skipped.

        ``message_rows`` (default: the config's enable_message_path)
        additionally compiles the mono-rows programs the message path
        dispatches from the analysis stage — VAD segments land in
        EVERY bucket (variable segment lengths), so those warm across
        all buckets at the three static row-tail sizes; without this
        the first message batch pays the cold compiles inside the
        300 s analysis timeout and a healthy device reads as hung."""
        buckets = (list(self.bucket_samples) if all_buckets
                   else [max(self.bucket_samples)])
        if tail_sizes is None:
            tail_sizes = {self.device_chunks, self._tail_size(1),
                          self._tail_size(max(1, self.device_chunks // 2))}
        n_shapes = 0
        for bucket in buckets:
            zeros = np.zeros(bucket, np.float32)
            for n in sorted(set(tail_sizes)):
                # Canonical device shape for an n-chunk dispatch.
                key = (bucket, self._tail_size(n)
                       if self.fuse_acoustic_features else
                       self.device_chunks)
                if key in self._warmed:
                    continue
                warm = [Chunk("warmup.wav", i, 0.0, 0.0,
                              agent=zeros, client=zeros)
                        for i in range(n)]
                self.transcribe_chunks(warm)
                n_shapes += 1
        if message_rows is None:
            message_rows = bool(
                self.config.get("enable_message_path", False))
        if message_rows:
            B = self.device_batch
            row_sizes = sorted({self._row_tail_size(1),
                                self._row_tail_size(B // 2), B})
            for bucket in self.bucket_samples:
                for rows_n in row_sizes:
                    key = ("mono", bucket, rows_n, self.beam_width > 1)
                    if key in self._warmed:
                        continue
                    # _run_rows pads to the static row size itself;
                    # dispatch exactly rows_n rows to hit that shape.
                    self._run_rows(
                        np.zeros((rows_n, bucket), np.float32),
                        np.full((rows_n,), bucket, np.int32), bucket)
                    self._warmed.add(key)
                    n_shapes += 1
        return n_shapes

    def _tail_size(self, n: int) -> int:
        """Static device chunk count for a sub-batch of n chunks: the
        full size mid-bucket, or the smallest power-of-two fraction
        (>= 1/4, still divisible by the data-parallel degree) that fits
        a final partial sub-batch — padding rows cost real upload bytes
        and MXU time (~20% of the bench workload before this)."""
        n_dev = self.device_chunks
        data_par = 1 if self.mesh is None else int(self.mesh.devices.shape[0])
        for _ in range(2):
            half = n_dev // 2
            if n <= half and half % max(data_par, 1) == 0 and half >= 1:
                n_dev = half
            else:
                break
        return n_dev

    def _prepare_fused_buffer(self, batch, n_dev: Optional[int] = None
                              ) -> tuple:
        """Host prep: [N, 2, bucket+2*PAD] reflect-padded agent/client
        buffer (int16 when enabled — lossless for PCM16 sources) padded
        to the static device chunk count. Uses the GIL-free C++ prep
        (native/audioio.cpp::ap_prepare_fused) when available."""
        from audio_processor_tpu.dsp.acoustic_features import (
            PAD, prepare_reflect_padded,
        )

        n = len(batch)
        if n_dev is None:
            n_dev = self.device_chunks
        L = batch.bucket_len
        lengths = batch.lengths.astype(np.int32)
        if n < n_dev:
            lengths = np.concatenate(
                [lengths, np.full((n_dev - n,), L, np.int32)])

        if self.int16_transfers:
            from audio_processor_tpu.io import native

            if native.has_prepare_fused():
                zero = np.zeros(0, np.float32)
                agents = [c.agent for c in batch.chunks] + \
                    [zero] * (n_dev - n)
                clients = [c.client for c in batch.chunks] + \
                    [zero] * (n_dev - n)
                # Data lengths (0 for padding rows) for the prep; the
                # device-side `lengths` keep L for padding rows so the
                # masked statistics stay well-defined on zero audio.
                data_lens = np.array(
                    [c.num_samples for c in batch.chunks]
                    + [0] * (n_dev - n), np.int64)
                buf = native.prepare_fused_int16(
                    agents, clients, data_lens, L, PAD)
                if buf is not None:
                    return buf, lengths

        waves = []
        for c in batch.chunks:
            waves.append(c.agent)
            waves.append(c.client)
        waves += [np.zeros(0, np.float32)] * (2 * (n_dev - n))
        buf2, _ = prepare_reflect_padded(waves, L)   # [2n_dev, L+2*PAD]
        buf = buf2.reshape(n_dev, 2, L + 2 * PAD)
        if self.int16_transfers:
            buf = np.clip(np.round(buf * 32768.0),
                          -32768, 32767).astype(np.int16)
        return buf, lengths

    def _row_tail_size(self, n: int) -> int:
        """Static row count for an n-row mono dispatch: the full
        device batch mid-stream, or the smallest power-of-two
        fraction (>= 1/4) that covers a final partial batch — the
        message path often transcribes a handful of VAD segments, and
        padding 4 segments to 48 rows burns ~10x their device time
        (measured: message_rtfx 31.6 before this + cross-file
        batching, tools/profile_message_path.py)."""
        B = self.device_batch
        for _ in range(2):
            half = B // 2
            if n <= half and half >= 1:
                B = half
            else:
                break
        return B

    def _dispatch_rows(self, rows: np.ndarray, lengths: np.ndarray,
                       bucket_len: int):
        """Dispatch [N, L] audio rows (padded to bucket_len) and return
        a fetch closure. Every sub-batch is enqueued before the closure
        runs (async JAX dispatch), so callers holding several bucket
        batches can dispatch them ALL before fetching any — through the
        tunneled transport a per-bucket dispatch->fetch round trip
        serializes uploads against compute (measured: the message
        path's asr phase, tools/profile_message_path.py). beam_width >
        1 decodes the log posteriors with prefix beam search instead
        of greedy."""
        beam = self.beam_width > 1
        fn = self._logits_fn(bucket_len) if beam \
            else self._device_fn(bucket_len)
        B = self.device_batch
        n = rows.shape[0]
        # int16 wire when every sample is int16-exact (PCM16-decoded
        # sources): half the upload bytes, device dequantize is
        # bit-identical to uploading the f32 values.
        if self.int16_transfers:
            from audio_processor_tpu.io.wire import maybe_int16_wire

            rows = maybe_int16_wire(rows)
        pending = []
        for i in range(0, n, B):
            sl_rows = rows[i:i + B]
            sl_len = lengths[i:i + B]
            valid = sl_rows.shape[0]
            n_dev = self._row_tail_size(valid)
            if valid < n_dev:  # pad to the static tail batch
                pad = n_dev - valid
                sl_rows = np.concatenate(
                    [sl_rows, np.zeros((pad, bucket_len), rows.dtype)])
                sl_len = np.concatenate(
                    [sl_len, np.full((pad,), bucket_len, np.int32)])
            pending.append((valid, fn(self.params, sl_rows, sl_len)))

        def fetch() -> List[str]:
            out_texts: List[str] = []
            if beam:
                from audio_processor_tpu.models.ctc_beam import (
                    ctc_beam_search,
                )

                for valid, (log_probs, mask) in pending:
                    lp = np.asarray(log_probs)[:valid]
                    m = np.asarray(mask)[:valid].astype(bool)
                    for b in range(valid):
                        hyps = ctc_beam_search(
                            lp[b], self.vocab,
                            beam_width=self.beam_width,
                            word_bonus=self.beam_word_bonus, mask=m[b])
                        out_texts.append(hyps[0][0] if hyps else "")
                return out_texts
            for valid, (ids, mask) in pending:
                out_texts.extend(batch_decode(
                    np.asarray(ids)[:valid], self.vocab,
                    np.asarray(mask)[:valid]))
            return out_texts

        return fetch

    def _run_rows(self, rows: np.ndarray, lengths: np.ndarray,
                  bucket_len: int) -> List[str]:
        """Transcribe [N, L] audio rows: dispatch + immediate fetch."""
        return self._dispatch_rows(rows, lengths, bucket_len)()

    # ------------------------------------------------------------------
    def transcribe_chunks(self, chunks: Sequence[Chunk]) -> List[Dict]:
        """Adds transcription_chunk / agent_transcription /
        client_transcription (+ on-device acoustic sentiment features
        when fusion is enabled) to every chunk (reference result
        contract, services/audio_processor.py:288-296).

        All device calls are dispatched before any result is fetched:
        JAX dispatch is asynchronous, so host->device transfers and
        compute of successive batches pipeline instead of
        ping-ponging.
        """
        return self.dispatch_chunks(chunks)()

    def dispatch_chunks(self, chunks: Sequence[Chunk]):
        """Dispatch-only half of :meth:`transcribe_chunks`: prep +
        enqueue every sub-batch on the device (async JAX dispatch),
        then return a fetch closure that performs the device->host
        fetch, CTC text decode, and row assembly.

        The engine calls this from its device-stage worker and runs
        the closure on its analysis worker, so batch N+1's uploads/
        compute overlap batch N's fetch + sentiment + persistence —
        the device never idles waiting for host-side result handling
        (the reference serializes forward->fetch->analyze per batch,
        services/pipeline.py:409-427)."""
        if not chunks:
            return lambda: []
        results: Dict[int, Dict] = {}
        batches = chunk_batch(
            chunks, self.bucket_samples,
            sort_by_length=bool(self.config.get("enable_length_bucketing",
                                                True)))
        subs = []
        for batch in batches:
            for i in range(0, len(batch), self.device_chunks):
                n = min(self.device_chunks, len(batch) - i)
                subs.append((batch, _SubBatch(batch, i, i + n)))

        # Pass 1: dispatch every sub-batch (async; uploads of batch
        # i+1 overlap device compute of batch i). Host prep runs a few
        # sub-batches AHEAD on a small thread pool (the C++ prep
        # releases the GIL) so prep never sits between dispatches —
        # bounded look-ahead keeps host memory O(1) in sweep size
        # (each 25 s sub-batch buffer is ~25 MB).
        from concurrent.futures import ThreadPoolExecutor

        PREP_AHEAD = 3

        def _prep(idx: int):
            s = subs[idx][1]
            return self._prepare_fused_buffer(s, self._tail_size(len(s)))

        prep_pool = None
        prep_futs: Dict[int, object] = {}
        if self.fuse_acoustic_features and len(subs) > 1:
            prep_pool = ThreadPoolExecutor(max_workers=2)
            for k in range(min(PREP_AHEAD, len(subs))):
                prep_futs[k] = prep_pool.submit(_prep, k)

        pending = []  # (chunk_list, device_outputs, error)
        try:
            for k, (batch, sub) in enumerate(subs):
                sub_chunks = sub.chunks
                try:
                    if self.fuse_acoustic_features:
                        fn = self._fused_fn(batch.bucket_len)
                        if prep_pool is not None \
                                and k + PREP_AHEAD < len(subs):
                            prep_futs[k + PREP_AHEAD] = prep_pool.submit(
                                _prep, k + PREP_AHEAD)
                        fut = prep_futs.pop(k, None)
                        buf, lengths = (fut.result() if fut is not None
                                        else _prep(k))
                        out = fn(self.params, buf, lengths)
                        self._warmed.add((batch.bucket_len, buf.shape[0]))
                        del buf
                    else:
                        fn = self._device_fn(batch.bucket_len)
                        rows, lengths = self._prepare_rows(sub)
                        out = fn(self.params, rows, lengths)
                        self._warmed.add(
                            (batch.bucket_len, self.device_chunks))
                    pending.append((sub_chunks, out, None))
                except Exception as e:  # pragma: no cover
                    logger.error("ASR dispatch failed (bucket %d): %s",
                                 batch.bucket_len, e)
                    pending.append((sub_chunks, None, str(e)))
        finally:
            if prep_pool is not None:
                prep_pool.shutdown(wait=False, cancel_futures=True)

        return lambda: self._fetch_pending(chunks, pending, results)

    def _fetch_pending(self, chunks, pending, results) -> List[Dict]:
        # Pass 2: fetch + decode in dispatch order.
        for sub_chunks, out, err in pending:
            n = len(sub_chunks)
            if err is not None:
                for c in sub_chunks:
                    results[id(c)] = {
                        "transcription_chunk": "",
                        "agent_transcription": "",
                        "client_transcription": "",
                        "error": err,
                    }
                continue
            try:
                if self.fuse_acoustic_features:
                    ids, mask, af = out
                    af = np.asarray(af)[:n]
                else:
                    ids, mask = out
                    af = None
                ids = np.asarray(ids)[:3 * n]
                mask = np.asarray(mask)[:3 * n]
            except Exception as e:  # pragma: no cover
                logger.error("ASR fetch failed: %s", e)
                for c in sub_chunks:
                    results[id(c)] = {
                        "transcription_chunk": "",
                        "agent_transcription": "",
                        "client_transcription": "",
                        "error": str(e),
                    }
                continue
            texts = batch_decode(ids, self.vocab, mask)
            for j, c in enumerate(sub_chunks):
                r = {
                    "transcription_chunk":
                        remove_special_characters(texts[3 * j]),
                    "agent_transcription":
                        remove_special_characters(texts[3 * j + 1]),
                    "client_transcription":
                        remove_special_characters(texts[3 * j + 2]),
                    "error": "",
                }
                if af is not None:
                    r["agent_acoustic_features"] = af[j, 0]
                    r["client_acoustic_features"] = af[j, 1]
                if self.emit_word_timestamps:
                    for view, name in ((0, "mixed_words"),
                                       (1, "agent_words"),
                                       (2, "client_words")):
                        row = ids[3 * j + view]
                        valid = row[mask[3 * j + view].astype(bool)]
                        r[name] = decode_words(
                            valid, self.vocab, self._frame_sec,
                            offset_sec=c.start_time)
                results[id(c)] = r

        out_rows = []
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
            out_rows.append(row)
        return out_rows

    def _prepare_rows(self, batch) -> tuple:
        """Non-fused path: [3N, L] float32 view rows, padded to the
        static device batch."""
        n = len(batch)
        rows = batch.audio.reshape(n * 3, batch.bucket_len)
        lengths = np.repeat(batch.lengths, 3).astype(np.int32)
        B = self.device_batch
        if rows.shape[0] < B:
            pad = B - rows.shape[0]
            rows = np.concatenate(
                [rows, np.zeros((pad, batch.bucket_len), np.float32)])
            lengths = np.concatenate(
                [lengths, np.full((pad,), batch.bucket_len, np.int32)])
        return rows, lengths

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
        # Dispatch EVERY bucket batch before fetching any: per-bucket
        # dispatch->fetch round trips serialize uploads against compute
        # through the 25 ms-latency tunnel (message-path asr phase
        # 7.0 s -> overlapped, tools/profile_message_path.py).
        dispatched = []
        for batch in chunk_batch(chunks, self.bucket_samples):
            # Mono rows built directly: ChunkBatch.audio would
            # materialize [N, 3, L] (the wave copied into all three
            # views) only for view 0 to be kept — 3x the host
            # allocation+copy per message batch.
            rows = np.zeros((len(batch), batch.bucket_len), np.float32)
            for j, c in enumerate(batch.chunks):
                t = int(batch.lengths[j])
                rows[j, :t] = c.mixed[:t]
            dispatched.append((batch, self._dispatch_rows(
                rows, batch.lengths, batch.bucket_len)))
        for batch, fetch in dispatched:
            out = fetch()
            for j, c in enumerate(batch.chunks):
                texts[c.chunk_idx] = out[j]
        return [texts.get(i, "") for i in range(len(waves))]
