"""Multi-modal sentiment analysis (text BERT + acoustic SVM/RF + late
fusion), behavior-matched to the reference's SentimentAnalyzer stack
(services/sentiment_analysis.py) with the compute moved on-device:

- Text: DarijaBERT-style classifiers (client/agent) run as jitted JAX
  programs (models/bert.py) with static length buckets; tokenization
  stays host-side via the checkpoint's HF tokenizer.
- Acoustic: the 38-dim feature vector is extracted on device in one
  batched program (dsp/acoustic_features.py) instead of the
  reference's serial per-waveform loop; SVC/RandomForest execute as
  JAX programs with sklearn-exact numerics (models/sklearn_infer.py).
- Fusion: fixed weighted probability sum with the reference's
  aggressive-demotion rule (sentiment_analysis.py:1216-1246).

Reference quirks preserved as behavior:
- acoustic results are gated on a non-empty text prediction
  (sentiment_analysis.py:140-142, 153-155);
- texts shorter than 5 chars are skipped (:1099);
- all-zero or NaN scaled features yield empty acoustic results
  (:757-760);
- SVC.predict (ovo voting) provides the label while predict_proba
  provides confidence, and they can disagree (:763-777).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.dsp.acoustic_features import (
    extract_features_batch, prepare_reflect_padded,
)
from audio_processor_tpu.host.aggregation import (
    aggregate_agent_sentiment, aggregate_client_sentiment,
    call_id_from_chunk_filename,
)
from audio_processor_tpu.models import bert as bert_mod
from audio_processor_tpu.models import sklearn_infer as ski

logger = logging.getLogger(__name__)

EMPTY = {"prediction": "", "confidence": 0.0, "probabilities": []}


def _empty_results(n: int) -> List[Dict[str, Any]]:
    return [dict(EMPTY) for _ in range(n)]


# ----------------------------------------------------------------------
class TextSentimentAnalyzer:
    """Client/agent text classifiers (reference: :916-1166)."""

    def __init__(self, config):
        self.config = config
        self.models: Dict[str, Optional[Dict[str, Any]]] = {
            "client": None, "agent": None}
        self.models_available = False
        client_path = config.get("client_text_model_path", "")
        agent_path = config.get("agent_text_model_path", "")
        if client_path and agent_path:
            try:
                self.models["client"] = self._load_one(client_path)
                self.models["agent"] = self._load_one(agent_path)
                self.models_available = True
            except Exception as e:
                logger.error("Failed to load text models: %s", e)
        else:
            logger.warning("Text model paths not configured - "
                           "text sentiment disabled")

    def _load_one(self, path: str) -> Dict[str, Any]:
        import torch
        from transformers import (AutoModelForSequenceClassification,
                                  AutoTokenizer)

        model = AutoModelForSequenceClassification.from_pretrained(
            path, torch_dtype=torch.float32)
        hf_cfg = model.config
        id2label = dict(getattr(hf_cfg, "id2label", {}) or {})
        try:
            with open(Path(path) / "config.json", "r") as f:
                raw = json.load(f)
            if raw.get("id2label"):
                id2label = {int(k): v for k, v in raw["id2label"].items()}
        except Exception as e:
            logger.warning("No readable config.json id2label at %s: %s",
                           path, e)
        tokenizer = AutoTokenizer.from_pretrained(path)
        cfg = bert_mod.BertConfig.from_hf(hf_cfg)
        from audio_processor_tpu.models.convert_hf import (
            convert_bert_classifier,
        )

        params = jax.tree.map(jnp.asarray, convert_bert_classifier(
            model.state_dict(), hf_cfg.num_hidden_layers))
        if str(self.config.get("quantization", "none")) == "int8":
            # Same opt-in W8A8 mode as the ASR encoder (models/quant.py).
            params = bert_mod.quantize_params(params)
        fwd = jax.jit(lambda p, ids, mask: jax.nn.softmax(
            bert_mod.forward(p, cfg, ids, mask), axis=-1))
        return {"params": params, "cfg": cfg, "tokenizer": tokenizer,
                "id2label": {int(k): v for k, v in id2label.items()},
                "forward": fwd}

    # Pad token counts to fixed buckets so XLA compiles a handful of
    # shapes instead of one per batch.
    _LEN_BUCKETS = (32, 64, 128, 256, 512)

    def _bucket_len(self, n: int) -> int:
        for b in self._LEN_BUCKETS:
            if n <= b:
                return b
        return self._LEN_BUCKETS[-1]

    def dispatch_batch(self, texts: Sequence[str], speaker: str):
        """Tokenize + enqueue the device program (async JAX dispatch)
        and return a fetch closure. Lets the coordinator dispatch the
        agent AND client classifiers before fetching either, so the
        two programs pipeline on the device instead of ping-ponging
        dispatch->fetch->dispatch->fetch (one device round trip saved
        per batch)."""
        n = len(texts)
        if n == 0:
            return lambda: []
        model = (self.models.get(speaker)
                 if self.models_available else None)
        if model is None:
            return lambda: _empty_results(n)

        valid_idx = [i for i, t in enumerate(texts)
                     if t and t.strip() and len(t.strip()) >= 5]
        if not valid_idx:
            return lambda: _empty_results(n)
        enc = model["tokenizer"](
            [texts[i] for i in valid_idx], truncation=True, max_length=512,
            padding=True, return_tensors="np")
        ids = enc["input_ids"].astype(np.int32)
        mask = enc["attention_mask"].astype(np.float32)
        L = self._bucket_len(ids.shape[1])
        if ids.shape[1] < L:
            pad = L - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        # Pad the batch dim to a multiple of 16 (static compile shapes).
        nvalid = ids.shape[0]
        pad_b = max(16, -(-nvalid // 16) * 16) - nvalid
        if pad_b:
            ids = np.pad(ids, ((0, pad_b), (0, 0)))
            mask = np.pad(mask, ((0, pad_b), (0, 0)))
        device_probs = model["forward"](model["params"], ids, mask)

        def fetch() -> List[Dict[str, Any]]:
            probs = np.asarray(device_probs)[:nvalid]
            id2label = model["id2label"]
            out = _empty_results(n)
            for row, i in enumerate(valid_idx):
                p = probs[row]
                idx = int(np.argmax(p))
                out[i] = {"prediction": id2label.get(idx, "unknown"),
                          "confidence": float(p.max()),
                          "probabilities": p.tolist()}
            return out
        return fetch

    def analyze_batch_sentiment(self, texts: Sequence[str],
                                speaker: str) -> List[Dict[str, Any]]:
        return self.dispatch_batch(texts, speaker)()

    def analyze_sentiment(self, text: str, speaker: str) -> Dict[str, Any]:
        return self.analyze_batch_sentiment([text], speaker)[0]


# ----------------------------------------------------------------------
class AcousticSentimentAnalyzer:
    """SVM (client) / RandomForest (agent) on device (reference: :531-913)."""

    def __init__(self, config):
        self.config = config
        self.models: Dict[str, Optional[Dict[str, Any]]] = {
            "client": None, "agent": None}
        self.models_available = False
        paths = [config.get(k, "") for k in (
            "client_acoustic_model_path", "client_acoustic_scaler_path",
            "agent_acoustic_model_path", "agent_acoustic_scaler_path")]
        if all(paths):
            try:
                self.models["client"] = self._load_one(paths[0], paths[1])
                self.models["agent"] = self._load_one(paths[2], paths[3])
                self.models_available = True
            except Exception as e:
                logger.error("Failed to load acoustic models: %s", e)
        else:
            logger.warning("Acoustic model paths not configured - "
                           "acoustic sentiment disabled")
        # id2label maps injected into fusion (reference :58-59).
        self.client_acoustic_id2label = self._id2label("client")
        self.agent_acoustic_id2label = self._id2label("agent")

    def _id2label(self, speaker: str) -> Dict[int, Any]:
        m = self.models.get(speaker)
        if not m:
            return {}
        return {i: c for i, c in enumerate(m["classes"])}

    def _load_one(self, model_path: str, scaler_path: str) -> Dict[str, Any]:
        import joblib

        skl_model = joblib.load(model_path)
        scaler = joblib.load(scaler_path)
        entry: Dict[str, Any] = {
            "scaler": ski.convert_scaler(scaler),
            "n_features": int(scaler.n_features_in_),
            "classes": np.asarray(skl_model.classes_),
        }
        if hasattr(skl_model, "support_vectors_"):
            entry["kind"] = "svc"
            entry["model"] = ski.convert_svc(skl_model)
        else:
            entry["kind"] = "forest"
            entry["model"] = ski.convert_forest(skl_model)
        return entry

    def extract_features(self, waveforms: Sequence[Optional[np.ndarray]],
                         bucket_len: int) -> np.ndarray:
        """Batched on-device 38-dim feature extraction. The batch dim
        is padded to a multiple of 16 so XLA compiles a few static
        shapes, not one per batch size."""
        waves = [np.zeros(0, np.float32) if w is None else
                 np.asarray(w, np.float32).reshape(-1) for w in waveforms]
        n = len(waves)
        pad_to = max(16, -(-n // 16) * 16)
        waves = waves + [np.zeros(0, np.float32)] * (pad_to - n)
        buf, lengths = prepare_reflect_padded(waves, bucket_len)
        return np.asarray(extract_features_batch(buf, lengths))[:n]

    def analyze_batch_sentiment(self, waveforms: Sequence[Any],
                                sample_rate: int, speaker: str
                                ) -> List[Dict[str, Any]]:
        n = len(waveforms)
        if n == 0:
            return []
        if not self.models_available:
            return _empty_results(n)
        entry = self.models.get(speaker)
        if entry is None:
            return _empty_results(n)

        waves = []
        valid = []
        for i, w in enumerate(waveforms):
            if w is None:
                continue
            arr = np.asarray(w, np.float32).reshape(-1)
            if arr.size == 0:
                continue
            waves.append(arr)
            valid.append(i)
        if not waves:
            return _empty_results(n)

        # Static length bucket so XLA compiles once per bucket.
        from audio_processor_tpu.pipeline.chunker import pick_bucket

        buckets = tuple(int(b * sample_rate) for b in self.config.get(
            "length_buckets_sec", (5.0, 10.0, 15.0, 20.0, 25.0)))
        bucket = pick_bucket(max(w.shape[0] for w in waves), buckets)
        feats = self.extract_features(waves, bucket)        # [V, 38]
        results = self.classify_features(feats, speaker)
        final = _empty_results(n)
        for row, i in enumerate(valid):
            final[i] = results[row]
        return final

    def classify_features(self, feats: np.ndarray, speaker: str
                          ) -> List[Dict[str, Any]]:
        """Classify precomputed 38-dim feature rows (the fused ASR
        program computes them on device alongside transcription)."""
        entry = self.models.get(speaker)
        n = feats.shape[0]
        if entry is None or not self.models_available:
            return _empty_results(n)
        feats = np.asarray(feats, np.float32)
        nf = entry["n_features"]
        if feats.shape[1] < nf:
            feats = np.pad(feats, ((0, 0), (0, nf - feats.shape[1])))
        elif feats.shape[1] > nf:
            feats = feats[:, :nf]

        scaled = ski.scaler_transform_np(entry["scaler"], feats)
        ok = ~(np.all(scaled == 0, axis=1) | np.isnan(scaled).any(axis=1))
        # NaN rows are masked out of the results (reference:
        # sentiment_analysis.py:757-777); compute on zeroed copies.
        safe = np.where(np.isnan(scaled), 0.0, scaled).astype(np.float32)
        # Classifier heads run on host: they are microscopic (38-dim)
        # and dispatch-bound on device; numerics identical to the JAX
        # versions (tested both ways vs sklearn).
        if entry["kind"] == "svc":
            pred_idx = ski.svc_predict_np(entry["model"], safe)
            probas = ski.svc_predict_proba_np(entry["model"], safe)
        else:
            probas = ski.forest_predict_proba_np(entry["model"], safe)
            pred_idx = np.argmax(probas, axis=-1)
        classes = entry["classes"]

        out = _empty_results(n)
        for row in range(n):
            if not ok[row]:
                continue
            p = probas[row]
            out[row] = {
                "prediction": classes[int(pred_idx[row])],
                "confidence": float(p.max()),
                "probabilities": p.tolist(),
            }
        return out

    def analyze_sentiment(self, waveform, sample_rate: int,
                          speaker: str) -> Dict[str, Any]:
        return self.analyze_batch_sentiment([waveform], sample_rate,
                                            speaker)[0]


# ----------------------------------------------------------------------
class LateFusionSentimentAnalyzer:
    """Weighted probability fusion (reference: :1169-1281)."""

    CLIENT_TEXT_W, CLIENT_ACOUSTIC_W = 0.42, 0.58
    AGENT_TEXT_W, AGENT_ACOUSTIC_W = 0.54, 0.46

    def __init__(self, config=None):
        self.agent_id2label: Dict[int, Any] = {}
        self.client_id2label: Dict[int, Any] = {}

    def analyze_sentiment(self, results: Dict[str, Any],
                          speaker: str) -> Dict[str, Any]:
        text_sentiment = results.get(f"{speaker}_text_sentiment", "")
        acoustic_sentiment = results.get(f"{speaker}_acoustic_sentiment", "")
        text_confidence = results.get(f"{speaker}_text_confidence", 0.0)
        acoustic_confidence = results.get(
            f"{speaker}_acoustic_confidence", 0.0)
        text_probs = results.get(f"{speaker}_text_probabilities", [])
        acoustic_probs = results.get(f"{speaker}_acoustic_probabilities", [])

        has_both = (text_sentiment != "" and acoustic_sentiment != ""
                    and len(text_probs) > 0 and len(acoustic_probs) > 0)
        if not has_both:
            if text_sentiment:
                return {"prediction": text_sentiment,
                        "confidence": text_confidence,
                        "probabilities": text_probs}
            if acoustic_sentiment:
                return {"prediction": acoustic_sentiment,
                        "confidence": acoustic_confidence,
                        "probabilities": acoustic_probs}
            return dict(EMPTY)

        tp = np.asarray(text_probs, np.float64)
        ap = np.asarray(acoustic_probs, np.float64)
        if speaker == "client":
            fused = self.CLIENT_TEXT_W * tp + self.CLIENT_ACOUSTIC_W * ap
            id2label = self.client_id2label
        else:
            fused = self.AGENT_TEXT_W * tp + self.AGENT_ACOUSTIC_W * ap
            id2label = self.agent_id2label

        idx = int(np.argmax(fused))
        conf = float(np.max(fused))
        prediction = id2label.get(idx, "unknown")

        if speaker != "client" and prediction == "aggressive":
            # Aggressive-demotion rule (reference :1231-1246).
            if conf < 0.7 and (text_sentiment != "aggressive"
                               or text_confidence < 0.8):
                for alt in np.argsort(fused)[::-1][1:]:
                    alt_label = id2label.get(int(alt), "unknown")
                    if alt_label not in ("aggressive", "agressif"):
                        prediction = alt_label
                        conf = float(fused[int(alt)])
                        break
        return {"prediction": prediction, "confidence": conf,
                "probabilities": fused.tolist()}


# ----------------------------------------------------------------------
class SentimentAnalyzer:
    """Coordinator (reference: :16-528). Public API preserved."""

    def __init__(self, config, db_manager=None, topic_classifier=None):
        self.config = config
        self.db_manager = db_manager
        self.text_analyzer = TextSentimentAnalyzer(config)
        self.acoustic_analyzer = AcousticSentimentAnalyzer(config)
        self.late_fusion_analyzer = LateFusionSentimentAnalyzer(config)
        self.late_fusion_analyzer.agent_id2label = \
            self.acoustic_analyzer.agent_acoustic_id2label
        self.late_fusion_analyzer.client_id2label = \
            self.acoustic_analyzer.client_acoustic_id2label
        self.topic_classifier = topic_classifier

    def set_database_manager(self, db_manager):
        self.db_manager = db_manager

    def load_models(self):
        """(Re)build the three analyzers (reference contract:
        sentiment_analysis.py:50-63; this implementation also loads
        them eagerly in __init__, so calling this is only needed to
        reload after a config/model-path change)."""
        self.text_analyzer = TextSentimentAnalyzer(self.config)
        self.acoustic_analyzer = AcousticSentimentAnalyzer(self.config)
        self.late_fusion_analyzer = LateFusionSentimentAnalyzer(
            self.config)
        self.late_fusion_analyzer.agent_id2label = \
            self.acoustic_analyzer.agent_acoustic_id2label
        self.late_fusion_analyzer.client_id2label = \
            self.acoustic_analyzer.client_acoustic_id2label

    def pretty_sentiment(self, label) -> str:
        """Raw label -> display variant (reference contract:
        sentiment_analysis.py:437-443)."""
        from audio_processor_tpu.host.aggregation import pretty_sentiment

        return pretty_sentiment(label)

    # ------------------------------------------------------------------
    def analyze_batch_sentiment(self, chunks: List[Dict]) -> List[Dict]:
        if not chunks:
            return chunks
        try:
            results = self._analyze_batch(chunks)
            for i, chunk in enumerate(chunks):
                chunk.update(results[i])
        except Exception as e:
            logger.error("Error in batch sentiment analysis: %s", e)
            return self._fallback_individual_processing(chunks)
        if self.db_manager:
            self._save_chunks_to_database(chunks)
            try:
                self._update_calls_aggregated_emotions(chunks)
            except Exception as e:
                logger.error("Failed to update call-level emotions: %s", e)
        return chunks

    def _analyze_batch(self, chunks: List[Dict]) -> List[Dict]:
        sr = int(self.config.get("target_sample_rate", 16000))
        agent_texts = [c.get("agent_transcription", "") for c in chunks]
        client_texts = [c.get("client_transcription", "") for c in chunks]
        agent_waves = [c.get("agent_waveform") for c in chunks]
        client_waves = [c.get("client_waveform") for c in chunks]

        # Dispatch both classifiers before fetching either: the agent
        # and client programs pipeline on the device (and with the
        # fused ASR path the acoustic features are already on host, so
        # text is the only device work here).
        a_fetch = self.text_analyzer.dispatch_batch(agent_texts, "agent")
        c_fetch = self.text_analyzer.dispatch_batch(client_texts,
                                                    "client")
        a_text = a_fetch()
        c_text = c_fetch()

        def acoustic(speaker, waves):
            # Prefer features computed on device by the fused ASR
            # program (zero re-upload of chunk audio).
            feats = [c.get(f"{speaker}_acoustic_features") for c in chunks]
            if all(f is not None for f in feats) and feats:
                return self.acoustic_analyzer.classify_features(
                    np.stack(feats), speaker)
            return self.acoustic_analyzer.analyze_batch_sentiment(
                waves, sr, speaker)

        a_ac = acoustic("agent", agent_waves)
        c_ac = acoustic("client", client_waves)

        out = []
        for i in range(len(chunks)):
            r: Dict[str, Any] = {}
            at, aa = a_text[i], a_ac[i]
            gate_a = at.get("prediction", "") != ""
            r.update({
                "agent_text_sentiment": at.get("prediction", ""),
                "agent_text_confidence": at.get("confidence", 0.0),
                "agent_text_probabilities": at.get("probabilities", []),
                "agent_acoustic_sentiment":
                    aa.get("prediction", "") if gate_a else "",
                "agent_acoustic_confidence":
                    aa.get("confidence", 0.0) if gate_a else 0.0,
                "agent_acoustic_probabilities":
                    aa.get("probabilities", []) if gate_a else [],
            })
            ct, ca = c_text[i], c_ac[i]
            gate_c = ct.get("prediction", "") != ""
            r.update({
                "client_text_sentiment": ct.get("prediction", ""),
                "client_text_confidence": ct.get("confidence", 0.0),
                "client_text_probabilities": ct.get("probabilities", []),
                "client_acoustic_sentiment":
                    ca.get("prediction", "") if gate_c else "",
                "client_acoustic_confidence":
                    ca.get("confidence", 0.0) if gate_c else 0.0,
                "client_acoustic_probabilities":
                    ca.get("probabilities", []) if gate_c else [],
            })
            af = self.late_fusion_analyzer.analyze_sentiment(r, "agent")
            cf = self.late_fusion_analyzer.analyze_sentiment(r, "client")
            r.update({
                "agent_fusion_sentiment": af.get("prediction", ""),
                "agent_fusion_confidence": af.get("confidence", 0.0),
                "client_fusion_sentiment": cf.get("prediction", ""),
                "client_fusion_confidence": cf.get("confidence", 0.0),
            })
            out.append(r)
        return out

    def _fallback_individual_processing(self, chunks: List[Dict]
                                        ) -> List[Dict]:
        """Per-chunk degradation when batch analysis fails
        (reference: sentiment_analysis.py:255-292)."""
        logger.warning("Falling back to individual chunk processing")
        for chunk in chunks:
            try:
                chunk.update(self._analyze_batch([chunk])[0])
            except Exception as e:
                logger.error("Error analyzing sentiment for %s: %s",
                             chunk.get("file_name", "unknown"), e)
                chunk.update({
                    "agent_text_sentiment": "error",
                    "agent_text_confidence": 0.0,
                    "agent_acoustic_sentiment": "error",
                    "agent_acoustic_confidence": 0.0,
                    "agent_fusion_sentiment": "error",
                    "agent_fusion_confidence": 0.0,
                    "client_text_sentiment": "error",
                    "client_text_confidence": 0.0,
                    "client_acoustic_sentiment": "error",
                    "client_acoustic_confidence": 0.0,
                    "client_fusion_sentiment": "error",
                    "client_fusion_confidence": 0.0,
                    "sentiment_error": str(e),
                })
        if self.db_manager:
            self._save_chunks_to_database(chunks)
            try:
                self._update_calls_aggregated_emotions(chunks)
            except Exception as e:
                logger.error("Failed to update call-level emotions: %s", e)
        return chunks

    # ------------------------------------------------------------------
    def _save_chunks_to_database(self, chunks: List[Dict]):
        if not self.db_manager:
            return
        for chunk in chunks:
            filename = chunk.get("file_name", "")
            if not filename:
                continue
            call_id = call_id_from_chunk_filename(
                filename, chunk.get("chunk_idx", chunk.get("chunk_index")))
            try:
                existing = self.db_manager.get_call_by_id_enregistrement(
                    call_id)
            except Exception:
                existing = None
            if not existing:
                try:
                    self.db_manager.insert_call({
                        "id_enregistrement": call_id,
                        "duration_seconds": None,
                        "topics": "",
                        "emotion_client_globale": "",
                        "ton_agent_global": "",
                    })
                except Exception as e:
                    logger.error("Failed to create call %s: %s", call_id, e)
                    continue
            try:
                self.db_manager.insert_chunk({
                    "id_chunk": f"{chunk.get('chunk_idx', 0)}",
                    "id_enregistrement": call_id,
                    "transcription_chunk":
                        chunk.get("transcription_chunk", ""),
                    "transcription_agent":
                        chunk.get("agent_transcription", ""),
                    "transcription_client":
                        chunk.get("client_transcription", ""),
                    "emotion_client": chunk.get("client_fusion_sentiment", ""),
                    "ton_agent": chunk.get("agent_fusion_sentiment", ""),
                })
            except Exception as e:
                logger.error("Failed to insert chunk for %s: %s", call_id, e)

    def _update_calls_aggregated_emotions(self, chunks: List[Dict]):
        if not self.db_manager or not chunks:
            return
        per_call: Dict[str, List[Dict]] = {}
        for chunk in chunks:
            filename = chunk.get("file_name", "")
            if not filename:
                continue
            call_id = call_id_from_chunk_filename(
                filename, chunk.get("chunk_idx", chunk.get("chunk_index")))
            per_call.setdefault(call_id, []).append(chunk)
        for call_id, items in per_call.items():
            client_emotion = aggregate_client_sentiment(
                [str(it.get("client_fusion_sentiment", "") or "")
                 for it in items])
            agent_ton = aggregate_agent_sentiment(
                [str(it.get("agent_fusion_sentiment", "") or "")
                 for it in items])
            business_type = None
            try:
                business_type = self.db_manager.get_business_type(call_id)
            except Exception:
                pass
            topics = self.sentiment_appel_topics(items, business_type
                                                 or "B2C")
            if client_emotion or agent_ton:
                try:
                    self.db_manager.update_call_sentiment(
                        call_id, client_emotion, agent_ton, topics)
                except Exception as e:
                    logger.error("Call sentiment update failed for %s: %s",
                                 call_id, e)

    def sentiment_appel_topics(self, items: List[Dict],
                               business_type: str = "B2C") -> str:
        """Call-level topic classification via the topic classifier.

        The reference implements this fully but stubs the call site to
        '' (sentiment_analysis.py:432-435); here it is actually wired
        when a classifier with credentials is present."""
        if self.topic_classifier is None or \
                not getattr(self.topic_classifier, "enabled", False):
            return ""
        transcription = "".join(
            it.get("transcription_chunk", "") for it in items)
        try:
            _, cat, typ = self.topic_classifier.infer(
                transcription, business_type)
            return f"{cat} - {typ}"
        except Exception as e:
            logger.error("Topic inference failed: %s", e)
            return ""

    # Aggregation rules kept importable from the facade for parity
    # with the reference's public surface.
    sentiment_appel_client = staticmethod(aggregate_client_sentiment)
    sentiment_appel_agent = staticmethod(aggregate_agent_sentiment)
