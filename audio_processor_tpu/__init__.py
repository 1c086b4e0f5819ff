"""audio_processor_tpu — TPU-native call-center audio analytics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``jaratM/audio_processor`` reference pipeline (see SURVEY.md): batch
processing of 2-channel (agent/client) call recordings in Darija —
decode → resample → chunk → Wav2Vec2Bert CTC ASR → VAD-segmented mono
transcription → multi-modal sentiment (text BERT + acoustic SVM/RF +
late fusion) → topic classification → PostgreSQL/SQLite/CSV persistence —
designed SPMD-first over a TPU device mesh instead of the reference's
thread/process-per-GPU architecture.

Public facade classes (``AudioProcessor``, ``SpeechSegment``,
``SentimentAnalyzer``) preserve the reference's API surface
(reference: services/audio_processor.py:17, services/speech_segment.py:161,
services/sentiment_analysis.py:16).
"""

__version__ = "0.1.0"

from audio_processor_tpu.config import PipelineConfig, load_config

__all__ = [
    "PipelineConfig",
    "load_config",
    "__version__",
]
