"""Orbax checkpointing for converted model parameters.

HF->JAX conversion (models/convert_hf.py) costs ~30 s for the 580M ASR
model; the converted tree is cached as an Orbax checkpoint next to the
HF directory so subsequent runs restore in seconds (SURVEY.md §5.4:
weights are load-only in this pipeline).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

logger = logging.getLogger(__name__)

CACHE_DIRNAME = "jax_converted"


def save_params(params: Dict[str, Any], directory: str | Path,
                metadata: Optional[Dict[str, Any]] = None) -> Path:
    import jax
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    ckpt_dir = directory / "params"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, jax.tree.map(lambda x: x, params), force=True)
        ckptr.wait_until_finished()
    if metadata:
        (directory / "metadata.json").write_text(json.dumps(metadata))
    logger.info("Saved converted params to %s", directory)
    return directory


def load_params(directory: str | Path) -> Tuple[Dict[str, Any],
                                                Optional[Dict[str, Any]]]:
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(directory / "params")
    meta = None
    meta_path = directory / "metadata.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    return params, meta


def cache_dir_for(model_path: str | Path) -> Path:
    return Path(model_path) / CACHE_DIRNAME


def load_or_convert_w2v_bert(model_path: str | Path):
    """Restore the Orbax cache when present/valid, else convert the HF
    checkpoint and populate the cache. Returns (params, cfg, vocab)."""
    from audio_processor_tpu.models.convert_hf import (
        load_w2v_bert_from_pretrained,
    )
    from audio_processor_tpu.models.wav2vec2bert import W2VBertConfig

    cache = cache_dir_for(model_path)
    if cache.exists():
        try:
            params, meta = load_params(cache)
            cfg = W2VBertConfig(**meta["config"])
            vocab = meta.get("vocab")
            logger.info("Restored converted params from %s", cache)
            return params, cfg, vocab
        except Exception as e:
            logger.warning("Cache restore failed (%s); reconverting", e)
    params, cfg, vocab = load_w2v_bert_from_pretrained(str(model_path))
    try:
        import dataclasses

        save_params(params, cache, metadata={
            "config": dataclasses.asdict(cfg), "vocab": vocab})
    except Exception as e:
        logger.warning("Could not write param cache: %s", e)
    return params, cfg, vocab
