"""CSV writer tests (reference 17-column schema,
services/pipeline.py:603-662)."""

import csv

from audio_processor_tpu.host.csv_writer import COLUMNS, save_results_csv


def _read(path):
    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def test_columns_and_values(tmp_path):
    rows = [{
        "file_name": "c.wav", "transcription_chunk": "salam",
        "agent_transcription": "a", "client_transcription": "b",
        "error": "",
        "agent_text_sentiment": "courtois", "agent_text_confidence": 0.9,
        "client_fusion_sentiment": "content",
        "client_fusion_confidence": 0.77,
    }]
    p = save_results_csv(rows, tmp_path)
    out = _read(p)
    assert list(out[0].keys()) == COLUMNS
    assert out[0]["transcription_chunk"] == "salam"
    assert out[0]["agent_text_sentiment"] == "courtois"
    assert float(out[0]["client_fusion_confidence"]) == 0.77
    # unset sentiment fields default to '' / 0.0
    assert out[0]["agent_acoustic_sentiment"] == ""
    assert float(out[0]["agent_acoustic_confidence"]) == 0.0


def test_failed_row_blanks_everything(tmp_path):
    """Failed results (error set, no transcription) keep only
    file_name + error (reference: pipeline.py:614-634)."""
    rows = [{
        "file_name": "bad.wav", "error": "boom",
        "transcription_chunk": "",
        "agent_transcription": "should-not-appear",
        "agent_text_sentiment": "should-not-appear",
    }]
    p = save_results_csv(rows, tmp_path)
    out = _read(p)
    assert out[0]["file_name"] == "bad.wav"
    assert out[0]["error"] == "boom"
    assert out[0]["agent_transcription"] == ""
    assert out[0]["agent_text_sentiment"] == ""


def test_error_with_transcription_is_not_failed(tmp_path):
    rows = [{
        "file_name": "ok.wav", "error": "warn",
        "transcription_chunk": "text here",
        "agent_transcription": "kept",
    }]
    p = save_results_csv(rows, tmp_path)
    out = _read(p)
    assert out[0]["agent_transcription"] == "kept"
    assert out[0]["error"] == "warn"


def test_unicode_and_empty(tmp_path):
    rows = [{"file_name": "u.wav", "transcription_chunk": "سلام عليكم"}]
    p = save_results_csv(rows, tmp_path)
    assert _read(p)[0]["transcription_chunk"] == "سلام عليكم"
    p2 = save_results_csv([], tmp_path, timestamp="empty")
    assert _read(p2) == []
