"""DatabaseManager tests (sqlite backend; schema + upsert semantics
from reference services/database_manager.py)."""

import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.host.db import DatabaseManager


@pytest.fixture
def db(tmp_path):
    cfg = PipelineConfig(database_type="sqlite",
                         db_path=str(tmp_path / "t.db"),
                         input_folder=str(tmp_path))
    d = DatabaseManager(cfg)
    yield d
    d.close()


def test_insert_call_upsert(db):
    db.insert_call({"id_enregistrement": "c1", "duration_seconds": 10.0})
    db.insert_call({"id_enregistrement": "c1", "duration_seconds": 20.0,
                    "topics": "t"})
    row = db.get_call_by_id_enregistrement("c1")
    assert row["duration_seconds"] == 20.0
    assert row["topics"] == "t"


def test_insert_call_requires_id(db):
    with pytest.raises(ValueError):
        db.insert_call({"duration_seconds": 1.0})


def test_chunk_upsert_and_fetch(db):
    db.insert_call({"id_enregistrement": "c1"})
    db.insert_chunk({"id_chunk": "0", "id_enregistrement": "c1",
                     "transcription_chunk": "a"})
    db.insert_chunk({"id_chunk": "0", "id_enregistrement": "c1",
                     "transcription_chunk": "b",
                     "emotion_client": "content"})
    chunks = db.get_chunks_by_id_enregistrement("c1")
    assert len(chunks) == 1
    assert chunks[0]["transcription_chunk"] == "b"
    assert chunks[0]["emotion_client"] == "content"


def test_messages(db):
    db.insert_call({"id_enregistrement": "c1"})
    db.insert_message({"id_enregistrement": "c1", "order_message": 1,
                       "text": "salam", "speaker": "agent"})
    db.insert_message({"id_enregistrement": "c1", "order_message": 2,
                       "text": "labas", "speaker": "client"})
    msgs = db.get_messages_by_id_enregistrement("c1")
    assert [m["text"] for m in msgs] == ["salam", "labas"]
    with pytest.raises(ValueError):
        db.insert_message({"id_enregistrement": "c1", "text": "x"})
    # idempotent refresh: clear + re-insert replaces the set
    db.insert_call({"id_enregistrement": "c2"})
    db.insert_message({"id_enregistrement": "c2", "order_message": 1,
                       "text": "other", "speaker": "agent"})
    db.delete_messages_by_id_enregistrement("c1")
    assert db.get_messages_by_id_enregistrement("c1") == []
    assert len(db.get_messages_by_id_enregistrement("c2")) == 1
    db.insert_message({"id_enregistrement": "c1", "order_message": 1,
                       "text": "re", "speaker": "agent"})
    assert [m["text"] for m in
            db.get_messages_by_id_enregistrement("c1")] == ["re"]


def test_update_call_sentiment(db):
    db.insert_call({"id_enregistrement": "c1"})
    db.update_call_sentiment("c1", "Content", "Courtois", "topic - sub")
    row = db.get_call_by_id_enregistrement("c1")
    assert row["emotion_client_globale"] == "Content"
    assert row["ton_agent_global"] == "Courtois"
    assert row["topics"] == "topic - sub"


def test_metadata_upsert_and_date_parse(db, tmp_path):
    (tmp_path / "c1.wav").write_bytes(b"x")  # file must exist
    db.insert_call_metadata("c1", {
        "AGENT_ID": "a9", "CALL_ID": "k1",
        "DESTINATION_NUMBER": "0529000220",
        "DATE_": "25/09/2025 21:54:39",
        "QUEUE_NAME": "q", "BUSINESS_TYPE": "B2C",
    })
    meta = db.get_call_metadata("c1")
    assert meta["agent_id"] == "a9"
    assert meta["business_type"] == "B2C"
    assert "2025-09-25" in str(meta["call_date"])
    assert db.get_business_type("c1") == "B2C"


def test_metadata_skipped_for_missing_audio(db):
    db.insert_call_metadata("ghost", {"AGENT_ID": "a"})
    assert db.get_call_metadata("ghost") is None


def test_business_type_mapping(db):
    assert db.business_type("0529000220") == "B2C"
    assert db.business_type("+212529000135") == "B2C"
    assert db.business_type("0529292929") == "B2B"
    assert db.business_type("12345") == "UNKNOWN"
    assert db.business_type(None) == "UNKNOWN"


def test_processing_stats(db):
    db.insert_call({"id_enregistrement": "c1"})
    db.insert_chunk({"id_chunk": "0", "id_enregistrement": "c1"})
    stats = db.get_processing_stats()
    assert stats["total_calls"] == 1
    assert stats["total_chunks"] == 1


def test_extra_getters(db, tmp_path):
    db.insert_call({"id_enregistrement": "c9"})
    db.insert_chunk({"id_chunk": "2", "id_enregistrement": "c9",
                     "transcription_chunk": "x"})
    db.insert_message({"id_enregistrement": "c9", "order_message": 1,
                       "text": "t", "speaker": "agent"})
    (tmp_path / "c9.wav").write_bytes(b"x")
    db.insert_call_metadata("c9", {"AGENT_ID": "a7",
                                   "DATE_": "01/01/2026 00:00:00"})
    assert db.get_chunk_by_id_enregistrement_and_id("c9", "2") \
        ["transcription_chunk"] == "x"
    assert db.get_message_by_id_enregistrement_and_order_message(
        "c9", 1)["text"] == "t"
    calls = db.get_calls_by_agent_id("a7")
    assert len(calls) == 1 and calls[0]["id_enregistrement"] == "c9"


def test_reconnects_after_lost_connection(tmp_path):
    """A lost/closed connection gets one reconnect-and-retry per
    statement (beyond the reference, which fails every row after a
    PostgreSQL drop). File-backed sqlite only — :memory: must fail
    loudly (a silent reconnect would start from an empty schema)."""
    from audio_processor_tpu.config import PipelineConfig

    cfg = PipelineConfig(database_type="sqlite",
                         db_path=str(tmp_path / "r.db"))
    d = DatabaseManager(cfg)
    d.insert_call({"id_enregistrement": "c1", "duration_seconds": 3.0,
                   "topics": "", "emotion_client_globale": "",
                   "ton_agent_global": ""})
    d.connection.close()  # simulate a dropped connection
    d.insert_call({"id_enregistrement": "c2", "duration_seconds": 4.0,
                   "topics": "", "emotion_client_globale": "",
                   "ton_agent_global": ""})
    rows = d.get_call_by_id_enregistrement("c2")
    assert rows and rows["duration_seconds"] == 4.0
    # the pre-drop row is still there (same file, real reconnect)
    assert d.get_call_by_id_enregistrement("c1") is not None
    d.close()

    import sqlite3

    m = DatabaseManager(PipelineConfig(database_type="memory"))
    m.insert_call({"id_enregistrement": "x", "duration_seconds": 1.0,
                   "topics": "", "emotion_client_globale": "",
                   "ton_agent_global": ""})
    m.connection.close()
    with pytest.raises(sqlite3.ProgrammingError):
        m.insert_call({"id_enregistrement": "y", "duration_seconds": 1.0,
                       "topics": "", "emotion_client_globale": "",
                       "ton_agent_global": ""})
