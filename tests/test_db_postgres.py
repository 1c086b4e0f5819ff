"""PostgreSQL code path of host/db.py with a fake psycopg2 driver
(no PG server exists in this image; the reference's driver surface is
psycopg2, database_manager.py:16-21). Validates that the PG branch
keeps %s placeholders, TIMESTAMPTZ DDL, autocommit=False, and
per-statement commit/rollback, by translating the statements onto an
in-memory SQLite engine."""

import sqlite3
import sys
import types

import pytest

from audio_processor_tpu.config import PipelineConfig


class FakeCursor:
    def __init__(self, conn, log):
        self._cur = conn._sql.cursor()
        self._log = log
        self.description = None

    def execute(self, sql, params=()):
        # the PG branch must hand psycopg2 %s placeholders, never '?'
        assert "?" not in sql, f"sqlite placeholder leaked to PG: {sql}"
        self._log["statements"].append(sql)
        self._cur.execute(sql.replace("%s", "?"), params)
        self.description = self._cur.description

    def fetchone(self):
        return self._cur.fetchone()

    def fetchall(self):
        return self._cur.fetchall()

    def close(self):
        self._cur.close()


class FakePGConnection:
    def __init__(self, log):
        self._sql = sqlite3.connect(":memory:", check_same_thread=False)
        self._log = log
        self.autocommit = True   # DatabaseManager must set this False

    def cursor(self):
        return FakeCursor(self, self._log)

    def commit(self):
        self._log["commits"] += 1
        self._sql.commit()

    def rollback(self):
        self._log["rollbacks"] += 1
        self._sql.rollback()

    def close(self):
        self._sql.close()


@pytest.fixture
def pg_db(monkeypatch):
    log = {"statements": [], "commits": 0, "rollbacks": 0,
           "connect_kwargs": None}
    fake = types.ModuleType("psycopg2")

    def connect(**kw):
        log["connect_kwargs"] = kw
        return FakePGConnection(log)

    fake.connect = connect
    monkeypatch.setitem(sys.modules, "psycopg2", fake)

    from audio_processor_tpu.host.db import DatabaseManager

    cfg = PipelineConfig(database_type="postgresql", db_host="pg.local",
                         db_port=5999, db_name="calls", db_user="svc",
                         db_password="secret")
    db = DatabaseManager(cfg)
    yield db, log
    db.close()


def test_pg_connection_parameters_and_autocommit(pg_db):
    db, log = pg_db
    kw = log["connect_kwargs"]
    assert kw == {"host": "pg.local", "port": 5999, "database": "calls",
                  "user": "svc", "password": "secret"}
    assert db.connection.autocommit is False


def test_pg_ddl_uses_timestamptz(pg_db):
    _, log = pg_db
    ddl = [s for s in log["statements"] if "call_metadata" in s
           and "CREATE TABLE" in s]
    assert ddl and "TIMESTAMPTZ" in ddl[0]


def test_pg_upserts_and_per_statement_commit(pg_db):
    db, log = pg_db
    commits0 = log["commits"]
    db.insert_call({"id_enregistrement": "c1", "duration_seconds": 9.5,
                    "topics": "", "emotion_client_globale": "",
                    "ton_agent_global": ""})
    db.insert_call({"id_enregistrement": "c1", "duration_seconds": 11.0,
                    "topics": "", "emotion_client_globale": "",
                    "ton_agent_global": ""})  # upsert, not IntegrityError
    row = db.get_call_by_id_enregistrement("c1")
    assert row["duration_seconds"] == 11.0
    assert log["commits"] > commits0 + 1  # one commit per statement
    assert any("ON CONFLICT" in s for s in log["statements"])


def test_pg_rollback_on_failure(pg_db):
    db, log = pg_db
    with pytest.raises(Exception):
        db._execute("INSERT INTO nonexistent_table VALUES (%s)", ("x",))
    assert log["rollbacks"] >= 1
