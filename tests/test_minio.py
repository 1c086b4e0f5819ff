"""MinIOSyncManager semantics with a fake client
(reference: utils/minio-access.py:61-171): download only objects
missing locally, skip existing, count per-object errors, survive a
listing failure, and gate cleanly on credentials/SDK."""

import logging

import pytest

from audio_processor_tpu.config import MinioConfig, PipelineConfig
from audio_processor_tpu.host.minio_sync import MinIOSyncManager


class _Obj:
    def __init__(self, name):
        self.object_name = name


class FakeMinioClient:
    def __init__(self, objects, bucket="calls", fail_names=(),
                 fail_listing=False, bucket_missing=False):
        self.objects = objects          # {object_name: payload bytes}
        self.bucket = bucket
        self.fail_names = set(fail_names)
        self.fail_listing = fail_listing
        self.bucket_missing = bucket_missing
        self.downloads = []

    def bucket_exists(self, bucket):
        return bucket == self.bucket and not self.bucket_missing

    def list_objects(self, bucket, prefix="", recursive=False):
        assert bucket == self.bucket and recursive
        if self.fail_listing:
            raise ConnectionError("listing exploded")
        return [_Obj(n) for n in sorted(self.objects)
                if n.startswith(prefix)]

    def fget_object(self, bucket, name, local_path):
        if name in self.fail_names:
            raise OSError(f"simulated download failure for {name}")
        with open(local_path, "wb") as f:
            f.write(self.objects[name])
        self.downloads.append(name)


def make_manager(client, prefix="input"):
    cfg = PipelineConfig(minio=MinioConfig(
        endpoint="minio.local:9000", enabled=True, bucket_name="calls",
        folder_prefix=prefix, secure=False))
    mgr = MinIOSyncManager.__new__(MinIOSyncManager)
    mgr.config = cfg
    mgr.enabled = True
    mgr.bucket = "calls"
    mgr.prefix = prefix
    mgr.client = client
    return mgr


def test_downloads_only_missing_files(tmp_path):
    objs = {f"input/call_{i}.wav": b"RIFF" + bytes([i]) for i in range(4)}
    client = FakeMinioClient(objs)
    (tmp_path / "call_1.wav").write_bytes(b"already here")

    stats = make_manager(client).sync_to_local(tmp_path)
    assert stats == {"downloaded": 3, "skipped": 1, "errors": 0,
                     "total_objects": 4}
    assert sorted(p.name for p in tmp_path.iterdir()) == \
        [f"call_{i}.wav" for i in range(4)]
    # the existing file was not overwritten
    assert (tmp_path / "call_1.wav").read_bytes() == b"already here"
    assert "input/call_1.wav" not in client.downloads


def test_prefix_filters_objects(tmp_path):
    objs = {"input/a.wav": b"a", "other/b.wav": b"b"}
    stats = make_manager(FakeMinioClient(objs)).sync_to_local(tmp_path)
    assert stats["total_objects"] == 1
    assert [p.name for p in tmp_path.iterdir()] == ["a.wav"]


def test_per_object_errors_counted_and_rest_downloaded(tmp_path):
    objs = {f"input/c{i}.wav": b"x" for i in range(3)}
    client = FakeMinioClient(objs, fail_names={"input/c1.wav"})
    stats = make_manager(client).sync_to_local(tmp_path)
    assert stats == {"downloaded": 2, "skipped": 0, "errors": 1,
                     "total_objects": 3}
    assert not (tmp_path / "c1.wav").exists()


def test_listing_failure_counts_one_error(tmp_path):
    client = FakeMinioClient({}, fail_listing=True)
    stats = make_manager(client).sync_to_local(tmp_path)
    assert stats["errors"] == 1 and stats["downloaded"] == 0


def test_missing_bucket_returns_zero_stats(tmp_path):
    client = FakeMinioClient({"input/a.wav": b"a"}, bucket_missing=True)
    stats = make_manager(client).sync_to_local(tmp_path)
    assert stats == {"downloaded": 0, "skipped": 0, "errors": 0,
                     "total_objects": 0}


def test_disabled_without_credentials(tmp_path, monkeypatch, caplog):
    monkeypatch.delenv("MINIO_ACCESS_KEY", raising=False)
    monkeypatch.delenv("MINIO_SECRET_KEY", raising=False)
    cfg = PipelineConfig(minio=MinioConfig(
        endpoint="minio.local:9000", enabled=True, bucket_name="calls"))
    with caplog.at_level(logging.ERROR):
        mgr = MinIOSyncManager(cfg)
    assert not mgr.enabled
    assert mgr.sync_to_local(tmp_path)["total_objects"] == 0


def test_disabled_config_is_noop(tmp_path):
    mgr = MinIOSyncManager(PipelineConfig())
    assert not mgr.enabled
    assert mgr.sync_to_local(tmp_path) == {
        "downloaded": 0, "skipped": 0, "errors": 0, "total_objects": 0}
