import pytest

from audio_processor_tpu.config import PipelineConfig, load_config


def test_defaults_match_reference_yaml_surface():
    cfg = PipelineConfig()
    # Values mirror reference config.yaml defaults.
    assert cfg.chunk_duration_sec == 25.0
    assert cfg.overlap_sec == 1.0
    assert cfg.target_sample_rate == 16000
    assert cfg.chunk_batch_size == 16
    assert cfg.file_batch_size == 32
    assert cfg.max_batch_size_mb == 23.0
    assert cfg.vad_gap_threshold == 0.8
    assert cfg.vad_padding == 0.5
    assert cfg.retention_days == 30


def test_from_dict_preserves_unknown_keys():
    cfg = PipelineConfig.from_dict({"chunk_batch_size": 8, "my_custom": 42})
    assert cfg.chunk_batch_size == 8
    assert cfg.get("my_custom") == 42
    assert cfg["my_custom"] == 42
    assert "my_custom" in cfg
    with pytest.raises(KeyError):
        cfg["does_not_exist"]


def test_dict_style_access():
    cfg = PipelineConfig()
    assert cfg.get("target_sample_rate") == 16000
    assert cfg["chunk_duration_sec"] == 25.0
    assert cfg.get("missing", "dflt") == "dflt"


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "chunk_batch_size: 4\n"
        "minio:\n  enabled: true\n  bucket_name: b\n"
        "input_folder: ./in\n"
    )
    cfg = PipelineConfig.from_yaml(p)
    assert cfg.chunk_batch_size == 4
    assert cfg.minio.enabled and cfg.minio.bucket_name == "b"
    assert cfg.input_folder == "./in"


def test_validate_rejects_bad_overlap():
    cfg = PipelineConfig(overlap_sec=30.0)
    with pytest.raises(ValueError):
        cfg.validate()


def test_load_config_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("chunk_batch_size: 4\n")
    cfg = load_config(p, overrides={"chunk_batch_size": 2, "save_csv_results": False})
    assert cfg.chunk_batch_size == 2
    assert cfg.save_csv_results is False
