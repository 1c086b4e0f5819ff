"""SPMD scale-out tests on the 8-virtual-device CPU mesh
(SURVEY.md §4.3): sharded inference must produce identical results to
single-device, and the train step must run dp+tp."""

import numpy as np
import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.parallel.mesh import make_mesh
from audio_processor_tpu.parallel.multi_device import MultiDeviceManager
from audio_processor_tpu.pipeline.chunker import split_audio

from tests.conftest import make_stereo_call


def _tiny(cfg, mesh=None):
    import jax

    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.models.tokenizer import CTCVocab
    from audio_processor_tpu.pipeline.asr_engine import ASREngine

    vocab = CTCVocab.darija_default()
    mcfg = w2v.W2VBertConfig(vocab_size=len(vocab), hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=64,
                             conv_depthwise_kernel_size=7,
                             left_max_position_embeddings=8,
                             right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), mcfg)
    return ASREngine(cfg, params=params, model_cfg=mcfg, vocab=vocab,
                     mesh=mesh)


def test_mesh_has_8_virtual_devices():
    import jax

    assert len(jax.devices()) == 8


def test_sharded_inference_matches_single_device():
    cfg = PipelineConfig(enable_mixed_precision=False,
                         chunk_duration_sec=4.0, overlap_sec=1.0,
                         length_buckets_sec=(2.0, 4.0), chunk_batch_size=2)
    mesh = make_mesh(n_devices=8, data=8, model=1)
    call = make_stereo_call(dur=30.0)
    chunks = split_audio(call, 16000, "c.wav", 4.0, 1.0)  # 10 chunks

    single = _tiny(cfg)
    multi = _tiny(cfg, mesh=mesh)
    assert multi.device_chunks == 16  # 2 x 8 data-parallel

    out_s = single.transcribe_chunks(chunks)
    out_m = multi.transcribe_chunks(
        split_audio(call, 16000, "c.wav", 4.0, 1.0))
    for a, b in zip(out_s, out_m):
        assert a["transcription_chunk"] == b["transcription_chunk"]
        assert a["agent_transcription"] == b["agent_transcription"]
        assert a["client_transcription"] == b["client_transcription"]
    # fused features also match
    for a, b in zip(out_s, out_m):
        np.testing.assert_allclose(a["agent_acoustic_features"],
                                   b["agent_acoustic_features"],
                                   rtol=1e-4, atol=1e-4)


def test_multi_device_manager_mesh_from_config():
    cfg = PipelineConfig(mesh_shape={"data": 4, "model": 2})
    mgr = MultiDeviceManager(cfg)
    assert mgr.num_workers == 8
    assert mgr.data_parallel_size == 4


def test_train_step_dp_tp():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_engine_with_mesh_from_config(tmp_path):
    """DataProcessor builds the mesh from config.mesh_shape and the
    whole pipeline runs SPMD on the virtual 8-device mesh."""
    from audio_processor_tpu.io import wav
    from audio_processor_tpu.pipeline.engine import DataProcessor

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    for i in range(2):
        wav.write(input_dir / f"m-{i}.wav", make_stereo_call(dur=6.0),
                  16000)
    cfg = PipelineConfig(
        input_folder=str(input_dir), output_folder=str(tmp_path / "out"),
        logs_folder=str(tmp_path / "logs"),
        enable_mixed_precision=False, chunk_duration_sec=4.0,
        overlap_sec=1.0, length_buckets_sec=(2.0, 4.0),
        chunk_batch_size=1, mesh_shape={"data": 8, "model": 1})
    mesh = make_mesh(n_devices=8, data=8)
    proc = DataProcessor(cfg, asr_engine=_tiny(cfg, mesh=mesh), mesh=mesh)
    proc.setup_models()
    n = proc.run()
    assert n == 2
    assert proc.stats["files_failed"] == 0


def test_distributed_helpers_single_host():
    from audio_processor_tpu.parallel.distributed import (
        initialize_distributed, is_primary_host, local_file_shard,
        owns_call,
    )

    assert initialize_distributed() == 0  # no coordinator -> no-op
    assert is_primary_host()
    assert owns_call("anything")  # single process owns everything
    files = [f"f{i}" for i in range(5)]
    assert local_file_shard(files) == sorted(files)


def test_sequence_parallel_train_step_matches():
    """dp x sp x tp: sharding activation time dims over 'seq' must not
    change the loss (XLA inserts the attention/conv all-gathers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.training.train_step import (
        init_state, make_optimizer, make_train_step)

    cfg = w2v.W2VBertConfig(
        vocab_size=36, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8,
        right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-4)
    rng = np.random.default_rng(0)
    B, T, N = 8, 32, 8
    batch = {
        "features": rng.standard_normal(
            (B, T, cfg.feature_projection_input_dim)).astype(np.float32),
        "feature_mask": np.ones((B, T), np.float32),
        "labels": rng.integers(1, cfg.vocab_size, (B, N)).astype(np.int32),
        "label_mask": np.ones((B, N), np.float32),
    }
    losses = {}
    for name, kw in [("dp", dict(model=1)),
                     ("dp_sp", dict(model=1, seq=2)),
                     ("dp_sp_tp", dict(model=2, seq=2))]:
        mesh = make_mesh(n_devices=8, **kw)
        state = init_state(params, tx, mesh=mesh, cfg=cfg)
        step = make_train_step(cfg, tx, mesh=mesh, dtype=jnp.float32)
        with mesh:
            _, loss = step(state, batch)
            losses[name] = float(loss)
    base = losses["dp"]
    for name, v in losses.items():
        assert abs(v - base) < 1e-3 * max(1.0, abs(base)), losses


def test_pipeline_parallel_forward_equals_plain():
    """GPipe stages over 'stage' with ppermute == unpipelined forward,
    including ragged attention masks and uneven microbatch content."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.parallel.pipeline import (
        make_pipelined_forward)

    cfg = w2v.W2VBertConfig(
        vocab_size=36, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8,
        right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(2)
    B, T = 8, 32
    feats = rng.standard_normal(
        (B, T, cfg.feature_projection_input_dim)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 10:] = False
    mask[6, 25:] = False
    ref = w2v.forward(params, cfg, feats, mask)
    for n_stages, n_micro in [(2, 4), (4, 8)]:
        mesh = Mesh(np.asarray(jax.devices()[:n_stages]), ("stage",))
        fn = make_pipelined_forward(cfg, mesh, n_micro)
        out = fn(params, feats, mask)
        err = float(jnp.abs(out - ref).max())
        assert err < 1e-4, (n_stages, n_micro, err)


def test_manager_mesh_shape_with_seq_axis():
    """mesh_shape {'data': D, 'seq': S} sizes the mesh as D*S*model
    (regression: n omitted the seq factor and tripped make_mesh's
    divisibility assertion)."""
    from audio_processor_tpu.parallel.multi_device import (
        MultiDeviceManager)

    mgr = MultiDeviceManager({"mesh_shape": {"data": 2, "seq": 2,
                                             "model": 2}})
    assert dict(zip(mgr.mesh.axis_names, mgr.mesh.devices.shape)) == \
        {"data": 2, "seq": 2, "model": 2}


def test_pipeline_parallel_train_step_matches():
    """Gradient flows back through the ppermute pipeline: one
    pipelined train step produces the same loss and (to fp32
    tolerance) the same parameter update as the plain step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.parallel.pipeline import (
        make_pipelined_train_step)
    from audio_processor_tpu.training.train_step import (
        init_state, make_optimizer, make_train_step)

    cfg = w2v.W2VBertConfig(
        vocab_size=36, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8,
        right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-4)
    rng = np.random.default_rng(0)
    B, T, N = 8, 32, 8
    batch = {
        "features": rng.standard_normal(
            (B, T, cfg.feature_projection_input_dim)).astype(np.float32),
        "feature_mask": np.ones((B, T), np.float32),
        "labels": rng.integers(1, cfg.vocab_size, (B, N)).astype(np.int32),
        "label_mask": np.ones((B, N), np.float32),
    }
    ref_state, ref_loss = make_train_step(cfg, tx, dtype=jnp.float32)(
        init_state(params, tx), batch)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    pp_step = make_pipelined_train_step(cfg, tx, mesh, n_microbatches=4)
    with mesh:
        pp_state, pp_loss = pp_step(init_state(params, tx), batch)
    assert abs(float(ref_loss) - float(pp_loss)) < 1e-4
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         ref_state.params, pp_state.params)
    assert max(jax.tree.leaves(diffs)) < 1e-4


def test_zero1_optimizer_sharding_matches_replicated():
    """ZeRO-1 (Adam moments sharded over 'data') must produce the SAME
    loss and updated params as the replicated-optimizer step, while
    the moment leaves are actually partitioned across dp replicas."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audio_processor_tpu.models import wav2vec2bert as w2v
    from audio_processor_tpu.parallel.mesh import opt_state_shardings
    from audio_processor_tpu.training.train_step import (
        init_state, make_optimizer, make_train_step)

    cfg = w2v.W2VBertConfig(
        vocab_size=36, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8,
        right_max_position_embeddings=2)
    params = w2v.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-4)
    rng = np.random.default_rng(1)
    B, T, N = 8, 32, 8
    batch = {
        "features": rng.standard_normal(
            (B, T, cfg.feature_projection_input_dim)).astype(np.float32),
        "feature_mask": np.ones((B, T), np.float32),
        "labels": rng.integers(1, cfg.vocab_size, (B, N)).astype(np.int32),
        "label_mask": np.ones((B, N), np.float32),
    }
    mesh = make_mesh(n_devices=8, model=2)

    out = {}
    for name, zero1 in (("replicated", False), ("zero1", True)):
        state = init_state(params, tx, mesh=mesh, cfg=cfg, zero1=zero1)
        sh = (opt_state_shardings(state.opt_state, state.params, mesh,
                                  cfg) if zero1 else None)
        step = make_train_step(cfg, tx, mesh=mesh, dtype=jnp.float32,
                               opt_shardings=sh)
        with mesh:
            new_state, loss = step(state, batch)
        out[name] = (new_state, float(loss))

    (rep_state, rep_loss), (z_state, z_loss) = out["replicated"], out["zero1"]
    assert abs(rep_loss - z_loss) < 1e-4 * max(1.0, abs(rep_loss))
    for a, b in zip(jax.tree.leaves(rep_state.params),
                    jax.tree.leaves(z_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # the moments are genuinely partitioned over 'data': at least one
    # large leaf must NOT be fully replicated, and its shards must
    # tile the 'data' axis
    mu = z_state.opt_state[0].mu
    big = [x for x in jax.tree.leaves(mu) if x.ndim >= 2 and
           x.shape[0] >= 4]
    assert big, "no moment leaves to check"
    partitioned = 0
    for x in big:
        spec = x.sharding.spec
        if any(p == "data" or (isinstance(p, tuple) and "data" in p)
               for p in spec if p is not None):
            partitioned += 1
    assert partitioned >= len(big) // 2, \
        f"only {partitioned}/{len(big)} moment leaves dp-sharded"
