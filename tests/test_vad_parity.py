"""Parity of the JAX PyanNet VAD against a torch implementation of
pyannote.audio's PyanNet architecture.

pyannote.audio is not installable in this image, so the oracle below
replicates its published forward pass exactly — SincNet with asteroid's
ParamSincFB filterbank (sin-difference form), affine InstanceNorms,
conv -> abs(sinc only) -> maxpool -> norm -> leaky_relu block order,
monolithic batch-first BiLSTM, leaky-ReLU linear stack, sigmoid
classifier — with pyannote's state-dict key layout
(sincnet.wav_norm1d, sincnet.conv1d.0.filterbank.low_hz_, ...,
lstm.weight_ih_l{k}[_reverse], linear.{k}, classifier). Same oracle
technique as the tiny HF models in test_wav2vec2bert/test_bert.

Reference VAD call path: services/speech_segment.py:175-187, 314-326.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from audio_processor_tpu.models.vad import (
    PyanNetConfig, binarize, convert_pyannet, pyannet_forward,
    pyannet_frame_hop_sec,
)

SR = 16000


class _ParamSincFB(nn.Module):
    """asteroid_filterbanks.ParamSincFB equivalent (the filterbank
    inside pyannote's SincNet)."""

    def __init__(self, n_filters=80, kernel_size=251, stride=10,
                 sample_rate=16000, min_low_hz=50.0, min_band_hz=50.0):
        super().__init__()
        self.stride = stride
        self.sample_rate = sample_rate
        self.min_low_hz = min_low_hz
        self.min_band_hz = min_band_hz
        low = np.linspace(30.0, 6000.0, n_filters)
        band = np.linspace(80.0, 400.0, n_filters)
        self.low_hz_ = nn.Parameter(
            torch.tensor(low[:, None], dtype=torch.float32))
        self.band_hz_ = nn.Parameter(
            torch.tensor(band[:, None], dtype=torch.float32))
        n = (kernel_size - 1) / 2
        self.register_buffer(
            "t_", (torch.arange(kernel_size, dtype=torch.float32) - n)
            / sample_rate)
        self.register_buffer(
            "window_", torch.hamming_window(kernel_size, periodic=False))

    def filters(self):
        low = self.min_low_hz + self.low_hz_.abs()
        high = torch.clamp(low + self.min_band_hz + self.band_hz_.abs(),
                           self.min_low_hz, self.sample_rate / 2)
        t = self.t_[None, :]
        # (sin(2pi f2 t) - sin(2pi f1 t)) / (pi t) windowed, t=0 -> 2*band;
        # normalized by 2*band (asteroid's band_pass / (2*band)).
        num = (torch.sin(2 * np.pi * high * t)
               - torch.sin(2 * np.pi * low * t))
        denom = np.pi * self.t_[None, :]
        bp = torch.where(self.t_[None, :] == 0,
                         2 * (high - low),
                         num / torch.where(denom == 0,
                                           torch.ones_like(denom), denom))
        bp = bp * self.window_[None, :]
        return bp / (2 * (high - low))


class _Encoder(nn.Module):
    def __init__(self, fb):
        super().__init__()
        self.filterbank = fb

    def forward(self, x):
        return F.conv1d(x, self.filterbank.filters()[:, None, :],
                        stride=self.filterbank.stride)


class _SincNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
        self.conv1d = nn.ModuleList([
            _Encoder(_ParamSincFB()),
            nn.Conv1d(80, 60, 5, stride=1),
            nn.Conv1d(60, 60, 5, stride=1),
        ])
        self.pool1d = nn.ModuleList(
            [nn.MaxPool1d(3, stride=3) for _ in range(3)])
        self.norm1d = nn.ModuleList([
            nn.InstanceNorm1d(80, affine=True),
            nn.InstanceNorm1d(60, affine=True),
            nn.InstanceNorm1d(60, affine=True),
        ])

    def forward(self, waveforms):  # [B, 1, T]
        outputs = self.wav_norm1d(waveforms)
        for c, (conv1d, pool1d, norm1d) in enumerate(
                zip(self.conv1d, self.pool1d, self.norm1d)):
            outputs = conv1d(outputs)
            if c == 0:
                outputs = torch.abs(outputs)
            outputs = F.leaky_relu(norm1d(pool1d(outputs)))
        return outputs


class _PyanNet(nn.Module):
    def __init__(self, num_outputs=3):
        super().__init__()
        self.sincnet = _SincNet()
        self.lstm = nn.LSTM(60, 128, num_layers=2, batch_first=True,
                            bidirectional=True)
        self.linear = nn.ModuleList(
            [nn.Linear(256, 128), nn.Linear(128, 128)])
        self.classifier = nn.Linear(128, num_outputs)
        self.activation = nn.Sigmoid()

    def forward(self, waveforms):  # [B, 1, T] -> [B, frames, outputs]
        outputs = self.sincnet(waveforms)            # [B, C, T']
        outputs, _ = self.lstm(outputs.permute(0, 2, 1))
        for linear in self.linear:
            outputs = F.leaky_relu(linear(outputs))
        return self.activation(self.classifier(outputs))


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    model = _PyanNet(num_outputs=3)
    # Push the affine norms away from identity so a converter that
    # drops them would fail loudly.
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm1d" in name:
                p.add_(0.3 * torch.randn_like(p))
    model.eval()
    return model


def test_pyannet_forward_matches_torch(oracle, rng):
    cfg = PyanNetConfig(num_outputs=3)
    params = convert_pyannet(oracle.state_dict(), cfg)
    wav = (0.1 * rng.standard_normal((2, 32000))).astype(np.float32)
    wav[0, 8000:16000] += np.sin(
        2 * np.pi * 300 * np.arange(8000) / SR).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.tensor(wav)[:, None, :]).numpy()  # [B, F, 3]
    ref_vad = ref.max(axis=-1)

    out = np.asarray(pyannet_forward(params, cfg, wav))
    assert out.shape == ref_vad.shape
    np.testing.assert_allclose(out, ref_vad, atol=2e-5, rtol=1e-4)


def test_frame_hop_matches_torch_frame_count(oracle):
    cfg = PyanNetConfig(num_outputs=3)
    hop = pyannet_frame_hop_sec(cfg)
    assert abs(hop - 10 * 27 / SR) < 1e-9
    with torch.no_grad():
        frames = oracle(torch.zeros(1, 1, 48000)).shape[1]
    # hop * frames must span ~the whole 3 s input
    assert 3.0 - frames * hop < 0.25


def _oracle_windowed_probs(oracle, wav: np.ndarray, cfg: PyanNetConfig,
                           window_sec=5.0, step_sec=2.5) -> np.ndarray:
    """Torch-side replica of pyannet_probs_windowed: fixed windows,
    zero-padded tail, per-window forward, overlap-average on the
    absolute frame grid, crop to the file duration."""
    from audio_processor_tpu.models.vad import (
        pyannet_frame_hop_samples, pyannet_num_frames,
    )

    hop = pyannet_frame_hop_samples(cfg)
    W = int(window_sec * SR)
    S = max(hop, int(step_sec * SR) // hop * hop)
    T = wav.shape[0]
    n_win = max(1, -(-(max(T - W, 0)) // S) + 1)
    padded = np.zeros((n_win - 1) * S + W, np.float32)
    padded[:T] = wav
    F_w = pyannet_num_frames(cfg, W)
    n_total = pyannet_num_frames(cfg, padded.shape[0])
    sums = np.zeros(n_total, np.float64)
    counts = np.zeros(n_total, np.float64)
    with torch.no_grad():
        for w in range(n_win):
            chunk = padded[w * S:w * S + W]
            p = oracle(torch.tensor(chunk)[None, None, :])[0] \
                .max(-1)[0].numpy()
            lo = w * (S // hop)
            hi = min(lo + F_w, n_total)
            sums[lo:hi] += p[:hi - lo]
            counts[lo:hi] += 1.0
    agg = (sums / np.maximum(counts, 1.0)).astype(np.float32)
    return agg[:max(1, min(n_total, -(-T // hop)))]


def test_windowed_probs_match_torch_windowed(oracle, rng):
    """The batched sliding-window inference (static shapes, overlap
    averaging — the pyannote Inference('sliding') regime the reference
    pipeline runs, speech_segment.py:175-187) matches a per-window
    torch oracle, including the zero-padded tail window."""
    cfg = PyanNetConfig(num_outputs=3)
    from audio_processor_tpu.models.vad import pyannet_probs_windowed

    params = convert_pyannet(oracle.state_dict(), cfg)
    # 13.3 s: 4 full steps + unaligned tail; crosses a batch boundary
    # with batch_rows=4.
    wav = (0.05 * rng.standard_normal(int(13.3 * SR))).astype(np.float32)
    wav[2 * SR:5 * SR] += np.sin(
        2 * np.pi * 280 * np.arange(3 * SR) / SR).astype(np.float32)
    got = pyannet_probs_windowed(params, cfg, wav, window_sec=5.0,
                                 step_sec=2.5, batch_rows=4)
    ref = _oracle_windowed_probs(oracle, wav, cfg)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_segmenter_uses_pyannet_checkpoint(oracle, tmp_path, rng):
    """A configured PyanNet checkpoint becomes the VAD (energy VAD is
    only the no-checkpoint fallback), and the post-merge/pad/window
    boundaries equal applying the reference rules to the oracle's own
    (windowed, overlap-averaged) probabilities."""
    from audio_processor_tpu.config import PipelineConfig
    from audio_processor_tpu.pipeline.segmenter import SpeechSegment

    ckpt = tmp_path / "pyannet.ckpt"
    torch.save({"state_dict": oracle.state_dict()}, ckpt)
    cfg = PipelineConfig(vad_model_id=str(ckpt), vad_gap_threshold=0.8,
                         vad_padding=0.5, vad_max_segment_sec=25.0)
    seg = SpeechSegment(cfg)
    assert seg._vad_params is not None, "checkpoint must engage PyanNet"

    wav = (0.01 * rng.standard_normal(SR * 4)).astype(np.float32)
    wav[SR:2 * SR] += np.sin(
        2 * np.pi * 250 * np.arange(SR) / SR).astype(np.float32)
    segs = seg.get_speech_segments(wav, SR, "agent")

    # Independent reference: windowed oracle probs -> binarize ->
    # merge -> pad, the reference's rules (speech_segment.py:366-418).
    mcfg = PyanNetConfig(num_outputs=3)
    probs = _oracle_windowed_probs(oracle, wav, mcfg)
    hop = pyannet_frame_hop_sec(mcfg)
    spans = binarize(np.asarray(probs), hop, onset=0.5, offset=0.5)
    merged = []
    for s, e in spans:
        if merged and s - merged[-1][1] <= 0.8:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    expect = [(max(0.0, s - 0.5), min(4.0, e + 0.5)) for s, e in merged]
    got = [(round(d["start"], 3), round(d["end"], 3)) for d in segs]
    assert got == [(round(s, 3), round(e, 3)) for s, e in expect]


def test_binarize_vectorized_matches_loop_reference(rng):
    """The vectorized hysteresis must equal the frame-by-frame state
    machine for arbitrary probs and asymmetric onset/offset."""
    def loop_binarize(probs, hop, onset, offset):
        segments = []
        active = False
        start = 0.0
        for i, p in enumerate(probs):
            t = i * hop
            if not active and p > onset:
                active = True
                start = t
            elif active and p < offset:
                segments.append((start, t))
                active = False
        if active:
            segments.append((start, len(probs) * hop))
        return segments

    hop = 0.016875
    for trial in range(50):
        n = int(rng.integers(0, 400))
        probs = rng.uniform(0, 1, n)
        onset = float(rng.uniform(0.3, 0.9))
        offset = float(rng.uniform(0.1, onset))
        got = binarize(probs, hop, onset=onset, offset=offset)
        want = loop_binarize(probs, hop, onset, offset)
        assert got == want, (trial, n, onset, offset)
    # hysteresis band actually exercised: values between offset and
    # onset must hold the previous state
    probs = np.array([0.2, 0.9, 0.55, 0.55, 0.3, 0.55, 0.9, 0.1])
    got = binarize(probs, hop, onset=0.8, offset=0.4)
    want = loop_binarize(probs, hop, 0.8, 0.4)
    assert got == want
    # Inverted band (onset < offset): a p in (onset, offset) toggles
    # the state machine every frame — the exact-loop fallback must
    # match, including the alternating one-frame segments at p=0.5.
    for trial in range(30):
        n = int(rng.integers(0, 200))
        probs = rng.uniform(0, 1, n)
        onset = float(rng.uniform(0.1, 0.5))
        offset = float(rng.uniform(onset, 0.9))
        got = binarize(probs, hop, onset=onset, offset=offset)
        want = loop_binarize(probs, hop, onset, offset)
        assert got == want, (trial, n, onset, offset)
    probs = np.full(6, 0.5)
    assert binarize(probs, hop, onset=0.4, offset=0.6) == \
        loop_binarize(probs, hop, 0.4, 0.6)


def test_int16_wire_bit_identical(oracle, rng):
    """PCM16-derived waveforms engage the int16 wire (half the H2D
    bytes for the ~2x-overlapping sliding windows) and the device-side
    dequantize produces BIT-IDENTICAL probabilities to the f32 wire;
    non-exact float input falls back to f32."""
    import audio_processor_tpu.models.vad as vad_mod

    cfg = PyanNetConfig(num_outputs=3)
    params = convert_pyannet(oracle.state_dict(), cfg)
    pcm = rng.integers(-2000, 2000, int(7.3 * SR)).astype(np.int16)
    pcm[SR:3 * SR] += (8000 * np.sin(
        2 * np.pi * 300 * np.arange(2 * SR) / SR)).astype(np.int16)
    wav = pcm.astype(np.float32) / 32768.0

    seen = []
    real = vad_mod._pyannet_span_forward

    def spy(p, c, x, base, **kw):
        seen.append(np.dtype(x.dtype))   # wire dtype of the resident buffer
        return real(p, c, x, base, **kw)

    vad_mod._pyannet_span_forward = spy
    try:
        got16 = vad_mod.pyannet_probs_windowed(params, cfg, wav,
                                               batch_rows=4)
        gotf = vad_mod.pyannet_probs_windowed(params, cfg, wav,
                                              batch_rows=4,
                                              int16_wire=False)
        n16 = len(seen)
        vad_mod.pyannet_probs_windowed(
            params, cfg, wav + np.float32(1e-6), batch_rows=4)
    finally:
        vad_mod._pyannet_span_forward = real

    assert seen[0] == np.int16          # wire engaged on exact input
    assert seen[n16 - 1] == np.float32  # forced f32
    assert seen[-1] == np.float32       # non-exact input falls back
    np.testing.assert_array_equal(got16, gotf)
