"""Voice activity detection as a batched XLA program.

Replaces the reference's pyannote VAD pipeline
(services/speech_segment.py:175-187, 314-326), which round-trips every
waveform through a temp WAV file into a torch pipeline. Two detectors:

1. :class:`PyanNetVAD` — a PyanNet-style segmentation model (SincNet
   band-pass frontend → stacked BiLSTM → FFN → sigmoid frame
   probabilities) implemented functionally in JAX, with a converter
   for pyannote-format torch state dicts (``convert_pyannet``).
2. :func:`energy_vad_probs` — a deterministic energy detector used
   when no checkpoint is configured (synthetic/benchmark runs and
   tests).

Both emit frame speech probabilities; :func:`binarize` applies
pyannote-style onset/offset hysteresis with min-duration filtering to
produce (start, end) second timelines.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_processor_tpu.dsp.stft import frame_signal


# ----------------------------------------------------------------------
# PyanNet-style model
# ----------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PyanNetConfig:
    """Geometry of pyannote.audio's PyanNet segmentation model
    (pyannote SincNet + monolithic BiLSTM + leaky-ReLU linear stack;
    defaults match pyannote's LSTM_DEFAULTS / LINEAR_DEFAULTS)."""

    sample_rate: int = 16000
    sinc_filters: int = 80
    sinc_kernel: int = 251
    sinc_stride: int = 10
    conv_channels: int = 60
    conv_kernel: int = 5
    pool: int = 3
    lstm_hidden: int = 128
    lstm_layers: int = 2
    linear_hidden: int = 128
    linear_layers: int = 2
    num_outputs: int = 1
    leaky_slope: float = 0.01   # F.leaky_relu default


def _hamming(n: int) -> np.ndarray:
    return 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1))


def sinc_filters(low_hz: jnp.ndarray, band_hz: jnp.ndarray,
                 kernel: int, sample_rate: int) -> jnp.ndarray:
    """SincNet band-pass bank [F, kernel] from learnable cutoffs."""
    min_low, min_band = 50.0, 50.0
    low = min_low + jnp.abs(low_hz)
    high = jnp.clip(low + min_band + jnp.abs(band_hz),
                    min_low, sample_rate / 2)
    t = (jnp.arange(kernel) - (kernel - 1) / 2) / sample_rate  # seconds
    window = jnp.asarray(_hamming(kernel), jnp.float32)

    def bp(f1, f2):
        s2 = 2 * f2 * jnp.sinc(2 * f2 * t)
        s1 = 2 * f1 * jnp.sinc(2 * f1 * t)
        return (s2 - s1) * window

    filt = jax.vmap(bp)(low, high)                       # [F, K]
    # normalize each filter to unit peak (SincNet convention)
    return filt / (2.0 * (high - low))[:, None]


def init_pyannet(rng, cfg: PyanNetConfig) -> Dict[str, Any]:
    ks = iter(jax.random.split(rng, 32))
    F, C, H = cfg.sinc_filters, cfg.conv_channels, cfg.lstm_hidden

    def dense(k, i, o):
        return {"kernel": jax.random.normal(k, (i, o)) * (1.0 / np.sqrt(i)),
                "bias": jnp.zeros((o,))}

    def norm(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def lstm(k, i, h):
        k1, k2 = jax.random.split(k)
        return {"w_ih": jax.random.normal(k1, (i, 4 * h)) / np.sqrt(i),
                "w_hh": jax.random.normal(k2, (h, 4 * h)) / np.sqrt(h),
                "b": jnp.zeros((4 * h,))}

    params: Dict[str, Any] = {
        "wav_norm": norm(1),
        "sinc": {"low_hz": jnp.linspace(30.0, 7000.0, F),
                 "band_hz": jnp.full((F,), 100.0)},
        "norm0": norm(F),
        "conv1": {"kernel": jax.random.normal(
            next(ks), (cfg.conv_kernel, F, C)) / np.sqrt(F * cfg.conv_kernel),
            "bias": jnp.zeros((C,))},
        "norm1": norm(C),
        "conv2": {"kernel": jax.random.normal(
            next(ks), (cfg.conv_kernel, C, C)) / np.sqrt(C * cfg.conv_kernel),
            "bias": jnp.zeros((C,))},
        "norm2": norm(C),
        "lstm": [], "linear": [],
    }
    in_dim = C
    for _ in range(cfg.lstm_layers):
        params["lstm"].append({"fwd": lstm(next(ks), in_dim, H),
                               "bwd": lstm(next(ks), in_dim, H)})
        in_dim = 2 * H
    d = 2 * H
    for _ in range(cfg.linear_layers):
        params["linear"].append(dense(next(ks), d, cfg.linear_hidden))
        d = cfg.linear_hidden
    params["classifier"] = dense(next(ks), d, cfg.num_outputs)
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def _lstm_scan(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
               reverse: bool = False) -> jnp.ndarray:
    """[B, T, I] -> [B, T, H] single-direction LSTM (torch gate order
    i, f, g, o)."""
    B, T, _ = x.shape
    H = p["w_hh"].shape[0]
    xs = jnp.einsum("bti,ih->bth", x, p["w_ih"]) + p["b"]

    def cell(carry, xt):
        h, c = carry
        gates = xt + jnp.matmul(h, p["w_hh"])
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    h0 = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = jax.lax.scan(cell, h0, jnp.swapaxes(xs, 0, 1), reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def _instance_norm(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
                   eps: float = 1e-5) -> jnp.ndarray:
    """Affine per-sample per-channel normalization over time
    ([B, T, C]); matches torch InstanceNorm1d(affine=True)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _maxpool(x: jnp.ndarray, pool: int) -> jnp.ndarray:
    return -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                  (1, pool, 1), (1, pool, 1), "VALID")


def pyannet_forward(params: Dict[str, Any], cfg: PyanNetConfig,
                    waveform: jnp.ndarray) -> jnp.ndarray:
    """[B, T] -> [B, frames] speech probabilities.

    Faithful to pyannote.audio's PyanNet forward: per SincNet block
    conv -> abs (sinc block only) -> maxpool -> affine InstanceNorm ->
    leaky_relu; monolithic BiLSTM; leaky_relu linear stack; sigmoid
    classifier (max over outputs for multi-speaker segmentation
    checkpoints, which is the VAD pipeline's reduction).

    An int16 waveform is the wire format (half the H2D bytes through
    the tunnel): dequantized on device as x/32768, which is
    BIT-IDENTICAL to uploading the f32 values when they came from
    PCM16 (k/2^15 scales exactly in fp32)."""
    slope = cfg.leaky_slope
    if waveform.dtype == jnp.int16:
        waveform = waveform.astype(jnp.float32) * (1.0 / 32768.0)
    x = waveform[:, :, None]                                 # [B, T, 1]
    x = _instance_norm(params["wav_norm"], x)

    filt = sinc_filters(params["sinc"]["low_hz"], params["sinc"]["band_hz"],
                        cfg.sinc_kernel, cfg.sample_rate)     # [F, K]
    x = jax.lax.conv_general_dilated(
        x, filt.T[:, None, :],                                # [K, 1, F]
        window_strides=(cfg.sinc_stride,), padding=((0, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"))              # [B, T1, F]
    x = jnp.abs(x)
    x = _maxpool(x, cfg.pool)
    x = jax.nn.leaky_relu(_instance_norm(params["norm0"], x), slope)

    for conv_name, norm_name in (("conv1", "norm1"), ("conv2", "norm2")):
        x = jax.lax.conv_general_dilated(
            x, params[conv_name]["kernel"],
            window_strides=(1,), padding=((0, 0),),
            dimension_numbers=("NHC", "HIO", "NHC"))
        x = x + params[conv_name]["bias"]
        x = _maxpool(x, cfg.pool)
        x = jax.nn.leaky_relu(_instance_norm(params[norm_name], x), slope)

    for layer in params["lstm"]:
        fwd = _lstm_scan(layer["fwd"], x)
        bwd = _lstm_scan(layer["bwd"], x, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)

    for lin in params["linear"]:
        x = jax.nn.leaky_relu(
            jnp.matmul(x, lin["kernel"]) + lin["bias"], slope)
    cls = params["classifier"]
    probs = jax.nn.sigmoid(jnp.matmul(x, cls["kernel"]) + cls["bias"])
    return jnp.max(probs, axis=-1)


def pyannet_frame_hop_sec(cfg: PyanNetConfig) -> float:
    """Seconds per output frame (stride 10 x three pools of 3)."""
    return cfg.sinc_stride * cfg.pool ** 3 / cfg.sample_rate


def pyannet_frame_hop_samples(cfg: PyanNetConfig) -> int:
    return cfg.sinc_stride * cfg.pool ** 3


def pyannet_num_frames(cfg: PyanNetConfig, samples: int) -> int:
    """Output frame count of pyannet_forward for an input length
    (valid convs/pools: sinc k251 s10, then 3x [pool3 + conv k5
    except after the last pool])."""
    t = (samples - cfg.sinc_kernel) // cfg.sinc_stride + 1
    t = t // cfg.pool
    t = t - (cfg.conv_kernel - 1)
    t = t // cfg.pool
    t = t - (cfg.conv_kernel - 1)
    t = t // cfg.pool
    return max(0, t)


_pyannet_jit = jax.jit(pyannet_forward, static_argnames=("cfg",))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "batch_rows", "step", "win"))
def _pyannet_span_forward(params: Dict[str, Any], cfg: PyanNetConfig,
                          x: jnp.ndarray, base: jnp.ndarray,
                          batch_rows: int, step: int, win: int
                          ) -> jnp.ndarray:
    """One sub-batch of ``batch_rows`` sliding windows, formed ON
    DEVICE from the resident channel buffer ``x``.

    ``base`` (dynamic) is the first window's sample offset; the
    windows inside the span sit at STATIC offsets ``j*step``, so the
    extraction is a dynamic_slice plus ``batch_rows`` static slices —
    no gathers, and one compiled program serves every sub-batch of a
    given buffer length. Uploading ``x`` once instead of the
    overlapped window rows halves H2D bytes (the 5 s / 2.5 s sliding
    regime duplicates ~2x the audio)."""
    span = jax.lax.dynamic_slice(x, (base,),
                                 ((batch_rows - 1) * step + win,))
    rows = jnp.stack([jax.lax.slice(span, (j * step,), (j * step + win,))
                      for j in range(batch_rows)])
    return pyannet_forward(params, cfg, rows)


def pyannet_windowed_dispatch(params: Dict[str, Any], cfg: PyanNetConfig,
                              mono: np.ndarray,
                              window_sec: float = 5.0,
                              step_sec: float = 2.5,
                              batch_rows: int = 16,
                              int16_wire: bool = None):
    """Upload one channel and dispatch its sliding-window VAD
    sub-batches WITHOUT fetching. Returns an opaque pending handle for
    :func:`pyannet_windowed_fetch`.

    Splitting dispatch from fetch lets callers overlay the device
    work + transfers of many channels (segmenter.get_speech_segments_
    multi dispatches every channel of a file batch before fetching
    any), hiding this image's ~25 ms-per-round-trip tunnel latency.
    """
    sr = cfg.sample_rate
    hop = pyannet_frame_hop_samples(cfg)
    W = int(window_sec * sr)
    S = max(hop, int(step_sec * sr) // hop * hop)
    x = np.asarray(mono, np.float32).reshape(-1)
    T = x.shape[0]
    n_win = max(1, -(-(max(T - W, 0)) // S) + 1)
    n_batches = -(-n_win // batch_rows)
    # The buffer is padded so every sub-batch's span (including padded
    # tail rows) is in bounds: zero rows beyond n_win are cropped at
    # fetch, identical to the previous host-side row padding. One
    # compile per distinct buffer length, i.e. per batch_rows*step
    # (~40 s) of call length.
    L = (n_batches * batch_rows - 1) * S + W
    if L > T:
        x = np.concatenate([x, np.zeros(L - T, np.float32)])
    # int16 wire: halve upload bytes whenever the samples are
    # int16-exact (every PCM16-decoded file); device dequantize by an
    # exact 2^-15 scale is bit-identical to uploading f32.
    # int16_wire: None = engage iff exact (default); False = never.
    if int16_wire is None or int16_wire:
        from audio_processor_tpu.io.wire import maybe_int16_wire

        x = maybe_int16_wire(x)
    x_dev = jax.device_put(x)
    outs = [_pyannet_span_forward(params, cfg, x_dev,
                                  np.int32(g * batch_rows * S),
                                  batch_rows=batch_rows, step=S, win=W)
            for g in range(n_batches)]
    return outs, {"cfg": cfg, "n_win": n_win, "T": T, "S": S,
                  "W": W, "hop": hop}


def pyannet_windowed_fetch(pending) -> np.ndarray:
    """Fetch + overlap-average a :func:`pyannet_windowed_dispatch`
    handle into [frames] speech probabilities."""
    outs, m = pending
    cfg, n_win, T, S, W, hop = (m["cfg"], m["n_win"], m["T"], m["S"],
                                m["W"], m["hop"])
    F_w = pyannet_num_frames(cfg, W)
    probs = np.concatenate([np.asarray(o)[:, :F_w] for o in outs])[:n_win]

    # Overlap-average onto the absolute frame grid (window w's frame
    # f sits at absolute frame w*(S//hop) + f).
    step_frames = S // hop
    padded_len = (n_win - 1) * S + W
    n_total = pyannet_num_frames(cfg, padded_len)
    sums = np.zeros(n_total, np.float64)
    counts = np.zeros(n_total, np.float64)
    for w in range(n_win):
        lo = w * step_frames
        hi = min(lo + F_w, n_total)
        sums[lo:hi] += probs[w, :hi - lo]
        counts[lo:hi] += 1.0
    agg = (sums / np.maximum(counts, 1.0)).astype(np.float32)
    # Trim frames whose hop position lies entirely in the zero tail
    # (the pyannote pipeline crops its timeline to the file duration).
    n_keep = max(1, min(agg.shape[0], -(-T // hop)))
    return agg[:n_keep]


def pyannet_probs_windowed(params: Dict[str, Any], cfg: PyanNetConfig,
                           mono: np.ndarray,
                           window_sec: float = 5.0,
                           step_sec: float = 2.5,
                           batch_rows: int = 16,
                           int16_wire: bool = None) -> np.ndarray:
    """Arbitrary-length mono waveform -> [frames] speech probabilities
    via fixed-size sliding windows, batched, with overlap averaging.

    This is the TPU-native inference regime AND the behavioral match
    for the reference's pyannote pipeline, which slides a fixed
    ``duration`` window over the file and aggregates overlapping frame
    scores (pyannote.audio Inference('sliding'); reference call path
    services/speech_segment.py:175-187). A whole-call forward would
    recompile per call length, run the InstanceNorms over a length
    regime the published checkpoints never saw, and serialize one
    giant BiLSTM scan; fixed windows give short scans and MXU-friendly
    batching, and the window rows are formed ON DEVICE from a single
    per-channel upload (see _pyannet_span_forward) — 1x audio bytes on
    the wire instead of the 2x that overlapped host-formed rows cost.

    The step is snapped DOWN to the model's output frame hop (270
    samples) so every window's frame grid aligns with the absolute
    frame grid; the tail window is zero-padded (pyannote pads short
    chunks the same way). Overlapping frames are averaged.

    ``int16_wire``: None (default) uploads int16 when every sample is
    int16-exact — bit-identical results at half the H2D bytes; False
    forces the f32 wire (tests).
    """
    return pyannet_windowed_fetch(pyannet_windowed_dispatch(
        params, cfg, mono, window_sec=window_sec, step_sec=step_sec,
        batch_rows=batch_rows, int16_wire=int16_wire))


def convert_pyannet(state_dict: Dict[str, Any],
                    cfg: PyanNetConfig) -> Dict[str, Any]:
    """pyannote.audio PyanNet torch state dict -> param tree.

    Layout per pyannote.audio models.segmentation.PyanNet: sincnet
    (wav_norm1d, conv1d.0.filterbank.low_hz_/band_hz_ [asteroid
    Encoder(ParamSincFB)], conv1d.{1,2} with biases, norm1d.{0,1,2}
    affine InstanceNorms), lstm.* (weight_ih_l{k}[_reverse] ...),
    linear.{k}, classifier."""
    def np_(k):
        t = state_dict[k]
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    def first(*keys):
        for k in keys:
            if k in state_dict:
                return np_(k)
        raise KeyError(keys[0])

    def norm(i):
        return {"scale": np_(f"sincnet.norm1d.{i}.weight"),
                "bias": np_(f"sincnet.norm1d.{i}.bias")}

    params: Dict[str, Any] = {
        "wav_norm": {"scale": np_("sincnet.wav_norm1d.weight"),
                     "bias": np_("sincnet.wav_norm1d.bias")},
        "sinc": {
            "low_hz": first("sincnet.conv1d.0.filterbank.low_hz_",
                            "sincnet.conv1d.0.low_hz_").reshape(-1),
            "band_hz": first("sincnet.conv1d.0.filterbank.band_hz_",
                             "sincnet.conv1d.0.band_hz_").reshape(-1),
        },
        "norm0": norm(0),
        # torch conv weight [out, in, K] -> [K, in, out]
        "conv1": {"kernel": np_("sincnet.conv1d.1.weight")
                  .transpose(2, 1, 0),
                  "bias": np_("sincnet.conv1d.1.bias")},
        "norm1": norm(1),
        "conv2": {"kernel": np_("sincnet.conv1d.2.weight")
                  .transpose(2, 1, 0),
                  "bias": np_("sincnet.conv1d.2.bias")},
        "norm2": norm(2),
        "lstm": [], "linear": [],
    }
    for layer in range(cfg.lstm_layers):
        entry = {}
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            w_ih = np_(f"lstm.weight_ih_l{layer}{suffix}").T
            w_hh = np_(f"lstm.weight_hh_l{layer}{suffix}").T
            b = (np_(f"lstm.bias_ih_l{layer}{suffix}")
                 + np_(f"lstm.bias_hh_l{layer}{suffix}"))
            entry[direction] = {"w_ih": w_ih, "w_hh": w_hh, "b": b}
        params["lstm"].append(entry)
    i = 0
    while f"linear.{i}.weight" in state_dict:
        params["linear"].append({
            "kernel": np_(f"linear.{i}.weight").T,
            "bias": np_(f"linear.{i}.bias")})
        i += 1
    params["classifier"] = {"kernel": np_("classifier.weight").T,
                            "bias": np_("classifier.bias")}
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


# ----------------------------------------------------------------------
# Energy VAD fallback
# ----------------------------------------------------------------------

FRAME = 400   # 25 ms @ 16 kHz
HOP = 160     # 10 ms


@jax.jit
def energy_vad_probs(waveform: jnp.ndarray, lengths: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] -> ([B, F] speech probabilities, [B, F] frame mask).

    Deterministic adaptive-threshold RMS detector: a frame is speech
    when its RMS exceeds max(1e-4, 0.1 * p95-RMS of the utterance).
    """
    B, T = waveform.shape
    nf = max(0, 1 + (T - FRAME) // HOP)
    frames = frame_signal(waveform, FRAME, HOP, nf)
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1))       # [B, F]
    valid = jnp.maximum(0, 1 + (lengths - FRAME) // HOP)
    mask = jnp.arange(nf)[None, :] < valid[:, None]
    rms_m = jnp.where(mask, rms, 0.0)
    p95 = jnp.percentile(rms_m, 95, axis=-1, keepdims=True)
    thresh = jnp.maximum(1e-4, 0.1 * p95)
    probs = jax.nn.sigmoid((rms - thresh) / (0.1 * thresh + 1e-8))
    return jnp.where(mask, probs, 0.0), mask


# ----------------------------------------------------------------------
# Binarization (pyannote-style hysteresis)
# ----------------------------------------------------------------------

def binarize(probs: np.ndarray, frame_hop_sec: float,
             onset: float = 0.5, offset: float = 0.5,
             min_duration_on: float = 0.0,
             min_duration_off: float = 0.0) -> List[Tuple[float, float]]:
    """Frame probabilities -> [(start_sec, end_sec)] speech regions.

    Vectorized hysteresis: the per-frame state machine (activate on
    p > onset, deactivate on p < offset) is a forward-fill of the
    last decisive frame's sign — a Python loop over ~18k frames per
    3-minute channel was ~0.3 s/channel of the message path."""
    probs = np.asarray(probs).reshape(-1)
    n = probs.shape[0]
    segments: List[Tuple[float, float]] = []
    if n:
        if onset < offset:
            # Inverted "hysteresis" band: a p in (onset, offset)
            # satisfies BOTH transitions, so the state machine
            # toggles every frame — no forward-fill equivalent
            # exists. Run the exact per-frame machine for this
            # (misconfigured but legal) regime.
            active = np.empty(n, dtype=bool)
            act = False
            for i, p in enumerate(probs):
                if not act and p > onset:
                    act = True
                elif act and p < offset:
                    act = False
                active[i] = act
        else:
            sig = np.where(probs > onset, 1,
                           np.where(probs < offset, -1, 0)).astype(np.int8)
            last = np.maximum.accumulate(
                np.where(sig != 0, np.arange(n), -1))
            active = np.where(last >= 0,
                              sig[np.maximum(last, 0)] == 1, False)
        prev = np.concatenate(([False], active[:-1]))
        starts = np.nonzero(active & ~prev)[0]
        ends = np.nonzero(~active & prev)[0]
        for k, s in enumerate(starts):
            e = ends[k] if k < ends.shape[0] else n
            segments.append((s * frame_hop_sec, e * frame_hop_sec))

    if min_duration_off > 0 and segments:
        merged = [list(segments[0])]
        for s, e in segments[1:]:
            if s - merged[-1][1] < min_duration_off:
                merged[-1][1] = e
            else:
                merged.append([s, e])
        segments = [tuple(x) for x in merged]
    if min_duration_on > 0:
        segments = [(s, e) for s, e in segments if e - s >= min_duration_on]
    return segments
