"""Packet-level Opus decoder glue (RFC 6716 §4): TOC dispatch into
the SILK and CELT codec bodies, channel-count adaptation, and
mode-transition state resets.

The reference stack never decodes Opus itself (it shells audio out to
ffmpeg, services/audio_processor.py:76-86); io/opus.py prefers the
system libopus and falls back to this pure-Python decoder.  SILK-mode
output is bit-exact with libopus' int16 API (the SILK decoder is
fixed-point in every libopus build); CELT/hybrid output is held to a
small float tolerance by tests/test_opusdec.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from audio_processor_tpu.io.opusdec.packet import (OpusPacketError,
                                                   PacketInfo,
                                                   SILK_KHZ,
                                                   parse_packet)
from audio_processor_tpu.io.opusdec.rangedec import RangeDecoder
from audio_processor_tpu.io.opusdec.silk import SilkDecoder


class OpusDecodeError(ValueError):
    pass


class OpusDecoder:
    """Stateful decoder for one Opus stream at 48 kHz API rate.

    decode(packet) -> float32 [N, channels] in [-1, 1];
    decode_int16(packet) -> int16 [N, channels] (SILK-only streams are
    bit-exact with libopus' opus_decode()).
    """

    def __init__(self, channels: int):
        if channels not in (1, 2):
            raise OpusDecodeError(f"unsupported channel count {channels}")
        self.channels = channels
        self.silk = SilkDecoder()
        self.prev_mode: Optional[str] = None

    # ----------------------------------------------------------------
    def _decode_silk_frame(self, rd: RangeDecoder,
                           info: PacketInfo) -> np.ndarray:
        fs_khz = SILK_KHZ[info.bandwidth]
        n_internal = 2 if info.stereo else 1
        chans = self.silk.decode(rd, n_internal, fs_khz,
                                 int(info.frame_ms))
        n = len(chans[0])
        out = np.zeros((n, self.channels), np.int16)
        if self.channels == 2 and n_internal == 1:
            col = np.asarray(chans[0], np.int16)
            out[:, 0] = col
            out[:, 1] = col
        elif self.channels == 1 and n_internal == 2:
            # dec_API.c mono-API downmix: (L + R) >> 1 per sample
            mix = (np.asarray(chans[0], np.int32)
                   + np.asarray(chans[1], np.int32)) >> 1
            out[:, 0] = mix.astype(np.int16)
        else:
            for c in range(n_internal):
                out[:, c] = np.asarray(chans[c], np.int16)
        return out

    # ----------------------------------------------------------------
    def decode_int16(self, packet: bytes) -> np.ndarray:
        """Decode one packet -> int16 [N, channels] at 48 kHz."""
        info = parse_packet(packet)
        if info.mode != "silk":
            raise NotImplementedError(
                f"opusdec: {info.mode} mode not yet implemented")
        outs = []
        for frame in info.frames:
            if not frame:
                raise OpusPacketError("empty frame (PLC not supported)")
            rd = RangeDecoder(frame)
            outs.append(self._decode_silk_frame(rd, info))
            if rd.error:
                raise OpusDecodeError("range decoder error")
        self.prev_mode = info.mode
        return np.concatenate(outs, axis=0)

    def decode(self, packet: bytes) -> np.ndarray:
        """Decode one packet -> float32 [N, channels] in [-1, 1]."""
        return self.decode_int16(packet).astype(np.float32) / 32768.0
