"""Audio frontend: Whisper log-mel spectrogram + WAV decode.

Numerically matches HF's WhisperFeatureExtractor (hann window,
n_fft=400, hop=160, Slaney-normalized mel filterbank, log10 with a
max-8dB dynamic-range clamp, (x+4)/4 scaling) — parity-tested in
tests/test_whisper.py. The reference ships precomputed filter binaries
(multimodal/mel_filters80.bin); here the bank is derived in closed form.
"""

from __future__ import annotations

import io
import wave
from typing import Optional

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30
CHUNK_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS


def _hertz_to_mel(freq):
    """Slaney mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(
            np.maximum(freq, 1e-30) / min_log_hertz) * logstep
    return np.where(freq >= min_log_hertz, log_branch, mels)


def _mel_to_hertz(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)), freq)


def mel_filter_bank(num_mels: int = 80, n_fft: int = N_FFT,
                    sampling_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Triangular Slaney-normalized filterbank [n_fft//2+1, num_mels]."""
    fft_freqs = np.linspace(0, sampling_rate / 2, n_fft // 2 + 1)
    mel_min = _hertz_to_mel(0.0)
    mel_max = _hertz_to_mel(sampling_rate / 2.0)
    mel_pts = np.linspace(mel_min, mel_max, num_mels + 2)
    hz_pts = _mel_to_hertz(mel_pts)

    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0, np.minimum(down, up))
    enorm = 2.0 / (hz_pts[2:num_mels + 2] - hz_pts[:num_mels])
    return (fb * enorm[None, :]).astype(np.float64)


def log_mel_spectrogram(audio: np.ndarray, num_mels: int = 80,
                        pad_to_chunk: bool = True) -> np.ndarray:
    """f32 waveform [n] @16 kHz -> log-mel [num_mels, 3000] (one 30 s
    window; longer audio should be chunked by the caller)."""
    audio = np.asarray(audio, dtype=np.float64)
    if pad_to_chunk:
        if len(audio) > CHUNK_SAMPLES:
            audio = audio[:CHUNK_SAMPLES]
        audio = np.pad(audio, (0, CHUNK_SAMPLES - len(audio)))

    window = np.hanning(N_FFT + 1)[:-1]
    # Center-padded (reflect) frames, matching torch.stft(center=True).
    padded = np.pad(audio, (N_FFT // 2, N_FFT // 2), mode="reflect")
    n_frames = 1 + (len(padded) - N_FFT) // HOP
    idx = (np.arange(N_FFT)[None, :]
           + HOP * np.arange(n_frames)[:, None])
    frames = padded[idx] * window[None, :]
    stft = np.fft.rfft(frames, n=N_FFT, axis=1)        # [T, F]
    magnitudes = np.abs(stft[:-1]) ** 2                # drop last frame (HF)

    fb = mel_filter_bank(num_mels)
    mel = magnitudes @ fb                              # [T, mels]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T.astype(np.float32)               # [mels, T]


def decode_wav(data: bytes) -> np.ndarray:
    """WAV bytes -> f32 mono waveform @16 kHz (naive resample if needed;
    non-WAV containers are rejected loudly — the reference bundles
    symphonia, here WAV-PCM is the supported container)."""
    with wave.open(io.BytesIO(data)) as w:
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if rate != SAMPLE_RATE:
        # Linear resample (adequate for speech; dedicated DSP later).
        t_new = np.linspace(0, len(x) - 1,
                            int(len(x) * SAMPLE_RATE / rate))
        x = np.interp(t_new, np.arange(len(x)), x).astype(np.float32)
    return x
