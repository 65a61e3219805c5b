"""Audio front-end numeric parity tests.

The mel test compares the rFFT implementation against a literal NumPy port of
the reference's O(N²) DFT (src/tts_pipeline_fixes.rs) — same math, so they
must agree to float tolerance.
"""

import importlib.util
import os

import numpy as np
import pytest

from rwkv_tts_tpu.audio import io as aio
from rwkv_tts_tpu.audio.frontend import (
    get_ref_clip,
    to_mono_first_channel,
    trim_silence,
    volume_normalize,
    zero_mean_unit_variance,
)
from rwkv_tts_tpu.ops.mel import (
    HOP_LENGTH,
    N_FFT,
    N_MELS,
    hann_window,
    mel_filterbank,
    mel_spectrogram,
)
from rwkv_tts_tpu.ops.resample import resample


# ---- reference oracle: literal port of tts_pipeline_fixes.rs --------------

def oracle_mel(wav):
    n_mels, n_fft, hop = 128, 1024, 320
    pad = n_fft // 2
    padded = np.concatenate([np.zeros(pad), wav, np.zeros(pad)]).astype(np.float32)
    n = len(padded)
    n_frames = 1 if n <= n_fft else (n - n_fft) // hop + 1
    window = hann_window()
    fb = mel_filterbank()
    out = np.zeros((n_mels, n_frames), np.float32)
    for fi in range(n_frames):
        start = fi * hop
        frame = np.zeros(n_fft, np.float32)
        seg = padded[start: min(start + n_fft, n)]
        frame[: len(seg)] = seg * window[: len(seg)]
        mag = np.abs(np.fft.rfft(frame))
        out[:, fi] = fb @ mag
    return out


def test_mel_matches_oracle():
    rng = np.random.default_rng(0)
    wav = rng.normal(0, 0.3, 16000).astype(np.float32)
    ours = mel_spectrogram(wav)
    ref = oracle_mel(wav)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mel_ref_clip_shape_is_301():
    wav = np.random.default_rng(1).normal(0, 0.3, 96000).astype(np.float32)
    m = mel_spectrogram(wav)
    assert m.shape == (N_MELS, 301)


def test_filterbank_properties():
    fb = mel_filterbank()
    assert fb.shape == (128, 513)
    assert np.all(fb >= 0)
    assert fb.sum() > 0
    # Slaney normalization: each filter's area ≈ 2/(f_hi - f_lo) · width/2 … just
    # check rows are nonzero and band-limited below fmax bin
    fmax_bin = int(8000 * 1024 / 16000) + 2
    assert np.all(fb[:, fmax_bin + 1:] == 0)


def test_zero_mean_unit_variance():
    rng = np.random.default_rng(2)
    x = rng.normal(3.0, 2.0, 4096).astype(np.float32)
    z = zero_mean_unit_variance(x)
    assert abs(float(z.mean())) < 1e-4
    assert abs(float(z.std()) - 1.0) < 1e-3
    assert np.all(zero_mean_unit_variance(np.full(10, 5.0, np.float32)) == 0)
    assert np.all(zero_mean_unit_variance(np.array([7.0], np.float32)) == 0)


def test_ref_clip_exact_and_tiled():
    long = np.arange(200000, dtype=np.float32)
    clip = get_ref_clip(long)
    assert clip.shape == (96000,)
    np.testing.assert_array_equal(clip, long[:96000])
    short = np.arange(1000, dtype=np.float32)
    clip = get_ref_clip(short)
    assert clip.shape == (96000,)
    np.testing.assert_array_equal(clip[:1000], short)
    np.testing.assert_array_equal(clip[1000:2000], short)   # tiling


def test_trim_silence():
    wav = np.concatenate([np.zeros(100), np.full(50, 0.5), np.zeros(30)]).astype(np.float32)
    out = trim_silence(wav, 0.01)
    assert out.shape == (50,)
    silent = np.full(80, 0.001, np.float32)
    assert np.all(trim_silence(silent) == 0) and len(trim_silence(silent)) == 80


def test_volume_normalize_loud_and_quiet():
    rng = np.random.default_rng(3)
    loud = (rng.normal(0, 1.0, 16000) * 2.0).astype(np.float32)
    out = volume_normalize(loud, 0.2)
    assert float(np.max(np.abs(out))) <= 1.0
    quiet = (rng.normal(0, 0.01, 16000)).astype(np.float32)
    out_q = volume_normalize(quiet, 0.2)
    assert float(np.max(np.abs(out_q))) > float(np.max(np.abs(quiet)))


def test_first_channel_mono():
    stereo = np.array([1, -1, 2, -2, 3, -3], np.float32)  # interleaved L/R
    mono = to_mono_first_channel(stereo, 2)
    np.testing.assert_array_equal(mono, [1, 2, 3])


def test_resample_tone_preserved():
    """A 440 Hz tone resampled 44100→16000 must stay 440 Hz with ~unity gain."""
    sr0, sr1, f = 44100, 16000, 440.0
    t = np.arange(sr0) / sr0
    tone = np.sin(2 * np.pi * f * t).astype(np.float32)
    out = resample(tone, sr0, sr1)
    assert abs(len(out) - sr1) <= 2
    spec = np.abs(np.fft.rfft(out[:sr1] * np.hanning(min(len(out), sr1))))
    peak_hz = float(np.argmax(spec)) * sr1 / sr1
    assert abs(peak_hz - f) <= 2.0
    mid = out[len(out) // 4: -len(out) // 4]
    assert 0.9 < float(np.max(np.abs(mid))) < 1.1


def test_resample_antialiasing():
    """Content above the target Nyquist must be strongly attenuated."""
    sr0, sr1 = 48000, 16000
    t = np.arange(sr0) / sr0
    hi = np.sin(2 * np.pi * 11000.0 * t).astype(np.float32)  # > 8 kHz Nyquist
    out = resample(hi, sr0, sr1)
    assert float(np.max(np.abs(out[1000:-1000]))) < 0.01


def test_wav_roundtrip_16bit():
    rng = np.random.default_rng(4)
    wav = (rng.normal(0, 0.2, 8000)).astype(np.float32)
    blob = aio.encode_wav_16bit(wav, 16000)
    back, sr, ch = aio.read_wav(blob)
    assert sr == 16000 and ch == 1 and len(back) == len(wav)
    # encode applies dynamic gain; correlation must be ~1
    c = np.corrcoef(back, wav)[0, 1]
    assert c > 0.999


def test_wav_24bit_and_float():
    import struct
    # hand-build a 24-bit PCM WAV with known samples
    vals = [0, 1 << 22, -(1 << 22)]
    raw = b""
    for v in vals:
        raw += struct.pack("<I", v & 0xFFFFFFFF)[:3]
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 48000, 3, 24)
           + b"data" + struct.pack("<I", len(raw)) + raw)
    samples, sr, ch = aio.read_wav(hdr)
    np.testing.assert_allclose(samples, [0.0, 0.5, -0.5], atol=1e-6)

    fl = np.array([0.25, -0.75], np.float32)
    hdr = (b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
           + b"data" + struct.pack("<I", 8) + fl.tobytes())
    samples, _, _ = aio.read_wav(hdr)
    np.testing.assert_allclose(samples, fl)


def test_wav_reject_garbage():
    with pytest.raises(aio.AudioDecodeError):
        aio.read_wav(b"not a wav file at all, sorry")


def test_mel_jnp_backend_matches_numpy():
    import jax.numpy as jnp
    wav = np.random.default_rng(7).normal(0, 0.3, 32000).astype(np.float32)
    m_np = mel_spectrogram(wav, xp=np)
    m_jnp = np.asarray(mel_spectrogram(wav, xp=jnp))
    np.testing.assert_allclose(m_jnp, m_np, rtol=1e-3, atol=1e-4)


def test_mp3_gated_without_any_backend(tmp_path, monkeypatch):
    """Without libmp3lame/libmpg123 AND ffmpeg AND SDL_mixer the MP3 error
    is explicit."""
    from rwkv_tts_tpu.audio import mp3 as m3
    monkeypatch.setattr(m3, "lame_available", lambda: False)
    monkeypatch.setattr(m3, "mpg123_available", lambda: False)
    monkeypatch.setattr(aio, "_ffmpeg", lambda: None)
    monkeypatch.setattr(aio, "_sdl_mixer", lambda: None)
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" * 10)
    with pytest.raises(aio.AudioDecodeError, match="ffmpeg or SDL_mixer"):
        aio.read_mp3_file(str(p))
    with pytest.raises(aio.AudioDecodeError, match="libmp3lame or ffmpeg"):
        aio.encode_mp3(np.zeros(100, np.float32))


_mp3_mod = importlib.import_module("rwkv_tts_tpu.audio.mp3")


@pytest.mark.skipif(not _mp3_mod.lame_available()
                    or not _mp3_mod.mpg123_available(),
                    reason="libmp3lame/libmpg123 not present")
def test_mp3_lame_mpg123_round_trip(tmp_path):
    """In-process native MP3 codec (the reference's own encoder — LAME,
    src/lightweight_tts_pipeline.rs:1031-1121): a 440 Hz tone encodes to a
    valid mono 16 kHz stream and decodes back at the NATIVE rate with the
    tone intact."""
    sr = 16000
    t = np.arange(sr * 2) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    blob = aio.encode_mp3(sig, sr)
    assert blob[:2] in (b"\xff\xf3", b"\xff\xfb", b"\xff\xf2") or blob[:3] == b"ID3"
    p = tmp_path / "tone.mp3"
    p.write_bytes(blob)

    dec, rate, ch = aio.read_mp3_file(str(p))
    assert rate == sr and ch == 1  # native rate, not a mixer respec
    assert abs(dec.size / rate - 2.0) < 0.1  # duration within codec padding
    spec = np.abs(np.fft.rfft(dec[:sr]))
    assert abs(np.argmax(spec) * rate / sr - 440.0) < 2.0
    peak = float(np.max(np.abs(dec)))
    assert 0.3 < peak <= 1.0


@pytest.mark.skipif(not _mp3_mod.lame_available()
                    or not _mp3_mod.mpg123_available(),
                    reason="libmp3lame/libmpg123 not present")
def test_mp3_codec_thread_safety(tmp_path):
    """Concurrent encodes/decodes (the server encodes from multiple
    handlers): every LAME/mpg123 handle is per-call, so parallel use must
    neither crash nor cross streams."""
    import concurrent.futures as cf

    sr = 16000
    freqs = [220.0, 330.0, 440.0, 550.0]
    t = np.arange(sr) / sr
    paths = []
    for i, f in enumerate(freqs):
        sig = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        p = tmp_path / f"tone{i}.mp3"
        p.write_bytes(_mp3_mod.encode_mp3_lame(sig, sr))
        paths.append(str(p))

    def roundtrip(i):
        dec, rate, ch = _mp3_mod.decode_mp3_mpg123(paths[i])
        spec = np.abs(np.fft.rfft(dec[:sr]))
        return float(np.argmax(spec) * rate / sr)

    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        got = list(ex.map(roundtrip, list(range(4)) * 4))
    for j, f in enumerate(got):
        assert abs(f - freqs[j % 4]) < 2.0, (j, f)


@pytest.mark.skipif(not _mp3_mod.lame_available(),
                    reason="libmp3lame not present")
def test_mp3_encode_no_dynamic_gain():
    """The MP3 file-save conversion is a plain clamp → i16 (the reference
    applies its dynamic gain only to the API's base64 WAV): a quiet signal
    must stay quiet through the encoder."""
    sr = 16000
    quiet = (0.01 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)).astype(np.float32)
    blob = aio.encode_mp3(quiet, sr)
    if _mp3_mod.mpg123_available():
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".mp3") as f:
            f.write(blob)
            f.flush()
            dec, _, _ = _mp3_mod.decode_mp3_mpg123(f.name)
        assert float(np.max(np.abs(dec))) < 0.05  # not boosted toward 0.8


def _pygame_example_mp3() -> str:
    spec = importlib.util.find_spec("pygame")
    if spec is None or not spec.origin:
        return ""
    return os.path.join(os.path.dirname(spec.origin),
                        "examples", "data", "house_lo.mp3")


_SDL_FIXTURE_MP3 = _pygame_example_mp3()


@pytest.mark.skipif(not os.path.exists(_SDL_FIXTURE_MP3),
                    reason="pygame example mp3 not present")
def test_mp3_decode_via_sdl_mixer(monkeypatch):
    """In-process SDL_mixer MP3 decode: real MP3 file → sane PCM at the
    fixed mixer spec (mpg123 + ffmpeg forced absent so the fallback runs)."""
    from rwkv_tts_tpu.audio import mp3 as m3
    monkeypatch.setattr(m3, "mpg123_available", lambda: False)
    monkeypatch.setattr(aio, "_ffmpeg", lambda: None)
    samples, rate, ch = aio.read_mp3_file(_SDL_FIXTURE_MP3)
    assert rate == aio._SDL_RATE and ch == aio._SDL_CHANNELS
    assert samples.dtype == np.float32
    dur = samples.size / ch / rate
    assert 1.0 < dur < 60.0
    peak = float(np.max(np.abs(samples)))
    assert 0.05 < peak <= 1.0


def test_wav_extensible_float32():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) must dispatch on the SubFormat GUID:
    an extensible float32 file (DAW/sox output) decoded as int32 PCM is
    silent garbage."""
    import struct

    sr, n = 16000, 256
    samples = (np.sin(np.linspace(0, 20, n)) * 0.5).astype(np.float32)
    raw = samples.tobytes()
    # fmt body: 16 base bytes + cbSize(2) + validbits(2) + chmask(4) +
    # SubFormat GUID(16) whose first two bytes are the real tag (3 = float)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32)
    fmt += struct.pack("<H", 22) + struct.pack("<H", 32)
    fmt += struct.pack("<I", 0)
    fmt += struct.pack("<H", 3) + bytes(14)          # SubFormat: float
    blob = b"RIFF" + struct.pack("<I", 36 + len(fmt) - 16 + len(raw)) + b"WAVE"
    blob += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    blob += b"data" + struct.pack("<I", len(raw)) + raw
    got, got_sr, ch = aio.read_wav(blob)
    assert (got_sr, ch) == (sr, 1)
    np.testing.assert_allclose(got, samples, atol=1e-7)

    # extensible PCM16 still decodes as PCM
    s16 = (samples * 32767).astype("<i2")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 2, 2, 16)
    fmt += struct.pack("<H", 22) + struct.pack("<H", 16)
    fmt += struct.pack("<I", 0) + struct.pack("<H", 1) + bytes(14)
    blob = b"RIFF" + struct.pack("<I", 0) + b"WAVE"
    blob += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    blob += b"data" + struct.pack("<I", len(s16.tobytes())) + s16.tobytes()
    got, _, _ = aio.read_wav(blob)
    np.testing.assert_allclose(got, samples, atol=1e-3)
