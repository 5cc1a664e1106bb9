"""Audio processor + WAV I/O tests — mirrors reference coverage
(``/root/reference/tests/test_audio_processor_full.py``)."""

import numpy as np
import pytest

from vietvoice_tts_tpu.pipeline.audio import AudioProcessor
from vietvoice_tts_tpu.utils.wavio import read_wav, wav_bytes, write_wav


class TestWavIO:
    def test_roundtrip(self, temp_dir):
        sig = (np.sin(np.linspace(0, 40 * np.pi, 24000)) * 0.5).astype(np.float32)
        path = f"{temp_dir}/x.wav"
        write_wav(sig, path, 24000)
        back, sr = read_wav(path)
        assert sr == 24000
        assert back.shape == (24000, 1)
        np.testing.assert_allclose(back[:, 0], sig, atol=1e-4)

    def test_bytes_roundtrip(self):
        sig = np.linspace(-0.9, 0.9, 1000).astype(np.float32)
        data = wav_bytes(sig, 24000)
        back, sr = read_wav(data)
        assert sr == 24000
        np.testing.assert_allclose(back[:, 0], sig, atol=1e-4)

    def test_rejects_garbage(self):
        with pytest.raises((ValueError, RuntimeError, Exception)):
            read_wav(b"not audio at all")

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            read_wav("/nonexistent/file.wav")

    def test_empty_save_rejected(self, temp_dir):
        with pytest.raises(ValueError):
            write_wav(np.array([]), f"{temp_dir}/e.wav", 24000)


class TestNormalize:
    def test_peak_at_90_percent(self):
        audio = np.array([0.0, 0.5, -1.0, 0.25], np.float32)
        out = AudioProcessor.normalize_to_int16(audio)
        assert out.dtype == np.int16
        assert abs(int(np.abs(out).max()) - 29491) <= 2

    def test_dc_offset_removed(self):
        audio = np.ones(100, np.float32) * 0.3 + np.sin(np.linspace(0, 6, 100)) * 0.1
        out = AudioProcessor.normalize_to_int16(audio)
        assert abs(float(out.astype(np.float64).mean())) < 2000

    def test_silence(self):
        out = AudioProcessor.normalize_to_int16(np.zeros(10, np.float32))
        assert (out == 0).all()


class TestFixClipped:
    def test_nan_removed(self):
        audio = np.array([np.nan, 1.0, np.inf], np.float32)
        out = AudioProcessor.fix_clipped_audio(audio)
        assert np.isfinite(out).all()

    def test_clipped_rescaled(self):
        audio = np.array([40000.0, -40000.0, 100.0], np.float32)
        out = AudioProcessor.fix_clipped_audio(audio)
        assert int(np.abs(out.astype(np.int32)).max()) <= 26214 + 1

    def test_unclipped_unchanged(self):
        audio = np.array([100, -200, 300], np.int16)
        out = AudioProcessor.fix_clipped_audio(audio)
        np.testing.assert_array_equal(out, audio)


class TestLoadAudio:
    def test_load_resample(self, temp_dir):
        sig = np.sin(np.linspace(0, 100, 48000)).astype(np.float32) * 0.5
        path = f"{temp_dir}/hi.wav"
        write_wav(sig, path, 48000)
        out = AudioProcessor.load_audio(path, 24000)
        assert out.dtype == np.int16
        assert abs(len(out) - 24000) <= 2

    def test_load_bytes(self):
        sig = np.sin(np.linspace(0, 50, 12000)).astype(np.float32) * 0.5
        out = AudioProcessor.load_audio(wav_bytes(sig, 24000), 24000)
        assert out.dtype == np.int16
        assert len(out) == 12000


class TestCrossfade:
    def _waves(self, n=3, length=24000):
        rng = np.random.default_rng(0)
        return [
            (rng.uniform(-0.3, 0.3, length) * 32767).astype(np.int16)
            for _ in range(n)
        ]

    def test_empty(self):
        assert AudioProcessor.concatenate_with_crossfade([], 0.1, 24000).size == 0

    def test_single(self):
        w = self._waves(1)
        out = AudioProcessor.concatenate_with_crossfade(w, 0.1, 24000)
        np.testing.assert_array_equal(out, w[0])

    def test_zero_duration_concat(self):
        waves = self._waves(2)
        out = AudioProcessor.concatenate_with_crossfade(waves, 0.0, 24000)
        assert len(out) == sum(len(w) for w in waves)

    def test_overlap_shortens(self):
        waves = self._waves(2)
        out = AudioProcessor.concatenate_with_crossfade(waves, 0.1, 24000)
        assert len(out) == sum(len(w) for w in waves) - 2400

    def test_improved_variant(self):
        waves = self._waves(3)
        out = AudioProcessor.concatenate_with_crossfade_improved(waves, 0.1, 24000)
        assert out.dtype == np.int16
        assert len(out) == sum(len(w) for w in waves) - 2 * 2400

    def test_improved_equals_linear_length(self):
        waves = self._waves(2)
        a = AudioProcessor.concatenate_with_crossfade(waves, 0.05, 24000)
        b = AudioProcessor.concatenate_with_crossfade_improved(waves, 0.05, 24000)
        assert len(a) == len(b)

    def test_crossfade_longer_than_waves(self):
        waves = [np.ones(10, np.int16), np.ones(10, np.int16)]
        out = AudioProcessor.concatenate_with_crossfade_improved(waves, 1.0, 24000)
        assert len(out) == 10  # full overlap


class TestContainerDecode:
    """Non-WAV container decode via the ffmpeg fallback (reference decodes
    m4a through pydub→ffmpeg, audio_processor.py:16-27, examples/sample.m4a).
    Skipped when the ffmpeg binary is absent (this CI image ships none)."""

    @staticmethod
    def _encode(tmpdir, fmt):
        import shutil
        import subprocess

        import numpy as np

        from vietvoice_tts_tpu.utils.wavio import write_wav

        if shutil.which("ffmpeg") is None:
            pytest.skip("ffmpeg binary not available")
        sr = 24000
        t = np.arange(sr) / sr
        tone = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        src = f"{tmpdir}/tone.wav"
        dst = f"{tmpdir}/tone.{fmt}"
        write_wav(tone, src, sr)
        subprocess.run(
            ["ffmpeg", "-v", "error", "-y", "-i", src, dst], check=True
        )
        return dst, tone, sr

    @pytest.mark.parametrize("fmt", ["m4a", "ogg"])
    def test_decode_roundtrip(self, temp_dir, fmt):
        import numpy as np

        from vietvoice_tts_tpu.pipeline.audio import AudioProcessor

        path, tone, sr = self._encode(temp_dir, fmt)
        out = AudioProcessor.load_audio(path, sr)
        assert out.dtype == np.int16
        # Lossy codec: sample counts may differ by a priming frame; compare
        # duration and energy, not samples.
        assert abs(len(out) - len(tone)) < sr // 10
        assert np.abs(out).max() > 20000  # normalized to ~90% full scale

    def test_missing_ffmpeg_raises_clear_error(self, temp_dir, monkeypatch):
        import shutil as _shutil

        from vietvoice_tts_tpu.utils import wavio

        monkeypatch.setattr(wavio.shutil, "which", lambda _: None)
        bogus = f"{temp_dir}/x.m4a"
        with open(bogus, "wb") as fh:
            fh.write(b"\x00\x00\x00 ftypM4A ....")
        with pytest.raises(RuntimeError, match="ffmpeg"):
            wavio.read_wav(bogus)
