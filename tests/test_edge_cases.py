"""Edge cases — mirrors reference coverage (``/root/reference/tests/
test_edge_cases.py``): input validation, unicode, extreme audio, chunking
edges, concurrency, context managers, config extremes, error recovery."""

import threading

import numpy as np
import pytest

from tests.conftest import tiny_config
from vietvoice_tts_tpu.pipeline.audio import AudioProcessor
from vietvoice_tts_tpu.pipeline.text import chunk_text, clean_text
from vietvoice_tts_tpu.utils.wavio import wav_bytes


class TestInputValidation:
    def test_empty_text(self, tiny_engine):
        # Cleaning turns "" into "." — synthesis still produces min-duration audio.
        wave, _ = tiny_engine.synthesize("")
        assert wave.size > 0

    def test_whitespace_only(self, tiny_engine):
        wave, _ = tiny_engine.synthesize("   \n\t  ")
        assert wave.size > 0

    def test_emoji_and_symbols_stripped(self, tiny_engine):
        wave, _ = tiny_engine.synthesize("Xin chào 🎉✨ thế giới «» ©®")
        assert wave.size > 0

    def test_mixed_scripts(self):
        out = clean_text("tiếng Việt and English và 日本語")
        assert "日" not in out
        assert "tiếng Việt and English" in out

    def test_very_long_single_word(self, tiny_engine):
        wave, _ = tiny_engine.synthesize("a" * 500)
        assert wave.size > 0


class TestAudioExtremes:
    def test_zero_length_concat(self):
        out = AudioProcessor.concatenate_with_crossfade_improved([], 0.1, 24000)
        assert out.size == 0

    def test_single_sample_waves(self):
        waves = [np.array([100], np.int16), np.array([-100], np.int16)]
        out = AudioProcessor.concatenate_with_crossfade_improved(waves, 0.1, 24000)
        assert out.size >= 1

    def test_extreme_values_normalize(self):
        audio = np.array([1e10, -1e10, 0.0], np.float32)
        out = AudioProcessor.normalize_to_int16(audio)
        assert np.abs(out.astype(np.int32)).max() <= 32767

    def test_all_nan_audio(self):
        audio = np.full(100, np.nan, np.float32)
        out = AudioProcessor.fix_clipped_audio(audio)
        assert (out == 0).all()

    def test_dc_only_audio(self):
        # DC removal leaves float rounding residue which peak-scaling then
        # amplifies — same behavior as the reference normalize_to_int16
        # (audio_processor.py:29-44); assert it stays in range, not silent.
        out = AudioProcessor.normalize_to_int16(np.full(100, 0.7, np.float32))
        assert out.dtype == np.int16
        assert np.abs(out.astype(np.int32)).max() <= 32767


class TestChunkingEdges:
    def test_max_chars_one(self):
        chunks = chunk_text("một hai ba.", max_chars=1)
        assert chunks  # degrades to per-word chunks, never crashes

    def test_only_punctuation(self):
        assert clean_text("...,,,!!!") != ""

    def test_unicode_boundary_safety(self):
        text = "ế" * 200 + "."
        for c in chunk_text(text, max_chars=50):
            c.encode("utf-8")  # no split inside a codepoint

    def test_chunk_merge_keeps_all_words(self):
        text = ". ".join(f"câu {i} này có đủ năm từ" for i in range(12)) + "."
        chunks = chunk_text(text, max_chars=60)
        rejoined = " ".join(chunks)
        for i in range(12):
            assert f"câu {i}" in rejoined


class TestEngineRecovery:
    def test_engine_usable_after_error(self, tiny_engine):
        with pytest.raises(ValueError):
            tiny_engine.synthesize("x", gender="robot")
        wave, _ = tiny_engine.synthesize("Phục hồi sau lỗi.")
        assert wave.size > 0

    def test_cleanup_idempotent(self, tiny_pack_dir):
        from vietvoice_tts_tpu.pipeline.engine import TTSEngine

        engine = TTSEngine(tiny_config(model_cache_dir=tiny_pack_dir))
        engine.cleanup()
        engine.cleanup()  # second call must not raise

    def test_corrupt_reference_audio(self, tiny_engine, temp_dir):
        bad = f"{temp_dir}/bad.wav"
        with open(bad, "wb") as f:
            f.write(b"not a wav file at all")
        with pytest.raises((RuntimeError, ValueError)):
            tiny_engine.synthesize("x", reference_audio=bad, reference_text="t")


class TestConfigExtremes:
    def test_min_nfe(self, tiny_pack_dir):
        from vietvoice_tts_tpu.pipeline.engine import TTSEngine

        cfg = tiny_config(model_cache_dir=tiny_pack_dir, nfe_step=1)
        engine = TTSEngine(cfg)
        wave, _ = engine.synthesize("Một bước duy nhất.")
        assert wave.size > 0

    def test_fuse_nfe_unroll_same_output(self, tiny_pack_dir):
        from vietvoice_tts_tpu.pipeline.engine import TTSEngine

        w1, _ = TTSEngine(
            tiny_config(model_cache_dir=tiny_pack_dir, fuse_nfe=1)
        ).synthesize("Hợp nhất bước.")
        w2, _ = TTSEngine(
            tiny_config(model_cache_dir=tiny_pack_dir, fuse_nfe=4)
        ).synthesize("Hợp nhất bước.")
        np.testing.assert_allclose(
            w1.astype(np.int32), w2.astype(np.int32), atol=1
        )

    def test_zero_crossfade(self, tiny_pack_dir):
        from vietvoice_tts_tpu.pipeline.engine import TTSEngine

        cfg = tiny_config(model_cache_dir=tiny_pack_dir, cross_fade_duration=0.0)
        wave, _ = TTSEngine(cfg).synthesize("Không ghép mờ.")
        assert wave.size > 0

    def test_extreme_speeds(self, tiny_engine):
        slow, _ = tiny_engine.synthesize("Tốc độ.", )
        fast, _ = tiny_engine.engine.synthesize("Tốc độ.", speed=2.0) if hasattr(
            tiny_engine, "engine"
        ) else tiny_engine.synthesize("Tốc độ.", speed=2.0)
        assert fast.size <= slow.size


class TestConcurrency:
    def test_parallel_direct_synthesis(self, tiny_engine):
        """Direct (non-batcher) concurrent calls are safe (GIL + jit)."""
        results, errors = {}, []

        def worker(i):
            try:
                wave, _ = tiny_engine.synthesize(f"Song song {i}.")
                results[i] = wave
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        assert not errors and len(results) == 3


class TestBytesRoundTrip:
    def test_synthesize_bytes_parse(self, tiny_pack_dir):
        from vietvoice_tts_tpu.client import TTSApi
        from vietvoice_tts_tpu.utils.wavio import read_wav

        api = TTSApi(tiny_config(model_cache_dir=tiny_pack_dir))
        data, _ = api.synthesize_to_bytes("Chu kỳ byte.")
        samples, sr = read_wav(data)
        assert sr == 24000 and samples.size > 0

    def test_wav_bytes_even_odd_lengths(self):
        for n in (1, 2, 3, 1001):
            data = wav_bytes(np.zeros(n, np.int16), 24000)
            assert len(data) == 44 + 2 * n
