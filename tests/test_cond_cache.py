"""Device-resident voice-conditioning cache (EngineCore._cond_handles).

The reference prefix's log-mel depends only on the voice audio, so it is
cached on device and the waveform — the chunk program's largest host→device
transfer — is not re-sent per request. The cached-conditioning program must
reproduce the waveform program's output: mel rows at or beyond ref_len are
masked everywhere downstream, and rows below ref_len are computed from the
identical sample window (centered STFT, 2-hop reflect margin).
"""

import numpy as np
import pytest

from conftest import tiny_config


def _batch(core, b=2, n=128, ref_frames=16, seed=3):
    hop = core.config.hop_length
    rng = np.random.default_rng(seed)
    wave = np.zeros((b, n * hop), np.float32)
    for i in range(b):
        wave[i, : ref_frames * hop] = rng.uniform(-0.4, 0.4, ref_frames * hop)
    ref_len = np.full((b,), ref_frames, np.int32)
    total = np.full((b,), n - 8, np.int32)
    ids = np.full((b, n), -1, np.int32)
    ids[:, : n // 2] = 7
    return wave, ref_len, ids, total


@pytest.fixture
def core(tiny_pack_dir):
    from vietvoice_tts_tpu.pipeline.engine import TTSEngine

    engine = TTSEngine(tiny_config(model_cache_dir=tiny_pack_dir))
    yield engine.engine_core
    engine.cleanup()


class TestCondCache:
    def test_matches_waveform_path(self, core):
        wave, ref_len, ids, total = _batch(core)
        cached = core.synthesize_batch(wave, ref_len, ids, total, seed=1)
        core.config.voice_cond_cache = False
        try:
            direct = core.synthesize_batch(wave, ref_len, ids, total, seed=1)
        finally:
            core.config.voice_cond_cache = True
        # Same samples, same noise; only the mel's compilation context
        # differs (separate frontend program) → at most LSB rounding.
        diff = np.abs(cached.astype(np.int32) - direct.astype(np.int32))
        assert diff.max() <= 1, f"max int16 diff {diff.max()}"

    def test_hits_and_misses_counted(self, core):
        wave, ref_len, ids, total = _batch(core, b=2)
        h0, m0 = core.cond_cache_hits, core.cond_cache_misses
        out1 = core.synthesize_batch(wave, ref_len, ids, total, seed=1)
        # Two rows, distinct reference audio → two misses.
        assert core.cond_cache_misses == m0 + 2
        out2 = core.synthesize_batch(wave, ref_len, ids, total, seed=1)
        assert core.cond_cache_hits == h0 + 2
        np.testing.assert_array_equal(out1, out2)

    def test_rows_sharing_a_voice_share_one_entry(self, core):
        wave, ref_len, ids, total = _batch(core, b=2)
        wave[1] = wave[0]
        m0 = core.cond_cache_misses
        n0 = len(core._cond_cache)
        core.synthesize_batch(wave, ref_len, ids, total)
        assert core.cond_cache_misses == m0 + 1
        assert len(core._cond_cache) == n0 + 1

    def test_lru_eviction(self, core):
        core.config.voice_cond_cache_size = 2
        try:
            for s in range(4):
                wave, ref_len, ids, total = _batch(core, b=1, seed=10 + s)
                core.synthesize_batch(wave, ref_len, ids, total)
            assert len(core._cond_cache) <= 2
        finally:
            core.config.voice_cond_cache_size = 64

    def test_long_reference_falls_back(self, core):
        # ref_len + margin exceeds the cache window → waveform program.
        n = 128
        wave, ref_len, ids, total = _batch(core, b=1, n=n, ref_frames=n - 2)
        total[:] = n
        m0 = core.cond_cache_misses
        out = core.synthesize_batch(wave, ref_len, ids, total)
        assert out.shape == (1, n * core.config.hop_length)
        assert core.cond_cache_misses == m0  # cache never consulted
        assert (1, n, False) in core._jit_cache or (1, n) in core._jit_cache

    def test_output_independent_of_junk_beyond_reference(self, core):
        """Samples past the hashed reference window must not affect output
        (they only feed masked-out mel rows)."""
        wave, ref_len, ids, total = _batch(core, b=1)
        out1 = core.synthesize_batch(wave, ref_len, ids, total)
        hop = core.config.hop_length
        junk = wave.copy()
        junk[0, (int(ref_len[0]) + 4) * hop :] = 0.123
        out2 = core.synthesize_batch(junk, ref_len, ids, total)
        np.testing.assert_array_equal(out1, out2)


class TestTrimmedFetch:
    """On-device reference-prefix trim before the device→host fetch."""

    def test_trimmed_equals_untrimmed_slice(self, core):
        wave, ref_len, ids, total = _batch(core, b=2, ref_frames=70)
        hop = core.config.hop_length
        full = core.synthesize_batch(wave, ref_len, ids, total, seed=2)
        trimmed = core.synthesize_batch(
            wave, ref_len, ids, total, seed=2, trim_ref_frames=64
        )
        np.testing.assert_array_equal(trimmed, full[:, 64 * hop :])

    def test_trim_validation(self, core):
        wave, ref_len, ids, total = _batch(core, b=1, ref_frames=16)
        with pytest.raises(ValueError, match="32-multiple"):
            core.synthesize_batch(wave, ref_len, ids, total, trim_ref_frames=63)
        with pytest.raises(ValueError, match="32-multiple"):
            # a 32-multiple trim larger than ref_len (16) must also fail
            core.synthesize_batch(wave, ref_len, ids, total, trim_ref_frames=64)

    def test_pick_trim_only_returns_warmed_classes(self, core):
        ref = np.array([188], np.int32)
        # Nothing warmed → degrade to 0 (full fetch), never a surprise compile.
        assert core.pick_trim(1, 128, ref) == 0
        # The registry is keyed by the cond-cache flag too (the trimmed
        # waveform and trimmed cond programs are different compiles).
        core._warm_trims[(1, 128, True)] = {0, 64, 128}
        core._warm_trims[(1, 128, False)] = {0, 64, 128}
        assert core.pick_trim(1, 128, ref) == 128
        assert core.pick_trim(1, 128, np.array([70], np.int32)) == 64
        assert core.pick_trim(1, 128, np.array([10], np.int32)) == 0
        assert core.pick_trim(2, 128, ref) == 0  # batch 2 not warmed

    def test_warmup_registers_trim_class(self, core):
        core.warmup(batches=(1,), buckets=(128,), trim_classes=(0, 64))
        ref = np.array([100], np.int32)
        assert core.pick_trim(1, 128, ref) == 64

    def test_engine_output_unchanged_by_trim(self, tiny_pack_dir):
        """The same text must produce identical audio whether the trimmed
        program is warmed (device drops the prefix) or not (host slices)."""
        from vietvoice_tts_tpu.pipeline.engine import TTSEngine

        engine = TTSEngine(tiny_config(model_cache_dir=tiny_pack_dir))
        try:
            ref, _ = engine.synthesize("Xin chào thế giới.")
            engine.warmup(buckets=(256,))  # registers the default-voice trim
            assert any(
                t for ts in engine.engine_core._warm_trims.values() for t in ts
            ), "warmup should register a nonzero trim class"
            out, _ = engine.synthesize("Xin chào thế giới.")
            np.testing.assert_array_equal(ref, out)
        finally:
            engine.cleanup()

    def test_streaming_matches_batch(self, tiny_pack_dir):
        from vietvoice_tts_tpu.pipeline.engine import TTSEngine

        engine = TTSEngine(tiny_config(model_cache_dir=tiny_pack_dir))
        try:
            ref, _ = engine.synthesize("Xin chào thế giới.")
            stream = np.concatenate(list(engine.synthesize_streaming("Xin chào thế giới.")))
            np.testing.assert_array_equal(ref, stream)
        finally:
            engine.cleanup()
