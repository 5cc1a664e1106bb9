"""C++ audio DSP library tests: build on demand, numerically match the numpy
reference path within 1 LSB."""

import numpy as np
import pytest

from vietvoice_tts_tpu.native import audio_native
from vietvoice_tts_tpu.native.build import build
from vietvoice_tts_tpu.pipeline.audio import AudioProcessor


@pytest.fixture(scope="module")
def native():
    if not audio_native.available() and not build(verbose=False):
        pytest.skip("no C++ toolchain available")
    assert audio_native.available()
    return audio_native


def _numpy_crossfade(waves, dur, sr):
    """The numpy path, with the native hook disabled."""
    import vietvoice_tts_tpu.pipeline.audio as pa

    orig = pa._native_dsp
    pa._native_dsp = lambda: None
    try:
        return AudioProcessor.concatenate_with_crossfade_improved(waves, dur, sr)
    finally:
        pa._native_dsp = orig


class TestNativeCrossfade:
    def _waves(self, n, length=24000, seed=0):
        rng = np.random.default_rng(seed)
        return [
            (rng.uniform(-0.4, 0.4, length) * 32767).astype(np.int16)
            for _ in range(n)
        ]

    def test_matches_numpy_within_1_lsb(self, native):
        waves = self._waves(4)
        nat = native.crossfade_concat(waves, 0.1, 24000)
        ref = _numpy_crossfade(waves, 0.1, 24000)
        assert len(nat) == len(ref)
        assert np.abs(nat.astype(np.int32) - ref.astype(np.int32)).max() <= 1

    def test_single_wave(self, native):
        waves = self._waves(1)
        nat = native.crossfade_concat(waves, 0.1, 24000)
        np.testing.assert_array_equal(nat, waves[0])

    def test_clipped_input_rescaled(self, native):
        w = np.full(24000, 32767, np.int16)
        nat = native.crossfade_concat([w, self._waves(1)[0]], 0.1, 24000)
        assert np.abs(nat[:1000].astype(np.int32)).max() <= 26215

    def test_quiet_overlap_skips_rms_matching(self, native):
        quiet = np.zeros(24000, np.int16)
        waves = [quiet, self._waves(1)[0]]
        nat = native.crossfade_concat(waves, 0.1, 24000)
        ref = _numpy_crossfade(waves, 0.1, 24000)
        assert np.abs(nat.astype(np.int32) - ref.astype(np.int32)).max() <= 1

    def test_engine_path_uses_native(self, native):
        """AudioProcessor dispatches to the native lib when built."""
        waves = self._waves(3, seed=1)
        out = AudioProcessor.concatenate_with_crossfade_improved(waves, 0.05, 24000)
        ref = _numpy_crossfade(waves, 0.05, 24000)
        assert np.abs(out.astype(np.int32) - ref.astype(np.int32)).max() <= 1
