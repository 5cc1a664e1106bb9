"""Checkpoint/resume (orbax) and ONNX-asset conversion tests."""

import json
import tarfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietvoice_tts_tpu.models.convert import extract_assets, load_onnx_initializers
from vietvoice_tts_tpu.models.dit import DiTConfig, init_dit_params
from vietvoice_tts_tpu.training.checkpoint import CheckpointManager
from vietvoice_tts_tpu.training.train import TrainConfig, init_train_state

CFG = DiTConfig(
    dim=32, depth=1, heads=2, n_mels=8, text_dim=16, text_conv_layers=1,
    vocab_size=16, compute_dtype=jnp.float32,
)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, temp_dir):
        params = init_dit_params(0, CFG)
        opt_state = init_train_state(params, TrainConfig())
        mgr = CheckpointManager(temp_dir, save_interval_steps=1)
        assert mgr.save(0, params, opt_state, force=True)
        mgr.manager.wait_until_finished()
        p2, o2, step = mgr.restore()
        assert step == 0
        np.testing.assert_array_equal(
            np.asarray(params["input_proj"]["w"]), np.asarray(p2["input_proj"]["w"])
        )
        mgr.close()

    def test_latest_step_tracking(self, temp_dir):
        params = init_dit_params(0, CFG)
        opt_state = init_train_state(params, TrainConfig())
        mgr = CheckpointManager(temp_dir, save_interval_steps=1)
        mgr.save(0, params, opt_state, force=True)
        mgr.save(5, params, opt_state, force=True)
        mgr.manager.wait_until_finished()
        assert mgr.latest_step() == 5
        mgr.close()

    def test_restore_empty_raises(self, temp_dir):
        mgr = CheckpointManager(temp_dir)
        with pytest.raises(FileNotFoundError):
            mgr.restore()
        mgr.close()

    def test_export_for_inference(self, temp_dir):
        from vietvoice_tts_tpu.runtime.serialization import load_params

        params = init_dit_params(0, CFG)
        mgr = CheckpointManager(temp_dir)
        mgr.export_for_inference(params, temp_dir)
        back = load_params(Path(temp_dir) / "params.msgpack")
        np.testing.assert_array_equal(
            np.asarray(params["final_proj"]["w"]), back["final_proj"]["w"]
        )
        mgr.close()


class TestConvert:
    def _make_tarball(self, temp_dir) -> Path:
        """Synthetic reference-layout tarball (model.py:73-123 layout)."""
        root = Path(temp_dir)
        (root / "cleaned_audios").mkdir()
        (root / "vocab.txt").write_text("a\nb\nc\n")
        (root / "audio_metadata.json").write_text(
            json.dumps([{"file_name": "x.wav", "gender": "female", "group":
                         "news", "area": "northern", "emotion": "neutral",
                         "text": "xin chào"}])
        )
        (root / "cleaned_audios" / "x.wav").write_bytes(b"RIFFfake")
        tar_path = root / "model-bin.pt"
        with tarfile.open(tar_path, "w") as tar:
            for name in ("vocab.txt", "audio_metadata.json", "cleaned_audios/x.wav"):
                tar.add(root / name, arcname=name)
        return tar_path

    def test_extract_assets(self, temp_dir):
        tar_path = self._make_tarball(temp_dir)
        pack = Path(temp_dir) / "pack"
        found = extract_assets(tar_path, pack)
        assert found["vocab"] and found["metadata"] and found["audios"] == 1
        assert (pack / "vocab.txt").read_text() == "a\nb\nc\n"
        assert (pack / "audios" / "x.wav").exists()

    def test_graph_load_requires_onnx(self, temp_dir):
        tar_path = self._make_tarball(temp_dir)
        try:
            import onnx  # noqa: F401

            pytest.skip("onnx installed; gate not exercised")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="onnx"):
            load_onnx_initializers(tar_path)
