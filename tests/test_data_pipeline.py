"""Training data pipeline + end-to-end training loop tests (tiny, CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import tiny_config
from vietvoice_tts_tpu.training.data import (
    TextMelDataset,
    load_manifest,
    manifest_from_pack,
)


@pytest.fixture
def pack(tiny_pack_dir):
    return Path(tiny_pack_dir) / "vietvoice-tpu-v1"


class TestManifest:
    def test_from_pack(self, pack):
        records = manifest_from_pack(pack)
        assert len(records) == 42
        assert Path(records[0]["audio"]).exists()
        assert records[0]["text"]

    def test_jsonl_round_trip(self, pack, temp_dir):
        records = manifest_from_pack(pack)[:3]
        path = f"{temp_dir}/m.jsonl"
        with open(path, "w", encoding="utf-8") as fh:
            for r in records:
                fh.write(json.dumps(r, ensure_ascii=False) + "\n")
        back = load_manifest(path)
        assert back == records

    def test_malformed_record_rejected(self, temp_dir):
        path = f"{temp_dir}/bad.jsonl"
        Path(path).write_text('{"audio": "x.wav"}\n')
        with pytest.raises(ValueError):
            load_manifest(path)


class TestDataset:
    def test_batches_have_contract_shapes(self, pack, tiny_pack_dir):
        cfg = tiny_config(model_cache_dir=tiny_pack_dir)
        ds = TextMelDataset(
            manifest_from_pack(pack)[:6], cfg, pack / "vocab.txt", batch_size=4
        )
        batches = list(ds)
        assert batches
        for mel, text_ids, lengths in batches:
            b, n, m = mel.shape
            assert m == cfg.n_mels
            assert n in cfg.frame_buckets
            assert text_ids.shape == (b, n)
            assert lengths.shape == (b,)
            assert (lengths > 0).all()
            assert (lengths <= n).all()

    def test_deterministic_order(self, pack, tiny_pack_dir):
        cfg = tiny_config(model_cache_dir=tiny_pack_dir)
        records = manifest_from_pack(pack)[:6]
        a = [m.sum() for m, _, _ in TextMelDataset(records, cfg, pack / "vocab.txt", shuffle_seed=1)]
        b = [m.sum() for m, _, _ in TextMelDataset(records, cfg, pack / "vocab.txt", shuffle_seed=1)]
        np.testing.assert_allclose(a, b)


class TestTrainLoop:
    def test_short_training_run_and_resume(self, tiny_pack_dir, temp_dir):
        from vietvoice_tts_tpu.training.loop import TrainRunConfig, train
        from vietvoice_tts_tpu.training.train import TrainConfig

        cfg = tiny_config(model_cache_dir=tiny_pack_dir)
        run = TrainRunConfig(
            steps=3,
            batch_size=2,
            checkpoint_dir=f"{temp_dir}/ckpt",
            checkpoint_every=1,
            log_every=1,
            export_to_pack=False,
        )
        summary = train(
            model_config=cfg,
            train_config=TrainConfig(warmup_steps=1),
            run_config=run,
        )
        assert summary["final_step"] == 3
        assert np.isfinite(summary["final_loss"])
        # Resume: continue to step 5 from the step-3 checkpoint.
        run2 = TrainRunConfig(
            steps=5,
            batch_size=2,
            checkpoint_dir=f"{temp_dir}/ckpt",
            checkpoint_every=1,
            log_every=1,
            export_to_pack=False,
        )
        summary2 = train(
            model_config=cfg,
            train_config=TrainConfig(warmup_steps=1),
            run_config=run2,
        )
        assert summary2["final_step"] == 5
