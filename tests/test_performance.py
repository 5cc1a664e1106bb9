"""Performance-surface tests — the reference's ``test_performance.py`` only
times a mocked engine; ours exercises the real timing/observability surface
on the tiny CPU model: stage timers, sequential batches, memory stability,
and config churn."""

from tests.conftest import tiny_config


class TestTimers:
    def test_stage_timer_accumulates(self, tiny_engine):
        tiny_engine.engine_core.timer.reset()
        tiny_engine.synthesize("Đo thời gian.")
        report = tiny_engine.engine_core.timer.report()
        assert "chunk_pipeline" in report
        assert report["chunk_pipeline"] > 0

    def test_generation_time_positive_and_sane(self, tiny_engine):
        _, t = tiny_engine.synthesize("Một câu.")
        assert 0 < t < 300


class TestSequentialLoad:
    def test_five_requests_no_degradation(self, tiny_engine):
        times = []
        for i in range(5):
            _, t = tiny_engine.synthesize(f"Yêu cầu tuần tự số {i}.")
            times.append(t)
        # After the first (compile) call, latency must be stable: the
        # slowest warm call within 10x of the fastest warm call.
        warm = times[1:]
        assert max(warm) < 10 * min(warm) + 0.1


class TestMemoryStability:
    def test_jit_cache_bounded_by_buckets(self, tiny_engine):
        core = tiny_engine.engine_core
        for text in ("Ngắn.", "Một câu dài hơn một chút nữa.", "Ba."):
            tiny_engine.synthesize(text)
        # Cache keys only come from (batch, bucket[, cond_cached])
        # combinations plus the bounded voice-conditioning helpers.
        buckets = set(tiny_engine.config.frame_buckets)
        for key in core._jit_cache:
            if key[0] == "cond_frontend":
                continue
            b, n = key[0], key[1]
            assert n in buckets
            assert 1 <= b <= tiny_engine.config.max_batch_size


class TestConfigChurn:
    def test_many_engine_configs(self, tiny_pack_dir):
        from vietvoice_tts_tpu.pipeline.engine import TTSEngine

        for speed in (0.5, 0.9, 1.5):
            engine = TTSEngine(tiny_config(model_cache_dir=tiny_pack_dir, speed=speed))
            wave, _ = engine.synthesize("Cấu hình.")
            assert wave.size > 0
            engine.cleanup()

    def test_speed_scales_duration(self, tiny_pack_dir):
        from vietvoice_tts_tpu.pipeline.engine import TTSEngine

        engine = TTSEngine(tiny_config(model_cache_dir=tiny_pack_dir))
        text = "Một câu có độ dài vừa phải để đo."
        slow, _ = engine.synthesize(text, speed=0.5)
        fast, _ = engine.synthesize(text, speed=2.0)
        assert len(slow) > len(fast)
