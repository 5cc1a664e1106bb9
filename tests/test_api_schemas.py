"""Exhaustive pydantic schema tests — mirrors reference coverage
(``/root/reference/tests/test_api_schemas.py``, 407 LoC)."""

import pytest
from pydantic import ValidationError

from vietvoice_tts_tpu.api.schemas import (
    Area,
    Emotion,
    Gender,
    Group,
    HealthResponse,
    SynthesizeFileResponse,
    SynthesizeRequest,
)


class TestEnums:
    def test_gender_values(self):
        assert {g.value for g in Gender} == {"male", "female"}

    def test_group_values(self):
        assert {g.value for g in Group} == {
            "story", "news", "audiobook", "interview", "review",
        }

    def test_area_values(self):
        assert {a.value for a in Area} == {"northern", "southern", "central"}

    def test_emotion_values(self):
        assert {e.value for e in Emotion} == {
            "neutral", "serious", "monotone", "sad", "surprised", "happy", "angry",
        }

    def test_enums_are_str(self):
        assert Gender.FEMALE == "female"
        assert isinstance(Area.NORTHERN.value, str)

    def test_match_model_constants(self):
        from vietvoice_tts_tpu.config import (
            MODEL_AREA,
            MODEL_EMOTION,
            MODEL_GENDER,
            MODEL_GROUP,
        )

        assert {g.value for g in Gender} == set(MODEL_GENDER)
        assert {g.value for g in Group} == set(MODEL_GROUP)
        assert {a.value for a in Area} == set(MODEL_AREA)
        assert {e.value for e in Emotion} == set(MODEL_EMOTION)


class TestHealthResponse:
    def test_valid(self):
        h = HealthResponse(status="healthy", uptime=12)
        assert h.uptime == 12

    def test_status_literal(self):
        with pytest.raises(ValidationError):
            HealthResponse(status="sick", uptime=1)

    def test_uptime_required(self):
        with pytest.raises(ValidationError):
            HealthResponse(status="healthy")


class TestSynthesizeRequest:
    def test_minimal(self):
        r = SynthesizeRequest(text="xin chào")
        assert r.speed == 0.9
        assert r.output_format == "wav"
        assert r.gender is None
        assert r.sample_iteration is None

    def test_full(self):
        r = SynthesizeRequest(
            text="xin chào",
            speed=1.5,
            gender="male",
            group="news",
            area="central",
            emotion="happy",
            sample_iteration=3,
        )
        assert r.gender is Gender.MALE
        assert r.sample_iteration == 3

    def test_text_length_bounds(self):
        with pytest.raises(ValidationError):
            SynthesizeRequest(text="")
        SynthesizeRequest(text="x" * 1000)  # at the limit
        with pytest.raises(ValidationError):
            SynthesizeRequest(text="x" * 1001)

    def test_speed_bounds(self):
        SynthesizeRequest(text="t", speed=0.25)
        SynthesizeRequest(text="t", speed=2.0)
        for bad in (0.24, 2.01, -1.0):
            with pytest.raises(ValidationError):
                SynthesizeRequest(text="t", speed=bad)

    def test_output_format_literal(self):
        with pytest.raises(ValidationError):
            SynthesizeRequest(text="t", output_format="mp3")

    def test_bad_enum_values(self):
        for field, value in (
            ("gender", "robot"),
            ("group", "podcast"),
            ("area", "western"),
            ("emotion", "bored"),
        ):
            with pytest.raises(ValidationError):
                SynthesizeRequest(**{"text": "t", field: value})

    def test_sample_iteration_non_negative(self):
        SynthesizeRequest(text="t", sample_iteration=0)
        with pytest.raises(ValidationError):
            SynthesizeRequest(text="t", sample_iteration=-1)

    def test_missing_text(self):
        with pytest.raises(ValidationError):
            SynthesizeRequest()

    def test_json_round_trip(self):
        r = SynthesizeRequest(text="chu kỳ", gender="female", speed=1.1)
        r2 = SynthesizeRequest.model_validate_json(r.model_dump_json())
        assert r2 == r

    def test_unicode_text(self):
        r = SynthesizeRequest(text="đây là tiếng Việt có dấu: ế ỗ ự")
        assert "ế" in r.text


class TestSynthesizeFileResponse:
    def test_valid(self):
        r = SynthesizeFileResponse(
            download_url="/api/v1/download/abc123",
            duration_seconds=1.5,
            sample_rate=24000,
            format="wav",
            file_size_bytes=72044,
        )
        assert r.sample_rate == 24000

    def test_all_fields_required(self):
        with pytest.raises(ValidationError):
            SynthesizeFileResponse(download_url="/x")
