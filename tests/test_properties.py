"""Property→token mapping parity tests (reference src/properties_util.rs)."""

from rwkv_tts_tpu.constants import TTS_SPECIAL_TOKEN_OFFSET as OFF
from rwkv_tts_tpu.tokenizer.properties import (
    classify_age,
    classify_pitch,
    classify_speed,
    convert_properties_to_tokens,
    convert_standard_properties_to_tokens,
)


def test_standard_conversion_order_and_values():
    # order: offset, age, gender, emotion, pitch, speed (properties_util.rs:90-97)
    toks = convert_standard_properties_to_tokens(
        "middle-aged", "male", "HAPPY", "high_pitch", "fast"
    )
    assert toks == [OFF, OFF + 16, OFF + 47, OFF + 24, OFF + 8, OFF + 4]


def test_defaults_on_unknown():
    toks = convert_standard_properties_to_tokens("?", "?", "?", "?", "?")
    assert toks == [OFF, OFF + 15, OFF + 46, OFF + 26, OFF + 7, OFF + 3]


def test_case_insensitive():
    a = convert_standard_properties_to_tokens(
        "CHILD", "FEMALE", "happy", "LOW_PITCH", "Very_Fast"
    )
    b = convert_standard_properties_to_tokens(
        "child", "female", "HAPPY", "low_pitch", "very_fast"
    )
    assert a == b


def test_classify_speed_boundaries():
    # properties_util.rs:263-275
    assert classify_speed(3.5) == "very_slow"
    assert classify_speed(3.6) == "slow"
    assert classify_speed(4.0) == "medium"
    assert classify_speed(4.5) == "medium"
    assert classify_speed(4.6) == "fast"
    assert classify_speed(5.0) == "fast"
    assert classify_speed(5.1) == "very_fast"


def test_classify_age_boundaries():
    assert classify_age(12) == "child"
    assert classify_age(13) == "teenager"
    assert classify_age(19) == "teenager"
    assert classify_age(20) == "youth-adult"
    assert classify_age(39) == "youth-adult"
    assert classify_age(40) == "middle-aged"
    assert classify_age(64) == "middle-aged"
    assert classify_age(65) == "elderly"


def test_classify_pitch_female_adult():
    # properties_util.rs:136-146 (female youth-adult: 191/211/232)
    assert classify_pitch(190.0, "female", 25) == "low_pitch"
    assert classify_pitch(191.0, "female", 25) == "medium_pitch"
    assert classify_pitch(211.0, "female", 25) == "high_pitch"
    assert classify_pitch(232.0, "female", 25) == "very_high_pitch"


def test_classify_pitch_female_child_has_three_tiers():
    # female child never yields very_high (properties_util.rs:116-124)
    assert classify_pitch(1000.0, "female", 8) == "high_pitch"


def test_classify_pitch_male_defaults():
    # male child falls to the default male table 114/130/151
    assert classify_pitch(100.0, "male", 8) == "low_pitch"
    assert classify_pitch(120.0, "male", 8) == "medium_pitch"
    assert classify_pitch(140.0, "male", 8) == "high_pitch"
    assert classify_pitch(160.0, "male", 8) == "very_high_pitch"


def test_classify_pitch_unknown_gender():
    assert classify_pitch(100.0, "", 30) == "low_pitch"
    assert classify_pitch(150.0, "", 30) == "medium_pitch"
    assert classify_pitch(200.0, "", 30) == "high_pitch"
    assert classify_pitch(250.0, "", 30) == "very_high_pitch"


def test_numeric_conversion_end_to_end():
    toks = convert_properties_to_tokens(4.2, 120.0, 30, "male", "NEUTRAL")
    # age 30 → youth-adult(15); male(47); NEUTRAL(22);
    # male youth-adult pitch 120 → medium(7); speed 4.2 → medium(3)
    assert toks == [OFF, OFF + 15, OFF + 47, OFF + 22, OFF + 7, OFF + 3]
