"""Property-based tests (hypothesis) for the pure-Python kernels whose
correctness the Spark operators lean on: container codecs and fusion
arithmetic. Spark-free — these run in milliseconds and explore input
shapes the example-based tests cannot enumerate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sfcrimedatapipeline_spark.operators import multimodal as mm


@settings(max_examples=200, deadline=None)
@given(
    width=st.integers(0, 40),
    height=st.integers(0, 40),
    data=st.data(),
)
def test_pgm_roundtrip_any_geometry(width, height, data):
    """parse(encode(pixels)) == pixels for EVERY geometry, including
    degenerate 0-width/0-height rasters."""
    pixels = data.draw(
        st.lists(st.integers(0, 255), min_size=width * height, max_size=width * height)
    )
    buf = f"P5\n{width} {height}\n255\n".encode() + bytes(pixels)
    got = mm._parse_pgm(buf)
    assert got is not None and got.tolist() == pixels


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(max_size=256))
def test_decode_image_never_raises_and_bytes_is_total(payload):
    """Arbitrary bytes — including truncated container magics (and
    truncated P5 headers, which previously spun forever — round-5
    review) — must decode via SOME branch, never raise; the bytes
    method is always the identity on length."""
    auto = mm._decode_image(payload)
    raw = mm._decode_image(payload, "bytes")
    assert raw.size == len(payload)
    assert auto is not None and auto.size >= 0


@settings(max_examples=100, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=64),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_int16(samples, rate):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    got, got_rate, ch = mm._decode_audio(buf.getvalue(), fallback_rate=123)
    assert got_rate == rate and ch == 1
    assert got.tolist() == samples


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(max_size=128))
def test_decode_audio_never_raises(payload):
    got, rate, ch = mm._decode_audio(payload, fallback_rate=16000)
    assert rate > 0 and ch >= 1 and got.size <= max(len(payload), 1)


@settings(max_examples=200, deadline=None)
@given(suffix=st.binary(max_size=64))
def test_pgm_truncated_headers_terminate(suffix):
    """Every P5-prefixed byte string must PARSE OR REJECT in finite
    time — the unbounded field scan hung on b'P5 3' (round-5 review)."""
    out = mm._parse_pgm(b"P5" + suffix)
    assert out is None or out.size >= 0
