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


# --- round-5 continuation kernels ------------------------------------

from sfcrimedatapipeline_spark.operators import geo
from sfcrimedatapipeline_spark.operators.textstats import BM25_IDF_SCALE


def _bm25_contrib(tf: int, df: int, dl: int, n_docs: int, t_tokens: int) -> int:
    """Pure-Python replica of the exact-rational BM25 contribution (the
    formula both engines execute; parity is the gate's job — these
    tests pin the SEMANTICS of the shared formula)."""
    idf_q = (BM25_IDF_SCALE * (2 * (n_docs - df) + 1)) // (2 * df + 1)
    num = idf_q * 22 * tf * t_tokens
    den = 10 * tf * t_tokens + 3 * t_tokens + 9 * dl * n_docs
    return num // den


@settings(max_examples=300, deadline=None)
@given(
    tf=st.integers(1, 50),
    df=st.integers(1, 99),
    dl=st.integers(1, 500),
    n_docs=st.integers(100, 10_000),
)
def test_bm25_contribution_monotonicities(tf, df, dl, n_docs):
    t_tokens = n_docs * 60
    base = _bm25_contrib(tf, df, dl, n_docs, t_tokens)
    assert base >= 0
    # more occurrences never lower the score
    assert _bm25_contrib(tf + 1, df, dl, n_docs, t_tokens) >= base
    # a rarer term never scores lower at equal tf/dl
    if df > 1:
        assert _bm25_contrib(tf, df - 1, dl, n_docs, t_tokens) >= base
    # a longer document never scores higher for the same tf
    assert _bm25_contrib(tf, df, dl + 50, n_docs, t_tokens) <= base


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(1, 500),
    rk=st.integers(1, 500),
    frac_bp=st.integers(0, 10_000),
)
def test_top_fraction_integer_cut_equals_percent_rank_rule(n, rk, frac_bp):
    """The integer cut (rk-1)*10000 <= frac_bp*(n-1) must decide
    exactly like percent_rank <= frac for any frac expressible in
    basis points — the reason the operator never materializes the
    float."""
    if rk > n:
        return
    import fractions

    keep_int = (rk - 1) * 10_000 <= frac_bp * (n - 1)
    if n == 1:
        assert keep_int  # singleton groups always keep their row
        return
    pct = fractions.Fraction(rk - 1, n - 1)
    keep_exact = pct <= fractions.Fraction(frac_bp, 10_000)
    assert keep_int == keep_exact


@settings(max_examples=300, deadline=None)
@given(
    lat1=st.integers(3_770_000, 3_783_000),
    lat2=st.integers(3_770_000, 3_783_000),
    lon1=st.integers(-12_251_000, -12_236_000),
    lon2=st.integers(-12_251_000, -12_236_000),
    radius_m=st.integers(5, 500),
)
def test_grid_blocking_never_separates_close_pairs(lat1, lat2, lon1, lon2, radius_m):
    """Any pair within the radius must land in adjacent (±1) cells on
    both axes — the invariant that makes the 3x3 neighborhood join
    complete (the brute-force oracle checks it empirically; this
    proves it over the whole coordinate space)."""
    lat_units = -(-radius_m * geo.UNIT_PER_DEG // geo.LAT_W)
    lon_units = -(-radius_m * geo.UNIT_PER_DEG // geo.LON_W)
    d2 = ((lat1 - lat2) * geo.LAT_W) ** 2 + ((lon1 - lon2) * geo.LON_W) ** 2
    if d2 > (radius_m * geo.UNIT_PER_DEG) ** 2:
        return  # not a qualifying pair
    cx1, cx2 = lat1 // lat_units, lat2 // lat_units
    cy1 = (lon1 + geo.LON_SHIFT) // lon_units
    cy2 = (lon2 + geo.LON_SHIFT) // lon_units
    assert abs(cx1 - cx2) <= 1 and abs(cy1 - cy2) <= 1
