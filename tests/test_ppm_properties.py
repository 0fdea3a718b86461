"""Property tests for the dependency-free PPM codec (functions/ppm.py).

The codec feeds the certified ``multimodal_ppm_decode`` entry, so its
invariants get the same hypothesis treatment as the mini-language parser:
encode/decode roundtrip identity over arbitrary dims and payload bytes,
header tolerance over the full netpbm whitespace/comment grammar, and the
box-mean resize against an independent numpy model.
"""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")

from hypothesis import given, settings
from hypothesis import strategies as st

from simple_query_engine_spark.functions.ppm import (
    decode_ppm,
    encode_ppm,
    resize_ppm,
)

dims = st.integers(min_value=1, max_value=24)


@settings(max_examples=200, deadline=None)
@given(w=dims, h=dims, data=st.data())
def test_encode_decode_roundtrip_identity(w, h, data):
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


# The netpbm header grammar: any whitespace run between tokens, '#'
# comments (to end-of-line) legal anywhere between tokens, and exactly ONE
# whitespace byte after maxval before the raster.
_ws = st.text(alphabet=" \t\n\r", min_size=1, max_size=4).map(str.encode)
_comment = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="\n", exclude_categories=("Cc",)
    ),
    max_size=10,
).map(lambda s: b"#" + s.encode() + b"\n")


def _sep(data):
    """One token separator: whitespace, optionally interleaved comments."""
    parts = [data.draw(_ws)]
    for _ in range(data.draw(st.integers(0, 2))):
        parts.append(data.draw(_comment))
        parts.append(data.draw(_ws))
    return b"".join(parts)


@settings(max_examples=200, deadline=None)
@given(w=dims, h=dims, data=st.data())
def test_header_whitespace_and_comments_tolerated(w, h, data):
    rgb = bytes((i * 7) % 256 for i in range(w * h * 3))
    payload = (
        b"P6"
        + _sep(data)
        + str(w).encode()
        + _sep(data)
        + str(h).encode()
        + _sep(data)
        + b"255"
        + data.draw(st.sampled_from([b"\n", b" ", b"\t", b"\r"]))
        + rgb
    )
    assert decode_ppm(payload) == (w, h, rgb)


@settings(max_examples=100, deadline=None)
@given(
    side=st.integers(1, 4),
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    data=st.data(),
)
def test_resize_matches_numpy_box_mean_model(side, bh, bw, data):
    import numpy as np

    w, h = side * bw, side * bh
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    out = resize_ppm(encode_ppm(w, h, rgb), side)
    ow, oh, orgb = decode_ppm(out)
    assert (ow, oh) == (side, side)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
    want = np.empty((side, side, 3), dtype=np.int64)
    for r in range(side):
        for c in range(side):
            cell = px[r * bh : (r + 1) * bh, c * bw : (c + 1) * bw]
            want[r, c] = cell.sum(axis=(0, 1)) // (bh * bw)
    got = np.frombuffer(orgb, dtype=np.uint8).reshape(side, side, 3)
    assert (got == want).all()


@settings(max_examples=100, deadline=None)
@given(w=dims, h=dims, cut=st.integers(0, 200))
def test_truncated_raster_always_rejected(w, h, cut):
    rgb = bytes((i * 13) % 256 for i in range(w * h * 3))
    payload = encode_ppm(w, h, rgb)
    short = payload[: len(payload) - min(cut + 1, w * h * 3)]
    with pytest.raises(ValueError):
        decode_ppm(short)
