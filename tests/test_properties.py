"""Property-based tests (hypothesis) for driver-side kernels — no Spark.

Mirrors the reference's determinism/edge-case coverage style with
generated inputs: t-digest invariants, sort_counts ordering contract,
state-artifact round-trips.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from torchestra_spark.operators.lookups import sort_counts
from torchestra_spark.state import StateArtifact
from torchestra_spark.tdigest import TDigest, digest_from_state, digest_to_state


@st.composite
def float_arrays(draw, min_size=1, max_size=500):
    n = draw(st.integers(min_size, max_size))
    return draw(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=n,
            max_size=n,
        )
    )


@settings(max_examples=30, deadline=None)
@given(float_arrays())
def test_tdigest_cdf_monotone_and_bounded(xs):
    td = TDigest(100.0)
    t = td.new_digest()
    td.add_values(t, np.array(xs))
    td.finalize(t)
    grid = np.linspace(min(xs) - 1, max(xs) + 1, 50)
    c = td.cdf(t, grid)
    assert np.all(c >= 0.0) and np.all(c <= 1.0)
    assert np.all(np.diff(c) >= -1e-12)  # non-decreasing
    assert td.cdf(t, np.array([min(xs) - 10]))[0] == 0.0
    assert td.cdf(t, np.array([max(xs) + 10]))[0] == 1.0


@settings(max_examples=30, deadline=None)
@given(float_arrays(min_size=2))
def test_tdigest_quantile_within_range(xs):
    td = TDigest(100.0)
    t = td.new_digest()
    td.add_values(t, np.array(xs))
    td.finalize(t)
    qs = td.quantile(t, np.array([0.0, 0.25, 0.5, 0.75, 1.0]))
    assert np.all(qs >= min(xs) - 1e-9) and np.all(qs <= max(xs) + 1e-9)
    assert np.all(np.diff(qs) >= -1e-9)


@settings(max_examples=30, deadline=None)
@given(float_arrays(min_size=50, max_size=400), st.integers(2, 6))
def test_tdigest_merge_close_to_single(xs, shards):
    xs = np.array(xs)
    td = TDigest(200.0)
    merged = td.new_digest()
    for part in np.array_split(xs, shards):
        if len(part) == 0:
            continue
        s = td.new_digest()
        td.add_values(s, part)
        td.merge_digests(merged, s)
    td.finalize(merged)
    med_est = td.quantile(merged, np.array([0.5]))[0]
    lo, hi = np.quantile(xs, [0.2, 0.8])
    assert lo - 1e-6 <= med_est <= hi + 1e-6


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(st.text(max_size=8), st.integers(0, 10_000), max_size=40))
def test_sort_counts_contract(counts):
    # count DESC, key ASC tiebreak; a permutation of the keys
    out = sort_counts(counts)
    assert sorted(out) == sorted(counts.keys())
    for a, b in zip(out, out[1:]):
        assert counts[a] > counts[b] or (counts[a] == counts[b] and a < b)


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(
        st.text(min_size=1, max_size=10),
        st.dictionaries(
            st.text(min_size=1, max_size=10),
            st.one_of(
                st.floats(allow_nan=False),
                st.integers(-(2**53), 2**53),
                st.text(max_size=20),
                st.lists(st.floats(allow_nan=False), max_size=5),
            ),
            max_size=5,
        ),
        max_size=5,
    )
)
def test_state_artifact_roundtrip(states):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/s.json"
        StateArtifact(states).save(path)
        back = StateArtifact.load(path).states
    assert back == states


def test_state_artifact_inf_nan(tmp_path):
    path = str(tmp_path / "s.json")
    s = {"op": {"a": math.inf, "b": -math.inf, "c": 1.5, "d": 5e-324}}
    StateArtifact(s).save(path)
    back = StateArtifact.load(path).states
    assert back["op"]["a"] == math.inf and back["op"]["b"] == -math.inf
    assert back["op"]["c"] == 1.5 and back["op"]["d"] == 5e-324


def test_tdigest_nan_filtered_by_sketch_op():
    from torchestra_spark.operators.scalers import TDigestDistribution

    op = TDigestDistribution(compression=100)
    d = op.partial_sketch(np.array([1.0, np.nan, 2.0, np.nan, 3.0]))
    assert d.processed_weight + d.unprocessed_weight == 3.0


# ------------------------------------------------------------- winnowing
def _py_winnow(tokens, k, w):
    """Pure-python mirror of winnow_fingerprints' modular arithmetic
    (validated token-for-token against the Spark expression in
    tests/test_text_dedup.py::test_winnow_guarantee_and_pure_python_parity)."""
    from torchestra_spark.functions.text import WINNOW_MOD as M, WINNOW_PRIME as P

    hs = []
    for tok in tokens:
        acc = 0
        for ch in tok:
            acc = (acc * 31 + ord(ch)) % M
        hs.append(acc)
    if len(hs) < k:
        return set()
    gs = []
    for i in range(len(hs) - k + 1):
        g = hs[i]
        for h in hs[i + 1 : i + k]:
            g = (g * P + h) % M
        gs.append(g)
    return {min(gs[i : i + w]) for i in range(max(len(gs) - w + 1, 1))}


_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=4)


@given(
    pre_a=st.lists(_tok, max_size=20),
    suf_a=st.lists(_tok, max_size=20),
    pre_b=st.lists(_tok, max_size=20),
    suf_b=st.lists(_tok, max_size=20),
    shared=st.lists(_tok, min_size=6, max_size=15),  # >= w+k-1 = 6
    k_w=st.tuples(st.integers(2, 4), st.integers(2, 5)),
)
@settings(max_examples=200, deadline=None)
def test_winnow_shared_run_guarantee(pre_a, suf_a, pre_b, suf_b, shared, k_w):
    # Schleimer et al. thm: docs sharing a run of >= w+k-1 consecutive
    # tokens share at least one winnowed fingerprint
    k, w = k_w
    if len(shared) < w + k - 1:
        shared = shared + ["pad"] * (w + k - 1 - len(shared))
    fa = _py_winnow(pre_a + shared + suf_a, k, w)
    fb = _py_winnow(pre_b + shared + suf_b, k, w)
    assert fa & fb


# ------------------------------------------------------- codec properties
@given(
    h=st.integers(1, 6),
    w=st.integers(1, 6),
    c=st.sampled_from([1, 2, 3, 4]),
    filters=st.lists(st.integers(0, 4), min_size=6, max_size=6),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_png_unfilter_roundtrip_property(h, w, c, filters, seed):
    """Any shape × color type × per-row filter combination unfilters
    back to the exact pixels (drives the Sub/Up/Average/Paeth
    recurrences through degenerate 1-pixel rows and columns)."""
    from tests.test_text_dedup import _png_with_filters
    from torchestra_spark.functions import multimodal as M

    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, c), dtype=np.uint8)
    got = M.decode_png_pixels(_png_with_filters(px, filters[:h]))
    exp = {1: np.repeat(px, 3, 2), 2: np.repeat(px[..., :1], 3, 2),
           4: px[..., :3], 3: px}[c]
    assert np.array_equal(got, exp)


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    mode=st.sampled_from(["plain", "gray", "420", "rst"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_decode_total_property(h, w, mode, seed):
    """encode_jpeg -> decode_jpeg_pixels is total over arbitrary shapes
    and modes: right output shape, and smooth (constant) content stays
    within the quantization bound."""
    from torchestra_spark.functions import jpeg as J

    v = seed % 256
    px = np.full((h, w, 3), v, dtype=np.uint8)
    kw = dict(plain={}, gray=dict(gray=True), **{"420": dict(subsample=True)},
              rst=dict(restart_interval=2))[mode]
    dec = J.decode_jpeg_pixels(J.encode_jpeg(px, **kw))
    assert dec.shape == (h, w, 3)
    if mode != "gray":  # gray drops chroma, compare luminance-ish only
        assert np.abs(dec.astype(int) - int(v)).max() <= 4
    else:
        # Rec.601 luminance of a gray-equal RGB is the value itself
        assert np.abs(dec[..., 0].astype(int) - int(v)).max() <= 4


def test_jpeg_no_trailing_restart_marker():
    """ADVICE r7: when the MCU count is an exact multiple of
    restart_interval, the encoder must NOT emit an RSTn after the final
    MCU (a nonconformant stream for strict external decoders).  16x16
    gray = 4 MCUs at interval 2; 16x8 = 2 MCUs at interval 2."""
    from torchestra_spark.functions import jpeg as J

    for h, w in ((16, 16), (8, 16), (16, 8)):
        px = np.full((h, w, 3), 128, dtype=np.uint8)
        data = J.encode_jpeg(px, gray=True, restart_interval=2)
        assert data.endswith(b"\xff\xd9")
        body = data[:-2]
        # the entropy stream may end with pad bits, never a full RSTn
        assert not (len(body) >= 2 and body[-2] == 0xFF and 0xD0 <= body[-1] <= 0xD7), (
            h, w, body[-4:].hex(),
        )
        # and it still decodes to the same content
        dec = J.decode_jpeg_pixels(data)
        assert np.abs(dec[..., 0].astype(int) - 128).max() <= 4


def test_jpeg_truncated_bitstream_raises_value_error():
    """ADVICE r7: aligning to a marker on data that contains none must
    raise a descriptive ValueError, not a bare IndexError."""
    import pytest

    from torchestra_spark.functions import jpeg as J

    br = J._BitReader(b"\x12\x34\x56", 0)
    with pytest.raises(ValueError, match="truncated"):
        br.align_to_marker()


@given(
    n=st.integers(1, 6),
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    every=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_avi_roundtrip_property(n, h, w, every, seed):
    """Uncompressed AVI roundtrips bit-exactly for any frame count /
    shape (incl. rows needing 4-byte padding), and every_n sampling
    returns exactly frames[::every_n]."""
    from torchestra_spark.functions import video as V

    frames = np.random.RandomState(seed).randint(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    idx, dec = V.decode_avi_frames(V.encode_avi(frames), every_n=every)
    assert idx.tolist() == list(range(0, n, every))
    assert np.array_equal(dec, frames[::every])
