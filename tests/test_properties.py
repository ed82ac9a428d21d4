"""Property-based tests (hypothesis) for the numeric core.

These cover the custom math the engine depends on — t-digest quantiles,
MinHash Jaccard estimation, SimHash locality, SNR — independent of Spark
(pure numpy), so they run fast and explore the input space broadly.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_check_spark.functions.pcm import snr_db, synth_wave
from data_check_spark.operators import tdigest as td

floats = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@settings(max_examples=50, deadline=None)
@given(st.lists(floats, min_size=1, max_size=2000), st.sampled_from([0.1, 0.5, 0.9]))
def test_tdigest_quantile_accuracy(values, q):
    arr = np.array(values, dtype=np.float64)
    d = td.from_values(arr)
    got = td.quantile(d, q)
    lo, hi = float(np.min(arr)), float(np.max(arr))
    assert lo <= got <= hi
    # within ±1 order statistic of the true rank (quantile *definitions*
    # differ for tiny discrete samples; rank error is the meaningful bound)
    s = np.sort(arr)
    k = q * (len(s) - 1)
    lo_i = max(int(np.floor(k)) - 1, 0)
    hi_i = min(int(np.ceil(k)) + 1, len(s) - 1)
    assert s[lo_i] - 1e-9 <= got <= s[hi_i] + 1e-9


@settings(max_examples=30, deadline=None)
@given(
    st.lists(floats, min_size=1, max_size=500),
    st.lists(floats, min_size=1, max_size=500),
)
def test_tdigest_merge_bounds(a, b):
    da = td.from_values(np.array(a))
    db = td.from_values(np.array(b))
    merged = td.merge([da, db])
    allv = np.array(a + b)
    for q in (0.1, 0.5, 0.9):
        got = td.quantile(merged, q)
        assert float(np.min(allv)) - 1e-9 <= got <= float(np.max(allv)) + 1e-9


@settings(max_examples=30, deadline=None)
@given(st.lists(floats, min_size=2, max_size=800))
def test_tdigest_serialize_roundtrip(values):
    d = td.from_values(np.array(values))
    d2 = td.deserialize(td.serialize(d))
    for q in (0.25, 0.5, 0.75):
        assert abs(td.quantile(d, q) - td.quantile(d2, q)) < 1e-9


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / max(len(a | b), 1)


def _minhash(shingles: set, num_perm: int = 64) -> list[int]:
    # mirrors the Spark expression: min over shingles of hash(shingle, perm)
    import zlib

    return [
        min(zlib.crc32(f"{p}|{s}".encode()) for s in shingles) if shingles else 0
        for p in range(num_perm)
    ]


@settings(max_examples=40, deadline=None)
@given(
    st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=120),
    st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=120),
)
def test_minhash_estimate_tracks_jaccard(sa, sb):
    true = _jaccard(sa, sb)
    siga, sigb = _minhash(sa), _minhash(sb)
    est = sum(x == y for x, y in zip(siga, sigb)) / 64.0
    # identical sets estimate exactly; disjoint sets estimate near zero;
    # otherwise the 64-perm estimator stays within a generous band
    if true == 1.0:
        assert est == 1.0
    elif true == 0.0:
        assert est <= 0.15
    else:
        assert abs(est - true) <= 0.35


@settings(max_examples=25, deadline=None)
@given(
    st.text(alphabet="0123456789abcdef", min_size=16, max_size=16),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=1, max_value=2000),
)
def test_snr_identity_and_corruption(hex_id, sr, dur_ms):
    clip_id = f"clip_{hex_id}"
    w = synth_wave(clip_id, sr, dur_ms, cap_ms=50)
    if w.size == 0:
        return
    assert snr_db(w, w) == float("inf")
    rng = np.random.default_rng(42)
    noisy = np.clip(
        w.astype(np.int32) + rng.integers(-20000, 20000, w.size), -32768, 32767
    ).astype(np.int16)
    assert snr_db(w, noisy) < 30.0  # planted corruption must fail the gate
    assert snr_db(w, w[: w.size // 2]) == float("-inf")  # truncation


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=48000), st.integers(min_value=1, max_value=40000))
def test_synth_wave_length_contract(sr, dur_ms):
    w = synth_wave("clip_00000000000000aa", sr, dur_ms, cap_ms=100)
    assert w.dtype == np.int16
    assert w.size == int(sr * min(dur_ms, 100) / 1000)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(floats, min_size=2, max_size=1000),
    st.floats(min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False),
)
def test_wasserstein_shift_equivariance(values, c):
    """W1 between X and X+c is |c| (the drift metric's core property:
    a pure location shift scores exactly the shift size)."""
    arr = np.array(values, dtype=np.float64)
    a = td.from_values(arr)
    b = td.from_values(arr + c)
    tol = max(1e-6, abs(c) * 0.02) + 1e-9 * (np.max(np.abs(arr)) + 1)
    assert abs(td.wasserstein(a, b) - abs(c)) <= tol
    # symmetry + identity
    assert td.wasserstein(a, b) == td.wasserstein(b, a)
    assert td.wasserstein(a, a) == 0.0


@settings(max_examples=50, deadline=None)
@given(st.lists(floats, min_size=2, max_size=500), st.lists(floats, min_size=2, max_size=500))
def test_wasserstein_bounded_by_range(xs, ys):
    """W1 never exceeds the span of the combined support (sanity against
    interpolation blow-ups on degenerate/atom-heavy inputs)."""
    a = td.from_values(np.array(xs, dtype=np.float64))
    b = td.from_values(np.array(ys, dtype=np.float64))
    span = max(np.max(xs), np.max(ys)) - min(np.min(xs), np.min(ys))
    w = td.wasserstein(a, b)
    assert 0.0 <= w <= span + 1e-9


# ---------------------------------------------------------------------------
# Cross-engine parity properties for the rule-suggestion oracle's trickiest
# parts (queries.rule_suggestions_orders): the mask -> anchored-regex
# translation and the %.2f float rendering must agree byte-for-byte between
# Python (Spark side builds params driver-side) and DuckDB SQL.
# ---------------------------------------------------------------------------

_MASK_CHARS = "Aa9" + "()[]{}?*+-|^$\\.&~# " + "_:/@%'"


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=_MASK_CHARS, min_size=0, max_size=24))
def test_mask_to_regex_duckdb_parity(mask):
    import duckdb

    from data_check_spark.rules.suggest import _mask_to_regex

    py = _mask_to_regex(mask)
    sql_expr = (
        "array_to_string(list_transform(string_split(?, ''), c -> "
        "CASE WHEN c = 'A' THEN '[A-Z]' WHEN c = 'a' THEN '[a-z]' "
        "WHEN c = '9' THEN '[0-9]' "
        "WHEN c <> '' AND strpos('()[]{}?*+-|^$\\.&~# ', c) > 0 THEN '\\' || c "
        "ELSE c END), '')"
    )
    got = duckdb.connect().execute(f"SELECT {sql_expr}", [mask]).fetchone()[0]
    assert got == py, (mask, py, got)


@settings(max_examples=80, deadline=None)
@given(st.floats(min_value=-1e12, max_value=1e12,
                 allow_nan=False, allow_infinity=False))
def test_float_2f_rendering_duckdb_parity(v):
    import duckdb

    got = duckdb.connect().execute("SELECT printf('%.2f', ?::DOUBLE)", [v]).fetchone()[0]
    assert got == f"{v:.2f}", (v, got)
