"""Property-based tests (hypothesis) for the parity-critical pure functions —
the layer-1 unit tests of SURVEY.md §5 strengthened with generated inputs."""

from __future__ import annotations

import hashlib
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from drive_health_etl_spark.functions.phone import normalize_phone_py, process_payload_py


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_phone_normalizer_total_and_shaped(s):
    """Never raises; output is None or '+' + 8..15 digits."""
    out = normalize_phone_py(s)
    if out is not None:
        assert out.startswith("+")
        digits = out[1:]
        assert digits.isdigit() and 8 <= len(digits) <= 16


@given(
    st.dictionaries(
        st.sampled_from(["call_id", "caller", "callee", "duration", "nested", "x"]),
        st.one_of(
            st.text(max_size=20),
            st.integers(),
            st.none(),
            st.dictionaries(st.text(max_size=5), st.integers(), max_size=3),
        ),
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_process_payload_preserves_non_phone_fields(payload):
    out = process_payload_py(json.dumps(payload))
    obj = json.loads(out)
    for k, v in payload.items():
        if k not in ("caller", "callee"):
            assert obj[k] == v
    assert set(obj) == set(payload)


@given(st.text(min_size=1, max_size=64), st.floats(min_value=0.01, max_value=0.99))
@settings(max_examples=200, deadline=None)
def test_sampling_reference_algorithm_deterministic(key, rate):
    """The reference algorithm (src/sampling.js:15-24) is a pure function of
    (key, rate); the Spark expression's bit-exactness vs this is asserted in
    test_functions.py — here we pin the reference implementation itself."""
    h = hashlib.sha256(key.encode()).hexdigest()
    ratio = int(h[:8], 16) / 0xFFFFFFFF
    assert 0.0 <= ratio <= 1.0
    assert (ratio < rate) == (int(h[:8], 16) < rate * 0xFFFFFFFF)


# --- generated-input invariants for the windowed operators ------------------
# Few examples (each builds a DataFrame on the shared session), but every
# example exercises the tie-breaking and ordering contracts with adversarial
# generated timelines — duplicate timestamps included on purpose.

_ts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # coarse ts -> forced ties
        st.integers(min_value=0, max_value=3),   # user/key
        st.sampled_from(["click", "purchase", "error"]),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)


@given(_ts_strategy)
@settings(max_examples=12, deadline=None)
def test_cdc_apply_matches_reference_lww(rows):
    """Spark last-writer-wins + delete materialization == a sequential
    reference fold, for any timeline including ts ties (event_id breaks)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tests.conftest import get_shared_spark

    spark = get_shared_spark()
    data = [
        (i, key, f"2026-01-01 00:00:{ts:02d}", etype, val)
        for i, (ts, key, etype, val) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    got = {
        r["user_id"]: r["value"]
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .collect()
    }
    # reference: sort by (ts, event_id), fold; delete removes the key
    ref: dict[int, float] = {}
    for i, (ts, key, etype, val) in sorted(enumerate(rows), key=lambda p: (p[1][0], p[0])):
        if etype == "error":
            ref.pop(key, None)
        else:
            ref[key] = val
    # Spark keeps a key only if its LAST op is an upsert; the reference fold
    # is equivalent because a later delete pops and a later upsert rewrites.
    assert got == ref


@given(_ts_strategy)
@settings(max_examples=12, deadline=None)
def test_interval_concurrency_matches_reference_sweep(rows):
    """Spark +1/-1 running-sum max == a sequential sweep with the same
    ends-before-starts tie rule, for generated timelines with ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tests.conftest import get_shared_spark

    HOLD = 5  # seconds, to keep the generated timeline overlapping

    spark = get_shared_spark()
    data = [
        (i, f"2026-01-01 00:00:{ts:02d}") for i, (ts, _k, _e, _v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    pts = df.select(F.col("ts").alias("t"), F.lit(1).alias("delta")).unionAll(
        df.select((F.col("ts") + F.expr(f"INTERVAL {HOLD} SECONDS")).alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy(F.lit(0)).orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    got = pts.select(F.sum("delta").over(w).alias("cur")).agg(F.max("cur")).collect()[0][0]

    evs = sorted(
        [(ts, 1) for ts, _k, _e, _v in rows] + [(ts + HOLD, -1) for ts, _k, _e, _v in rows]
    )  # tuple sort = (t, delta): -1 before +1 at the same instant
    cur = best = 0
    for _t, d in evs:
        cur += d
        best = max(best, cur)
    assert got == best


_merge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # key -> forced overlaps
        st.sampled_from(["U", "D", "I"]),
        st.floats(min_value=-50, max_value=50, allow_nan=False),
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],  # MERGE source: one op per key (ANSI constraint)
)


@given(
    st.sets(st.integers(min_value=0, max_value=15), max_size=12),
    _merge_strategy,
)
@settings(max_examples=10, deadline=None)
def test_merge_into_matches_reference_semantics(target_keys, ops):
    """merge_into == the dictionary reference of ANSI MERGE for any target
    key set and any one-op-per-key source: matched+U updates, matched+D
    deletes, unmatched+I inserts, everything else no-ops."""
    from drive_health_etl_spark.operators.snapshots import merge_into
    from tests.conftest import get_shared_spark

    spark = get_shared_spark()
    target = spark.createDataFrame(
        [(k, float(k) * 10) for k in sorted(target_keys)] or [(None, None)],
        "k long, v double",
    )
    if not target_keys:
        target = target.filter("k IS NOT NULL")
    source = spark.createDataFrame(
        [(k, v, op) for (k, op, v) in ops] or [(None, None, None)],
        "k long, v double, op string",
    )
    if not ops:
        source = source.filter("k IS NOT NULL")
    got = {r["k"]: r["v"] for r in merge_into(target, source, key="k").collect()}

    ref = {k: float(k) * 10 for k in target_keys}
    for k, op, v in ops:
        if k in ref and op == "U":
            ref[k] = v
        elif k in ref and op == "D":
            del ref[k]
        elif k not in ref and op == "I":
            ref[k] = v
    assert got == ref


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(h, w, rgb, seed):
    """encode_png -> decode recovers EVERY pixel for arbitrary shapes and
    content — PNG is lossless, so exact equality is the property."""
    import numpy as np

    from drive_health_etl_spark.operators.multimodal import decode_image, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_image(bytes(encode_png(img)))
    assert out.shape == img.shape and (out == img).all()


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_property(h, w, rgb, seed):
    """decode(encode(x)) is shape-exact and error-bounded for arbitrary
    shapes including non-multiple-of-8 edges (replication padding). The MSE
    bound is the quantization worst case measured on uniform noise."""
    import numpy as np

    from drive_health_etl_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert ((out.astype(float) - img) ** 2).mean() < 200.0


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_fast_sigmoid_python_reference(zs):
    """The rational sigmoid surrogate's math in plain Python: range (0,1),
    antisymmetric around 0.5, monotone — the properties GD relies on,
    checked against the exact formula the engines both evaluate."""
    vals = [0.5 + z / (2.0 * (1.0 + abs(z))) for z in zs]
    for z, v in zip(zs, vals):
        assert 0.0 < v < 1.0
        mirror = 0.5 + (-z) / (2.0 * (1.0 + abs(z)))
        assert abs((v - 0.5) + (mirror - 0.5)) < 1e-15
    for (z1, v1), (z2, v2) in zip(sorted(zip(zs, vals)), sorted(zip(zs, vals))[1:]):
        if z1 < z2:
            assert v1 <= v2


# --- Codec round-trip properties ---------------------------------------------
#
# Every lossless codec must reconstruct ANY input bit-exactly, not just the
# fixture corpus — hypothesis drives arbitrary shapes/contents through the
# full encode/decode pipelines (the Adam7 bug class: a wrong pass grid only
# shows on particular dimension residues).


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    interlace=st.booleans(),
)
def test_prop_png_roundtrip(h, w, seed, interlace):
    import numpy as np

    from drive_health_etl_spark.operators.multimodal import _decode_png, encode_png

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = _decode_png(encode_png(img, interlace=interlace))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    npal=st.integers(min_value=2, max_value=256),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_prop_gif_roundtrip(h, w, npal, seed):
    import numpy as np

    from drive_health_etl_spark.operators.gif_codec import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (npal, 3)).astype(np.uint8)
    idx = rng.randint(0, npal, (h, w)).astype(np.uint8)
    out, _ = decode_gif(encode_gif(idx, pal))
    assert (out == idx).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=9000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    tonal=st.booleans(),
)
def test_prop_flac_roundtrip(n, seed, tonal):
    import numpy as np

    from drive_health_etl_spark.operators.flac_codec import decode_flac, encode_flac

    rng = np.random.RandomState(seed)
    if tonal:
        s = (np.sin(np.linspace(0, n / 37.0, n)) * 25000).astype(np.int16)
    else:
        s = rng.randint(-32768, 32767, n).astype(np.int16)
    out, rate = decode_flac(encode_flac(s, 8000))
    assert rate == 8000 and (out == s).all()


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=600),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_prop_adpcm_bounded_and_container(n, seed):
    """ADPCM is lossy: the property is container fidelity (rate, count) and
    a generous error bound that any step-table bug still explodes past."""
    import numpy as np

    from drive_health_etl_spark.operators.adpcm_codec import decode_wav_ima, encode_wav_ima

    s = np.random.RandomState(seed).randint(-32768, 32767, n).astype(np.int16)
    out, rate = decode_wav_ima(encode_wav_ima(s, 16000))
    assert rate == 16000 and len(out) == n
    # full-scale uniform noise: once the adaptive quantizer has ramped its
    # step size (IMA starts at step index 0 and climbs at most +8 indexes
    # per sample, so ~11 samples to reach full scale), tracking stays
    # within ~1/3 scale. The bound deliberately EXCLUDES the warmup prefix:
    # hypothesis found n=2 full-scale streams where no adaptive codec can
    # have adapted yet (mean error ~20k) — inherent to ADPCM, not a bug.
    if n > 16:
        tail = slice(16, None)
        assert np.abs(out.astype(int)[tail] - s.astype(int)[tail]).mean() < 11000


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    gray=st.booleans(),
    smooth=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_prop_jpeg_progressive_parity(h, w, gray, smooth, seed):
    """For ANY image, progressive (SOF2) decode must equal baseline (SOF0)
    decode bit-exactly — both encoders share one quantized-coefficient
    array, so the progressive entropy coding (EOB runs, refinement
    correction bits, point transforms) is the only thing under test. Smooth
    inputs drive long EOB runs; noise drives dense refinement traffic."""
    import numpy as np

    from drive_health_etl_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from drive_health_etl_spark.operators.jpeg_progressive import (
        decode_jpeg_progressive,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    if smooth:
        img = np.full(shape, rng.randint(0, 256), np.uint8)
    else:
        img = rng.randint(0, 256, shape).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg_progressive(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=32),
    w=st.integers(min_value=1, max_value=32),
    levels=st.integers(min_value=1, max_value=255),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_prop_qoi_roundtrip(h, w, levels, seed):
    """QOI is lossless: ANY uint8 RGB raster must round-trip bit-exactly.
    Varying the palette size sweeps the op mix from run/INDEX-dominated to
    literal-RGB-dominated."""
    import numpy as np

    from drive_health_etl_spark.operators.qoi_codec import decode_qoi, encode_qoi

    rng = np.random.RandomState(seed)
    img = (rng.randint(0, levels + 1, (h, w, 3)) * (255 // max(levels, 1))).astype(np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)
