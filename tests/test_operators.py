"""Unit tests: PNG codec + PSNR invariant (P14), image features, textops,
similarity search, LSH salting path, suffix-array cross-check."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_jl_spark.config import DedupConfig
from jsonschema_jl_spark.datagen import generate_images
from jsonschema_jl_spark.operators.multimodal import (
    decode_image,
    png_decode,
    png_encode,
    psnr,
    resize_pixels,
    with_image_features,
    with_resized,
    with_sampled_frames,
)
from jsonschema_jl_spark.operators.similarity import cosine_topk, lsh_ann_pairs
from jsonschema_jl_spark.operators.lsh import band_buckets, candidate_pairs, salted_candidate_pairs
from jsonschema_jl_spark.operators.minhash import with_signatures
from jsonschema_jl_spark.operators.substring import containment_pairs, suffix_array_containment

CFG = DedupConfig()


# ---------------------------------------------------------------------------
# PNG codec + per-row invariant (P14, BASELINE.json:15)
# ---------------------------------------------------------------------------

def test_png_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(40, 57, 3), dtype=np.uint8)
    data = png_encode(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = png_decode(data)
    assert np.array_equal(px, back)
    assert psnr(px, back) == float("inf")


def test_webp_roundtrip_via_decode_image():
    from jsonschema_jl_spark.operators.vp8l import webp_encode

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(24, 31, 3), dtype=np.uint8)
    data = webp_encode(px)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    back = decode_image(data, "webp")
    assert np.array_equal(px, back)  # VP8L is lossless


def test_lossy_webp_is_stubbed():
    import struct as _struct

    lossy = (
        b"RIFF" + _struct.pack("<I", 16) + b"WEBP" + b"VP8 " + _struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError):
        decode_image(lossy, "webp")


def test_truncated_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg", "jpeg")


def test_dup_rows_satisfy_pixel_invariant(spark):
    """Planted exact-dup rows: decoded pixels PSNR >= 40 dB (exact here,
    PNG is lossless) and caption equality vs the base row."""
    images = generate_images(spark, 100, CFG, with_malformed=False).toPandas()
    images = images.set_index("image_id")
    for i in range(100):
        if i % 20 == 15:
            a = images.loc[f"img{i - 1:012d}"]
            b = images.loc[f"img{i:012d}"]
            assert a["caption"] == b["caption"]
            pa = decode_image(bytes(a["bytes"]), a["fmt"])
            pb = decode_image(bytes(b["bytes"]), b["fmt"])
            assert psnr(pa, pb) >= 40.0


def test_with_image_features(spark):
    df = generate_images(spark, 40, CFG, with_malformed=False)
    out = with_image_features(df).select("image_id", "w", "h", "img_features.*").collect()
    assert len(out) == 40
    for r in out:
        assert r.decode_ok
        assert r.decoded_w == r.w and r.decoded_h == r.h
        assert 0 <= r.mean_r <= 255


def test_normalize_series_matches_scalar():
    """Vectorized batch normalizer == scalar normalize_text (shared by the
    oracle), including casefold expansion, final sigma, astral chars, and
    null passthrough; and normalization is idempotent (the pre-normalized
    pipeline contract relies on it)."""
    import pandas as pd
    from jsonschema_jl_spark.operators.minhash import normalize_series, normalize_text

    cases = ["  Hello   WORLD  ", "Straße ẞ", "été", "ＡＢＣ", "ﬁn", "İstanbul",
             "💩  x\t\ny", "", "a", None, "ΣΊΣΥΦΟΣ ΣΊΣΥΦΟΣ"]
    out = normalize_series(pd.Series(cases, dtype=object))
    for c, o in zip(cases, out):
        expect = normalize_text(c) if c is not None else None
        assert o == expect, (c, o, expect)
        if c is not None:
            assert normalize_text(expect) == expect


def test_resize_pixels_vectorized():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    small = resize_pixels(px, 12, 8)
    assert small.shape == (8, 12, 3)
    # nearest-neighbor: every output pixel exists in the input
    assert small[0, 0].tolist() == px[0, 0].tolist()


def test_with_resized(spark):
    df = generate_images(spark, 30, CFG, with_malformed=False)
    out = with_resized(df, 16, 16).select("image_id", "fmt", "resized.*").collect()
    assert len(out) == 30
    # datagen payloads all decode (png/jpeg/webp real codecs), so all rows
    # resize
    for r in out:
        assert r.resize_ok and r.w == 16 and r.h == 16
        assert decode_image(bytes(r.bytes), "png").shape == (16, 16, 3)


def test_with_resized_lossy_passthrough(spark):
    """A payload with no in-container codec passes through unchanged with
    resize_ok=false instead of failing the job."""
    df = spark.createDataFrame(
        [("x1", bytearray(b"\xff\xd8\xff\xe0 fake jpeg"), "jpeg")],
        "image_id string, bytes binary, fmt string",
    )
    r = with_resized(df, 16, 16).select("resized.*").collect()[0]
    assert not r.resize_ok and bytes(r.bytes) == b"\xff\xd8\xff\xe0 fake jpeg"


def test_with_sampled_frames(spark):
    df = generate_images(spark, 10, CFG, with_malformed=False)
    out = with_sampled_frames(df, every_n=2).select("image_id", "sampled.*").collect()
    assert len(out) == 10
    for r in out:
        assert len(r.frame_idx) == len(r.frames) >= 1
        assert r.frame_idx == sorted(r.frame_idx)
        assert all(i % 2 == 0 for i in r.frame_idx)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 8)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)], "vec_id long, embedding array<double>"
    )
    got = cosine_topk(df, k=2).orderBy("query_id", "rank").collect()
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    for q in range(30):
        expect = np.argsort(-np.round(sims[q], 6), kind="stable")[:2]
        rows = [r for r in got if r.query_id == q]
        assert [r.neighbor_id for r in rows] == list(expect)


def test_lsh_ann_recall_vs_bruteforce(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((50, 16))
    # plant 10 near-dup pairs (tiny perturbations)
    rows = []
    for i in range(50):
        rows.append((i, [float(x) for x in base[i]]))
    for j in range(10):
        v = base[j] + rng.standard_normal(16) * 0.01
        rows.append((100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = lsh_ann_pairs(df, dim=16, n_planes=8, n_tables=6, min_cos=0.99)
    got = {(r.src, r.dst) for r in pairs.collect()}
    planted = {(j, 100 + j) for j in range(10)}
    assert len(planted & got) >= 9  # >= 90% recall on planted near-dups


def test_ivf_topk_recall(spark):
    from jsonschema_jl_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(11)
    base = rng.standard_normal((120, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(120)]
    # near-copies: their true top-1 is the base vector
    for j in range(30):
        v = base[j] + rng.standard_normal(16) * 0.005
        rows.append((1000 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    near = df.filter(F.col("vec_id") >= 1000)
    top1 = ivf_topk(df, k=1, n_cells=8, nprobe=2, queries=near)
    hits = {r.query_id: r.neighbor_id for r in top1.collect()}
    assert all(hits[1000 + j] == j for j in range(30)), hits
    # exact-match sanity vs brute force on a random query slice
    qs = df.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(df, k=3, queries=qs).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(df, k=3, n_cells=8, nprobe=5, queries=qs).collect()}
    assert len(exact & approx) / len(exact) >= 0.6


# ---------------------------------------------------------------------------
# LSH salting path + suffix-array cross-check
# ---------------------------------------------------------------------------

def test_salted_pairs_equal_capped_union(spark):
    import dataclasses

    images = generate_images(spark, 400, CFG, with_bytes=False, with_malformed=False)
    sigs = with_signatures(images.select("image_id", "caption", "phash"), cfg=CFG)
    buckets = band_buckets(sigs, cfg=CFG).persist()
    plain = {(r.src, r.dst) for r in candidate_pairs(buckets, CFG).collect()}
    salted = {(r.src, r.dst) for r in salted_candidate_pairs(buckets, CFG, num_salts=4).collect()}
    # salting must find at least everything capping finds (it drops nothing)
    assert plain <= salted
    # ...and must equal the EXACT uncapped pair set: an uncappable config
    # (cap > any bucket) routes everything down the plain path, giving the
    # ground truth.  A subset check alone cannot catch salt-grid pair loss
    # (the id<id_r regression dropped ~half the cross-salt hot pairs while
    # still passing `plain <= salted`).
    uncapped_cfg = dataclasses.replace(CFG, bucket_cap=1_000_000)
    exact = {(r.src, r.dst) for r in candidate_pairs(buckets, uncapped_cfg).collect()}
    assert salted == exact
    buckets.unpersist()


@pytest.mark.parametrize(
    "shape", [None, {"num_perm": 128, "num_bands": 32, "rows_per_band": 4},
              {"num_perm": 64, "num_bands": 8, "rows_per_band": 8}]
)
def test_kernel_bands_pair_parity(spark, shape):
    """Kernel-computed band keys (band_keys_np via with_bands=True) must
    yield the SAME candidate pair set as the JVM slice+xxhash64 path —
    the bucket hash is an internal join key; grouping semantics are by
    band content, so the two formulations may differ only by 64-bit hash
    collisions (none at test scale).  Parametrized over banding shapes
    so the (n, B, r) reshape/fold stays aligned with the JVM slicing."""
    import dataclasses

    cfg = CFG if shape is None else dataclasses.replace(CFG, **shape)
    images = generate_images(spark, 400, cfg, with_bytes=False, with_malformed=False)
    slim = images.select("image_id", "caption", "phash")
    sigs = with_signatures(slim, cfg=cfg, keep_shingles=False, with_bands=True).persist()
    b_kernel = band_buckets(sigs, cfg=cfg, bands_col="bands")
    b_jvm = band_buckets(sigs, sig_col="minhash", cfg=cfg)
    pk = {(r.src, r.dst) for r in candidate_pairs(b_kernel, cfg).collect()}
    pj = {(r.src, r.dst) for r in candidate_pairs(b_jvm, cfg).collect()}
    assert pk == pj and len(pk) > 0
    sigs.unpersist()


def test_band_keys_np_semantics():
    """Equal band slices -> equal keys; any differing lane -> different key
    (w.h.p.); band index salts the fold (same content in different bands
    must not collide into one bucket)."""
    import dataclasses
    import numpy as np
    from jsonschema_jl_spark.operators.minhash import band_keys_np

    cfg = dataclasses.replace(CFG, num_perm=16, num_bands=4, rows_per_band=4)
    rng = np.random.default_rng(7)
    base = rng.integers(0, 1 << 62, size=(1, 16)).astype(np.int64)
    twin = base.copy()                      # identical row
    diff = base.copy(); diff[0, 5] ^= 1     # flip one lane of band 1
    keys = band_keys_np(np.vstack([base, twin, diff]), cfg)
    assert (keys[0] == keys[1]).all()
    assert keys[0][1] != keys[2][1]         # band 1 differs
    assert keys[0][0] == keys[2][0]         # band 0 untouched
    # same content placed in band 0 vs band 1 -> different keys (band salt)
    sym = np.tile(base[0, :4], 4)[None, :].astype(np.int64)
    ks = band_keys_np(sym, cfg)[0]
    assert len(set(ks.tolist())) == 4


def test_suffix_array_matches_anchor_join(spark):
    images = generate_images(spark, 300, CFG, with_bytes=False, with_malformed=False)
    slim = images.select("image_id", "caption", "phash")
    a = {(r.src, r.dst) for r in containment_pairs(slim, cfg=CFG).collect()}
    b = {(r.src, r.dst) for r in suffix_array_containment(slim, cfg=CFG).collect()}
    assert a == b
    assert len(a) > 0  # planted containment pairs exist


def test_wav_roundtrip_and_audio_features(spark):
    from jsonschema_jl_spark.operators.multimodal import (
        wav_encode, wav_decode, with_audio_features,
    )

    rng = np.random.default_rng(13)
    a = (rng.standard_normal(16000) * 3000).astype(np.int16)   # 1s mono
    b = (rng.standard_normal((8000, 2)) * 2000).astype(np.int16).reshape(-1)  # stereo
    wav_a = wav_encode(a, 16000, 1)
    wav_b = wav_encode(b, 8000, 2)
    s, sr, ch = wav_decode(wav_a)
    assert sr == 16000 and ch == 1 and np.array_equal(s.ravel(), a)

    df = spark.createDataFrame(
        [("x", wav_a, "wav"), ("y", wav_b, "wav"), ("z", b"\x00garbage", "mp3")],
        "id string, bytes binary, fmt string",
    )
    out = {r.id: r.audio_features for r in with_audio_features(df).collect()}
    assert out["x"].decode_ok and out["x"].sample_rate == 16000
    assert abs(out["x"].duration_s - 1.0) < 1e-9
    assert abs(out["x"].rms - float(np.sqrt(np.mean(a.astype(np.float64) ** 2)))) < 1e-6
    assert out["y"].channels == 2 and out["y"].n_samples == 8000
    assert not out["z"].decode_ok and out["z"].sample_rate is None


def test_simhash_batch_matches_native(spark):
    """The Arrow-batched vote kernel must be bit-identical to the 60-aggregate
    native expression (same JVM tokenization + md5 feed both)."""
    from jsonschema_jl_spark.operators.textops import simhash64, simhash64_batch

    rows = [
        ("a", "The quick brown fox jumps over the lazy dog"),
        ("b", "the quick  brown fox Jumps over the lazy dog!"),
        ("c", ""),
        ("d", "   "),
        ("e", "einzelwort"),
        ("f", None),
        ("g", "der die und das ist nicht ein mit für auf"),
        ("h", "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 8),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = (
        df.select(
            "id",
            simhash64(F.col("text")).alias("native"),
            simhash64_batch(F.col("text")).alias("batch"),
        )
        .collect()
    )
    for r in got:
        assert r.native == r.batch, f"simhash mismatch for id={r.id}"


def test_simhash_votes_kernel_edge_segments():
    """reduceat edge cases: empty rows at the start, middle, end, and the
    all-empty batch."""
    from jsonschema_jl_spark.operators.textops import _simhash_votes_kernel

    def ref(hs):
        sig = 0
        for b in range(60):
            votes = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if votes > 0:
                sig |= 1 << b
        return sig

    hs1 = [123456789012345, 987654321098765]
    hs2 = [(1 << 60) - 1]
    out = _simhash_votes_kernel([[], hs1, [], hs2, [], None])
    assert out[0] == 0 and out[2] == 0 and out[4] == 0
    assert out[1] == ref(hs1) and out[3] == ref(hs2)
    assert out[5] == 0  # NULL text -> 0, matching the native otherwise(0)
    out2 = _simhash_votes_kernel([[], []])
    assert out2[0] == 0 and out2[1] == 0


def test_candidate_pairs_cache_registry(spark):
    """With a cache_registry the banded bucket rows are persisted (one
    MinHash/banding computation shared by the count and pair branches) and
    ownership of the unpersist moves to the caller; results are identical
    to the registry-less plan."""
    from pyspark.sql import functions as F

    texts = [(f"id{i:02d}", f"caption text shared prefix {i % 7}") for i in range(40)]
    df = spark.createDataFrame(texts, "image_id string, caption string")
    sigs = with_signatures(df, cfg=CFG, keep_shingles=False)
    buckets = band_buckets(sigs, cfg=CFG)
    reg: list = []
    pairs_cached = candidate_pairs(buckets, CFG, cache_registry=reg)
    got = {(r.src, r.dst) for r in pairs_cached.collect()}
    assert len(reg) == 1 and reg[0].is_cached
    plain = {(r.src, r.dst) for r in candidate_pairs(buckets, CFG).collect()}
    assert got == plain
    # metrics branch reuses the same counts aggregate
    _, skew = candidate_pairs(buckets, CFG, with_metrics=True, cache_registry=reg)
    assert skew.capped_rows >= 0
    for cached in reg:
        cached.unpersist()


def test_signs_kernel_parity_dim256(spark):
    """The Arrow matmul bucket-key kernel (large n_planes*dim path) must
    produce the same pair set as the native per-plane expression path at
    dim=256 — forced onto each path by flipping _NATIVE_SIGNS_MAX."""
    import jsonschema_jl_spark.operators.similarity as sim

    rng = np.random.default_rng(11)
    dim = 256
    base = rng.standard_normal((40, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    for j in range(8):
        v = base[j] + rng.standard_normal(dim) * 0.003
        rows.append((100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    saved = sim._NATIVE_SIGNS_MAX
    try:
        sim._NATIVE_SIGNS_MAX = 10 ** 9  # force native
        native = {
            (r.src, r.dst)
            for r in sim.lsh_ann_pairs(
                df, dim=dim, n_planes=10, n_tables=6, min_cos=0.99
            ).collect()
        }
        sim._NATIVE_SIGNS_MAX = 0  # force Arrow kernel
        kernel = {
            (r.src, r.dst)
            for r in sim.lsh_ann_pairs(
                df, dim=dim, n_planes=10, n_tables=6, min_cos=0.99
            ).collect()
        }
    finally:
        sim._NATIVE_SIGNS_MAX = saved
    assert native == kernel
    planted = {(j, 100 + j) for j in range(8)}
    assert len(planted & kernel) >= 7
    # the default threshold keeps small configs (10 planes x 256 = 2560
    # literals) native and routes big ones (e.g. 32 planes x 256) to the
    # kernel
    assert 10 * dim <= sim._NATIVE_SIGNS_MAX < 32 * dim


def test_signs_kernel_null_and_ragged_embeddings(spark):
    """Null / wrong-length embeddings must DEGRADE on the kernel path (row
    dropped, no pairs) exactly like the native path, not crash the matmul
    with a ragged array (regression: np.asarray over a batch containing
    None raised 'inhomogeneous shape').  Pair output must be identical to
    the same corpus with the bad rows filtered out."""
    import jsonschema_jl_spark.operators.similarity as sim

    rng = np.random.default_rng(23)
    dim = 64
    base = rng.standard_normal((20, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    for j in range(4):
        v = base[j] + rng.standard_normal(dim) * 0.003
        rows.append((100 + j, [float(x) for x in v]))
    bad = [(900, None), (901, [1.0, 2.0]), (902, [float("nan")] * dim)]
    df = spark.createDataFrame(
        rows + bad, "vec_id long, embedding array<float>"
    )
    clean = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    saved = sim._NATIVE_SIGNS_MAX
    try:
        sim._NATIVE_SIGNS_MAX = 0  # force the Arrow kernel
        got = {
            (r.src, r.dst)
            for r in sim.lsh_ann_pairs(
                df, dim=dim, n_planes=10, n_tables=4, min_cos=0.99
            ).collect()
        }
        want = {
            (r.src, r.dst)
            for r in sim.lsh_ann_pairs(
                clean, dim=dim, n_planes=10, n_tables=4, min_cos=0.99
            ).collect()
        }
    finally:
        sim._NATIVE_SIGNS_MAX = saved
    assert got == want
    assert not any(900 <= a or 900 <= b for a, b in got)


def test_lsh_ann_pairs_matches_self_join_shape(spark):
    """Pair-set parity of the one-exchange collect_list expansion against
    the classic bucket SELF-JOIN shape it replaced (round-5 restructure:
    vectors no longer cross the candidate-generation shuffles — ids pair
    first, vectors re-fetch narrowly for the cosine verify)."""
    import jsonschema_jl_spark.operators.similarity as sim

    rng = np.random.default_rng(47)
    dim = 48
    base = rng.standard_normal((60, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    for j in range(10):
        v = base[j] + rng.standard_normal(dim) * 0.003
        rows.append((300 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n_planes, n_tables, min_cos = 8, 4, 0.5

    got = {
        (r.src, r.dst, r.cos)
        for r in sim.lsh_ann_pairs(
            df, dim=dim, n_planes=n_planes, n_tables=n_tables, min_cos=min_cos
        ).collect()
    }

    # reference: the pre-round-5 two-sided membership self-join, inline
    keys = F.array(*[
        sim.signs_column(
            F.col("vec"), sim._hyperplanes(dim, n_planes, t, 4242)
        )
        for t in range(n_tables)
    ])
    ref_base = df.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    exploded = ref_base.select("id", "vec", F.posexplode(keys).alias("table", "bucket"))
    sizes = exploded.groupBy("table", "bucket").agg(F.count("*").alias("n"))
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= 2000)).drop("n")
    member = exploded.join(ok, ["table", "bucket"])
    a, b = member.alias("a"), member.alias("b")
    want = {
        (r.src, r.dst, r.cos)
        for r in a.join(b, ["table", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("src"),
            F.col("b.id").alias("dst"),
            F.round(sim.cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
        .dropDuplicates(["src", "dst"])
        .collect()
    }
    assert got == want and len(got) > 0


def test_lsh_ann_pairs_no_vectors_in_candidate_shuffles(spark):
    """The exploded bucket relation must not carry the embedding column —
    the whole point of the round-5 restructure.  Assert structurally: the
    optimized plan's Exchange nodes upstream of the pair expansion never
    ship `vec`; only the two narrow verify joins touch vectors."""
    rng = np.random.default_rng(53)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    reg: list = []
    out = lsh_ann_pairs(df, dim=16, n_planes=6, n_tables=2,
                        cache_registry=reg)
    try:
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # the persisted/repartitioned bucket relation is (id, table, bucket):
        # its output attribute list must not mention the vector column
        seg = plan.split("InMemoryRelation ")[1]
        cached_cols = seg[: seg.index("]")]
        assert "vec" not in cached_cols, cached_cols
        # and the collect_list aggregate pairs ids only
        agg = next(
            line for line in plan.splitlines() if "collect_list" in line
        )
        assert "vec" not in agg, agg
    finally:
        for c in reg:
            c.unpersist()


def test_lsh_ann_pairs_cache_registry(spark):
    """With a cache_registry the exploded bucket rows are persisted (the
    pandas-UDF key computation runs once, shared by the size agg and both
    self-join sides) and the pair set is unchanged; caller unpersists."""
    import jsonschema_jl_spark.operators.similarity as sim

    rng = np.random.default_rng(31)
    dim = 32
    base = rng.standard_normal((30, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    for j in range(5):
        v = base[j] + rng.standard_normal(dim) * 0.003
        rows.append((200 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plain = {
        (r.src, r.dst)
        for r in sim.lsh_ann_pairs(
            df, dim=dim, n_planes=8, n_tables=4, min_cos=0.99
        ).collect()
    }
    reg: list = []
    shared = {
        (r.src, r.dst)
        for r in sim.lsh_ann_pairs(
            df, dim=dim, n_planes=8, n_tables=4, min_cos=0.99,
            cache_registry=reg,
        ).collect()
    }
    assert shared == plain
    assert len(reg) == 1 and reg[0].is_cached
    for cached in reg:
        cached.unpersist()
