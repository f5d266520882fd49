"""Training-data pipeline operators: Spark implementation vs DuckDB SQL
twin, compared row-for-row at sf0.001 (the same comparison the driver's
correctness gate performs at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from qfspark import dedup, multimodal, similarity, textops

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df.cache()
    df.count()
    return df


def _compare(spark_df, duck_df, sort_cols):
    a = spark_df.toPandas()
    b = duck_df
    assert sorted(a.columns) == sorted(b.columns), (a.columns, b.columns)
    a = a[sorted(a.columns)].sort_values(sort_cols).reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(sort_cols).reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype == object and len(av) and isinstance(av.iloc[0], (list, np.ndarray)):
            for x, y in zip(av, bv):
                assert list(x) == list(y), col
        elif np.issubdtype(av.dtype, np.floating):
            assert np.allclose(
                av.to_numpy(dtype=float), bv.to_numpy(dtype=float), atol=1e-9
            ), col
        else:
            assert (av.to_numpy() == bv.to_numpy()).all(), col


def test_text_stats_parity(spark, docs, con):
    _compare(
        textops.text_stats(docs),
        con.sql(textops.duckdb_text_stats_sql()).df(),
        ["doc_id"],
    )


def test_lang_id_parity(spark, docs, con):
    _compare(
        textops.lang_id(docs),
        con.sql(textops.duckdb_lang_id_sql()).df(),
        ["doc_id"],
    )


def test_fingerprint_parity(spark, docs, con):
    _compare(
        textops.fingerprint(docs),
        con.sql(textops.duckdb_fingerprint_sql()).df(),
        ["doc_id"],
    )


def test_exact_dedup_parity(spark, docs, con):
    _compare(
        dedup.exact_dedup(docs),
        con.sql(dedup.DUCKDB_EXACT_DEDUP_SQL).df(),
        ["content_hash"],
    )


def test_minhash_signature_parity(spark, docs, con):
    _compare(
        dedup.minhash_signatures(docs, num_hashes=8),
        con.sql(dedup.duckdb_minhash_sql(num_hashes=8)).df(),
        ["doc_id"],
    )


def test_ngram_jaccard_parity(spark, docs, con):
    _compare(
        dedup.ngram_jaccard(docs, None).where("jaccard >= 0.05"),
        con.sql(dedup.duckdb_ngram_jaccard_sql(min_jaccard=0.05)).df(),
        ["doc_a", "doc_b"],
    )


def test_minhash_lsh_pairs_parity(spark, docs, con):
    _compare(
        dedup.minhash_lsh_pairs(docs, threshold=0.2),
        con.sql(dedup.duckdb_minhash_lsh_pairs_sql(threshold=0.2)).df(),
        ["doc_a", "doc_b"],
    )


def test_simhash_parity(spark, docs, con):
    _compare(
        dedup.simhash(docs),
        con.sql(dedup.duckdb_simhash_sql()).df(),
        ["doc_id"],
    )


def test_clean_corpus_parity(spark, docs, con):
    _compare(
        dedup.clean_corpus(docs, near_dup_jaccard=0.3),
        con.sql(dedup.duckdb_clean_corpus_sql(near_dup_jaccard=0.3)).df(),
        ["doc_id"],
    )


def test_simhash_pairs_complete_at_any_hamming(spark, docs):
    """Pigeonhole banding must be COMPLETE for the requested distance:
    banded candidates + verify == brute-force all-pairs filter."""
    sub = docs.limit(120).cache()
    got = dedup.simhash_pairs(sub, max_hamming=5).toPandas()
    sh = dedup.simhash(sub)
    brute = (
        sh.alias("a").join(sh.alias("b"),
                           F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"))
        .where("hamming <= 5")
        .toPandas()
    )
    key = lambda d: set(map(tuple, d[["doc_a", "doc_b", "hamming"]].to_numpy()))
    assert key(got) == key(brute)


def test_simhash_pairs_parity(spark, docs, con):
    _compare(
        dedup.simhash_pairs(docs, max_hamming=4),
        con.sql(dedup.duckdb_simhash_pairs_sql(max_hamming=4)).df(),
        ["doc_a", "doc_b"],
    )


def test_cosine_pairs_parity(spark, con):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(300)
    got = similarity.cosine_pairs(emb, threshold=0.2).toPandas()
    want = con.sql(
        """
        WITH base AS (
            SELECT vec_id AS id, embedding::DOUBLE[] AS emb
            FROM embeddings WHERE vec_id < 300
        )
        SELECT a.id AS id_a, b.id AS id_b,
               round(list_dot_product(a.emb, b.emb) /
                     (sqrt(list_dot_product(a.emb, a.emb)) *
                      sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos
        FROM base a JOIN base b ON a.id < b.id
        WHERE round(list_dot_product(a.emb, b.emb) /
                    (sqrt(list_dot_product(a.emb, a.emb)) *
                     sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.2
        """
    ).df()
    a = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = want.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a[["id_a", "id_b"]].to_numpy() == b[["id_a", "id_b"]].to_numpy()).all()
    assert np.allclose(a["cos"], b["cos"], atol=1e-9)


def test_cosine_topk_deterministic_and_sane(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    topk = similarity.cosine_topk(emb, k=5).toPandas()
    assert set(topk["rank"]) == {1, 2, 3, 4, 5}
    per_q = topk.groupby("query_id").size()
    assert (per_q == 5).all()
    # rank 1 has the max cos per query
    for qid, grp in topk.groupby("query_id"):
        g = grp.sort_values("rank")
        assert (g["cos"].diff().dropna() <= 1e-12).all()


def test_lsh_topk_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    emb.cache()
    exact = similarity.cosine_topk(emb, k=3)
    approx = similarity.lsh_cosine_topk(emb, k=3, planes=4, tables=4)
    m = similarity.ann_recall(exact, approx, k=3)
    # these synthetic 64-dim embeddings have near-orthogonal neighbors —
    # hard for sign-LSH; the substantive check is the monotone quality dial
    assert m["recall_at_1"] is not None and m["recall_at_1"] > 0.3, m
    assert m["recall_at_k"] > 0.3, m
    # more tables must not lower recall (monotone quality dial)
    approx8 = similarity.lsh_cosine_topk(emb, k=3, planes=4, tables=8)
    m8 = similarity.ann_recall(exact, approx8, k=3)
    assert m8["recall_at_k"] >= m["recall_at_k"] - 1e-9, (m, m8)


def test_quality_filter(spark, docs):
    kept = textops.quality_filter(docs, min_tokens=20).count()
    total = docs.count()
    assert 0 < kept <= total


def test_media_features_deterministic(spark):
    from qfspark.webpages import synthesize

    wp = synthesize(spark, SF_DIR).limit(50)
    f1 = multimodal.extract_media_features(wp, "url", "html").toPandas()
    f2 = multimodal.extract_media_features(wp, "url", "html").toPandas()
    assert len(f1) == 50
    assert set(f1.columns) == {"media_id", "n_bytes", "kind", "features"}
    a = f1.sort_values("media_id").reset_index(drop=True)
    b = f2.sort_values("media_id").reset_index(drop=True)
    for x, y in zip(a["features"], b["features"]):
        assert list(x) == list(y)
    assert (a["n_bytes"] > 0).all()
    assert all(len(f) == multimodal.FEATURE_DIM for f in a["features"])


def test_media_features_match_local(spark):
    from qfspark.webpages import synthesize

    wp = synthesize(spark, SF_DIR).limit(20)
    rows = {r.url: bytes(r.html) for r in wp.collect()}
    feats = multimodal.extract_media_features(wp, "url", "html").collect()
    for r in feats:
        want = multimodal.fake_features(rows[r.media_id])
        assert np.allclose(np.array(r.features, dtype=np.float32), want)


def test_sample_frames_shapes(spark):
    from qfspark.webpages import synthesize

    wp = synthesize(spark, SF_DIR).limit(10)
    frames = multimodal.sample_frames(wp, "url", "html", frame_bytes=128,
                                      max_frames=3).toPandas()
    assert set(frames.columns) == {"media_id", "frame_no", "frame"}
    per = frames.groupby("media_id")["frame_no"].max()
    assert (per <= 2).all()
    assert (frames["frame"].map(len) <= 128).all()


def _test_pixels():
    import numpy as np

    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (12, 17, 3)).astype(np.uint8)


def _png_with_filters(pixels, filter_types):
    """RGB8 PNG encoder applying a chosen PNG filter type per scanline
    (forward-filtering per the spec) — exercises the decoder's
    unfilter paths, which ``encode_png`` (always filter 0) cannot."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = pixels.shape
    raw = pixels.astype(np.int64)
    out = []
    prior = np.zeros(w * 3, np.int64)
    for y in range(h):
        line = raw[y].reshape(-1)
        f = filter_types[y % len(filter_types)]
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(3, np.int64), line[:-3]])
            filt = (line - left) % 256
        elif f == 2:  # Up
            filt = (line - prior) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(3, np.int64), line[:-3]])
            filt = (line - (left + prior) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(3, np.int64), line[:-3]])
            ul = np.concatenate([np.zeros(3, np.int64), prior[:-3]])
            p = left + prior - ul
            pa, pb, pc = (np.abs(p - left), np.abs(p - prior),
                          np.abs(p - ul))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, ul))
            filt = (line - pred) % 256
        out.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prior = line
    return (b"\x89PNG\r\n\x1a\n"
            + multimodal._png_chunk(
                b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + multimodal._png_chunk(b"IDAT", zlib.compress(b"".join(out)))
            + multimodal._png_chunk(b"IEND", b""))


def test_png_jpeg_sniffing():
    from qfspark import multimodal

    assert multimodal.sniff_kind(
        multimodal.encode_png(_test_pixels())) == "png"
    assert multimodal.sniff_kind(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert multimodal.sniff_kind(b"\x89PNGxx") is None  # bad magic tail


def test_png_roundtrip_and_filters():
    """Stdlib decode_png: encode/decode identity, and every PNG filter
    type (Sub/Up/Average/Paeth, alone and mixed) reconstructs the
    original pixels exactly."""
    import numpy as np

    px = _test_pixels()
    assert (multimodal.decode_png(multimodal.encode_png(px)) == px).all()
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = multimodal.decode_png(_png_with_filters(px, filters))
        assert (got == px).all(), filters
    # odd sizes incl. single-pixel and single-column
    rng = np.random.RandomState(9)
    for w, h in [(1, 1), (1, 7), (5, 1), (3, 2)]:
        p2 = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert (multimodal.decode_png(
            _png_with_filters(p2, [4])) == p2).all(), (w, h)


def test_png_color_types_and_depths():
    """Grayscale (incl. 1/2/4/16-bit), palette, gray+alpha and RGBA
    payloads all decode to the expected RGB pixels."""
    import struct
    import zlib

    import numpy as np

    def make(w, h, depth, ctype, scanlines, plte=None):
        chunks = (b"\x89PNG\r\n\x1a\n" + multimodal._png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)))
        if plte is not None:
            chunks += multimodal._png_chunk(b"PLTE", plte)
        raw = b"".join(b"\x00" + s for s in scanlines)
        return (chunks
                + multimodal._png_chunk(b"IDAT", zlib.compress(raw))
                + multimodal._png_chunk(b"IEND", b""))

    # 8-bit grayscale: value replicated across RGB
    g = make(3, 1, 8, 0, [bytes([0, 128, 255])])
    assert (multimodal.decode_png(g) == np.array(
        [[[0] * 3, [128] * 3, [255] * 3]], np.uint8)).all()
    # 1-bit grayscale: packed bits, scaled to 0/255
    g1 = make(3, 1, 1, 0, [bytes([0b10100000])])
    assert (multimodal.decode_png(g1)[0, :, 0] ==
            np.array([255, 0, 255])).all()
    # 4-bit grayscale: two samples per byte, scaled by 17
    g4 = make(3, 1, 4, 0, [bytes([0x5A, 0xF0])])
    assert (multimodal.decode_png(g4)[0, :, 0] ==
            np.array([5 * 17, 10 * 17, 15 * 17])).all()
    # 16-bit grayscale: high byte
    g16 = make(2, 1, 16, 0, [bytes([0xAB, 0xCD, 0x01, 0x02])])
    assert (multimodal.decode_png(g16)[0, :, 0] ==
            np.array([0xAB, 0x01])).all()
    # 2-bit palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    p2 = make(4, 1, 2, 3, [bytes([0b00011011])], plte=plte)
    assert (multimodal.decode_png(p2)[0] == np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]])).all()
    # gray+alpha (alpha dropped) and RGBA (alpha dropped)
    ga = make(2, 1, 8, 4, [bytes([100, 7, 200, 9])])
    assert (multimodal.decode_png(ga)[0, :, 1] ==
            np.array([100, 200])).all()
    rgba = make(1, 2, 8, 6, [bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8])])
    assert (multimodal.decode_png(rgba).reshape(-1) ==
            np.array([1, 2, 3, 5, 6, 7])).all()


def test_png_rejects_corrupt_and_interlaced():
    import struct
    import zlib

    png = multimodal.encode_png(_test_pixels())
    with pytest.raises(ValueError):
        multimodal.decode_png(b"<html>not an image</html>")
    with pytest.raises(ValueError):  # truncated
        multimodal.decode_png(png[: len(png) // 2])
    corrupt = bytearray(png)
    corrupt[40] ^= 0xFF  # flip an IDAT byte: CRC must catch it
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(corrupt))
    # Adam7 interlaced: honest unsupported error, not a wrong decode
    px = _test_pixels()
    h, w = px.shape[:2]
    interlaced = (b"\x89PNG\r\n\x1a\n" + multimodal._png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
        + multimodal._png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + multimodal._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        multimodal.decode_png(interlaced)


def test_png_matches_bmp_features(spark):
    """The stdlib PNG path must produce EXACTLY the BMP path's features
    for the same pixels (shared _rgb_features recipe; PNG is lossless).
    Round-5 gated this on PIL; round 6's stdlib decoder runs it in
    every CI environment."""
    import numpy as np

    from qfspark import multimodal

    pixels = _test_pixels()
    png = multimodal.encode_png(pixels)
    bmp = multimodal.encode_bmp(pixels)
    df = spark.createDataFrame(
        [("png1", bytearray(png)), ("bmp1", bytearray(bmp))],
        "media_id string, payload binary")
    rows = {r.media_id: r for r in multimodal.extract_media_features(
        df, "media_id", "payload", kind="image").collect()}
    assert rows["png1"].kind == "png"
    assert rows["bmp1"].kind == "bmp"
    assert np.allclose(rows["png1"].features, rows["bmp1"].features,
                       atol=1e-5)


def test_png_unsupported_variant_falls_back_deterministically(spark):
    """An undecodable PNG variant (Adam7 interlace) must degrade to the
    deterministic byte featurizer with the caller's declared kind —
    never fail the stage."""
    import struct
    import sys
    import zlib

    import numpy as np

    from qfspark import multimodal

    if "PIL" in sys.modules or multimodal._pil_featurizer() is not None:
        pytest.skip("PIL importable here; fallback path not reachable")
    interlaced = (b"\x89PNG\r\n\x1a\n" + multimodal._png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1))
        + multimodal._png_chunk(b"IDAT", zlib.compress(b"\x00" * 52))
        + multimodal._png_chunk(b"IEND", b""))
    df = spark.createDataFrame([("p1", bytearray(interlaced))],
                               "media_id string, payload binary")
    row = multimodal.extract_media_features(
        df, "media_id", "payload", kind="image").collect()[0]
    assert row.kind == "image"  # declared kind, not sniffed
    assert np.allclose(row.features,
                       multimodal.fake_features(interlaced).tolist())


def test_media_decoder_probe_never_raises(monkeypatch):
    """Media libs being importable must NOT crash the feature probe
    (round-1 defect: NotImplementedError escaped when PIL existed)."""
    import sys
    import types

    from qfspark import multimodal

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.ModuleType("PIL.Image")
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil.Image)
    monkeypatch.setitem(sys.modules, "soundfile", types.ModuleType("soundfile"))

    assert multimodal._try_real_decoder("image") is None
    assert multimodal._try_real_decoder("audio") is None
    assert multimodal._try_real_decoder("video") is None


def test_token_counts_bpe_vs_ws(spark):
    from qfspark.textops import token_counts

    df = spark.createDataFrame(
        [(1, "I can't stop, won't stop: 12345 times!"),
         (2, "plain words only here"),
         (3, "")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in token_counts(df).collect()}
    # contractions, punctuation and long digit runs split under BPE-ish
    assert rows[1].n_bpe_tokens > rows[1].n_ws_tokens
    assert rows[2].n_bpe_tokens == rows[2].n_ws_tokens == 4
    assert rows[3].n_bpe_tokens == 0


def test_rolling_fingerprint_properties(spark):
    from qfspark.textops import ROLL_MOD, rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij"), (3, "abcdefghiX"),
         (4, "short")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in rolling_fingerprint(df, k=8).collect()}
    # identical text -> identical fingerprint; one char flip changes it
    assert (rows[1].roll_min, rows[1].roll_xor) == \
           (rows[2].roll_min, rows[2].roll_xor)
    assert (rows[1].roll_min, rows[1].roll_xor) != \
           (rows[3].roll_min, rows[3].roll_xor)
    assert rows[1].n_windows == 3  # len 10, k 8
    assert 0 <= rows[1].roll_min < ROLL_MOD
    # shorter than k: defined, single sentinel window
    assert rows[4].n_windows == 1

    # the per-window polynomial equals an independent scalar Rabin hash
    text = "abcdefghij"
    h = 0
    for ch in text[:8]:
        h = (h * 31 + ord(ch)) % ROLL_MOD
    assert rows[1].roll_min <= h  # h is window 0; min over all windows


def test_ngram_jaccard_duplicate_pairs_not_inflated(spark):
    """A doubled candidate pair must not double the intersection count
    (review finding: pair-keyed verify inflated jaccard on dup pairs)."""
    from qfspark.dedup import ngram_jaccard

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2)], "doc_a long, doc_b long")
    rows = ngram_jaccard(df, pairs).collect()
    assert len(rows) == 1
    assert rows[0].jaccard == 1.0  # identical docs; would be 2.0 inflated


def test_bmp_roundtrip_and_resize():
    import numpy as np

    rng = np.random.RandomState(5)
    for w, h in [(4, 3), (5, 7), (13, 2), (1, 1)]:  # odd widths: stride pad
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        back = multimodal.decode_bmp(multimodal.encode_bmp(px))
        assert (back == px).all(), (w, h)
    px = np.zeros((4, 4, 3), np.uint8)
    px[0, 0] = (200, 100, 50)
    tiny = multimodal.resize_image(px, 1, 1)
    assert tuple(tiny[0, 0]) == (200, 100, 50)  # nearest = top-left
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"<html>not an image</html>")


def test_wav_real_features():
    import numpy as np

    rate, freq, amp = 16000, 440.0, 0.5
    t = np.arange(rate) / rate  # 1 second
    samples = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    payload = multimodal.encode_wav(samples, rate)
    assert multimodal.sniff_kind(payload) == "wav"
    f = multimodal.audio_features(payload)
    assert abs(f[0] - 1.0) < 1e-3                   # duration
    assert abs(f[1] - 16.0) < 1e-6                  # framerate kHz
    assert abs(f[2] - amp / np.sqrt(2)) < 0.01      # sine RMS
    assert abs(f[4] - 2 * freq / rate) < 0.005      # zero-crossing rate


def test_media_features_sniffs_real_formats(spark):
    import numpy as np

    px = np.full((3, 4, 3), (10, 20, 30), np.uint8)
    bmp = multimodal.encode_bmp(px)
    wav = multimodal.encode_wav(
        (np.ones(100) * 1000).astype(np.int16), 8000)
    df = spark.createDataFrame(
        [("img", bmp), ("aud", wav), ("doc", b"<html>plain</html>")],
        "media_id string, payload binary")
    rows = {r.media_id: r for r in multimodal.extract_media_features(
        df, "media_id", "payload", kind="unknown").collect()}
    assert rows["img"].kind == "bmp"
    assert rows["img"].features[0] == 4 and rows["img"].features[1] == 3
    assert abs(rows["img"].features[2] - 10) < 1e-4  # mean R exact (solid)
    assert rows["aud"].kind == "wav"
    assert rows["doc"].kind == "unknown"  # fell back to byte featurizer


def test_resize_images_spark(spark):
    import numpy as np

    px = np.zeros((8, 8, 3), np.uint8)
    px[:4] = (255, 0, 0)   # top half red
    px[4:] = (0, 0, 255)   # bottom half blue
    df = spark.createDataFrame(
        [("a", multimodal.encode_bmp(px)),
         ("p", multimodal.encode_png(px)), ("b", b"not-bmp")],
        "media_id string, payload binary")
    out = {r.media_id: r for r in multimodal.resize_images(
        df, "media_id", "payload", 2, 2).collect()}
    assert out["a"].resized and out["p"].resized and not out["b"].resized
    small = multimodal.decode_bmp(bytes(out["a"].payload))
    assert small.shape == (2, 2, 3)
    assert tuple(small[0, 0]) == (255, 0, 0)   # top row stayed on top
    assert tuple(small[1, 0]) == (0, 0, 255)
    # PNG resize round-trips through the PNG codec and matches the BMP
    small_p = multimodal.decode_png(bytes(out["p"].payload))
    assert (small_p == small).all()


# ---------------------------------------------------------------------------
# connected components / cluster dedup
# ---------------------------------------------------------------------------

def test_connected_components_chain_clique_isolated(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
             (20, 21), (30, 31), (31, 32), (5, 1)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.node: r.component
           for r in dedup.connected_components(pdf).collect()}
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10,
            20: 20, 21: 20, 30: 30, 31: 30, 32: 30}
    assert got == want


def test_connected_components_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    pairs = [(i, i + 1) for i in range(0, 40, 2)] + \
            [(i, i + 3) for i in range(0, 30, 5)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = sorted(map(tuple, dedup.connected_components(pdf).collect()))
    con = duckdb.connect()
    con.register("p", pd.DataFrame(pairs, columns=["doc_a", "doc_b"]))
    want = sorted(map(tuple, con.sql(
        dedup.duckdb_connected_components_sql("p")).fetchall()))
    assert got == want


def test_connected_components_long_path_converges(spark):
    """A 64-node path needs O(log n) pointer-jumping rounds, well under
    max_iter — everything collapses to component 0."""
    pairs = [(i, i + 1) for i in range(63)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    comp = dedup.connected_components(pdf).select("component").distinct()
    assert [r.component for r in comp.collect()] == [0]


def test_dedup_clusters_keeps_min_and_isolated(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
    surv = sorted(r.doc_id
                  for r in dedup.dedup_clusters(docs, pairs).collect())
    assert surv == [1, 10, 99]


def test_clean_corpus_cluster_mode(spark):
    """Cluster mode keeps >= the per-pair mode (transitive chains
    collapse to one survivor instead of dropping every doc_b), and both
    keep one doc per exact-duplicate group."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairwise = {r.doc_id for r in
                dedup.clean_corpus(docs, near_dup_jaccard=0.3).collect()}
    clustered = {r.doc_id for r in dedup.clean_corpus(
        docs, near_dup_jaccard=0.3, cluster=True).collect()}
    # the component minimum is the smallest id in its cluster, so it can
    # never be a pair's doc_b (pairs have doc_a < doc_b): every cluster
    # survivor also survives the per-pair policy, while transitive
    # chains can make the per-pair policy keep extra docs
    assert clustered and clustered <= pairwise


# ---------------------------------------------------------------------------
# decontamination / PII scrubbing
# ---------------------------------------------------------------------------

def test_decontaminate_flags_planted_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated text with no shared grams here at all"),
         (3, "quick brown fox jumps over the lazy dog and then sleeps")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    got = {r.doc_id: (r.overlap_shingles, r.contaminated)
           for r in textops.decontaminate(
               docs, bench, k=4, min_overlap=2).collect()}
    assert got[1][1] and got[3][1] and not got[2][1], got
    assert got[2][0] == 0


def test_decontaminate_matches_duckdb(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(map(tuple, textops.decontaminate(
        docs, docs.where("pmod(doc_id, 17) = 0"),
        k=6, min_overlap=1).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    want = sorted(map(tuple, con.sql(textops.duckdb_decontaminate_sql(
        "text", 6, 1, "documents",
        "(SELECT * FROM documents WHERE doc_id % 17 = 0)")).fetchall()))
    assert got == want


def test_scrub_pii_redacts_all_patterns(spark):
    rows = [
        (1, "mail me at alice.smith+x@sub.example.org please"),
        (2, "server at 192.168.001.042 went down"),
        (3, "call +1 555-123-4567 or 555 987-6543"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text_scrubbed, r.n_redactions)
           for r in textops.scrub_pii(df, "text").collect()}
    assert "@" not in got[1][0] and got[1][1] == 1
    assert "192.168" not in got[2][0] and got[2][1] == 1
    assert got[3][0].count("[PII]") == 2 and got[3][1] == 2
    assert got[4] == ("nothing sensitive here", 0)


def test_scrub_pii_matches_duckdb(spark):
    rows = [(i, t) for i, t in enumerate([
        "alice@example.com and 10.0.0.1 and 555-123-4567",
        "edge a@b.co end", "1.2.3.4", "+44 123-456-7890 x",
        "plain text only", "two emails a@x.com b@y.org",
    ])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, textops.scrub_pii(df, "text").collect()))
    con = duckdb.connect()
    con.register("src", df.toPandas())
    want = sorted(map(tuple, con.sql(
        textops.duckdb_scrub_pii_sql("text", "src")).fetchall()))
    assert got == want


def test_connected_components_matches_union_find(spark):
    """Randomized graphs (fixed seeds) vs an independent pure-Python
    union-find oracle."""
    import random

    for seed in (7, 41, 1234):
        rng = random.Random(seed)
        n = 120
        pairs = sorted({tuple(sorted(rng.sample(range(n), 2)))
                        for _ in range(150)})
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for p in pairs for x in p}
        want = {x: find(x) for x in touched}

        pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {r.node: r.component
               for r in dedup.connected_components(pdf).collect()}
        assert got == want, seed


def test_repetition_stats_flags_repetitive_doc(spark):
    df = spark.createDataFrame(
        [(1, "buy now " * 30), (2, "a genuinely varied sentence with "
                                  "many different words in it")],
        "doc_id long, text string")
    got = {r.doc_id: r.dup_gram_ratio
           for r in textops.repetition_stats(df.selectExpr(
               "doc_id", "trim(text) AS text")).collect()}
    assert got[1] > 0.9 and got[2] == 0.0, got


def test_repetition_stats_matches_duckdb(spark, docs, con):
    _compare(
        textops.repetition_stats(docs, k=4),
        con.sql(textops.duckdb_repetition_stats_sql(
            "text", 4, "documents")).df(),
        ["doc_id"],
    )
