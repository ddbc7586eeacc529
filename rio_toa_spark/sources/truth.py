"""Ground-truth side-table builders for fixture generation.

Every builder here computes EXPECTED outputs for a driver query with
an independent numpy re-derivation — the reference worker semantics
transliterated directly (the same approach as tests/oracle.py), or the
deterministic media/ANN pipeline replayed driver-side — deliberately
NOT by calling the engine's kernels (functions/kernels.py,
functions/sun.py, operators/*). The resulting parquet side tables are
genuine oracles: the DuckDB twins ``read_parquet`` them, so the
distributed pipelines must reproduce every hash and value exactly.

Reference semantics transliterated from:
  _reflectance_worker      rio_toa/reflectance.py:77-128
  _brightness_temp_worker  rio_toa/brightness_temp.py:65-91
  sun_utils                rio_toa/sun_utils.py:6-215
"""

from __future__ import annotations

import datetime
import hashlib

import numpy as np
import pyarrow as pa


def h60(buf: bytes) -> int:
    """The repo-wide portable 60-bit content hash: md5 hex prefix of
    15 nibbles as int64 (== Spark conv(substring(md5(x),1,15),16,10)
    == DuckDB CAST('0x'||substring(md5(x),1,15) AS BIGINT))."""
    return int(hashlib.md5(buf).hexdigest()[:15], 16)


# ------------------------------------------------------------- TOA truth


def _sun_elevation_grid(bbox, shape, date_str: str, time_str: str) -> np.ndarray:
    """Per-pixel solar elevation, float32 index grids / python-float
    scalars exactly like rio_toa/sun_utils.py:148-215."""
    rows, cols = shape
    w, s, e, n = bbox
    utc = datetime.datetime.strptime(
        (date_str + " " + time_str).split(".")[0], "%Y-%m-%d %H:%M:%S"
    )
    dec_hour = utc.hour + utc.minute / 60.0 + utc.second / 3600.0
    day = utc.timetuple().tm_yday
    xcell = (e - w) / float(cols)
    ycell = (n - s) / float(rows)
    lat_i, lng_i = np.indices((rows, cols), dtype=np.float32)
    lng = lng_i * xcell + w + xcell / 2.0
    lat = np.flipud(lat_i) * ycell + s + ycell / 2.0

    declination = np.arcsin(
        np.sin(np.deg2rad(23.45)) * np.sin(np.deg2rad(360.0 / 365.0) * (day - 81))
    )
    localtime = (lng / 180.0) * 12 + dec_hour
    lstm = 15 * (localtime - dec_hour)
    b = np.deg2rad((360.0 / 365.0) * (day - 81))
    eot = 9.87 * np.sin(2 * b) - 7.53 * np.cos(b) - 1.5 * np.sin(b)
    solar_angle = 15 * (localtime + (4 * (lng - lstm) + eot) / 60.0 - 12)
    hour_angle = np.deg2rad(solar_angle)
    lat_r = np.deg2rad(lat)
    return np.rad2deg(
        np.arcsin(
            np.sin(declination) * np.sin(lat_r)
            + np.cos(declination) * np.cos(lat_r) * np.cos(hour_angle)
        )
    )


def _reflectance_ps_f32(dn, mr, ar, bbox, date_str, time_str) -> np.ndarray:
    """Per-pixel-sun reflectance for one band, transliterated from
    _reflectance_worker (rio_toa/reflectance.py:77-128): depth-1 stack,
    python-float M/A LISTS (value-based f64 upcast), clip to [0,1],
    factor 1.0 (float32 dst), src_nodata=0."""
    rows, cols = dn.shape
    data = dn.astype(np.float32)[np.newaxis, :, :]
    elev = _sun_elevation_grid(bbox, (rows, cols), date_str, time_str).reshape(
        rows, cols, 1
    )
    if np.any(elev < 0.0):
        raise ValueError("negative sun elevation in fixture scene")
    img = np.rollaxis(data, 0, 3)
    rf = (([mr] * img.astype(np.float32)) + [ar]) / np.sin(np.deg2rad(elev))
    rf[img == 0] = 0.0
    rf = np.rollaxis(rf, 2, 0)
    rf[rf < 0.0] = 0.0
    rf[rf > 1.0] = 1.0
    rf *= 1.0
    return rf.astype(np.float32)


def _brighttemp_f32(dn, ml, al, k1, k2) -> np.ndarray:
    """Brightness temperature (Kelvin), transliterated from
    _brightness_temp_worker (rio_toa/brightness_temp.py:65-91):
    radiance with nodata 0 zeroed, then NaN-masked, K2/ln(K1/L + 1)."""
    lum = ml * dn.astype(np.float32) + al
    lum[dn == 0] = 0.0
    lum[dn == 0] = np.nan
    with np.errstate(invalid="ignore"):  # NaN nodata propagates by design
        temp = k2 / np.log((k1 / lum) + 1)
    return temp.astype(np.float32)


def toa_truth(scenes: list[tuple[str, dict]], tiles: pa.Table) -> pa.Table:
    """Expected per-tile output-buffer hashes for the two
    transcendental TOA pipelines (per-pixel-sun reflectance band 4;
    brightness temp band 10) — the pipelines whose values CANNOT be
    recomputed cross-engine in SQL (sin/log have no bitwise f32
    contract), closed instead by hashing the expected f32 buffers."""
    mtls = {sid: mtl["L1_METADATA_FILE"] for sid, mtl in scenes}
    cols: dict[str, list] = {
        k: [] for k in ("scene_id", "band", "tile_row", "tile_col", "kind", "px_hash")
    }
    for r in tiles.to_pylist():
        if r["band"] not in (4, 10):
            continue
        mtl = mtls[r["scene_id"]]
        rr = mtl["RADIOMETRIC_RESCALING"]
        dn = np.frombuffer(r["pixels"], dtype="<u2").reshape(r["height"], r["width"])
        if r["band"] == 4:
            pm = mtl["PRODUCT_METADATA"]
            buf = _reflectance_ps_f32(
                dn,
                rr["REFLECTANCE_MULT_BAND_4"],
                rr["REFLECTANCE_ADD_BAND_4"],
                [r["bounds_w"], r["bounds_s"], r["bounds_e"], r["bounds_n"]],
                pm["DATE_ACQUIRED"],
                pm["SCENE_CENTER_TIME"],
            ).tobytes()
            kind = "reflectance_ps"
        else:
            tc = mtl["TIRS_THERMAL_CONSTANTS"]
            buf = _brighttemp_f32(
                dn,
                rr["RADIANCE_MULT_BAND_10"],
                rr["RADIANCE_ADD_BAND_10"],
                tc["K1_CONSTANT_BAND_10"],
                tc["K2_CONSTANT_BAND_10"],
            ).tobytes()
            kind = "brighttemp_k"
        cols["scene_id"].append(r["scene_id"])
        cols["band"].append(r["band"])
        cols["tile_row"].append(r["tile_row"])
        cols["tile_col"].append(r["tile_col"])
        cols["kind"].append(kind)
        cols["px_hash"].append(h60(buf))
    return pa.table(
        {
            "scene_id": pa.array(cols["scene_id"], pa.string()),
            "band": pa.array(cols["band"], pa.int32()),
            "tile_row": pa.array(cols["tile_row"], pa.int32()),
            "tile_col": pa.array(cols["tile_col"], pa.int32()),
            "kind": pa.array(cols["kind"], pa.string()),
            "px_hash": pa.array(cols["px_hash"], pa.int64()),
        }
    )


# ----------------------------------------------------------- media truth


def media_truth(n_media: int = 64, size: int = 24, out_size: int = 8) -> pa.Table:
    """Expected (media_id, feature_idx, value) for the media_pipeline
    driver query: seeded 24x24x3 image -> nearest-neighbor 8x8 resize
    -> per-channel mean/std features, re-derived from the PRE-ENCODE
    pixel array (the PNG encode->decode roundtrip is lossless, asserted
    bitwise in tests/test_multimodal.py — starting before the codec
    makes the roundtrip part of what this oracle proves)."""
    step = size // out_size  # nearest-neighbor: arange(out)*size//out == 0,step,..
    mids, idxs, vals = [], [], []
    for mid in range(n_media):
        img = np.random.default_rng(mid + 17).integers(
            0, 256, size=(size, size, 3), dtype=np.uint8
        )
        small = img[::step, ::step].astype(np.float32)
        feats = np.concatenate(
            [small.mean(axis=(0, 1)), small.std(axis=(0, 1))]
        ).astype(np.float32)
        for i, v in enumerate(feats):
            mids.append(mid)
            idxs.append(i)
            vals.append(v)
    return pa.table(
        {
            "media_id": pa.array(mids, pa.int64()),
            "feature_idx": pa.array(idxs, pa.int32()),
            "value": pa.array(np.array(vals, dtype=np.float32), pa.float32()),
        }
    )


def frames_truth(n_media: int = 32, n_frames: int = 4, total: int = 10) -> pa.Table:
    """Expected (media_id, frame_idx, pixels_hash) for the media_frames
    driver query: the query mints 10-frame Motion-PNG AVI videos from
    seeded 24x24x3 frame arrays (rng(9000 + media_id*100 + frame)) and
    samples 4 frames evenly. Motion-PNG is lossless, so the expected
    pixel hashes are re-derived here from the PRE-ENCODE arrays — this
    builder calls NO codec; a green row therefore proves the engine's
    RIFF container walk, even-stride frame sampling (source indices
    i*total//n), and pure-numpy PNG decode all bitwise end to end."""
    mids, idxs, hashes = [], [], []
    for mid in range(n_media):
        for i in range(n_frames):
            src = i * total // n_frames
            frame = np.random.default_rng(9000 + mid * 100 + src).integers(
                0, 256, size=(24, 24, 3), dtype=np.uint8
            )
            mids.append(mid)
            idxs.append(src)
            hashes.append(h60(frame.tobytes()))
    return pa.table(
        {
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "pixels_hash": pa.array(hashes, pa.int64()),
        }
    )


def audio_truth(n_media: int = 48) -> pa.Table:
    """Expected (media_id, duration_s, feature_idx, value) for the
    media_audio driver query: the query mints PCM16 WAV payloads from
    seeded int16 sample arrays (rng(7000+media_id), n=800+37*media_id
    samples, 1 or 2 channels) and runs decode_audio -> audio_features.
    WAV PCM is lossless, so the expected per-channel rms/peak/zcr
    features are re-derived here from the PRE-ENCODE samples with the
    identical numpy ops — this builder calls NO codec; a green row
    proves the RIFF/WAVE parse and the feature kernel end to end."""
    mids, durs, idxs, vals = [], [], [], []
    for mid in range(n_media):
        n = 800 + 37 * mid
        ch = 1 + mid % 2
        s = np.random.default_rng(7000 + mid).integers(
            -(1 << 15), 1 << 15, size=(n, ch), dtype=np.int16
        )
        f = s.astype(np.float64)
        feats = np.concatenate(
            [
                np.sqrt((f**2).mean(axis=0)),
                np.abs(f).max(axis=0),
                np.abs(np.diff(np.signbit(f).astype(np.int8), axis=0)).mean(axis=0),
            ]
        ).astype(np.float32)
        for i, v in enumerate(feats):
            mids.append(mid)
            durs.append(n / 16_000.0)
            idxs.append(i)
            vals.append(v)
    return pa.table(
        {
            "media_id": pa.array(mids, pa.int64()),
            "duration_s": pa.array(durs, pa.float64()),
            "feature_idx": pa.array(idxs, pa.int32()),
            "value": pa.array(np.array(vals, dtype=np.float32), pa.float32()),
        }
    )


# ------------------------------------------------------------- ANN truth


def embeddings_arrow(n: int = 2000, d: int = 64, seed: int = 97) -> pa.Table:
    """Deterministic float32 embedding corpus (vec_id, embedding) for
    the fixture-backed ANN queries."""
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )


def _seq_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Strict left-to-right double fold — the summation order of Spark
    F.aggregate and DuckDB list_reduce (NOT numpy pairwise/BLAS)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def ann_truth(
    emb: pa.Table,
    n_queries: int = 3,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 13,
) -> pa.Table:
    """Expected (q_id, vec_id, rank) of the IVF top-k pipeline,
    re-derived driver-side: the deterministic centroid build (all rows
    in key order — sample(1.0) keeps every row — f64-normalized, 5
    Lloyd rounds from the rng(seed) start), argmax list assignment,
    stable-argsort probe selection, and the exact sequential-fold
    cosine with (cosine DESC, vec_id ASC) ranking. Every float op
    replays the operator's op order (operators/similarity.py:84-178),
    so the distributed result must match row-for-row."""
    ids = emb.column("vec_id").to_numpy()
    vecs = np.array(
        [np.asarray(v, dtype=np.float64) for v in emb.column("embedding").to_pylist()]
    )
    order = np.argsort(ids, kind="stable")
    sample = vecs[order].copy()
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    centroids = sample[idx].copy()
    for _ in range(5):
        dmat = sample @ centroids.T
        assign = np.argmax(dmat, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    centroids[c] = m / nrm

    corpus_dots = vecs @ centroids.T
    corpus_list = np.argmax(corpus_dots, axis=1)
    q_mask = ids < n_queries
    q_dots = vecs[q_mask] @ centroids.T
    probe_order = np.argsort(-q_dots, axis=1, kind="stable")[:, :n_probe]

    # Exactness guard for the oracle contract: the engine computes the
    # same argmax/argsort over (batch x centroids) BLAS matmuls whose
    # summation blocking can differ from this full-matrix one by ~1e-13
    # relative. A near-tied dot product could then flip a list
    # assignment (or probe order) between the engine and this oracle
    # nondeterministically across batch shapes/parallelism. Assert at
    # GENERATION time that every decision has a margin orders of
    # magnitude above f64 blocking noise, so the fixture itself proves
    # the row-exact contract is stable; a violation means "reseed the
    # fixture", never a flaky driver run.
    top2 = np.partition(corpus_dots, -2, axis=1)[:, -2:]
    min_assign_margin = float(np.min(top2[:, 1] - top2[:, 0]))
    probe_sorted = -np.sort(-q_dots, axis=1)[:, : n_probe + 1]
    min_probe_margin = float(np.min(np.diff(-probe_sorted, axis=1)))
    if min(min_assign_margin, min_probe_margin) < 1e-6:
        raise ValueError(
            "ann_truth: near-tied centroid dot product (margin %.3g) — "
            "reseed the embeddings fixture to keep the exact-oracle "
            "contract robust to BLAS summation-order variation"
            % min(min_assign_margin, min_probe_margin)
        )

    out_q, out_v, out_r = [], [], []
    for qi, q_id in enumerate(ids[q_mask]):
        probes = set(int(p) for p in probe_order[qi])
        qv = vecs[ids == q_id][0]
        qn = np.sqrt(_seq_dot(qv, qv))
        scored = []
        for j in range(len(ids)):
            if int(corpus_list[j]) not in probes:
                continue
            ev = vecs[j]
            cos = _seq_dot(ev, qv) / (np.sqrt(_seq_dot(ev, ev)) * qn)
            scored.append((-cos, int(ids[j])))
        scored.sort()
        for rank, (_, vid) in enumerate(scored[:k], start=1):
            out_q.append(int(q_id))
            out_v.append(vid)
            out_r.append(rank)
    return pa.table(
        {
            "q_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )
