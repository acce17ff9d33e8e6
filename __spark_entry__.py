"""Driver contract for the osmgraft PySpark engine.

``entry`` runs the flagship OSM label pipeline (the reference's ``main``)
on the engine's native interleaved-span documents, synthesized
deterministically at sf0.001-ish scale (the driver's testdata has no span
table; the generator is seed-fixed, SURVEY.md §7.1).

``queries``/``oracle_sql`` cover every operator class from SURVEY.md §2:
SQL-expressible operators run over the driver's sf tables and are
value-checked against DuckDB; engine-native operators (span decode,
polygon assembly, label UDF, cell encode, LSH) are included as rows-only
checks (documented — no ANSI-SQL equivalent exists for them).

Float-producing oracled queries round to >=4 decimals on BOTH sides so
JVM-vs-DuckDB last-bit arithmetic differences cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SEED = 42

# level ids for the default config (pinned by tests/test_classify.py):
# MEGA_CITY=16 LARGE_CITY=15 CITY=14 SMALL_CITY=13 LARGE_TOWN=12 TOWN=11
# SMALL_TOWN=10 VILLAGE=9 SUBURB=8 HAMLET=7 SCHOOL=6 UNIVERSITY=5
# LIBRARY=4 HOSPITAL=3 CAFE=2 SMALL_VENUE=1


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Deterministic URL synthesis shared VERBATIM by the domain_caps Spark
# query (via F.expr) and its DuckDB oracle — the documents table has no
# URL column, so both engines derive the same one from (doc_id, source).
# Coverage by construction: mixed-case schemes/hosts, default and
# non-default ports, tracking params, fragments, multi-part TLDs, and
# non-URL rows (mailto / free text) that must yield NULLs.
_URL_FRAG = (
    "case when doc_id % 97 = 0 then 'mailto:a@b.com' "
    "when doc_id % 89 = 0 then 'not a url' "
    "else concat("
    "case when doc_id % 3 = 0 then 'https' when doc_id % 3 = 1 then 'HTTP' "
    "else 'HtTpS' end, "
    "'://', "
    "case when doc_id % 2 = 0 then 'WWW.' else '' end, "
    "source, "
    "case when doc_id % 4 = 0 then '.CO.UK' when doc_id % 4 = 1 then '.com' "
    "when doc_id % 4 = 2 then '.Example.COM' else '.org' end, "
    "case when doc_id % 5 = 0 then ':443' when doc_id % 5 = 1 then ':80' "
    "when doc_id % 5 = 2 then ':8080' else '' end, "
    "'/p/', doc_id, "
    "case when doc_id % 3 = 0 then concat('?utm_source=a&q=', doc_id % 7) "
    "when doc_id % 3 = 1 then '?utm_campaign=x&gclid=1' else '' end, "
    "case when doc_id % 2 = 1 then '#sec' else '' end) end"
)


def _synth_docs(spark: SparkSession, n_docs: int = 1200):
    from osmgraft.sources.synth import SynthParams, synth_blobs, synth_documents

    p = SynthParams(n_docs=n_docs, seed=SEED)
    return synth_documents(spark, p, partitions=8), synth_blobs(spark, p, partitions=8)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved docs -> decode -> classify -> areas -> rank ->
    label balls -> slippy tiles. Returns the labeled, tiled frame."""
    from osmgraft.operators.tiles import assign_tiles
    from osmgraft.plans.pipeline import label_pipeline

    docs, blobs = _synth_docs(spark)
    labels = label_pipeline(spark, docs, blobs)
    return assign_tiles(labels, z=10)


# ---------------------------------------------------------------------------
# shared synthetic-point derivation (identical formula in Spark + SQL)
# ---------------------------------------------------------------------------

_PTS_SQL = (
    "select c_custkey as pid, (c_acctbal % 120.0)/2.0 as lat, "
    "(cast(c_custkey * 37 % 360 as double)) - 180.0 as lon, "
    "c_nationkey as grp from customer"
)


_MEDIA_ORACLE_PATH = "/tmp/osmgraft_media_oracle.parquet"


def _stage_media_oracle(n: int = 200) -> str:
    """Deterministic opaque-media parquet staged WITHOUT Spark (pyarrow),
    so it exists before either side of the multimodal oracle runs. The
    payload rule is the table's definition: both Spark (length(payload))
    and DuckDB (octet_length) measure the same staged bytes."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(_MEDIA_ORACLE_PATH):
        return _MEDIA_ORACLE_PATH
    ids, mimes, payloads = [], [], []
    for i in range(n):
        seed = hashlib.blake2b(str(i).encode(), digest_size=32).digest()
        length = 64 + (i * 37) % 448
        payload = (seed * ((length // 32) + 1))[:length]
        ids.append(i)
        mimes.append(("image/png", "audio/wav", "video/mp4")[i % 3])
        payloads.append(payload)
    table = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(mimes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    pq.write_table(table, _MEDIA_ORACLE_PATH)
    return _MEDIA_ORACLE_PATH


_WAV_ORACLE_PATH = "/tmp/osmgraft_wav_oracle.parquet"


def _stage_wav_oracle(n: int = 150) -> str:
    """Deterministic VALID PCM16 WAV payloads (sine + content-keyed phase)
    staged without Spark. The ``rate`` column is the oracle's side-channel:
    DuckDB recomputes n_samples/duration arithmetically from
    ``octet_length`` + ``rate`` (canonical 44-byte header, 2 bytes/sample),
    while the Spark side must recover both from the BYTES alone."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmgraft.operators.multimodal import encode_wav_pcm16

    if os.path.exists(_WAV_ORACLE_PATH):
        return _WAV_ORACLE_PATH
    rates = (8000, 16000, 44100)
    ids, rate_col, payloads = [], [], []
    for i in range(n):
        rate = rates[i % 3]
        n_samples = 400 + (i * 97) % 4000
        t = np.arange(n_samples) / rate
        freq = 200.0 + 13.0 * i
        wave = 0.7 * np.sin(2 * np.pi * freq * t + 0.01 * i)
        ids.append(i)
        rate_col.append(rate)
        payloads.append(encode_wav_pcm16(wave, rate))
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "rate": pa.array(rate_col, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        _WAV_ORACLE_PATH,
    )
    return _WAV_ORACLE_PATH


_MP4_ORACLE_PATH = "/tmp/osmgraft_mp4_oracle.parquet"


def _stage_mp4_oracle(n: int = 120) -> str:
    """Deterministic VALID ISO-BMFF payloads (ftyp+moov/mvhd+trak/tkhd,
    mixed timescales) staged without Spark. duration/w/h/n_tracks are the
    oracle's side-channel; the Spark side must recover all four from the
    BYTES via the struct-only box walk."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmgraft.operators.multimodal import encode_mp4_stub

    if os.path.exists(_MP4_ORACLE_PATH):
        return _MP4_ORACLE_PATH

    ids, durs, ws, hs, payloads = [], [], [], [], []
    for i in range(n):
        dur = 500 + (i * 977) % 60_000
        w = 16 * (1 + (i * 3) % 120)
        h = 16 * (1 + (i * 5) % 68)
        ts = (1000, 90_000, 600, 25_000)[i % 4]
        # writer quantizes duration to the timescale; record the value the
        # parser can actually recover (floor twice, like the parser does)
        dur_q = (dur * ts // 1000) * 1000 // ts
        ids.append(i)
        durs.append(dur_q)
        ws.append(w)
        hs.append(h)
        payloads.append(encode_mp4_stub(dur, w, h, timescale=ts))
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "dur_ms": pa.array(durs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        _MP4_ORACLE_PATH,
    )
    return _MP4_ORACLE_PATH


_JPEG_ORACLE_PATH = "/tmp/osmgraft_jpeg_oracle_v2.parquet"


def _stage_jpeg_oracle(n: int = 120) -> str:
    """Deterministic VALID JPEG payloads staged without Spark, mixing
    baseline grayscale / RGB 4:4:4 / RGB 4:2:0 with restart intervals AND
    progressive (SOF2) streams with the default multi-scan script. JPEG
    is lossy, so the oracle side-channel (``w``/``h``/``px_sum``) is
    produced by decoding each payload ONCE at staging time (driver-side,
    same deterministic decoder); the Spark query must reproduce all three
    from the BYTES through the full entropy-decode + IDCT + color path on
    executors. What the hash match proves: the distributed Arrow kernel
    decodes byte-identically to the staging decode."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmgraft.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    if os.path.exists(_JPEG_ORACLE_PATH):
        return _JPEG_ORACLE_PATH

    ids, ws, hs, sums, payloads = [], [], [], [], []
    for i in range(n):
        w = 16 + (i * 7) % 48
        h = 16 + (i * 11) % 40
        rng = np.random.default_rng([97, i])
        y, x = np.mgrid[0:h, 0:w]
        base = ((x * 5 + y * 3 + i) % 256).astype(np.uint8)
        if i % 4 == 0:
            img = base
            payload = encode_jpeg_baseline(img, quality=90 + (i % 11))
        elif i % 4 == 1:
            img = np.stack([base, base[::-1], rng.integers(0, 256, (h, w), dtype=np.uint8)], axis=2)
            payload = encode_jpeg_baseline(img, quality=85 + (i % 16), subsampling="444")
        elif i % 4 == 2:
            img = np.stack([base, np.roll(base, 3, axis=1), np.roll(base, 5, axis=0)], axis=2)
            payload = encode_jpeg_baseline(
                img, quality=80 + (i % 21), subsampling="420", restart_interval=(i % 4)
            )
        else:  # progressive: multi-scan spectral selection + SA
            img = np.stack([base, np.roll(base, 2, axis=0), base[:, ::-1]], axis=2)
            payload = encode_jpeg_progressive(
                img, quality=82 + (i % 19), subsampling="420" if i % 2 else "444"
            )
        dec = decode_jpeg(payload)
        ids.append(i)
        hs.append(dec.shape[0])
        ws.append(dec.shape[1])
        sums.append(int(dec.astype(np.int64).sum()))
        payloads.append(payload)
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        _JPEG_ORACLE_PATH,
    )
    return _JPEG_ORACLE_PATH


_AVI_ORACLE_PATH = "/tmp/osmgraft_avi_oracle.parquet"
_AVI_TRUTH_PATH = "/tmp/osmgraft_avi_truth.parquet"
_AVI_FPS_OUT = 2.0


def _stage_avi_oracle(n: int = 40) -> tuple[str, str]:
    """Deterministic VALID MJPEG-AVI payloads (mixed fps/geometry/frame
    counts, gray + RGB frames) staged without Spark, plus the per-sampled-
    frame ground truth (media_id, frame_idx, frame_ms, w, h, px_sum)
    produced by decoding each payload ONCE at staging time with the same
    container walk + JPEG decode. The Spark query must reproduce every
    sampled frame's pixels from the BYTES on executors — hash match
    proves the distributed frame-sampling kernel decodes byte-identically
    to the staging decode."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmgraft.operators.jpegcodec import decode_jpeg
    from osmgraft.operators.multimodal import encode_avi_mjpeg, parse_avi_mjpeg

    if os.path.exists(_AVI_ORACLE_PATH) and os.path.exists(_AVI_TRUTH_PATH):
        return _AVI_ORACLE_PATH, _AVI_TRUTH_PATH

    ids, payloads = [], []
    t_id, t_idx, t_ms, t_w, t_h, t_sum = [], [], [], [], [], []
    for i in range(n):
        w = 16 + (i * 9) % 48
        h = 16 + (i * 5) % 32
        fps = (5.0, 10.0, 24.0, 30.0)[i % 4]
        n_frames = 4 + (i * 7) % 60
        frames = []
        for k in range(n_frames):
            y, x = np.mgrid[0:h, 0:w]
            base = ((x * 4 + y * 6 + k * 13 + i) % 256).astype(np.uint8)
            if i % 2:
                frames.append(np.stack([base, base[::-1], np.roll(base, k, axis=1)], axis=2))
            else:
                frames.append(base)
        payload = encode_avi_mjpeg(frames, fps=fps, quality=88 + (i % 13))
        ids.append(i)
        payloads.append(payload)
        # ground truth: same sampling rule as decode_video_frames
        meta = parse_avi_mjpeg(payload)
        dur_ms = meta["n_frames"] * meta["us_per_frame"] / 1000.0
        for k in range(max(int(dur_ms / 1000.0 * _AVI_FPS_OUT), 1)):
            frame_ms = int(k * 1000.0 / _AVI_FPS_OUT)
            src = min(int(frame_ms * 1000 / meta["us_per_frame"]), len(meta["frames"]) - 1)
            off, size = meta["frames"][src]
            img = decode_jpeg(payload[off : off + size])
            t_id.append(i)
            t_idx.append(k)
            t_ms.append(frame_ms)
            t_w.append(img.shape[1])
            t_h.append(img.shape[0])
            t_sum.append(int(img.astype(np.int64).sum()))
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        _AVI_ORACLE_PATH,
    )
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(t_id, pa.int64()),
                "frame_idx": pa.array(t_idx, pa.int32()),
                "frame_ms": pa.array(t_ms, pa.int32()),
                "w": pa.array(t_w, pa.int32()),
                "h": pa.array(t_h, pa.int32()),
                "px_sum": pa.array(t_sum, pa.int64()),
            }
        ),
        _AVI_TRUTH_PATH,
    )
    return _AVI_ORACLE_PATH, _AVI_TRUTH_PATH


_PNG_ORACLE_PATH = "/tmp/osmgraft_png_oracle.parquet"


def _stage_png_oracle(n: int = 120) -> str:
    """Deterministic VALID gray8 PNG payloads (mixed None/Up scanline
    filters, zlib-deflated) staged without Spark. ``w``/``h``/``px_sum``
    are the oracle's side-channel: DuckDB replays the staged geometry +
    pixel sum while the Spark side must recover all three from the BYTES
    (inflate + unfilter included — px_sum over reconstructed samples)."""
    import os
    import struct
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(_PNG_ORACLE_PATH):
        return _PNG_ORACLE_PATH

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ids, ws, hs, sums, payloads = [], [], [], [], []
    for i in range(n):
        w = 8 + (i * 7) % 40
        h = 5 + (i * 11) % 30
        y, x = np.mgrid[0:h, 0:w]
        img = ((x * 3 + y * 5 + i) % 256).astype(np.uint8)
        raw = b""
        for yy in range(h):  # alternate filter None / Up per row
            if yy % 2 == 0 or yy == 0:
                raw += b"\x00" + img[yy].tobytes()
            else:
                raw += b"\x02" + ((img[yy].astype(np.int32) - img[yy - 1]) & 0xFF).astype(
                    np.uint8
                ).tobytes()
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        ids.append(i)
        ws.append(w)
        hs.append(h)
        sums.append(int(img.astype(np.int64).sum()))
        payloads.append(png)
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        ),
        _PNG_ORACLE_PATH,
    )
    return _PNG_ORACLE_PATH


def _stay_oracle_sql(rounded: bool = True) -> str:
    """DuckDB replica of operators.trajectory.stay_points over the
    deterministic synthetic trajectories of q_stay_points. ``rounded``
    controls the centroid columns: the stay_points oracle compares them
    rounded; od_flows composes on the raw centroids."""
    cent = (
        "round(avg(lat), 4) as lat, round(avg(lon), 4) as lon"
        if rounded
        else "avg(lat) as lat, avg(lon) as lon"
    )
    return (
        "with fx as (select user_id, event_id, "
        "date_diff('second', TIMESTAMP '1970-01-01', date_trunc('second', ts)) as ts_s, "
        "cast(user_id % 120 as double)/2.0 + value % 0.01 as lat, "
        "cast(user_id*37 % 360 as double) - 180.0 + value % 0.01 as lon from events), "
        "st as (select *, lag(lat) over w as la1, lag(lon) over w as lo1 from fx "
        "window w as (partition by user_id order by ts_s asc, event_id asc)), "
        "br as (select *, case when la1 is null or "
        "2*6371008.8*asin(sqrt(pow(sin(radians(lat-la1)/2),2) + "
        "cos(radians(la1))*cos(radians(lat))*pow(sin(radians(lon-lo1)/2),2))) > 1500.0 "
        "then 1 else 0 end as b from st), "
        "run as (select *, sum(b) over (partition by user_id "
        "order by ts_s asc, event_id asc rows unbounded preceding) as stay_seq from br), "
        "agg as (select user_id, cast(stay_seq as bigint) as stay_seq, "
        "count(*) as n_fixes, min(ts_s) as t_start, max(ts_s) as t_end, "
        f"cast(max(ts_s) - min(ts_s) as bigint) as dwell_s, {cent} "
        "from run group by 1, 2) "
        "select * from agg where dwell_s >= 600 and n_fixes >= 3"
    )


def _s2_compact_oracle_sql(level_from: int = 13, level_to: int = 10) -> str:
    """DuckDB replica of functions.cells.compact_cells over the 4-children
    expansion of the distinct level-12 cells (see q_s2_compact): per level
    a window count/min over the parent key keeps incomplete siblings and
    promotes one representative of each complete group."""
    base = _s2_oracle_sql(level=12)
    k = 1 << (2 * (30 - level_from))
    parts = [
        f"with c{level_from} as (select cell + d*{k} as cell from "
        f"(select distinct s2_cell as cell from ({base}) b) s "
        "cross join (select unnest([-3,-1,1,3]) as d) ks)"
    ]
    for lvl in range(level_from, level_to, -1):
        plsb = 1 << (2 * (30 - (lvl - 1)))
        parts.append(
            f"p{lvl} as (select cell, ((cell & ~({plsb}-1)) | {plsb}) as par from c{lvl})"
        )
        parts.append(
            f"w{lvl} as (select cell, par, count(*) over (partition by par) as n, "
            f"min(cell) over (partition by par) as mn from p{lvl})"
        )
        parts.append(f"k{lvl} as (select cell, {lvl} as level from w{lvl} where n < 4)")
        parts.append(
            f"c{lvl - 1} as (select par as cell from w{lvl} where n = 4 and cell = mn)"
        )
    sel = " union all ".join(
        [f"select cell, level from k{lvl}" for lvl in range(level_from, level_to, -1)]
        + [f"select cell, {level_to} as level from c{level_to}"]
    )
    return ", ".join(parts) + " " + sel


def _s2_oracle_sql(level: int = 12) -> str:
    """Bit-exact DuckDB replica of osmgraft.functions.cells.s2_cell_id over
    the shared pts derivation: face selection + quadratic (u,v)->(s,t) +
    the 4-bit Hilbert lookup walk, with the lookup table embedded as a
    4096-element literal list. IEEE float ops (cos/sin/div/sqrt) reproduce
    numpy's bit-for-bit on this platform (verified over all sf rows)."""
    from osmgraft.functions.cells import _LOOKUP_POS

    lut = "[" + ",".join(str(int(v)) for v in _LOOKUP_POS) + "]"
    fc = (
        "case face when 0 then 0 when 1 then 2305843009213693952 "
        "when 2 then 4611686018427387904 when 3 then 6917529027641081856 "
        "when 4 then -9223372036854775808 else -6917529027641081856 end"
    )
    lsb = 1 << (2 * (30 - level))
    rounds = "".join(
        f"h{8 - k} as (select pid, face, i, j, n | ((b::bigint >> 2) << {8 * k}) as n, "
        f"(b & 3)::bigint as o from (select *, {lut}"
        f"[(((i >> {4 * k}) & 15) << 6) + (((j >> {4 * k}) & 15) << 2) + o + 1] as b "
        f"from h{7 - k}) t), "
        for k in range(7, -1, -1)
    )
    return (
        f"with pts as ({_PTS_SQL}), "
        "xyz as (select pid, cos(radians(lat))*cos(radians(lon)) as x, "
        "cos(radians(lat))*sin(radians(lon)) as y, sin(radians(lat)) as z from pts), "
        "fuv as (select pid, face, "
        "case face when 0 then y/x when 1 then -x/y when 2 then -x/z when 3 then z/x "
        "when 4 then z/y else -y/z end as u, "
        "case face when 0 then z/x when 1 then z/y when 2 then -y/z when 3 then y/x "
        "when 4 then -x/y else -x/z end as v "
        "from (select pid, x, y, z, "
        "(case when abs(x) >= abs(y) and abs(x) >= abs(z) then (case when x < 0 then 3 else 0 end) "
        "when abs(x) < abs(y) and abs(y) >= abs(z) then (case when y < 0 then 4 else 1 end) "
        "else (case when z < 0 then 5 else 2 end) end) as face from xyz) t), "
        "ij as (select pid, face, "
        "least(greatest(cast(trunc((case when u >= 0 then 0.5*sqrt(1+3*u) "
        "else 1-0.5*sqrt(1-3*u) end)*1073741824.0) as bigint), 0), 1073741823) as i, "
        "least(greatest(cast(trunc((case when v >= 0 then 0.5*sqrt(1+3*v) "
        "else 1-0.5*sqrt(1-3*v) end)*1073741824.0) as bigint), 0), 1073741823) as j "
        "from fuv), "
        "h0 as (select pid, face, i, j, 0::bigint as n, (face & 1)::bigint as o from ij), "
        f"{rounds}"
        f"leaf as (select pid, ({fc}) + n*2 + 1 as id from h8) "
        f"select pid, ((id & ~({lsb} - 1)) | {lsb}) as s2_cell from leaf"
    )


def _hex_cell_sql_expr(lat: str, lon: str, res: int) -> str:
    """Bit-exact hex-cell replica — lives in osmgraft/plans/sql_oracle.py
    (shared with the staged-corpus oracles)."""
    from osmgraft.plans.sql_oracle import hex_cell_sql_expr

    return hex_cell_sql_expr(lat, lon, res)


def _adaptive_cells_sql(base_res: int, max_rows: int, max_res: int) -> str:
    """SQL replica of skew.adaptive_cell_split over the pts derivation
    (generalized generator in osmgraft/plans/sql_oracle.py)."""
    from osmgraft.plans.sql_oracle import adaptive_cells_sql

    return adaptive_cells_sql(_PTS_SQL, base_res, max_rows, max_res)


# triangle vertex offsets (degrees) for the pip_triangles oracle — literal
# constants shared by the Spark query and the SQL replica
_TRI_DY = [7.123, -3.891, -4.207, 6.551, 0.913, -7.441]
_TRI_DX = [0.317, 8.659, -9.113, -5.227, 9.884, 2.031]


def _pip_triangles_sql() -> str:
    """SQL replica of the even-odd kernel over the same triangles: for each
    of the 3 edges (v1->v2, v2->v3, v3->v1), the kernel's exact test
    ``(y1>y) != (y2>y) and x < x1 + (y-y1)/(y2-y1)*(x2-x1)``; inside =
    odd crossing count."""
    dy = "[" + ",".join(repr(v) for v in _TRI_DY) + "]"
    dx = "[" + ",".join(repr(v) for v in _TRI_DX) + "]"
    verts = ", ".join(
        f"la + {dy}[cast((poly_id + {i}) % 6 as int) + 1] as y{i + 1}, "
        f"lo + {dx}[cast((poly_id + {i}) % 6 as int) + 1] as x{i + 1}"
        for i in range(3)
    )
    def edge(a, b):
        return (
            f"(case when ((y{a} > lat) != (y{b} > lat)) "
            f"and lat is not null "
            f"and lon < x{a} + (lat - y{a})/(y{b} - y{a})*(x{b} - x{a}) then 1 else 0 end)"
        )
    crossings = " + ".join([edge(1, 2), edge(2, 3), edge(3, 1)])
    return (
        "with tri as (select cast(n_nationkey as bigint) as poly_id, "
        "(n_nationkey % 9) * 9.0 - 36.789 as la, (n_nationkey * 37 % 300) - 150.123 as lo "
        "from nation), "
        f"v as (select poly_id, {verts} from tri) "
        f"select pid, poly_id from ({_PTS_SQL}) p, v "
        f"where ({crossings}) % 2 = 1"
    )


# Overlay-join oracle geometry: per-side triangle vertex offsets (literal
# doubles shared verbatim between the Spark frames and the SQL replay, so
# both engines compute bit-identical orientation signs).
_OVL_L_DY = (1.7321, 0.8913)
_OVL_L_DX = (0.4567, 1.9876)
_OVL_R_DY = (4.6912, 1.1358)
_OVL_R_DX = (6.247, 8.4692)

_OVL_L_SQL = (
    "select cast(c_custkey as bigint) as lid, "
    "(c_custkey % 120) * 0.55 - 33.13579 as a, "
    "(c_custkey * 37 % 320) * 0.9 - 144.24683 as b from customer"
)
_OVL_R_SQL = (
    "select cast(n_nationkey as bigint) as rid, "
    "(n_nationkey % 9) * 9.0 - 36.78913 as a, "
    "(n_nationkey * 29 % 300) - 150.56789 as b from nation"
)


def _poly_overlap_tris_sql() -> str:
    """SQL replica of the overlay join's EXACT kernel over two triangle
    sets (operators/overlay.py rings_intersect): intersect iff some edge
    pair properly crosses (strict orientation-sign products) OR — when no
    edges cross — vertex 1 of either triangle is inside the other
    (half-open even-odd, same arithmetic as the PIP kernel replay)."""
    lv = ", ".join(
        [f"a as ly1, b as lx1"]
        + [f"a + {repr(_OVL_L_DY[i])} as ly{i + 2}, b + {repr(_OVL_L_DX[i])} as lx{i + 2}" for i in range(2)]
    )
    rv = ", ".join(
        [f"a as ry1, b as rx1"]
        + [f"a + {repr(_OVL_R_DY[i])} as ry{i + 2}, b + {repr(_OVL_R_DX[i])} as rx{i + 2}" for i in range(2)]
    )

    def orient(ax, ay, bx, by, px, py):
        # exact parenthesization of overlay._orient
        return f"(({bx} - {ax}) * ({py} - {ay}) - ({by} - {ay}) * ({px} - {ax}))"

    edges = [(1, 2), (2, 3), (3, 1)]
    cross_terms = []
    for i, j in edges:
        for k, m in edges:
            d1 = orient(f"lx{i}", f"ly{i}", f"lx{j}", f"ly{j}", f"rx{k}", f"ry{k}")
            d2 = orient(f"lx{i}", f"ly{i}", f"lx{j}", f"ly{j}", f"rx{m}", f"ry{m}")
            d3 = orient(f"rx{k}", f"ry{k}", f"rx{m}", f"ry{m}", f"lx{i}", f"ly{i}")
            d4 = orient(f"rx{k}", f"ry{k}", f"rx{m}", f"ry{m}", f"lx{j}", f"ly{j}")
            cross_terms.append(f"({d1} * {d2} < 0 and {d3} * {d4} < 0)")

    def inside(px, py, pre):
        hits = []
        for i, j in edges:
            y1, y2 = f"{pre}y{i}", f"{pre}y{j}"
            x1, x2 = f"{pre}x{i}", f"{pre}x{j}"
            hits.append(
                f"(case when (({y1} > {py}) != ({y2} > {py})) "
                f"and {px} < {x1} + ({py} - {y1})/({y2} - {y1})*({x2} - {x1}) then 1 else 0 end)"
            )
        return "(" + " + ".join(hits) + ") % 2 = 1"

    pred = (
        "(" + " or ".join(cross_terms) + ")"
        f" or ({inside('lx1', 'ly1', 'r')}) or ({inside('rx1', 'ry1', 'l')})"
    )
    return (
        f"with lt as ({_OVL_L_SQL}), lv as (select lid, {lv} from lt), "
        f"rt as ({_OVL_R_SQL}), rv as (select rid, {rv} from rt) "
        f"select lid, rid from lv, rv where {pred}"
    )


def _snap_oracle_sql() -> str:
    """Brute-force SQL replay of the snap join: the operator's exact
    point-to-segment distance (same parenthesization, same three-case
    endpoint/endpoint/perpendicular branch, same cos(lat)
    equirectangular scaling), nearest per point via (dist2, sid)
    ordering, with the radius and meters-per-degree constants embedded as
    the driver-side Python doubles the Spark plan uses."""
    from osmgraft.operators.knn import DEG_M

    radius_deg2 = (250_000.0 / DEG_M) ** 2
    seg = (
        "select cast(s_suppkey as bigint) as sid, "
        "(s_suppkey % 110) * 0.5 - 27.123 as y1, "
        "(s_suppkey * 53 % 340) - 170.456 as x1, "
        "(s_suppkey % 110) * 0.5 - 27.123 + ((s_suppkey % 7) - 3) * 0.8 + 0.123 as y2, "
        "(s_suppkey * 53 % 340) - 170.456 + ((s_suppkey % 11) - 5) * 0.6 + 0.234 as x2 "
        "from supplier"
    )
    return (
        f"with p as ({_PTS_SQL}), s as ({seg}), "
        "c as (select pid, sid, "
        "(x1 - lon) * cos(radians(lat)) as xa, y1 - lat as ya, "
        "(x2 - lon) * cos(radians(lat)) as xb, y2 - lat as yb from p, s), "
        "d as (select pid, sid, xa, ya, xb, yb, xb - xa as dx, yb - ya as dy from c), "
        "e as (select pid, sid, xa, ya, xb, yb, dx, dy, "
        "dx*dx + dy*dy as len2, -(xa*dx + ya*dy) as u from d), "
        "g as (select pid, sid, case "
        "when u <= 0 then xa*xa + ya*ya "
        "when u >= len2 then xb*xb + yb*yb "
        "else greatest(0.0, xa*xa + ya*ya - u*u/len2) end as d2 from e) "
        f"select pid, sid, sqrt(d2) * {DEG_M!r} as dist_m from g "
        f"where d2 <= {radius_deg2!r} "
        "qualify row_number() over (partition by pid order by d2, sid) = 1"
    )


def _label_pipeline_oracle_sql() -> str:
    """DuckDB replica of the FULL flagship pipeline over the staged synth
    corpus (see osmgraft/plans/sql_oracle.py for the derivation notes)."""
    from osmgraft.plans.sql_oracle import label_pipeline_sql, stage_pipeline_corpus
    from osmgraft.sources.config import default_config

    docs_p, _, geom_p = stage_pipeline_corpus()
    return label_pipeline_sql(docs_p, geom_p, default_config())


def _staged_oracle(kind: str) -> str:
    """Companion oracles over the staged corpus (plans/sql_oracle.py)."""
    from osmgraft.plans import sql_oracle as so
    from osmgraft.sources.config import default_config

    docs_p, _, geom_p = so.stage_pipeline_corpus()
    if kind == "pip_admin":
        return so.pip_admin_sql(docs_p, geom_p)
    if kind == "dedup_labels":
        return so.dedup_labels_sql(docs_p, geom_p, default_config(), 2000.0)
    if kind == "adaptive_cells":
        return so.adaptive_cells_sql(so.node_points_sql(docs_p, geom_p), 3, 50, 8)
    raise ValueError(kind)


def _doc_dedup_oracle_sql() -> str:
    """SQL replica of q_doc_dedup_first: groups by the RAW span-sequence
    key string (kind US text US media_ref, spans joined with RS) where the
    Spark side groups by its xxhash64 — results agree iff the fingerprint
    is injective on the corpus, so the oracle also pins collision-freeness
    at this scale."""
    from osmgraft.plans.sql_oracle import stage_pipeline_corpus

    docs_p, _, _ = stage_pipeline_corpus()
    return f"""
with base as (select doc_id, spans from read_parquet('{docs_p}')),
dups as (
  select 'dup/' || doc_id as doc_id, spans from base
  where cast(split_part(doc_id, '/', 2) as bigint) % 7 = 0
),
allr as (select * from base union all select * from dups),
keyed as (
  select doc_id,
         array_to_string(
           list_transform(spans, s ->
             struct_extract(s, 'kind') || chr(31)
             || coalesce(struct_extract(s, 'text'), '') || chr(31)
             || coalesce(struct_extract(s, 'media_ref'), '')),
           chr(30)) as k
  from allr
)
select min(doc_id) as doc_id, count(*) as n_dupes from keyed group by k
"""


# --- map matching: deterministic trajectories along parallel road bundles ---
_MM_RADIUS_M = 10_000.0
_MM_SIGMA_M = 1_000.0
_MM_BETA_M = 1_000.0
_MM_CAND_K = 3


def _match_inputs(spark: SparkSession, sf_dir: str, n_rows: int = 60, n_bundles: int = 10):
    """(fixes, segments) for the map-matching queries: ``n_bundles`` road
    bundles (supplier 1..n_bundles, each with 8 parallel offset segments)
    and ``n_rows // 6`` movers (customer 1..n_rows -> 6 fixes each)
    walking bundle ``u % n_bundles + 1`` near its j=3 line with
    deterministic jitter. At the defaults every arithmetic step mirrors
    the oracle SQL expression-for-expression (same association order) so
    the fix/segment doubles are bit-identical across engines; larger
    sizes feed the bench."""
    n_users = n_rows // 6
    s = _read(spark, sf_dir, "supplier").where(F.col("s_suppkey").between(1, n_bundles))
    k = F.col("s_suppkey").cast("long")
    base = s.select(
        k.alias("k"),
        ((k % 110).cast("double") * 0.5 - 27.123).alias("by1"),
        ((k * 53 % 340).cast("double") - 170.456).alias("bx1"),
        (((k % 7).cast("double") - 3) * 0.8 + 0.123).alias("dy"),
        (((k % 11).cast("double") - 5) * 0.6 + 0.234).alias("dx"),
    )
    segs = (
        base.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(7))))
        .withColumn("lat1", F.col("by1") + F.col("j") * 0.015)
        .withColumn("lon1", F.col("bx1") + F.col("j") * 0.011)
        .select(
            (F.col("k") * 8 + F.col("j")).alias("sid"),
            "lat1",
            "lon1",
            (F.col("lat1") + F.col("dy")).alias("lat2"),
            (F.col("lon1") + F.col("dx")).alias("lon2"),
        )
    )
    c = _read(spark, sf_dir, "customer").where(F.col("c_custkey").between(1, n_rows))
    x = (F.col("c_custkey").cast("long") - 1).alias("x")
    fx = c.select(
        F.col("c_custkey").cast("long").alias("fid"),
        (x % n_users).alias("user_id"),
        F.floor(x / n_users).cast("long").alias("t"),
    )
    fr = ((F.col("t") + 1).cast("double") / 7.0)
    jit_la = ((F.col("fid") - 1) * 13 % 9 - 4).cast("double") * 0.004
    jit_lo = ((F.col("fid") - 1) * 17 % 7 - 3).cast("double") * 0.005
    fixes = (
        fx.join(base, fx["user_id"] % n_bundles + 1 == base["k"])
        .select(
            "fid",
            "user_id",
            (F.col("t") * 60).alias("ts_s"),
            (F.col("by1") + 0.045 + fr * F.col("dy") + jit_la).alias("lat"),
            (F.col("bx1") + 0.033 + fr * F.col("dx") + jit_lo).alias("lon"),
        )
    )
    return fixes, segs


def _match_sql_ctes() -> str:
    """Shared oracle CTE chain: segments, fixes, exact candidate distance
    (the snap join's three-case form), snapped point, fixed-point emission,
    per-fix top-k — replicating _match_inputs + operators/matching.py
    term-for-term."""
    from osmgraft.operators.knn import DEG_M

    radius_deg2 = (_MM_RADIUS_M / DEG_M) ** 2
    sig2 = (_MM_SIGMA_M / DEG_M) ** 2
    return (
        # every fractional literal carries e0 (double), matching Spark's
        # double-by-double evaluation — bare literals are DECIMAL in DuckDB
        # and an exact-decimal chain diverges from IEEE in the last ulp
        "s0 as (select cast(s_suppkey as bigint) as k, "
        "(s_suppkey % 110) * 0.5e0 - 27.123e0 as by1, "
        "(s_suppkey * 53 % 340) - 170.456e0 as bx1, "
        "((s_suppkey % 7) - 3) * 0.8e0 + 0.123e0 as dy, "
        "((s_suppkey % 11) - 5) * 0.6e0 + 0.234e0 as dx "
        "from supplier where s_suppkey between 1 and 10), "
        "segs as (select k*8 + j as sid, by1 + j*0.015e0 as y1, bx1 + j*0.011e0 as x1, "
        "by1 + j*0.015e0 + dy as y2, bx1 + j*0.011e0 + dx as x2 "
        "from s0 cross join (select unnest([0,1,2,3,4,5,6,7]) as j)), "
        "fx0 as (select cast(c_custkey as bigint) as fid, cast(c_custkey as bigint) - 1 as x "
        "from customer where c_custkey between 1 and 60), "
        "fx1 as (select fid, x % 10 as user_id, cast(floor(x / 10) as bigint) as t from fx0), "
        "fx as (select f.fid, f.user_id, f.t * 60 as ts_s, "
        "s.by1 + 0.045e0 + (f.t + 1) / 7.0e0 * s.dy + ((f.fid - 1)*13 % 9 - 4) * 0.004e0 as lat, "
        "s.bx1 + 0.033e0 + (f.t + 1) / 7.0e0 * s.dx + ((f.fid - 1)*17 % 7 - 3) * 0.005e0 as lon "
        "from fx1 f join s0 s on s.k = f.user_id % 10 + 1), "
        "c0 as (select f.user_id, f.fid, f.ts_s, f.lat, f.lon, g.sid, "
        "(g.x1 - f.lon) * cos(radians(f.lat)) as xa, g.y1 - f.lat as ya, "
        "(g.x2 - f.lon) * cos(radians(f.lat)) as xb, g.y2 - f.lat as yb, "
        "g.y1, g.x1, g.y2, g.x2 from fx f, segs g), "
        "c1 as (select *, xb - xa as ddx, yb - ya as ddy from c0), "
        "c2 as (select *, ddx*ddx + ddy*ddy as len2, -(xa*ddx + ya*ddy) as u from c1), "
        "c3 as (select *, case when u <= 0 then xa*xa + ya*ya "
        "when u >= len2 then xb*xb + yb*yb "
        "else greatest(0.0, xa*xa + ya*ya - u*u/len2) end as d2, "
        "case when u <= 0 then 0.0 when u >= len2 then 1.0 else u / len2 end as tt from c2), "
        "cand as (select user_id, fid, ts_s, lat, lon, sid, "
        "y1 + tt*(y2 - y1) as sy, x1 + tt*(x2 - x1) as sx, "
        "cos(radians(lat)) as cl, d2, "
        f"cast(floor(d2 / {sig2!r} * 1000000000.0 + 0.5) as bigint) as emit_i "
        f"from c3 where d2 <= {radius_deg2!r}), "
        "ck as (select * from (select cand.*, "
        "row_number() over (partition by fid order by d2, sid) as rk from cand) "
        f"where rk <= {_MM_CAND_K})"
    )


def _match_cand_oracle_sql() -> str:
    from osmgraft.operators.knn import DEG_M

    return (
        f"with {_match_sql_ctes()} "
        "select user_id, fid, ts_s, rk as cand_rank, sid, "
        f"sqrt(d2) * {DEG_M!r} as dist_m, emit_i from ck"
    )


def _viterbi_oracle_sql() -> str:
    """Path-enumeration replay of the Viterbi decode: every trellis path
    with exact int64 fixed-point costs (identical double expressions ->
    identical ints), global min by (cost, path-lexicographic) — equal to
    the kernel's DP because integer sums are exact and lexicographic
    tie-breaks extend over fixed-width suffixes (see
    operators/matching.py module docstring)."""
    from osmgraft.operators.knn import DEG_M

    beta_deg = _MM_BETA_M / DEG_M
    return (
        f"with recursive {_match_sql_ctes()}, "
        "fsteps as (select user_id, fid, ts_s, lat, lon, "
        "row_number() over (partition by user_id order by ts_s, fid) as t "
        "from (select distinct user_id, fid, ts_s, lat, lon from ck)), "
        "cc as (select s.user_id, s.t, s.ts_s, s.lat as py, s.lon as px, "
        "k.cl, k.sid, k.sy, k.sx, k.emit_i from ck k join fsteps s on s.fid = k.fid), "
        "maxt as (select user_id, max(t) as mt from cc group by 1), "
        "paths(user_id, t, path, cost, sy, sx, py, px, cl) as ("
        "select user_id, t, [sid], emit_i, sy, sx, py, px, cl from cc where t = 1 "
        "union all "
        "select c.user_id, c.t, list_append(p.path, c.sid), "
        "p.cost + cast(floor(abs("
        "sqrt(((c.sx - p.sx) * p.cl)*((c.sx - p.sx) * p.cl) + (c.sy - p.sy)*(c.sy - p.sy)) - "
        "sqrt(((c.px - p.px) * p.cl)*((c.px - p.px) * p.cl) + (c.py - p.py)*(c.py - p.py))"
        f") / {beta_deg!r} * 1000000000.0 + 0.5) as bigint) + c.emit_i, "
        "c.sy, c.sx, c.py, c.px, c.cl "
        "from paths p join cc c on c.user_id = p.user_id and c.t = p.t + 1), "
        "best as (select p.user_id, p.path from paths p "
        "join maxt m on m.user_id = p.user_id and p.t = m.mt "
        "qualify row_number() over (partition by p.user_id order by p.cost, p.path) = 1), "
        "o as (select s.user_id, s.ts_s, b.path[s.t] as sid, s.t "
        "from best b join fsteps s on s.user_id = b.user_id) "
        "select o.user_id, o.ts_s, o.sid, c.sy as snap_lat, c.sx as snap_lon "
        "from o join cc c on c.user_id = o.user_id and c.t = o.t and c.sid = o.sid"
    )


_GEOFENCE_SQL = (
            "with fx as (select user_id, event_id as fid, "
            "date_diff('second', TIMESTAMP '1970-01-01', date_trunc('second', ts)) as ts_s, "
            "cast(user_id % 80 as double)/2.0 - 20.0 + (event_id % 37) * 0.45e0 as lat, "
            "cast(user_id*29 % 300 as double) - 150.0 + (event_id % 23) * 0.8e0 as lon "
            "from events), "
            "boxes as (select cast(n_nationkey as bigint) as poly_id, "
            "(n_nationkey % 9) * 9.0e0 - 40.5678e0 as la, "
            "(n_nationkey * 29 % 300) - 150.5678e0 as lo from nation), "
            "hit as (select f.user_id, f.fid, f.ts_s, b.poly_id from fx f join boxes b "
            "on f.lat > b.la and f.lat < b.la + 8.1234e0 "
            "and f.lon > b.lo and f.lon < b.lo + 12.1234e0), "
            "pf as (select user_id, fid, ts_s, list_sort(list(distinct poly_id)) as cur "
            "from hit group by 1, 2, 3), "
            "base as (select f.user_id, f.fid, f.ts_s, "
            "coalesce(p.cur, cast([] as bigint[])) as cur from fx f left join pf p "
            "on p.user_id = f.user_id and p.fid = f.fid and p.ts_s = f.ts_s), "
            "lg as (select user_id, ts_s, cur, "
            "coalesce(lag(cur) over (partition by user_id order by ts_s asc, fid asc), "
            "cast([] as bigint[])) as prv from base), "
            "en as (select user_id, ts_s, "
            "unnest(list_filter(cur, x -> not list_contains(prv, x))) as poly_id, "
            "'enter' as event from lg), "
            "ex as (select user_id, ts_s, "
            "unnest(list_filter(prv, x -> not list_contains(cur, x))) as poly_id, "
            "'exit' as event from lg) "
            "select * from en union all select * from ex"
        )


_DBSCAN_EPS_M = 200_000.0
_DBSCAN_MIN_PTS = 3


def _hull_oracle_sql(hav: str) -> str:
    """Hull-corner replay by the O(n^3) supporting-edge test per cluster:
    a distinct-coordinate point v is a hull CORNER iff some other point b
    has every remaining point strictly on one side of v->b, allowing
    collinear points only BETWEEN v and b (collinear-beyond kills the
    edge, which is exactly the strict-turn chain's corner set). Degenerate
    clusters (<= 2 distinct coords) emit all their points. All cross/dot
    arithmetic is exact on the query's dyadic lat grid + integral lons."""
    return (
        f"with lab as ({_dbscan_oracle_sql(hav)}), "
        f"mem as (select l.pid, l.cluster, "
        "floor(p2.lat * 64.0e0 + 0.5) / 64.0e0 as lat, p2.lon as lon "
        f"from lab l join ({_PTS_SQL}) p2 on p2.pid = l.pid where l.cluster >= 0), "
        "u as (select cluster, min(pid) as pid, lat, lon from mem "
        "group by cluster, lat, lon), "
        "sz as (select cluster, count(*) as n from u group by cluster), "
        "small as (select u.cluster, u.pid, u.lat, u.lon from u "
        "join sz on sz.cluster = u.cluster where sz.n <= 2), "
        "cand as (select a.cluster, a.pid as vid, a.lat as vy, a.lon as vx, "
        "b.lat as byy, b.lon as bxx from u a join u b on a.cluster = b.cluster "
        "and (a.lat <> b.lat or a.lon <> b.lon)), "
        "bad as (select distinct k.cluster, k.vid, k.byy, k.bxx "
        "from cand k join u c on c.cluster = k.cluster "
        "and (c.lat <> k.vy or c.lon <> k.vx) and (c.lat <> k.byy or c.lon <> k.bxx) "
        "where not ( "
        "(k.bxx - k.vx) * (c.lat - k.vy) - (k.byy - k.vy) * (c.lon - k.vx) > 0 "
        "or ((k.bxx - k.vx) * (c.lat - k.vy) - (k.byy - k.vy) * (c.lon - k.vx) = 0 "
        "and (c.lon - k.vx) * (k.bxx - k.vx) + (c.lat - k.vy) * (k.byy - k.vy) >= 0 "
        "and (c.lon - k.vx) * (k.bxx - k.vx) + (c.lat - k.vy) * (k.byy - k.vy) <= "
        "(k.bxx - k.vx) * (k.bxx - k.vx) + (k.byy - k.vy) * (k.byy - k.vy)))), "
        "corner as (select distinct k.cluster, k.vid from cand k "
        "left join bad d on d.cluster = k.cluster and d.vid = k.vid "
        "and d.byy = k.byy and d.bxx = k.bxx where d.vid is null) "
        "select c.cluster, c.vid as pid, u.lat, u.lon from corner c "
        "join u on u.cluster = c.cluster and u.pid = c.vid "
        "union all select cluster, pid, lat, lon from small"
    )


def _dbscan_oracle_sql(hav: str) -> str:
    """Textbook-sequential-free DBSCAN replay: brute-force eps pairs with
    the engine's haversine, core by neighbor count, clusters = recursive
    min-reachable over the core-core graph, border = min core-neighbor
    cluster (the deterministic pin, see operators/cluster.py)."""
    return (
        f"with recursive p as (select pid, lat, lon from ({_PTS_SQL})), "
        "pr as (select a.pid as src, b.pid as dst from p a, p b "
        f"where a.pid <> b.pid and {hav} <= {_DBSCAN_EPS_M!r}), "
        "deg as (select p.pid as src, count(pr.dst) as d from p "
        "left join pr on pr.src = p.pid group by 1), "
        f"core as (select src as id from deg where d >= {_DBSCAN_MIN_PTS - 1}), "
        "ce as (select pr.src, pr.dst from pr "
        "join core x on x.id = pr.src join core y on y.id = pr.dst), "
        "reach(id, r) as (select id, id from core union "
        "select reach.id, ce.dst from reach join ce on ce.src = reach.r), "
        "comp as (select id, min(r) as cluster from reach group by id), "
        "border as (select pr.src as id, min(c.cluster) as cluster from pr "
        "join comp c on c.id = pr.dst "
        "where pr.src not in (select id from core) group by 1) "
        "select p.pid, coalesce(co.cluster, bo.cluster, -1) as cluster, "
        "case when co.id is not null then 'core' "
        "when bo.id is not null then 'border' else 'noise' end as role "
        "from p left join comp co on co.id = p.pid left join border bo on bo.id = p.pid"
    )


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _read(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_acctbal") % 120.0) / 2.0).alias("lat"),
        ((F.col("c_custkey") * 37 % 360).cast("double") - 180.0).alias("lon"),
        F.col("c_nationkey").alias("grp"),
    )


_TAGS_SQL_SRC = (
    "select c_custkey, "
    "case c_custkey % 5 when 0 then 'city' when 1 then 'town' when 2 then 'village' "
    "when 3 then 'hamlet' else 'suburb' end as place, "
    "cast(floor(abs(c_acctbal) * 1000) as bigint) as pop from customer"
)


def _tags_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _read(spark, sf_dir, "customer")
    place = (
        F.when(F.col("c_custkey") % 5 == 0, "city")
        .when(F.col("c_custkey") % 5 == 1, "town")
        .when(F.col("c_custkey") % 5 == 2, "village")
        .when(F.col("c_custkey") % 5 == 3, "hamlet")
        .otherwise("suburb")
    )
    pop = F.floor(F.abs(F.col("c_acctbal")) * 1000).cast("long")
    tags = F.create_map(
        F.lit("place"), place,
        F.lit("population"), F.format_string("%d", pop),
        F.lit("name"), F.col("c_name"),
    )
    return c.select(F.col("c_custkey"), tags.alias("tags"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osmgraft.sources.config import default_config

    cfg = default_config()

    # --- P1: filter + projection pushdown ------------------------------
    def q_filter_scan(spark, sf):
        li = _read(spark, sf, "lineitem")
        return li.where(
            (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30)
        ).select("l_orderkey", "l_quantity", "l_extendedprice")

    # --- C1/P6: classification compiler --------------------------------
    def q_classify(spark, sf):
        from osmgraft.functions.classify import level_expr

        t = _tags_df(spark, sf)
        return t.select("c_custkey", level_expr(cfg, F.col("tags")).alias("level_id"))

    # --- A4: level counts ------------------------------------------------
    def q_level_counts(spark, sf):
        from osmgraft.functions.classify import level_expr

        t = _tags_df(spark, sf)
        return (
            t.select(level_expr(cfg, F.col("tags")).alias("level_id"))
            .groupBy("level_id")
            .agg(F.count("*").alias("poi_count"))
        )

    # --- P6: C-atoi semantics --------------------------------------------
    def q_atoi(spark, sf):
        from osmgraft.functions.classify import atoi_expr

        p = _read(spark, sf, "part")
        s = F.concat(F.lit("  +"), F.col("p_size").cast("string"), F.lit("kg"))
        return p.select(
            "p_partkey",
            atoi_expr(s).alias("atoi_sized"),
            atoi_expr(F.col("p_brand")).alias("atoi_brand"),
        )

    # --- P3/P4: name coalesce -------------------------------------------
    def q_name_coalesce(spark, sf):
        from osmgraft.functions.names import import_name_expr

        c = _read(spark, sf, "customer")
        tags = F.map_filter(
            F.create_map(
                F.lit("name"), F.when(F.col("c_custkey") % 3 == 0, F.col("c_name")),
                F.lit("official_name"), F.when(F.col("c_custkey") % 2 == 0, F.upper(F.col("c_name"))),
                F.lit("int_name"), F.when(F.col("c_custkey") % 5 == 0, F.lower(F.col("c_name"))),
            ),
            lambda k, v: v.isNotNull(),
        )
        return c.select("c_custkey", import_name_expr(tags).alias("resolved_name"))

    # --- J1/J2: left-semi reduction ---------------------------------------
    def q_semi_join(spark, sf):
        li = _read(spark, sf, "lineitem")
        big = _read(spark, sf, "orders").where(F.col("o_totalprice") > 150000)
        return (
            li.join(big, li["l_orderkey"] == big["o_orderkey"], "leftsemi")
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty"))
        )

    # --- J3/A2: hash-join + centroid avg ---------------------------------
    def q_centroid(spark, sf):
        pts = _pts(spark, sf)
        n = _read(spark, sf, "nation")
        return (
            pts.join(n, pts["grp"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(
                F.round(F.avg("lat"), 6).alias("lat_c"),
                F.round(F.avg("lon"), 6).alias("lon_c"),
                F.count("*").alias("n_pts"),
            )
        )

    # --- U1: union ---------------------------------------------------------
    def q_union(spark, sf):
        c = _read(spark, sf, "customer").select(
            F.col("c_custkey").alias("id"), F.lit("customer").alias("src")
        )
        s = _read(spark, sf, "supplier").select(
            F.col("s_suppkey").alias("id"), F.lit("supplier").alias("src")
        )
        return c.unionByName(s)

    # --- O1/O2: two-phase global rank ------------------------------------
    def q_global_rank(spark, sf):
        from osmgraft.operators.rank import global_rank

        c = _read(spark, sf, "customer").select(
            F.col("c_custkey").alias("osm_id"),
            F.col("c_nationkey").cast("long").alias("level_id"),
            F.floor(F.col("c_acctbal")).cast("long").alias("population"),
        )
        return global_rank(c).select("osm_id", "rank")

    # --- P8: size cap ------------------------------------------------------
    def q_size_cap(spark, sf):
        li = _read(spark, sf, "lineitem")
        ok = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s")).where(F.col("s") <= 100)
        o = _read(spark, sf, "orders")
        return o.join(ok.select("l_orderkey"), o["o_orderkey"] == ok["l_orderkey"], "leftsemi").select(
            "o_orderkey", "o_totalprice"
        )

    # --- A3: bounding box ---------------------------------------------------
    def q_bbox(spark, sf):
        pts = _pts(spark, sf)
        return pts.groupBy("grp").agg(
            F.round(F.min("lat"), 6).alias("min_lat"),
            F.round(F.max("lat"), 6).alias("max_lat"),
            F.round(F.min("lon"), 6).alias("min_lon"),
            F.round(F.max("lon"), 6).alias("max_lon"),
        )

    # --- A5: histogram -------------------------------------------------------
    def q_tag_histogram(spark, sf):
        ev = _read(spark, sf, "events")
        return ev.groupBy("event_type").agg(F.count("*").alias("tag_count"))

    # --- A6: detailed histogram + suppression --------------------------------
    def q_tag_histogram_detailed(spark, sf):
        ev = _read(spark, sf, "events").select(
            F.col("event_type").alias("key"), F.col("props").alias("value")
        )
        per_value = ev.groupBy("key", "value").agg(F.count("*").alias("value_count"))
        per_key = per_value.groupBy("key").agg(
            F.count_distinct("value").alias("n_values"), F.sum("value_count").alias("key_count")
        )
        return (
            per_value.join(per_key, "key")
            .where(F.col("n_values") <= 500)
            .select("key", "value", "value_count", "n_values", "key_count")
        )

    # --- tiles ---------------------------------------------------------------
    def q_tiles(spark, sf):
        from osmgraft.operators.tiles import assign_tiles

        pts = _pts(spark, sf)
        return (
            assign_tiles(pts, z=10)
            .groupBy("tile_z", "tile_x", "tile_y")
            .agg(F.count("*").alias("n_labels"))
        )

    # --- J6: kNN radius pairs (cell-pruned == exact within radius) -----------
    def q_knn_pairs(spark, sf):
        from osmgraft.operators.knn import knn_candidates

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        cand = knn_candidates(pts, pts, radius_m=200_000.0)
        return cand.where(F.col("pid") < F.col("pid_r")).select(
            F.col("pid").alias("id_a"), F.col("pid_r").alias("id_b")
        )

    # --- J5: PIP against rectangles (== SQL range join) -----------------------
    def q_pip_boxes(spark, sf):
        from osmgraft.operators.pip import pip_join

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        n = _read(spark, sf, "nation")
        boxes = n.select(
            F.col("n_nationkey").cast("long").alias("poly_id"),
            F.col("n_name").alias("name"),
            ((F.col("n_nationkey") % 9).cast("double") * 9.0 - 40.5678).alias("_la"),
            ((F.col("n_nationkey") * 29 % 300).cast("double") - 150.5678).alias("_lo"),
        )
        polys = boxes.select(
            "poly_id",
            "name",
            F.array(F.col("_la"), F.col("_la"), F.col("_la") + 8.1234, F.col("_la") + 8.1234).alias("ring_lats"),
            F.array(F.col("_lo"), F.col("_lo") + 12.1234, F.col("_lo") + 12.1234, F.col("_lo")).alias("ring_lons"),
        )
        out = pip_join(pts, polys, strategy="broadcast")
        return out.select("pid", "poly_id")

    def q_pip_triangles(spark, sf):
        # Non-axis-aligned polygons: unlike the rectangle case (where
        # bbox containment == polygon containment), triangles make the
        # even-odd crossing arithmetic itself decide — the SQL oracle
        # replays the kernel's exact edge test. Vertex offsets are literal
        # constants (no trig), so both engines compute identical doubles.
        from osmgraft.operators.pip import pip_join

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        n = _read(spark, sf, "nation")
        dy = F.array(*[F.lit(v) for v in _TRI_DY])
        dx = F.array(*[F.lit(v) for v in _TRI_DX])
        k = F.col("n_nationkey").cast("long")
        base = n.select(
            k.alias("poly_id"),
            F.col("n_name").alias("name"),
            ((k % 9).cast("double") * 9.0 - 36.789).alias("_la"),
            ((k * 37 % 300).cast("double") - 150.123).alias("_lo"),
        )
        def vert(i, arr, c):
            return F.col(c) + F.element_at(arr, ((F.col("poly_id") + i) % 6 + 1).cast("int"))
        polys = base.select(
            "poly_id",
            "name",
            F.array(vert(0, dy, "_la"), vert(1, dy, "_la"), vert(2, dy, "_la")).alias("ring_lats"),
            F.array(vert(0, dx, "_lo"), vert(1, dx, "_lo"), vert(2, dx, "_lo")).alias("ring_lons"),
        )
        return pip_join(pts, polys, strategy="broadcast").select("pid", "poly_id")

    # --- tiles: per-tile importance order (window partitioned by tile) ------------
    def q_tile_topk(spark, sf):
        from osmgraft.operators.tiles import tiles_with_order

        pts = _pts(spark, sf).select(
            F.col("pid").alias("osm_id"), "lat", "lon", F.col("pid").alias("rank")
        )
        out = tiles_with_order(pts, z=8)
        return out.where(F.col("tile_pos") < 5).select(
            "osm_id", "tile_x", "tile_y", "tile_pos"
        )

    # --- skew rail: salted aggregation == plain aggregation -----------------------
    def q_salted_count(spark, sf):
        from osmgraft.operators.skew import salted_count

        li = _read(spark, sf, "lineitem").select(F.col("l_returnflag").alias("k"))
        return salted_count(li, "k", n_salts=16)

    # --- similarity: exact blocked pairwise kNN -----------------------------------
    def q_pairwise_knn(spark, sf):
        from osmgraft.operators.simsearch import pairwise_neighbors

        emb = _read(spark, sf, "embeddings").where(F.col("vec_id") < 120).withColumn(
            "blk", F.col("vec_id") % 4
        )
        out = pairwise_neighbors(emb, k=3, by_label="blk")
        return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"), "rk")

    # --- quality filter (thresholded features) ------------------------------------
    def q_quality_filter(spark, sf):
        from osmgraft.operators.textstats import quality_filter

        d = _read(spark, sf, "documents")
        return quality_filter(
            d, min_words=5, max_punct_ratio=0.2, min_alpha_ratio=0.5
        ).select("doc_id")

    # --- raster <-> vector -------------------------------------------------------
    def q_rasterize(spark, sf):
        from osmgraft.operators.raster import rasterize

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        return rasterize(pts, z=6, px=64)

    def q_idw_surface(spark, sf):
        from osmgraft.operators.raster import idw_grid

        pts = _pts(spark, sf)
        g = idw_grid(pts, z=5, px=64, radius=2, value_col="grp")
        return g.select(
            "tile_z",
            "tile_x",
            "tile_y",
            "px_x",
            "px_y",
            F.round("value", 4).alias("value"),
            "n_src",
        )

    def q_vectorize_runs(spark, sf):
        from osmgraft.operators.raster import rasterize, vectorize_runs

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        runs = vectorize_runs(rasterize(pts, z=6, px=64), px=64)
        return runs.select(
            "poly_id",
            "tile_z",
            "value",
            "run_len",
            F.round("west", 4).alias("west"),
            F.round("east", 4).alias("east"),
            F.round("north", 4).alias("north"),
            F.round("south", 4).alias("south"),
        )

    def q_raster_vectorize(spark, sf):
        from osmgraft.operators.raster import rasterize, vectorize

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        rect = vectorize(rasterize(pts, z=6, px=64), px=64)
        return rect.select(
            "poly_id",
            "value",
            F.round(F.element_at("ring_lats", 1), 4).alias("south"),
            F.round(F.element_at("ring_lats", 3), 4).alias("north"),
            F.round(F.element_at("ring_lons", 1), 4).alias("west"),
            F.round(F.element_at("ring_lons", 2), 4).alias("east"),
        )

    # --- dedup: exact ----------------------------------------------------------
    def q_dedup_exact(spark, sf):
        from osmgraft.operators.dedup import exact_dedup

        d = _read(spark, sf, "documents").select("doc_id", "text")
        dup = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        return exact_dedup(d.unionByName(dup)).select("doc_id")

    # --- dedup: n-gram jaccard pairs -------------------------------------------
    def q_jaccard_pairs(spark, sf):
        from osmgraft.operators.dedup import jaccard_pairs

        d = _read(spark, sf, "documents").select("doc_id", "text").where(F.col("doc_id") < 200)
        # max_df=None: the exact-jaccard oracle configuration (the library
        # default keeps the hot-token damping rail on)
        return jaccard_pairs(d, threshold=0.4, max_df=None).select(
            "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
        )

    # --- dedup: pairs -> clusters (alternating-star connected components) -------
    def q_dedup_components(spark, sf):
        from osmgraft.operators.dedup import connected_components, jaccard_pairs

        docs = _read(spark, sf, "documents")
        d = docs.select("doc_id", "text").where(F.col("doc_id") < 200)
        near = jaccard_pairs(d, threshold=0.4, max_df=None).select("id_a", "id_b")
        # a 63-edge id chain: forces multi-round transitive closure (a
        # single-hop formulation would leave the chain in 64 components)
        chain = (
            docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") <= 362))
            .select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
        )
        comp = connected_components(near.unionByName(chain))
        return comp.select(F.col("id").alias("doc_id"), "component")

    # --- dedup: embedding-cosine near-dup (exact path == SQL oracle) ------------
    def q_embedding_dup(spark, sf):
        from osmgraft.operators.dedup import embedding_dup_pairs

        emb = (
            _read(spark, sf, "embeddings")
            .where(F.col("vec_id") < 150)
            .select("vec_id", "embedding")
        )
        dup = emb.where(F.col("vec_id") < 15).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
        pairs = embedding_dup_pairs(emb.unionByName(dup), threshold=0.99, exact=True)
        return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))

    # --- curation: benchmark n-gram decontamination ------------------------------
    def q_decontaminate(spark, sf):
        from osmgraft.operators.curation import contaminated_ids

        d = _read(spark, sf, "documents").select("doc_id", "text")
        bench = d.where(F.col("doc_id") % 10 == 7)  # scale-proportional eval set
        corpus = d.where(F.col("doc_id") % 10 != 7)
        out = contaminated_ids(corpus, bench, n=3, min_shared=2)
        return out.select("doc_id", F.col("n_shared").cast("long").alias("n_shared"))

    # --- curation: within-doc repetition signals (Gopher rules) -------------------
    def q_repetition(spark, sf):
        from osmgraft.operators.curation import repetition_features

        d = _read(spark, sf, "documents").where(F.col("doc_id") < 300)
        return repetition_features(d)

    # --- curation: deterministic stratified sampling ------------------------------
    def q_stratified_sample(spark, sf):
        from osmgraft.operators.curation import stratified_sample

        d = _read(spark, sf, "documents").select("doc_id", "lang")
        # sql_exact: the Knuth-arithmetic hash the DuckDB oracle replays
        # bit-for-bit (the library default is xxhash64)
        return stratified_sample(
            d, {"en": 0.8, "de": 0.5, "fr": 0.25}, strata_col="lang", seed=5, sql_exact=True
        )

    # --- curation: domain mixture resampling --------------------------------------
    def q_mix_domains(spark, sf):
        from osmgraft.operators.curation import mix_domains

        d = _read(spark, sf, "documents").select("doc_id", "lang")
        return mix_domains(
            d, {"en": 0.5, "de": 0.3, "fr": 0.2}, domain_col="lang", seed=9, sql_exact=True
        )

    # --- curation: C4 boilerplate line removal -------------------------------------
    def q_boilerplate(spark, sf):
        from osmgraft.operators.curation import remove_duplicate_lines

        d = _read(spark, sf, "documents").select("doc_id", "text")
        # synth docs are single-line word soup; derive deterministic 2-word
        # pseudo-lines so corpus-level line frequency is non-trivial
        ws = F.split(F.trim(F.col("text")), r"\s+")
        n_lines = F.ceil(F.size(ws) / F.lit(2.0)).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(ws, i * 2 + 1, 2), " "),
        )
        lined = d.select("doc_id", F.array_join(lines, "\n").alias("text"))
        return remove_duplicate_lines(lined, min_df=12)

    # --- curation: deterministic training-shard packing ------------------------------
    def q_assign_shards(spark, sf):
        from osmgraft.operators.curation import assign_shards

        d = _read(spark, sf, "documents").select(
            "doc_id", F.col("n_chars").alias("n_tokens")
        )
        return assign_shards(
            d, target_tokens=4000, n_buckets=8, seed=2, sql_exact=True
        ).select("doc_id", "n_tokens", "bucket", "shard_ix")

    # --- curation: PII redaction ----------------------------------------------------
    def q_pii_redact(spark, sf):
        from osmgraft.operators.curation import redact_pii

        d = _read(spark, sf, "documents").select("doc_id", "text")
        # inject deterministic synthetic PII (the corpus itself has none)
        t2 = F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" reach admin@example.com or 192.168.1.77"),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" dial +1 555 0100 now")).otherwise(
                F.lit("")
            ),
        )
        return redact_pii(d.select("doc_id", t2.alias("text")))

    # --- text quality ------------------------------------------------------------
    def q_quality(spark, sf):
        from osmgraft.operators.textstats import quality_features

        d = _read(spark, sf, "documents")
        qf = quality_features(d)
        return qf.select(
            "doc_id",
            "n_chars",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("avg_word_len", 4).alias("avg_word_len"),
            F.round("punct_ratio", 4).alias("punct_ratio"),
            F.round("alpha_ratio", 4).alias("alpha_ratio"),
            F.round("stopword_ratio", 4).alias("stopword_ratio"),
        )

    # --- lang id -------------------------------------------------------------------
    def q_lang_id(spark, sf):
        from osmgraft.operators.textstats import lang_id

        d = _read(spark, sf, "documents")
        out = lang_id(d)
        return out.select(
            "doc_id",
            F.col("en_hits").cast("long").alias("en_hits"),
            F.col("de_hits").cast("long").alias("de_hits"),
            F.col("fr_hits").cast("long").alias("fr_hits"),
            "lang_guess",
        )

    # --- fingerprint ------------------------------------------------------------------
    def q_fingerprint(spark, sf):
        from osmgraft.operators.textstats import fingerprint

        return fingerprint(_read(spark, sf, "documents"))

    # --- similarity: brute-force top-k --------------------------------------------------
    def q_ann_brute(spark, sf):
        from osmgraft.operators.simsearch import brute_force_topk

        emb = _read(spark, sf, "embeddings")
        qv = [float(x) for x in emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]]
        return brute_force_topk(emb, qv, 10).select("vec_id")

    # --- events daily rollup (streaming-analog batch) ------------------------------------
    def q_events_daily(spark, sf):
        ev = _read(spark, sf, "events")
        return ev.groupBy(
            F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))

    # --- gap-based sessionization (one shuffle: window + refined-key agg) ---------------
    def q_sessionize_events(spark, sf):
        from osmgraft.operators.sessions import session_stats

        return session_stats(_read(spark, sf, "events"))

    # --- window top-k ------------------------------------------------------------------------
    def q_window_topk(spark, sf):
        from pyspark.sql import Window

        o = _read(spark, sf, "orders")
        w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        return (
            o.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "rn")
        )

    # =================== engine-native (rows-only checks) ===================

    def q_osm_labels(spark, sf):
        # The FLAGSHIP query, fully oracled: the corpus is staged once as
        # parquet (pure-Python synth mirror, identical rows to the Spark
        # generator at the same seed), the engine runs the real pipeline —
        # packed-binary decode, classification, polygon assembly, rank,
        # label kernel — and DuckDB replays every stage in SQL over the
        # same files (osmgraft/plans/sql_oracle.py). lat/lon rounded on
        # both sides: the assembly centroid sums floats in walk order,
        # the SQL in set order.
        from osmgraft.plans.pipeline import label_pipeline
        from osmgraft.plans.sql_oracle import stage_pipeline_corpus

        docs_p, blobs_p, _ = stage_pipeline_corpus()
        docs = spark.read.parquet(docs_p)
        blobs = spark.read.parquet(blobs_p)
        out = label_pipeline(spark, docs, blobs)
        return out.select(
            F.round("lat", 6).alias("lat"),
            F.round("lon", 6).alias("lon"),
            "level_id",
            "rank",
            "radius",
            "osm_id",
            "label",
            "factor",
        )

    def _staged(spark):
        from osmgraft.plans.sql_oracle import stage_pipeline_corpus

        docs_p, blobs_p, _ = stage_pipeline_corpus()
        return spark.read.parquet(docs_p), spark.read.parquet(blobs_p)

    def q_osm_pip_admin(spark, sf):
        # fully oracled: even-odd edge-test SQL replica over the staged
        # corpus's admin rings (plans/sql_oracle.pip_admin_sql)
        from osmgraft.operators.pip import pip_join
        from osmgraft.sources.decode import decode_documents

        docs, blobs = _staged(spark)
        frames = decode_documents(docs, blobs)
        pts = frames.node_pois.select("osm_id", "lat", "lon")
        return pip_join(pts, frames.polygons, strategy="partitioned", res=4).select(
            "osm_id", "poly_id"
        )

    def q_osm_dedup_labels(spark, sf):
        # fully oracled: NOT EXISTS haversine suppression over the ranked
        # labels of the pipeline SQL replica (plans/sql_oracle.dedup_labels_sql)
        from osmgraft.operators.knn import dedup_labels
        from osmgraft.plans.pipeline import label_pipeline

        docs, blobs = _staged(spark)
        out = dedup_labels(label_pipeline(spark, docs, blobs), radius_m=2000.0)
        return out.select("osm_id")

    def q_osm_adaptive_cells(spark, sf):
        # fully oracled: chained re-encode rounds over the staged node
        # points (plans/sql_oracle.adaptive_cells_sql)
        from osmgraft.operators.skew import adaptive_cell_split
        from osmgraft.sources.decode import decode_documents

        docs, blobs = _staged(spark)
        pts = decode_documents(docs, blobs).node_pois.select("osm_id", "lat", "lon")
        out = adaptive_cell_split(pts, base_res=3, max_rows=50, max_res=8)
        return out.groupBy("cell").agg(F.count("*").alias("n"))

    def q_s2_cells(spark, sf):
        from osmgraft.functions.cells import s2_cell_udf

        pts = _pts(spark, sf)
        return pts.select("pid", s2_cell_udf(12)(F.col("lat"), F.col("lon")).alias("s2_cell"))

    def _traj_stays(spark, sf):
        # deterministic synthetic trajectories over the events table:
        # per-user base location + value-derived jitter (~<=0.02 deg), so
        # step distances straddle the 1500 m break threshold
        from osmgraft.operators.sessions import _epoch_seconds
        from osmgraft.operators.trajectory import stay_points

        ev = _read(spark, sf, "events")
        fixes = ev.select(
            "user_id",
            "event_id",
            _epoch_seconds(ev, "ts").alias("ts_s"),
            ((F.col("user_id") % 120).cast("double") / 2.0 + F.col("value") % 0.01).alias("lat"),
            ((F.col("user_id") * 37 % 360).cast("double") - 180.0 + F.col("value") % 0.01).alias("lon"),
        )
        return stay_points(
            fixes,
            ts_col="ts_s",
            order_tiebreak="event_id",
            jump_m=1500.0,
            min_duration_s=600,
            min_pts=3,
        )

    def q_stay_points(spark, sf):
        out = _traj_stays(spark, sf)
        return out.select(
            "user_id",
            "stay_seq",
            "n_fixes",
            "t_start",
            "t_end",
            "dwell_s",
            F.round("lat", 4).alias("lat"),
            F.round("lon", 4).alias("lon"),
        )

    def q_smooth_box(spark, sf):
        from osmgraft.operators.raster import rasterize, smooth_box

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        sm = smooth_box(rasterize(pts, z=6, px=64), px=64, radius=1)
        return sm.select(
            "tile_z",
            "tile_x",
            "tile_y",
            "px_x",
            "px_y",
            F.round("value", 4).alias("value"),
        )

    def q_contours(spark, sf):
        from osmgraft.operators.raster import contour_segments, rasterize

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        seg = contour_segments(rasterize(pts, z=5, px=64), px=64, threshold=0.5)
        return seg.select(
            "case_id",
            F.round("x0", 4).alias("x0"),
            F.round("y0", 4).alias("y0"),
            F.round("x1", 4).alias("x1"),
            F.round("y1", 4).alias("y1"),
        )

    def q_rog(spark, sf):
        from osmgraft.operators.sessions import _epoch_seconds
        from osmgraft.operators.trajectory import radius_of_gyration

        ev = _read(spark, sf, "events")
        fixes = ev.select(
            "user_id",
            ((F.col("user_id") % 120).cast("double") / 2.0 + F.col("value") % 0.01).alias("lat"),
            ((F.col("user_id") * 37 % 360).cast("double") - 180.0 + F.col("value") % 0.01).alias("lon"),
        )
        out = radius_of_gyration(fixes)
        return out.select(
            "user_id", "n_fixes", F.round("rog_m", 4).alias("rog_m")
        )

    def q_od_flows(spark, sf):
        from osmgraft.operators.trajectory import od_flows

        out = od_flows(_traj_stays(spark, sf), z=7, start_col="t_start")
        return out.select(
            "from_x",
            "from_y",
            "to_x",
            "to_y",
            "n_trips",
            F.round("avg_transit_s", 4).alias("avg_transit_s"),
        )

    def q_s2_compact(spark, sf):
        # every level-12 cell's 4 children are generated, so level 13
        # fully collapses back; levels 12->10 compact only where all 4
        # siblings are present in the data (dense clusters)
        from osmgraft.functions.cells import (
            compact_cells,
            s2_cell_udf,
            s2_children_expr,
        )

        pts = _pts(spark, sf)
        c12 = pts.select(
            s2_cell_udf(12)(F.col("lat"), F.col("lon")).alias("c")
        ).distinct()
        kids = c12.select(F.explode(s2_children_expr(F.col("c"), 13)).alias("cell"))
        return compact_cells(kids, level=13, min_level=10)

    def q_minhash_pairs(spark, sf):
        # Oracled configuration: 32 single-row bands and token shingles
        # (shingle_n=1). A pair with token-jaccard >= 0.6 misses all 32
        # bands with probability <= 0.4^32 ~ 2e-13 — and xxhash64 on fixed
        # data is deterministic, so on the sf tables the verified LSH
        # output EQUALS the exact token-jaccard pairs the SQL computes
        # (verified locally; recall failures would be permanent, not
        # flaky). The scale configuration (banded rows, word 3-shingles)
        # is exercised by pytest recall tests instead.
        from osmgraft.operators.dedup import minhash_lsh_pairs

        d = _read(spark, sf, "documents").select("doc_id", "text").where(F.col("doc_id") < 300)
        dup = d.where(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
        )
        return minhash_lsh_pairs(
            d.unionByName(dup), num_hashes=32, bands=32, shingle_n=1, verify_threshold=0.6
        ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))

    def q_simhash_pairs(spark, sf):
        # Oracled: the token hash equals DuckDB's md5_number_lower, so the
        # SQL recomputes the signatures bit-exactly and enumerates all
        # pairs within the Hamming budget; the 4 rotated prefix tables
        # have candidate recall 1.0 on the sf data (deterministic), so the
        # multi-probe output equals the brute-force SQL set.
        from osmgraft.operators.dedup import simhash_pairs

        d = _read(spark, sf, "documents").select("doc_id", "text").where(F.col("doc_id") < 300)
        dup = d.where(F.col("doc_id") < 30).select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        # signature='md5' is the oracle configuration; the library default
        # is the Catalyst xxhash64 path (pytest-pinned against a replay of
        # Spark's own token hashes — no ANSI-SQL equivalent exists)
        return simhash_pairs(
            d.unionByName(dup), max_hamming=4, prefix_bits=12, n_tables=4, signature="md5"
        )

    def q_ann_lsh(spark, sf):
        # Oracled configuration: dense tables (2 planes x 24 tables) give
        # candidate recall 1.0 on the sf embeddings (deterministic: planes
        # are seed-derived, data is fixed), so the LSH top-k EQUALS the
        # brute-force top-k the SQL computes. Sparse scale configurations
        # are covered by the pytest recall test.
        from osmgraft.operators.simsearch import ann_topk

        emb = _read(spark, sf, "embeddings")
        qs = emb.where(F.col("vec_id") < 16).select(F.col("vec_id").alias("q_id"), "embedding")
        return ann_topk(emb, qs, k=5, dim=64, n_planes=2, n_tables=24).select(
            "q_id", "vec_id", "rk"
        )

    def q_ann_ivf(spark, sf):
        # Oracled configuration: seed-id coarse quantizer (no Lloyd) +
        # Catalyst rounded-argmax assignment, so the SQL replays cell
        # membership, probe order AND the cell-pruned rerank exactly.
        # k-means configurations are covered by the pytest recall tests.
        from osmgraft.operators.simsearch import ivf_topk

        emb = _read(spark, sf, "embeddings")
        qs = emb.where(F.col("vec_id") < 8).select(F.col("vec_id").alias("q_id"), "embedding")
        return ivf_topk(
            emb,
            qs,
            k=5,
            nprobe=3,
            seed_ids=[3, 17, 29, 41, 53, 61, 77, 89],
            exact_assign=True,
        ).select("q_id", "vec_id", "rk")

    def q_quantize_embeddings(spark, sf):
        from osmgraft.operators.simsearch import quantize_embeddings

        emb = _read(spark, sf, "embeddings")
        out = quantize_embeddings(emb)
        return out.select("vec_id", "qvec", F.round("scale", 6).alias("scale"))

    def q_multimodal_features(spark, sf):
        from osmgraft.operators.multimodal import extract_features

        media = spark.read.parquet(_stage_media_oracle())
        return extract_features(media, dim=16).select("media_id", "n_bytes")

    def q_wav_decode(spark, sf):
        # the real stdlib WAV codec: sample_rate / n_samples / duration_ms
        # recovered from the payload BYTES (media_id + payload only — the
        # staged `rate` column is the oracle's, not ours)
        from osmgraft.operators.multimodal import wav_decode_meta

        media = spark.read.parquet(_stage_wav_oracle()).select("media_id", "payload")
        return wav_decode_meta(media)

    def q_png_decode(spark, sf):
        # the real stdlib PNG codec: geometry + pixel sum recovered from
        # the payload BYTES (zlib inflate + scanline unfilter; the staged
        # w/h/px_sum columns are the oracle's, not ours)
        from osmgraft.operators.multimodal import png_decode_meta

        media = spark.read.parquet(_stage_png_oracle()).select("media_id", "payload")
        return png_decode_meta(media)

    def q_jpeg_decode(spark, sf):
        # the real stdlib baseline-JPEG codec: geometry + pixel sum
        # recovered from the payload BYTES (Huffman entropy decode +
        # dequant + IDCT + YCbCr transform; the staged w/h/px_sum columns
        # are the oracle's ground truth from an independent staging-time
        # decode — JPEG is lossy, so pixels can't be re-derived in SQL)
        from osmgraft.operators.multimodal import jpeg_decode_meta

        media = spark.read.parquet(_stage_jpeg_oracle()).select("media_id", "payload")
        return jpeg_decode_meta(media)

    def q_mp4_decode(spark, sf):
        # the real ISO-BMFF box walk: duration/geometry/track count
        # recovered from the payload BYTES (media_id + payload only)
        from osmgraft.operators.multimodal import mp4_decode_meta

        media = spark.read.parquet(_stage_mp4_oracle()).select("media_id", "payload")
        return mp4_decode_meta(media)

    def q_avi_frames(spark, sf):
        # REAL video frame decode: sample frames at 2 fps from MJPEG-AVI
        # payloads and recover every sampled frame's geometry + pixel sum
        # from the BYTES (RIFF walk + baseline JPEG decode per frame)
        from osmgraft.operators.multimodal import decode_video_frames

        payload_path, _ = _stage_avi_oracle()
        media = spark.read.parquet(payload_path).select("media_id", "payload")
        return decode_video_frames(media, fps_out=_AVI_FPS_OUT)

    def q_hex_cells(spark, sf):
        from osmgraft.functions.cells import hex_cell_udf

        pts = _pts(spark, sf)
        return pts.select("pid", hex_cell_udf(7)(F.col("lat"), F.col("lon")).alias("cell"))

    def q_adaptive_cells_pts(spark, sf):
        from osmgraft.operators.skew import adaptive_cell_split

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        out = adaptive_cell_split(pts, base_res=0, max_rows=5, max_res=3)
        return out.groupBy("cell").agg(F.count("*").alias("n"))

    def q_legacy_split(spark, sf):
        # L7 legacy char-count split (ref osmpoi.cpp:121-199, dead code in
        # the reference — implemented for completeness). Pure Catalyst:
        # the center-out delimiter scan is a filter(sequence)+struct-min
        # argmin, the radius is byte-based (octet_length) like the C++
        # std::string math.
        from osmgraft.functions.labels import legacy_ball_radius_expr, legacy_split_expr

        d = _read(spark, sf, "documents").select("doc_id", "text")
        lbl = F.substring(F.col("text"), 1, 40)
        split = legacy_split_expr(lbl, " -/")
        return d.select(
            "doc_id",
            split.alias("split_label"),
            legacy_ball_radius_expr(split).alias("radius"),
        )

    def q_dedup_labels_pts(spark, sf):
        # J6 dedup semantics against a pure-SQL brute-force suppression:
        # keep a point iff no lower-pid point lies within the radius.
        from osmgraft.operators.knn import dedup_labels

        pts = _pts(spark, sf).select("pid", F.col("pid").alias("rank"), "lat", "lon")
        return dedup_labels(pts, radius_m=200_000.0, rank_col="rank", id_col="pid").select("pid")

    def q_doc_dedup_first(spark, sf):
        # batch analog of the streaming stateful dedup
        # (streaming/ingest.stream_dedup_first_seen): first doc_id per
        # span-sequence fingerprint over the staged interleaved corpus
        # plus a deterministic duplicated slice (distinct doc_id, same
        # spans). Groups by the xxhash64 fingerprint; the DuckDB oracle
        # groups by the raw key string — equal iff the hash is injective
        # on this corpus (fixed seed, so deterministic).
        from osmgraft.streaming.ingest import document_fingerprint_expr

        docs, _ = _staged(spark)
        dup = docs.where(
            F.split_part(F.col("doc_id"), F.lit("/"), F.lit(2)).cast("long") % 7 == 0
        ).withColumn("doc_id", F.concat(F.lit("dup/"), F.col("doc_id")))
        return (
            docs.unionByName(dup)
            .withColumn("_fp", document_fingerprint_expr())
            .groupBy("_fp")
            .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dupes"))
            .select("doc_id", "n_dupes")
        )

    # --- retrieval: BM25 keyword top-k (inverted-index shape) --------------------
    def q_bm25_topk(spark, sf):
        from osmgraft.operators.retrieval import bm25_topk

        d = _read(spark, sf, "documents").select("doc_id", "text")
        return bm25_topk(d, ["spark", "join", "window"], k=100)

    # --- dedup: exact duplicated-substring spans (suffix-array-free) -------------
    def q_dup_spans(spark, sf):
        from osmgraft.operators.dedup import dup_spans

        d = _read(spark, sf, "documents").select("doc_id", "text")
        # gram_hash='md5': the engine-replayable oracle configuration
        # (the library default is xxhash64, the narrower scale path)
        return dup_spans(d, n=5, min_docs=2, gram_hash="md5")

    # --- curation: the composed end-to-end chain ----------------------------------
    def q_curation_pipeline(spark, sf):
        from osmgraft.operators.curation import curation_pipeline

        d = _read(spark, sf, "documents").select("doc_id", "text")
        corpus = d.where(F.col("doc_id") % 10 != 7)
        dup = corpus.where(F.col("doc_id") < 300).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
        bench = d.where(F.col("doc_id") % 10 == 7)
        # planted exact duplicates must vanish at stage 1; sql_exact: the
        # Knuth-hash sampling configuration the oracle replays.
        # min_shared=10: the synth vocabulary is ~40 tokens, so 3-grams
        # recur across unrelated docs — at the default threshold the
        # decontamination stage would flag ~86% of this corpus
        return curation_pipeline(
            corpus.unionByName(dup), bench, decontam_min_shared=10, sql_exact=True
        )

    # --- sketch: HyperLogLog distinct-token count ---------------------------------
    def _hll_vals(spark, sf):
        # (token, doc bucket) pairs: the synth vocabulary alone is ~40
        # tokens — too few to exercise a sketch — so distinct values are
        # token x doc-bucket (thousands at sf0.01)
        from osmgraft.operators.dedup import tokens_expr

        d = _read(spark, sf, "documents")
        exp = d.select(
            (F.col("doc_id") % 1000).cast("string").alias("_b"),
            F.explode(tokens_expr(F.col("text"))).alias("_t"),
        )
        return exp.select(F.concat_ws("-", F.col("_t"), F.col("_b")).alias("w"))

    def q_hll_registers(spark, sf):
        from osmgraft.operators.sketch import hll_registers

        return hll_registers(_hll_vals(spark, sf), "w", p=10)

    def q_hll_estimate(spark, sf):
        from osmgraft.operators.sketch import hll_count_distinct

        return hll_count_distinct(_hll_vals(spark, sf), "w", p=10)

    # --- graph: fixed-iteration PageRank over a derived link graph ---------------
    def q_pagerank(spark, sf):
        from osmgraft.operators.graph import pagerank

        d = _read(spark, sf, "documents").where(F.col("doc_id") < 5000)
        edges = d.select(
            (F.col("doc_id") % 500).alias("src"),
            ((F.col("doc_id") * 13 + 7) % 500).alias("dst"),
        )
        return pagerank(edges, iterations=3)

    # --- curation: context-window chunking ---------------------------------------
    def q_chunk_docs(spark, sf):
        from osmgraft.operators.curation import chunk_docs

        d = _read(spark, sf, "documents").select("doc_id", "text").where(
            F.col("doc_id") < 500
        )
        return chunk_docs(d, chunk_words=40, overlap=10)

    # --- curation: URL canonicalization + per-domain caps --------------------
    def q_domain_caps(spark, sf):
        from osmgraft.operators.urltools import domain_caps

        d = (
            _read(spark, sf, "documents")
            .where(F.col("doc_id") < 1500)
            .select("doc_id", "source", "n_chars")
            .withColumn("url", F.expr(_URL_FRAG))
        )
        out = domain_caps(d, url_col="url", quality_col="n_chars", max_per_domain=3)
        return out.select(
            "doc_id",
            "url_canon",
            "domain",
            F.col("domain_rank").cast("int").alias("domain_rank"),
            F.col("kept").cast("int").alias("kept"),
        )

    # --- sketch: grouped HLL (distinct tokens per source) --------------------------
    def q_hll_by_source(spark, sf):
        from osmgraft.operators.dedup import tokens_expr
        from osmgraft.operators.sketch import hll_count_distinct_by

        d = _read(spark, sf, "documents")
        exp = d.select(
            F.col("source").alias("g"),
            (F.col("doc_id") % 1000).cast("string").alias("_b"),
            F.explode(tokens_expr(F.col("text"))).alias("_t"),
        )
        vals = exp.select("g", F.concat_ws("-", "_t", "_b").alias("w"))
        return hll_count_distinct_by(vals, ["g"], "w", p=9)

    # --- curation: deterministic weighted sampling (Efraimidis-Spirakis) -----------
    def q_weighted_sample(spark, sf):
        from osmgraft.operators.curation import weighted_sample

        d = _read(spark, sf, "documents").select("doc_id", "lang", "n_chars")
        return weighted_sample(
            d, k=20, weight_col="n_chars", strata_cols=["lang"], seed=1
        )

    # --- curation: corpus-percentile quality gate -----------------------------------
    def q_quantile_gate(spark, sf):
        from osmgraft.operators.curation import quantile_gate

        d = _read(spark, sf, "documents").select("doc_id", "n_chars")
        return quantile_gate(d, "n_chars", q=0.9, lo=0.0, hi=2048.0, nbins=256)

    # --- sketch: Count-Min weighted heavy-hitter point estimates -----------------
    def q_cms_topk(spark, sf):
        from osmgraft.operators.sketch import cms_point_query, cms_table

        d = _read(spark, sf, "documents").select(
            (F.col("doc_id") % 37).cast("string").alias("v"), "n_chars"
        )
        table = cms_table(d, "v", d=4, w=256, weight_col="n_chars")
        probes = spark.range(40).select(F.col("id").cast("string").alias("v"))
        return cms_point_query(table, probes, "v", d=4, w=256)

    # --- sketch: fixed-bin histogram quantiles ------------------------------------
    def q_hist_quantiles(spark, sf):
        from osmgraft.operators.sketch import hist_bins, hist_quantiles

        d = _read(spark, sf, "documents")
        bins = hist_bins(d, "n_chars", lo=0.0, hi=2048.0, nbins=256)
        return hist_quantiles(
            bins, [0.1, 0.25, 0.5, 0.75, 0.9, 0.99], lo=0.0, hi=2048.0, nbins=256
        )

    # --- sketch: per-group histogram quantiles --------------------------------------
    def q_hist_by_lang(spark, sf):
        from osmgraft.operators.sketch import hist_bins_by, hist_quantiles_by

        d = _read(spark, sf, "documents")
        bins = hist_bins_by(d, ["lang"], "n_chars", lo=0.0, hi=2048.0, nbins=256)
        return hist_quantiles_by(
            bins, ["lang"], [0.25, 0.5, 0.9], lo=0.0, hi=2048.0, nbins=256
        )

    # --- layout: Z-order (Morton) clustering key ----------------------------------
    def q_zorder_keys(spark, sf):
        from osmgraft.operators.layout import zorder_key

        pts = _pts(spark, sf)
        return pts.select("pid", zorder_key(F.col("lat"), F.col("lon"), 16))

    # --- tiles: multi-resolution rollup pyramid -----------------------------------
    def q_tile_pyramid(spark, sf):
        from osmgraft.operators.tiles import tile_pyramid

        pts = _pts(spark, sf)
        return tile_pyramid(pts, z_max=8, z_min=5, rank_col="pid")

    # --- geospatial: geodesic polyline length over derived ways --------------------
    def _ways(spark, sf):
        pts = _pts(spark, sf).where(F.col("pid") < 2000)
        w = pts.groupBy(F.col("grp").alias("way_id")).agg(
            F.sort_array(F.collect_list(F.struct("pid", "lat", "lon"))).alias("_s")
        )
        return w.select(
            "way_id",
            F.expr("transform(_s, x -> x.lat)").alias("lats"),
            F.expr("transform(_s, x -> x.lon)").alias("lons"),
        )

    def q_way_midpoints(spark, sf):
        from osmgraft.operators.geom import polyline_point_at

        w = _ways(spark, sf)
        p = polyline_point_at(F.col("lats"), F.col("lons"), frac=0.5)
        return w.select(
            "way_id",
            F.round(p["lat"], 4).alias("plat"),
            F.round(p["lon"], 4).alias("plon"),
        )

    def q_way_lengths(spark, sf):
        from osmgraft.operators.geom import polyline_length_m

        w = _ways(spark, sf)
        return w.select(
            "way_id",
            F.round(
                polyline_length_m(F.col("lats"), F.col("lons")) / 1000.0, 3
            ).alias("length_km"),
        )

    # --- geospatial: spherical ring areas over the PIP rectangles ------------------
    def q_ring_centroids(spark, sf):
        from osmgraft.operators.geom import ring_centroid

        n = _read(spark, sf, "nation")
        rings = n.select(
            F.col("n_nationkey").cast("long").alias("ring_id"),
            ((F.col("n_nationkey") % 9).cast("double") * 9.0 - 40.5678).alias("_la"),
            ((F.col("n_nationkey") * 29 % 300).cast("double") - 150.5678).alias("_lo"),
        ).select(
            "ring_id",
            F.array(
                F.col("_la"),
                F.col("_la"),
                F.col("_la") + 8.1234,
                F.col("_la") + 8.1234,
                F.col("_la") + 4.0,
            ).alias("lats"),
            F.array(
                F.col("_lo"),
                F.col("_lo") + 12.1234,
                F.col("_lo") + 12.1234,
                F.col("_lo") + 6.0,
                F.col("_lo") + 6.0,
            ).alias("lons"),
        )
        c = ring_centroid(F.col("lats"), F.col("lons"))
        return rings.select(
            "ring_id",
            F.round(c["lat"], 4).alias("clat"),
            F.round(c["lon"], 4).alias("clon"),
        )

    def q_ring_areas(spark, sf):
        from osmgraft.operators.geom import ring_area_m2

        n = _read(spark, sf, "nation")
        rings = n.select(
            F.col("n_nationkey").cast("long").alias("ring_id"),
            ((F.col("n_nationkey") % 9).cast("double") * 9.0 - 40.5678).alias("_la"),
            ((F.col("n_nationkey") * 29 % 300).cast("double") - 150.5678).alias("_lo"),
        ).select(
            "ring_id",
            F.array(
                F.col("_la"), F.col("_la"), F.col("_la") + 8.1234, F.col("_la") + 8.1234
            ).alias("lats"),
            F.array(
                F.col("_lo"), F.col("_lo") + 12.1234, F.col("_lo") + 12.1234, F.col("_lo")
            ).alias("lons"),
        )
        return rings.select(
            "ring_id",
            F.round(ring_area_m2(F.col("lats"), F.col("lons")) / 1e6, 3).alias(
                "area_km2"
            ),
        )

    # --- geospatial: zonal statistics over the PIP rectangles ----------------------
    def q_zonal_stats(spark, sf):
        from osmgraft.operators.zonal import zonal_stats

        pts = _pts(spark, sf).select(
            "pid", "lat", "lon", F.col("grp").cast("double").alias("val")
        )
        n = _read(spark, sf, "nation")
        boxes = n.select(
            F.col("n_nationkey").cast("long").alias("poly_id"),
            F.col("n_name").alias("name"),
            ((F.col("n_nationkey") % 9).cast("double") * 9.0 - 40.5678).alias("_la"),
            ((F.col("n_nationkey") * 29 % 300).cast("double") - 150.5678).alias("_lo"),
        )
        polys = boxes.select(
            "poly_id",
            "name",
            F.array(
                F.col("_la"), F.col("_la"), F.col("_la") + 8.1234, F.col("_la") + 8.1234
            ).alias("ring_lats"),
            F.array(
                F.col("_lo"), F.col("_lo") + 12.1234, F.col("_lo") + 12.1234, F.col("_lo")
            ).alias("ring_lons"),
        )
        return zonal_stats(pts, polys, "val", strategy="broadcast")

    # --- temporal: as-of join of events to a sparse snapshot stream ----------------
    def q_asof_join(spark, sf):
        from osmgraft.operators.temporal import asof_join

        ev = _read(spark, sf, "events")
        left = ev.select("event_id", "user_id", "ts", "value")
        # snapshot stream: every 7th event, aggregated to unique (user, ts)
        # (the operator's documented precondition on the right side)
        snap = (
            ev.where(F.col("event_id") % 7 == 0)
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias("snap"))
        )
        return asof_join(left, snap, key="user_id")

    # --- temporal: point-in-interval join (bucketized, long rail broadcast) --------
    def q_interval_join(spark, sf):
        from osmgraft.operators.temporal import interval_join

        ev = _read(spark, sf, "events")
        pts = ev.select("event_id", "user_id", "ts")
        # interval stream: every 97th event opens a window of 0..98 hours,
        # so both rails run — spans up to 16 buckets explode, longer ones
        # take the broadcast theta rail
        iv = ev.where(F.col("event_id") % 97 == 0).select(
            F.col("event_id").alias("iv_id"),
            "user_id",
            F.col("ts").alias("start_ts"),
            F.expr(
                "ts + make_interval(0, 0, 0, 0, cast((event_id % 50) * 2 as int), 0, 0)"
            ).alias("end_ts"),
        )
        out = interval_join(pts, iv, key="user_id", bucket_s=600.0, max_span_buckets=16)
        return out.select("event_id", "user_id", "ts", "iv_id_iv")

    # --- overlay: polygon x polygon intersects join ---------------------------------
    def q_poly_overlap_rects(spark, sf):
        # nation rects (~8x12 deg) exceed max_cover_cells at res 5 and take
        # the broadcast rail; customer rects stay cell-covered — the oracle
        # (strict bbox overlap, exact for axis-aligned rects) checks the
        # rail end-to-end.
        from osmgraft.operators.overlay import poly_intersects_join

        c = _read(spark, sf, "customer")
        k = F.col("c_custkey").cast("long")
        la = (k % 120).cast("double") * 0.55 - 33.13579
        lo = (k * 37 % 320).cast("double") * 0.9 - 144.24683
        left = c.select(
            k.alias("lid"),
            F.array(la, la, la + 0.9876, la + 0.9876).alias("ring_lats"),
            F.array(lo, lo + 1.2345, lo + 1.2345, lo).alias("ring_lons"),
        )
        n = _read(spark, sf, "nation")
        m = F.col("n_nationkey").cast("long")
        ra = (m % 9).cast("double") * 9.0 - 40.5678
        ro = (m * 29 % 300).cast("double") - 150.5678
        right = n.select(
            m.alias("rid"),
            F.array(ra, ra, ra + 8.1234, ra + 8.1234).alias("ring_lats"),
            F.array(ro, ro + 12.1234, ro + 12.1234, ro).alias("ring_lons"),
        )
        return poly_intersects_join(left, right, "lid", "rid", res=5, max_cover_cells=256)

    def q_poly_overlap_tris(spark, sf):
        # both triangle sets stay under the covering budget -> the shared-
        # cell equi-join path; the oracle replays the exact segment-
        # crossing + even-odd containment kernel in SQL.
        from osmgraft.operators.overlay import poly_intersects_join

        c = _read(spark, sf, "customer")
        k = F.col("c_custkey").cast("long")
        a = (k % 120).cast("double") * 0.55 - 33.13579
        b = (k * 37 % 320).cast("double") * 0.9 - 144.24683
        left = c.select(
            k.alias("lid"),
            F.array(a, a + _OVL_L_DY[0], a + _OVL_L_DY[1]).alias("ring_lats"),
            F.array(b, b + _OVL_L_DX[0], b + _OVL_L_DX[1]).alias("ring_lons"),
        )
        n = _read(spark, sf, "nation")
        m = F.col("n_nationkey").cast("long")
        ra = (m % 9).cast("double") * 9.0 - 36.78913
        rb = (m * 29 % 300).cast("double") - 150.56789
        right = n.select(
            m.alias("rid"),
            F.array(ra, ra + _OVL_R_DY[0], ra + _OVL_R_DY[1]).alias("ring_lats"),
            F.array(rb, rb + _OVL_R_DX[0], rb + _OVL_R_DX[1]).alias("ring_lons"),
        )
        return poly_intersects_join(left, right, "lid", "rid", res=5, max_cover_cells=2048)

    # --- snap: nearest-segment join (map-matching candidate stage) ------------------
    def q_snap(spark, sf):
        from osmgraft.operators.snap import snap_join

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        s = _read(spark, sf, "supplier")
        k = F.col("s_suppkey").cast("long")
        y1 = (k % 110).cast("double") * 0.5 - 27.123
        x1 = (k * 53 % 340).cast("double") - 170.456
        y2 = y1 + ((k % 7).cast("double") - 3) * 0.8 + 0.123
        x2 = x1 + ((k % 11).cast("double") - 5) * 0.6 + 0.234
        segs = s.select(
            k.alias("sid"),
            y1.alias("lat1"),
            x1.alias("lon1"),
            y2.alias("lat2"),
            x2.alias("lon2"),
        )
        # _pts latitudes stay within +-60, so min_cos_lat=0.45 (|lat| <=
        # 63.2) keeps the disk guarantee while using res-2 cells
        return snap_join(pts, segs, 250_000.0, min_cos_lat=0.45)

    # --- cdc: one-shuffle changelog fold into a snapshot -----------------------------
    def q_cdc(spark, sf):
        from osmgraft.operators.cdc import apply_changelog

        c = _read(spark, sf, "customer")
        snap = c.select(
            F.col("c_custkey").alias("id"),
            F.col("c_acctbal").alias("bal"),
            F.col("c_nationkey").cast("long").alias("nat"),
        )
        o = _read(spark, sf, "orders")
        chg = o.select(
            F.col("o_custkey").alias("id"),
            F.col("o_totalprice").alias("bal"),
            (F.col("o_orderkey") % 25).cast("long").alias("nat"),
            F.col("o_orderkey").alias("seq"),
            F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
        )
        return apply_changelog(snap, chg, key="id")

    def q_scd2(spark, sf):
        from osmgraft.operators.cdc import scd2_intervals

        o = _read(spark, sf, "orders")
        chg = o.select(
            F.col("o_custkey").alias("id"),
            F.col("o_orderkey").alias("seq"),
            F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
            F.col("o_orderstatus").alias("status"),
            (F.col("o_orderkey") % 25).cast("long").alias("nat"),
        )
        out = scd2_intervals(chg, key="id", attrs=["status", "nat"])
        # nullable bigint round-trips from DuckDB as float64; align kinds
        return out.withColumn("valid_to", F.col("valid_to").cast("double"))

    # --- layout: geohash string key -------------------------------------------------
    def q_geohash(spark, sf):
        from osmgraft.operators.layout import geohash

        pts = _pts(spark, sf)
        return pts.select("pid", geohash(F.col("lat"), F.col("lon"), 7).alias("gh"))

    def q_quadkeys(spark, sf):
        from osmgraft.operators.layout import quadkey

        pts = _pts(spark, sf)
        return pts.select("pid", quadkey(F.col("lat"), F.col("lon"), 12).alias("qk"))

    # --- layout: Morton-range-accelerated exact box query --------------------------
    def q_zorder_box(spark, sf):
        from osmgraft.operators.layout import box_query

        pts = _pts(spark, sf)
        return box_query(pts, 10.0, 35.0, -20.0, 40.0)

    # --- map matching: per-fix top-k snap candidates --------------------------------
    def q_match_candidates(spark, sf):
        from osmgraft.operators.matching import match_candidates

        fixes, segs = _match_inputs(spark, sf)
        out = match_candidates(
            fixes, segs, _MM_RADIUS_M, _MM_SIGMA_M, cand_k=_MM_CAND_K
        )
        return out.select(
            "user_id",
            "fid",
            "ts_s",
            F.col("rank").alias("cand_rank"),
            "sid",
            "dist_m",
            "emit_i",
        )

    # --- map matching: Viterbi decode over the candidate trellis --------------------
    def q_viterbi(spark, sf):
        from osmgraft.operators.matching import viterbi_match

        fixes, segs = _match_inputs(spark, sf)
        return viterbi_match(
            fixes,
            segs,
            _MM_RADIUS_M,
            sigma_m=_MM_SIGMA_M,
            beta_m=_MM_BETA_M,
            cand_k=_MM_CAND_K,
        )

    # --- graph: hop-bounded multi-source shortest paths -----------------------------
    def q_sssp(spark, sf):
        from osmgraft.operators.graph import sssp

        d = _read(spark, sf, "documents").where(F.col("doc_id") < 5000)
        # branching factor 4 (j-explode): every node gets 4 distinct
        # out-edges so shortest paths genuinely merge at the min
        edges = (
            d.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(3))))
            .select(
                (F.col("doc_id") % 500).alias("src"),
                ((F.col("doc_id") * 13 + F.col("j") * 97 + 7) % 500).alias("dst"),
                ((F.col("doc_id") + F.col("j") * 31) % 97 + 1).cast("long").alias("w"),
            )
        )
        srcs = d.where(F.col("doc_id") < 5).select(F.col("doc_id").alias("id"))
        return sssp(edges, srcs, n_rounds=6)

    # --- trajectory: fixed-interval linear resampling -------------------------------
    def q_resample(spark, sf):
        from osmgraft.operators.sessions import _epoch_seconds
        from osmgraft.operators.trajectory import resample_track

        ev = _read(spark, sf, "events")
        fixes = ev.select(
            "user_id",
            "event_id",
            _epoch_seconds(ev, "ts").alias("ts_s"),
            ((F.col("user_id") % 120).cast("double") / 2.0 + F.col("value") % 0.01).alias("lat"),
            ((F.col("user_id") * 37 % 360).cast("double") - 180.0 + F.col("value") % 0.01).alias("lon"),
        )
        return resample_track(fixes, 3600, order_tiebreak="event_id")

    # --- movement: geofence enter/exit events ---------------------------------------
    def q_geofence(spark, sf):
        from osmgraft.operators.geofence import geofence_events
        from osmgraft.operators.sessions import _epoch_seconds

        ev = _read(spark, sf, "events")
        fixes = ev.select(
            "user_id",
            F.col("event_id").alias("fid"),
            _epoch_seconds(ev, "ts").alias("ts_s"),
            (
                (F.col("user_id") % 80).cast("double") / 2.0
                - 20.0
                + (F.col("event_id") % 37).cast("double") * 0.45
            ).alias("lat"),
            (
                (F.col("user_id") * 29 % 300).cast("double")
                - 150.0
                + (F.col("event_id") % 23).cast("double") * 0.8
            ).alias("lon"),
        )
        n = _read(spark, sf, "nation")
        boxes = n.select(
            F.col("n_nationkey").cast("long").alias("poly_id"),
            ((F.col("n_nationkey") % 9).cast("double") * 9.0 - 40.5678).alias("_la"),
            ((F.col("n_nationkey") * 29 % 300).cast("double") - 150.5678).alias("_lo"),
        )
        polys = boxes.select(
            "poly_id",
            F.array(
                F.col("_la"), F.col("_la"), F.col("_la") + 8.1234, F.col("_la") + 8.1234
            ).alias("ring_lats"),
            F.array(
                F.col("_lo"), F.col("_lo") + 12.1234, F.col("_lo") + 12.1234, F.col("_lo")
            ).alias("ring_lons"),
        )
        return geofence_events(fixes, polys, strategy="broadcast")

    # --- trajectory: GPS spike removal ----------------------------------------------
    def q_spike_filter(spark, sf):
        from osmgraft.operators.sessions import _epoch_seconds
        from osmgraft.operators.trajectory import spike_filter

        ev = _read(spark, sf, "events")
        fixes = ev.select(
            "user_id",
            "event_id",
            _epoch_seconds(ev, "ts").alias("ts_s"),
            (
                (F.col("user_id") % 120).cast("double") / 2.0
                + F.col("value") % 0.01
                + F.when(F.col("event_id") % 17 == 0, 25.0).otherwise(0.0)
            ).alias("lat"),
            ((F.col("user_id") * 37 % 360).cast("double") - 180.0 + F.col("value") % 0.01).alias("lon"),
        )
        return spike_filter(fixes, max_speed_ms=30.0, order_tiebreak="event_id")

    # --- movement: geofence visits (dwell intervals) --------------------------------
    def q_dwell(spark, sf):
        from osmgraft.operators.geofence import dwell_intervals

        out = dwell_intervals(q_geofence(spark, sf))
        return out.select(
            "user_id",
            "poly_id",
            "enter_s",
            F.col("exit_s").cast("double").alias("exit_s"),
            F.col("dwell_s").cast("double").alias("dwell_s"),
        )

    # --- cluster footprints: convex hull per DBSCAN cluster -------------------------
    def q_cluster_hulls(spark, sf):
        from osmgraft.operators.cluster import convex_hulls, dbscan

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        lab = dbscan(pts, eps_m=_DBSCAN_EPS_M, min_pts=_DBSCAN_MIN_PTS)
        # lats snap to a dyadic 1/64-deg grid: every cross product in the
        # hull decisions is then EXACT in ieee doubles (lon is integral
        # already), so the chain kernel and the oracle's edge test agree
        # provably, not probabilistically
        members = (
            lab.where(F.col("cluster").isNotNull())
            .select("pid", "cluster")
            .join(pts, "pid")
            .select(
                "pid",
                "cluster",
                (F.floor(F.col("lat") * 64.0 + 0.5) / 64.0).alias("lat"),
                "lon",
            )
        )
        hull = convex_hulls(members)
        return hull.select("cluster", "pid", "lat", "lon")

    # --- density clustering: distributed DBSCAN -------------------------------------
    def q_dbscan(spark, sf):
        from osmgraft.operators.cluster import dbscan

        pts = _pts(spark, sf).select("pid", "lat", "lon")
        out = dbscan(pts, eps_m=_DBSCAN_EPS_M, min_pts=_DBSCAN_MIN_PTS)
        return out.select(
            "pid", F.coalesce(F.col("cluster"), F.lit(-1)).alias("cluster"), "role"
        )

    return {
        "filter_scan": q_filter_scan,
        "classify_levels": q_classify,
        "classify_level_counts": q_level_counts,
        "atoi_semantics": q_atoi,
        "name_coalesce": q_name_coalesce,
        "semi_join_reduction": q_semi_join,
        "join_centroid": q_centroid,
        "union_pois": q_union,
        "global_rank": q_global_rank,
        "area_size_cap": q_size_cap,
        "bbox_agg": q_bbox,
        "tag_histogram": q_tag_histogram,
        "tag_histogram_detailed": q_tag_histogram_detailed,
        "tile_assignment": q_tiles,
        "knn_radius_pairs": q_knn_pairs,
        "pip_rectangles": q_pip_boxes,
        "pip_triangles": q_pip_triangles,
        "poly_overlap_rects": q_poly_overlap_rects,
        "poly_overlap_tris": q_poly_overlap_tris,
        "snap_points_ways": q_snap,
        "cdc_upsert": q_cdc,
        "scd2_intervals": q_scd2,
        "geohash_cells": q_geohash,
        "quadkeys": q_quadkeys,
        "rasterize_density": q_rasterize,
        "raster_vectorize": q_raster_vectorize,
        "idw_surface": q_idw_surface,
        "vectorize_runs": q_vectorize_runs,
        "tile_topk": q_tile_topk,
        "salted_count": q_salted_count,
        "pairwise_knn": q_pairwise_knn,
        "quality_filter": q_quality_filter,
        "dedup_exact": q_dedup_exact,
        "jaccard_pairs": q_jaccard_pairs,
        "decontaminate_ngrams": q_decontaminate,
        "repetition_features": q_repetition,
        "stratified_sample": q_stratified_sample,
        "mix_domains": q_mix_domains,
        "boilerplate_lines": q_boilerplate,
        "assign_shards": q_assign_shards,
        "pii_redact": q_pii_redact,
        "embedding_dup_pairs": q_embedding_dup,
        "text_quality": q_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "ann_brute_topk": q_ann_brute,
        "events_daily": q_events_daily,
        "sessionize_events": q_sessionize_events,
        "window_topk": q_window_topk,
        # engine-native, rows-only:
        "osm_label_pipeline": q_osm_labels,
        "osm_pip_admin": q_osm_pip_admin,
        "osm_dedup_labels": q_osm_dedup_labels,
        "osm_adaptive_cells": q_osm_adaptive_cells,
        # oracled engine-native queries (SQL replicas on the DuckDB side):
        "doc_dedup_first": q_doc_dedup_first,
        "s2_cells": q_s2_cells,
        "s2_compact": q_s2_compact,
        "stay_points": q_stay_points,
        "match_candidates_topk": q_match_candidates,
        "viterbi_match": q_viterbi,
        "dbscan_clusters": q_dbscan,
        "cluster_hulls": q_cluster_hulls,
        "sssp_6hop": q_sssp,
        "resample_track": q_resample,
        "geofence_events": q_geofence,
        "spike_filter": q_spike_filter,
        "dwell_intervals": q_dwell,
        "od_flows": q_od_flows,
        "smooth_box": q_smooth_box,
        "contour_segments": q_contours,
        "radius_of_gyration": q_rog,
        "minhash_lsh_pairs": q_minhash_pairs,
        "ann_lsh_topk": q_ann_lsh,
        "ann_ivf_topk": q_ann_ivf,
        "quantize_embeddings": q_quantize_embeddings,
        "multimodal_features": q_multimodal_features,
        "wav_decode": q_wav_decode,
        "png_decode": q_png_decode,
        "jpeg_decode": q_jpeg_decode,
        "mp4_decode": q_mp4_decode,
        "avi_frames": q_avi_frames,
        "dedup_labels_pts": q_dedup_labels_pts,
        "hex_cells": q_hex_cells,
        "adaptive_cells_pts": q_adaptive_cells_pts,
        "simhash_pairs": q_simhash_pairs,
        "legacy_split": q_legacy_split,
        "dedup_components": q_dedup_components,
        "bm25_topk": q_bm25_topk,
        "dup_spans": q_dup_spans,
        "chunk_docs": q_chunk_docs,
        "pagerank_hosts": q_pagerank,
        "hll_registers": q_hll_registers,
        "hll_distinct_tokens": q_hll_estimate,
        "curation_pipeline": q_curation_pipeline,
        "domain_caps": q_domain_caps,
        "weighted_sample_docs": q_weighted_sample,
        "quantile_gate_p90": q_quantile_gate,
        "hll_distinct_by_source": q_hll_by_source,
        "cms_heavy_hitters": q_cms_topk,
        "hist_quantiles": q_hist_quantiles,
        "hist_quantiles_by_lang": q_hist_by_lang,
        "zorder_keys": q_zorder_keys,
        "tile_pyramid": q_tile_pyramid,
        "way_lengths": q_way_lengths,
        "ring_areas": q_ring_areas,
        "ring_centroids": q_ring_centroids,
        "way_midpoints": q_way_midpoints,
        "zonal_stats_boxes": q_zonal_stats,
        "asof_join_events": q_asof_join,
        "interval_join_events": q_interval_join,
        "zorder_box_query": q_zorder_box,
    }


def oracle_sql() -> dict[str, str]:
    from osmgraft.operators.graph import pagerank_oracle_sql, sssp_oracle_sql
    from osmgraft.operators.curation import weighted_sample_oracle_sql
    from osmgraft.operators.geom import (
        polyline_length_oracle_sql,
        polyline_point_at_oracle_sql,
        ring_area_oracle_sql,
        ring_centroid_oracle_sql,
    )
    from osmgraft.operators.layout import (
        geohash_oracle_sql,
        quadkey_oracle_sql,
        zorder_oracle_sql,
    )
    from osmgraft.operators.temporal import asof_oracle_sql
    from osmgraft.operators.sketch import (
        cms_oracle_sql,
        hist_quantiles_by_oracle_sql,
        hist_quantiles_oracle_sql,
        hll_by_oracle_sql,
        hll_oracle_sql,
    )

    def _tile_level_sql(z: int) -> str:
        # identical Web-Mercator formula as tiles.tile_xy, aggregated
        # DIRECTLY from the points at zoom z — so the pyramid oracle also
        # certifies the parent-relation rollup identity per level
        n = 1 << z
        return (
            f"select {z} as tile_z, "
            f"cast(least(floor((lon+180.0)/360.0*{n}), {n - 1}) as bigint) as tile_x, "
            f"cast(least(greatest(floor((1.0 - ln(tan(radians(least(greatest(lat, -85.05112878), 85.05112878))) "
            f"+ 1.0/cos(radians(least(greatest(lat, -85.05112878), 85.05112878))))/pi())/2.0*{n}), 0), {n - 1}) as bigint) as tile_y, "
            f"count(*) as n_labels, min(pid) as best_rank "
            f"from ({_PTS_SQL}) p group by 1, 2, 3"
        )

    atoi = (
        "coalesce(try_cast(regexp_extract({v}, '^[\\t\\n\\x0b\\x0c\\r ]*([+-]?[0-9]+)', 1) "
        "as bigint), 0)"
    )
    classify_case = """
        case
          when place = 'city' and {p} >= 5000000 then 16
          when place = 'city' and {p} >= 1000000 then 15
          when place = 'city' and {p} >= 500000 then 14
          when place = 'city' then 13
          when place = 'town' and {p} >= 100000 then 12
          when place = 'town' and {p} >= 25000 then 11
          when place = 'town' then 10
          when place = 'village' then 9
          when place = 'suburb' then 8
          when place = 'hamlet' then 7
          else 0
        end
    """.format(p=atoi.format(v="printf('%d', pop)"))

    hav = (
        "2*6371008.8*asin(sqrt("
        "pow(sin(radians(b.lat-a.lat)/2),2) + "
        "cos(radians(a.lat))*cos(radians(b.lat))*pow(sin(radians(b.lon-a.lon)/2),2)))"
    )

    tok = "string_split_regex(trim(text), '\\s+')"
    ltok = "string_split_regex(trim(lower(text)), '\\s+')"
    bpe = "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')"
    en = "len(list_filter({w}, x -> x in ('the','a','of','and','to','in','is','it','that','for')))"
    de = "len(list_filter({w}, x -> x in ('der','die','das','und','ist','ein','nicht','mit','auf','ich')))"
    fr = "len(list_filter({w}, x -> x in ('le','la','les','et','un','une','est','que','pour','dans')))"

    return {
        "filter_scan": (
            "select l_orderkey, l_quantity, l_extendedprice from lineitem "
            "where l_returnflag = 'R' and l_quantity > 30"
        ),
        "classify_levels": (
            f"select c_custkey, {classify_case} as level_id from ({_TAGS_SQL_SRC}) t"
        ),
        "classify_level_counts": (
            f"select level_id, count(*) as poi_count from "
            f"(select {classify_case} as level_id from ({_TAGS_SQL_SRC}) t) s group by level_id"
        ),
        "atoi_semantics": (
            "select p_partkey, "
            + atoi.format(v="concat('  +', cast(p_size as varchar), 'kg')")
            + " as atoi_sized, "
            + atoi.format(v="p_brand")
            + " as atoi_brand from part"
        ),
        "name_coalesce": (
            "select c_custkey, coalesce("
            "case when c_custkey % 3 = 0 then c_name end, "
            "case when c_custkey % 2 = 0 then upper(c_name) end, "
            "case when c_custkey % 5 = 0 then lower(c_name) end, "
            "'') as resolved_name from customer"
        ),
        "semi_join_reduction": (
            "select l_returnflag, count(*) as n, round(sum(l_quantity), 4) as qty "
            "from lineitem where l_orderkey in "
            "(select o_orderkey from orders where o_totalprice > 150000) "
            "group by l_returnflag"
        ),
        "join_centroid": (
            f"select n_name, round(avg(lat), 6) as lat_c, round(avg(lon), 6) as lon_c, "
            f"count(*) as n_pts from ({_PTS_SQL}) p join nation on p.grp = n_nationkey "
            "group by n_name"
        ),
        "union_pois": (
            "select c_custkey as id, 'customer' as src from customer "
            "union all select s_suppkey as id, 'supplier' as src from supplier"
        ),
        "global_rank": (
            "select c_custkey as osm_id, row_number() over "
            "(order by c_nationkey asc, cast(floor(c_acctbal) as bigint) asc, c_custkey asc) - 1 "
            "as rank from customer"
        ),
        "area_size_cap": (
            "select o_orderkey, o_totalprice from orders where o_orderkey in "
            "(select l_orderkey from lineitem group by l_orderkey having sum(l_quantity) <= 100)"
        ),
        "bbox_agg": (
            f"select grp, round(min(lat),6) as min_lat, round(max(lat),6) as max_lat, "
            f"round(min(lon),6) as min_lon, round(max(lon),6) as max_lon "
            f"from ({_PTS_SQL}) p group by grp"
        ),
        "tag_histogram": (
            "select event_type, count(*) as tag_count from events group by event_type"
        ),
        "tag_histogram_detailed": (
            "with per_value as (select event_type as key, props as value, count(*) as value_count "
            "from events group by 1, 2), "
            "per_key as (select key, count(distinct value) as n_values, cast(sum(value_count) as bigint) as key_count "
            "from per_value group by key) "
            "select v.key, v.value, v.value_count, k.n_values, k.key_count "
            "from per_value v join per_key k on v.key = k.key where k.n_values <= 500"
        ),
        "tile_assignment": (
            f"select 10 as tile_z, "
            f"cast(least(floor((lon+180.0)/360.0*1024), 1023) as bigint) as tile_x, "
            f"cast(least(greatest(floor((1.0 - ln(tan(radians(least(greatest(lat, -85.05112878), 85.05112878))) "
            f"+ 1.0/cos(radians(least(greatest(lat, -85.05112878), 85.05112878))))/pi())/2.0*1024), 0), 1023) as bigint) as tile_y, "
            f"count(*) as n_labels from ({_PTS_SQL}) p group by 1, 2, 3"
        ),
        "knn_radius_pairs": (
            f"select a.pid as id_a, b.pid as id_b from ({_PTS_SQL}) a, ({_PTS_SQL}) b "
            f"where a.pid < b.pid and {hav} <= 200000.0"
        ),
        "pip_rectangles": (
            "with boxes as (select cast(n_nationkey as bigint) as poly_id, "
            "(n_nationkey % 9) * 9.0 - 40.5678 as la, (n_nationkey * 29 % 300) - 150.5678 as lo from nation) "
            f"select pid, poly_id from ({_PTS_SQL}) p, boxes "
            "where p.lat > la and p.lat < la + 8.1234 and p.lon > lo and p.lon < lo + 12.1234"
        ),
        "pip_triangles": _pip_triangles_sql(),
        # axis-aligned rects: interiors intersect iff bboxes STRICTLY
        # overlap — exact for the rail path the nation rects take
        "poly_overlap_rects": (
            "with l as (select cast(c_custkey as bigint) as lid, "
            "(c_custkey % 120) * 0.55 - 33.13579 as la, "
            "(c_custkey * 37 % 320) * 0.9 - 144.24683 as lo from customer), "
            "r as (select cast(n_nationkey as bigint) as rid, "
            "(n_nationkey % 9) * 9.0 - 40.5678 as ra, "
            "(n_nationkey * 29 % 300) - 150.5678 as ro from nation) "
            "select lid, rid from l, r "
            "where la < ra + 8.1234 and ra < la + 0.9876 "
            "and lo < ro + 12.1234 and ro < lo + 1.2345"
        ),
        "poly_overlap_tris": _poly_overlap_tris_sql(),
        "snap_points_ways": _snap_oracle_sql(),
        # union-tag fold replay: snapshot enters at seq -1, latest change
        # per key wins, delete-latest keys drop
        "cdc_upsert": (
            "with s as (select c_custkey as id, c_acctbal as bal, "
            "cast(c_nationkey as bigint) as nat, cast(-1 as bigint) as _seq, 'U' as _op from customer), "
            "c as (select o_custkey as id, o_totalprice as bal, "
            "cast(o_orderkey % 25 as bigint) as nat, o_orderkey as _seq, "
            "case when o_orderkey % 10 = 0 then 'D' else 'U' end as _op from orders), "
            "u as (select * from s union all select * from c), "
            "r as (select *, row_number() over (partition by id order by _seq desc) as rn from u) "
            "select id, bal, nat from r where rn = 1 and _op <> 'D'"
        ),
        "scd2_intervals": (
            "with chg as (select o_custkey as id, o_orderkey as seq, "
            "case when o_orderkey % 10 = 0 then 'D' else 'U' end as op, "
            "o_orderstatus as status, cast(o_orderkey % 25 as bigint) as nat from orders), "
            "m as (select *, case when op is distinct from lag(op) over w "
            "or status is distinct from lag(status) over w "
            "or nat is distinct from lag(nat) over w then 1 else 0 end as chg "
            "from chg window w as (partition by id order by seq)), "
            "t as (select * from m where chg = 1), "
            "iv as (select id, status, nat, op, seq as valid_from, "
            "lead(seq) over (partition by id order by seq) as valid_to from t) "
            "select id, status, nat, valid_from, cast(valid_to as double) as valid_to, "
            "valid_to is null as is_current from iv where op = 'U'"
        ),
        "tile_topk": (
            f"with t as (select pid as osm_id, "
            f"least(cast(floor((lon+180.0)/360.0*256) as bigint), 255) as tile_x, "
            f"cast(least(greatest(floor((1.0 - ln(tan(radians(least(greatest(lat, -85.05112878), 85.05112878))) "
            f"+ 1.0/cos(radians(least(greatest(lat, -85.05112878), 85.05112878))))/pi())/2.0*256), 0), 255) as bigint) as tile_y, "
            f"pid as rank from ({_PTS_SQL}) p) "
            "select osm_id, tile_x, tile_y, tile_pos from "
            "(select osm_id, tile_x, tile_y, row_number() over "
            "(partition by tile_x, tile_y order by rank asc) - 1 as tile_pos from t) s "
            "where tile_pos < 5"
        ),
        "salted_count": (
            "select l_returnflag as k, count(*) as count from lineitem group by 1"
        ),
        "pairwise_knn": (
            "with e as (select vec_id, cast(embedding as double[]) as v, vec_id % 4 as blk "
            "from embeddings where vec_id < 120), "
            "scored as (select a.vec_id as id_a, b.vec_id as id_b, "
            "list_cosine_similarity(a.v, b.v) as c from e a join e b "
            "on a.blk = b.blk and a.vec_id <> b.vec_id), "
            "ranked as (select id_a, id_b, c, row_number() over "
            "(partition by id_a order by c desc, id_b asc) as rk from scored) "
            "select id_a, id_b, round(c, 4) as cosine, rk from ranked where rk <= 3"
        ),
        "quality_filter": (
            "select doc_id from documents where "
            "len(string_split_regex(trim(text), '\\s+')) >= 5 and "
            "cast(len(regexp_extract_all(text, '[^\\w\\s]')) as double)/length(text) <= 0.2 and "
            "cast(len(regexp_extract_all(text, '[A-Za-z]')) as double)/length(text) >= 0.5"
        ),
        "rasterize_density": (
            f"with src as (select lat, lon, least(greatest(lat, -85.05112878), 85.05112878) as lc "
            f"from ({_PTS_SQL}) p), "
            "px as (select least(cast(floor((lon+180.0)/360.0*4096) as bigint), 4095) as gx, "
            "cast(least(greatest(floor((1.0 - ln(tan(radians(lc)) + 1.0/cos(radians(lc)))/pi())/2.0*4096), 0), 4095) as bigint) as gy "
            "from src) "
            "select 6 as tile_z, gx//64 as tile_x, gy//64 as tile_y, "
            "gx%64 as px_x, gy%64 as px_y, count(*) as value from px group by 1,2,3,4,5"
        ),
        "raster_vectorize": (
            f"with src as (select lat, lon, least(greatest(lat, -85.05112878), 85.05112878) as lc "
            f"from ({_PTS_SQL}) p), "
            "px as (select least(cast(floor((lon+180.0)/360.0*4096) as bigint), 4095) as gx, "
            "cast(least(greatest(floor((1.0 - ln(tan(radians(lc)) + 1.0/cos(radians(lc)))/pi())/2.0*4096), 0), 4095) as bigint) as gy "
            "from src), "
            "cells as (select gx, gy, count(*) as value from px group by 1,2) "
            "select gx*4294967296 + gy as poly_id, value, "
            "round(degrees(atan((exp(pi() - 2*pi()*(gy+1)/4096.0) - exp(-(pi() - 2*pi()*(gy+1)/4096.0)))/2.0)), 4) as south, "
            "round(degrees(atan((exp(pi() - 2*pi()*gy/4096.0) - exp(-(pi() - 2*pi()*gy/4096.0)))/2.0)), 4) as north, "
            "round(gx/4096.0*360.0 - 180.0, 4) as west, "
            "round((gx+1)/4096.0*360.0 - 180.0, 4) as east from cells"
        ),
        "idw_surface": (
            f"with src as (select grp, lat, lon, least(greatest(lat, -85.05112878), 85.05112878) as lc "
            f"from ({_PTS_SQL}) p), "
            "px as (select cast(grp as double) as v, "
            "least(cast(floor((lon+180.0)/360.0*2048) as bigint), 2047) as gx, "
            "cast(least(greatest(floor((1.0 - ln(tan(radians(lc)) + 1.0/cos(radians(lc)))/pi())/2.0*2048), 0), 2047) as bigint) as gy "
            "from src), "
            "fan as (select v, gx + dx.x as tx, gy + dy.y as ty, "
            "cast(dx.x*dx.x + dy.y*dy.y as double) as d2 from px "
            "cross join (select unnest(generate_series(-2, 2)) as x) dx "
            "cross join (select unnest(generate_series(-2, 2)) as y) dy "
            "where dx.x*dx.x + dy.y*dy.y <= 4), "
            "bounded as (select * from fan "
            "where tx >= 0 and tx < 2048 and ty >= 0 and ty < 2048) "
            "select 5 as tile_z, tx//64 as tile_x, ty//64 as tile_y, "
            "tx%64 as px_x, ty%64 as px_y, "
            "round(sum(v*(1.0/(d2+0.5)))/sum(1.0/(d2+0.5)), 4) as value, "
            "count(*) as n_src from bounded group by 1,2,3,4,5"
        ),
        "vectorize_runs": (
            f"with src as (select lat, lon, least(greatest(lat, -85.05112878), 85.05112878) as lc "
            f"from ({_PTS_SQL}) p), "
            "px as (select least(cast(floor((lon+180.0)/360.0*4096) as bigint), 4095) as gx, "
            "cast(least(greatest(floor((1.0 - ln(tan(radians(lc)) + 1.0/cos(radians(lc)))/pi())/2.0*4096), 0), 4095) as bigint) as gy "
            "from src), "
            "cells as (select gx, gy, count(*) as value from px group by 1,2), "
            "runs as (select gx, gy, value, "
            "gx - row_number() over (partition by gy, value order by gx) as run from cells) "
            "select min(gx)*4294967296 + gy as poly_id, 6 as tile_z, value, "
            "count(*) as run_len, "
            "round(min(gx)/4096.0*360.0 - 180.0, 4) as west, "
            "round((max(gx)+1)/4096.0*360.0 - 180.0, 4) as east, "
            "round(degrees(atan((exp(pi() - 2*pi()*gy/4096.0) - exp(-(pi() - 2*pi()*gy/4096.0)))/2.0)), 4) as north, "
            "round(degrees(atan((exp(pi() - 2*pi()*(gy+1)/4096.0) - exp(-(pi() - 2*pi()*(gy+1)/4096.0)))/2.0)), 4) as south "
            "from runs group by gy, value, run"
        ),
        "dedup_exact": (
            "with corpus as (select doc_id, text from documents "
            "union all select doc_id + 1000000 as doc_id, text from documents) "
            "select doc_id from corpus where doc_id in "
            "(select min(doc_id) from corpus group by md5(text))"
        ),
        "embedding_dup_pairs": (
            "with corpus as (select vec_id, embedding from embeddings where vec_id < 150 "
            "union all select vec_id + 1000000 as vec_id, embedding from embeddings where vec_id < 15), "
            "pairs as (select a.vec_id as id_a, b.vec_id as id_b, "
            "list_cosine_similarity(cast(a.embedding as double[]), cast(b.embedding as double[])) as c "
            "from corpus a join corpus b on a.vec_id < b.vec_id) "
            "select id_a, id_b, round(c, 4) as cosine from pairs where c >= 0.99"
        ),
        "jaccard_pairs": (
            "with d as (select doc_id, text from documents where doc_id < 200), "
            f"tok as (select distinct doc_id as id, unnest({tok}) as w from d), "
            "sizes as (select id, count(*) as sz from tok group by id), "
            "inter as (select a.id as id_a, b.id as id_b, count(*) as i from tok a "
            "join tok b on a.w = b.w and a.id < b.id group by 1, 2) "
            "select id_a, id_b, round(cast(i as double)/(sa.sz + sb.sz - i), 4) as jaccard "
            "from inter join sizes sa on id_a = sa.id join sizes sb on id_b = sb.id "
            "where cast(i as double)/(sa.sz + sb.sz - i) >= 0.4"
        ),
        # component = min reachable id; DuckDB replays the alternating-star
        # result with a recursive transitive closure over the same edges
        "dedup_components": (
            "with recursive d as (select doc_id, text from documents where doc_id < 200), "
            f"tok as (select distinct doc_id as id, unnest({tok}) as w from d), "
            "sizes as (select id, count(*) as sz from tok group by id), "
            "inter as (select a.id as id_a, b.id as id_b, count(*) as i from tok a "
            "join tok b on a.w = b.w and a.id < b.id group by 1, 2), "
            "near as (select id_a, id_b from inter "
            "join sizes sa on id_a = sa.id join sizes sb on id_b = sb.id "
            "where cast(i as double)/(sa.sz + sb.sz - i) >= 0.4), "
            "chain as (select doc_id as id_a, doc_id + 1 as id_b from documents "
            "where doc_id between 300 and 362), "
            "pairs as (select * from near union select * from chain), "
            "edges as (select id_a as src, id_b as dst from pairs where id_a <> id_b "
            "union select id_b, id_a from pairs where id_a <> id_b), "
            "nodes as (select distinct src as id from edges), "
            "reach(id, r) as (select id, id from nodes union "
            "select reach.id, edges.dst from reach join edges on edges.src = reach.r) "
            "select id as doc_id, min(r) as component from reach group by id"
        ),
        # word_shingles_expr replica: distinct 3-grams, whole-doc gram below 3 words
        "decontaminate_ngrams": (
            "with d as (select doc_id, text from documents), "
            f"cw as (select doc_id, {tok} as ws from d where doc_id % 10 != 7), "
            f"bw as (select {tok} as ws from d where doc_id % 10 = 7), "
            "cg as (select doc_id, unnest(case when len(ws) >= 3 then "
            "list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)]) "
            "else [array_to_string(ws, ' ')] end) as g from cw), "
            "bg as (select distinct g from (select unnest(case when len(ws) >= 3 then "
            "list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)]) "
            "else [array_to_string(ws, ' ')] end) as g from bw)) "
            "select doc_id, cast(count(*) as bigint) as n_shared "
            "from cg join bg using (g) group by doc_id having count(*) >= 2"
        ),
        "repetition_features": (
            "with d as (select doc_id, text from documents where doc_id < 300), "
            f"w as (select doc_id, unnest({tok}) as g from d), "
            "wc as (select doc_id, g, count(*) as c from w group by 1, 2), "
            "wa as (select doc_id, cast(sum(c) as bigint) as n_words, "
            "cast(count(*) as bigint) as n_distinct_words, "
            "cast(max(c) as bigint) as top_word_count from wc group by 1), "
            f"bl as (select doc_id, {tok} as ws from d), "
            "b as (select doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) as g from bl), "
            "bc as (select doc_id, g, count(*) as c from b group by 1, 2), "
            "ba as (select doc_id, cast(sum(c) as bigint) as bt, "
            "cast(max(c) as bigint) as btop from bc group by 1) "
            "select wa.doc_id, n_words, n_distinct_words, "
            "round(n_distinct_words * 1.0 / n_words, 4) as distinct_frac, "
            "top_word_count, round(top_word_count * 1.0 / n_words, 4) as top_word_frac, "
            "coalesce(btop, cast(0 as bigint)) as top_bigram_count, "
            "round(coalesce(btop * 1.0 / bt, 0.0), 4) as top_bigram_frac "
            "from wa left join ba on wa.doc_id = ba.doc_id"
        ),
        # bias-rounded symmetric int8 quantization, exact double replay
        "quantize_embeddings": (
            "with a as (select vec_id, cast(embedding as double[]) as v from embeddings), "
            "m as (select vec_id, v, list_max(list_transform(v, x -> abs(x))) as amax from a) "
            "select vec_id, list_transform(v, x -> cast(floor(x * (case when amax > 0 then 127.0 / amax else 0.0 end) + 0.5) as int)) as qvec, "
            "round(case when amax > 0 then 127.0 / amax else 0.0 end, 6) as scale from m"
        ),
        # Knuth bucket hash + greedy cumulative-sum shard packing, seed 2
        "assign_shards": (
            "with b as (select doc_id, n_chars as n_tokens, "
            "cast(((doc_id % 2147483648 + 2) * 2654435761) % 8 as int) as bucket from documents), "
            "c as (select *, sum(n_tokens) over (partition by bucket order by doc_id "
            "rows between unbounded preceding and current row) as cum from b) "
            "select doc_id, n_tokens, bucket, "
            "cast(floor((cum - n_tokens) / 4000.0) as int) as shard_ix from c"
        ),
        # 2-word pseudo-lines; corpus-level line df via window; C4 removal
        "boilerplate_lines": (
            f"with w as (select doc_id, {tok} as ws from documents), "
            "lt as (select doc_id, [array_to_string(ws[i*2+1:i*2+2], ' ') "
            "for i in range(0, cast(ceil(len(ws)/2.0) as int))] as lines from w), "
            "l as (select doc_id, unnest(list_zip(lines, range(1, len(lines)+1))) as u from lt), "
            "e as (select doc_id, u[1] as line, u[2] as pos from l), "
            "c as (select *, count(*) over (partition by line) as df from e) "
            "select doc_id, string_agg(line, chr(10) order by pos) as text "
            "from c where df < 12 group by doc_id"
        ),
        "pii_redact": (
            "with d as (select doc_id, text || "
            "case when doc_id % 7 = 0 then ' reach admin@example.com or 192.168.1.77' else '' end || "
            "case when doc_id % 11 = 0 then ' dial +1 555 0100 now' else '' end as text "
            "from documents) "
            "select doc_id, "
            "cast(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) as bigint) as n_email, "
            "cast(len(regexp_extract_all(text, '([0-9]{1,3}\\.){3}[0-9]{1,3}')) as bigint) as n_ipv4, "
            "cast(len(regexp_extract_all(text, '\\+[0-9][0-9() -]{6,}[0-9]')) as bigint) as n_phone, "
            "regexp_replace(regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<email>', 'g'), "
            "'([0-9]{1,3}\\.){3}[0-9]{1,3}', '<ipv4>', 'g'), "
            "'\\+[0-9][0-9() -]{6,}[0-9]', '<phone>', 'g') as text "
            "from d"
        ),
        "ann_ivf_topk": (
            "with sd(ci, sid) as (values (1,3),(2,17),(3,29),(4,41),(5,53),(6,61),(7,77),(8,89)), "
            "cent as (select ci, cast(e.embedding as double[]) as cv from sd join embeddings e on e.vec_id = sd.sid), "
            "base as (select vec_id, cast(embedding as double[]) as v from embeddings), "
            "ascore as (select vec_id, ci, round(list_cosine_similarity(v, cv), 4) as s from base cross join cent), "
            "assign as (select vec_id, ci from (select vec_id, ci, row_number() over "
            "(partition by vec_id order by s desc, ci asc) as r from ascore) where r = 1), "
            "q as (select vec_id as q_id, cast(embedding as double[]) as qv from embeddings where vec_id < 8), "
            "qscore as (select q_id, ci, round(list_cosine_similarity(qv, cv), 4) as s from q cross join cent), "
            "probes as (select q_id, ci from (select q_id, ci, row_number() over "
            "(partition by q_id order by s desc, ci asc) as r from qscore) where r <= 3), "
            "cand as (select p.q_id, a.vec_id from probes p join assign a using (ci)), "
            "rer as (select c.q_id, c.vec_id, row_number() over (partition by c.q_id order by "
            "list_cosine_similarity(b.v, q.qv) desc, c.vec_id asc) as rk "
            "from cand c join base b using (vec_id) join q using (q_id)) "
            "select q_id, vec_id, rk from rer where rk <= 5"
        ),
        # Knuth hash replica of sample_hash01(sql_exact=True), seed 5
        "stratified_sample": (
            "select doc_id, lang from documents where "
            "(((doc_id % 2147483648) + 5) * 2654435761 % 4294967296) / 4294967296.0 < "
            "case lang when 'en' then 0.8 when 'de' then 0.5 when 'fr' then 0.25 else 0.0 end"
        ),
        # mix_domains replica: feasible-total rate derivation + seed-9 Knuth hash
        "mix_domains": (
            "with t(lang, tgt) as (values ('en', 0.5), ('de', 0.3), ('fr', 0.2)), "
            "c as (select lang, cast(count(*) as double) as cnt from documents "
            "where lang in ('en', 'de', 'fr') group by 1), "
            "f as (select min(cnt / tgt) as feas from c join t using (lang)), "
            "r as (select lang, least(feas * tgt / cnt, 1.0) as rate from c join t using (lang), f) "
            "select doc_id, d.lang from documents d join r on d.lang = r.lang where "
            "(((doc_id % 2147483648) + 9) * 2654435761 % 4294967296) / 4294967296.0 < rate"
        ),
        "text_quality": (
            f"select doc_id, length(text) as n_chars, "
            f"cast(len({tok}) as bigint) as n_words, "
            f"cast(len({bpe}) as bigint) as n_tokens, "
            f"round(cast(length(text) as double)/len({tok}), 4) as avg_word_len, "
            f"round(cast(len(regexp_extract_all(text, '[^\\w\\s]')) as double)/length(text), 4) as punct_ratio, "
            f"round(cast(len(regexp_extract_all(text, '[A-Za-z]')) as double)/length(text), 4) as alpha_ratio, "
            f"round(cast({en.format(w=ltok)} as double)/len({tok}), 4) as stopword_ratio "
            "from documents"
        ),
        "lang_id": (
            f"select doc_id, cast({en.format(w=ltok)} as bigint) as en_hits, "
            f"cast({de.format(w=ltok)} as bigint) as de_hits, "
            f"cast({fr.format(w=ltok)} as bigint) as fr_hits, "
            f"case when {en.format(w=ltok)} >= {de.format(w=ltok)} and {en.format(w=ltok)} >= {fr.format(w=ltok)} "
            f"and {en.format(w=ltok)} > 0 then 'en' "
            f"when {de.format(w=ltok)} >= {fr.format(w=ltok)} and {de.format(w=ltok)} > 0 then 'de' "
            f"when {fr.format(w=ltok)} > 0 then 'fr' else 'unknown' end as lang_guess "
            "from documents"
        ),
        "fingerprint": (
            "select doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) as fp "
            "from documents"
        ),
        "ann_brute_topk": (
            "with q as (select embedding as qv from embeddings where vec_id = 7) "
            "select vec_id from (select vec_id, list_cosine_similarity(cast(embedding as double[]), cast(qv as double[])) as c "
            "from embeddings, q order by c desc, vec_id asc limit 10) t"
        ),
        "events_daily": (
            "select user_id, cast(date_trunc('day', ts) as timestamp) as day, count(*) as n_events, "
            "round(sum(value), 4) as total_value from events group by 1, 2"
        ),
        "sessionize_events": (
            # same second-truncated gap predicate as the Spark side:
            # date_diff('second', a, b) counts second-boundary crossings,
            # which equals cast(b as long) - cast(a as long)
            "with lagged as (select user_id, event_id, ts, value, "
            "lag(ts) over (partition by user_id order by ts asc, event_id asc) as prev_ts "
            "from events), "
            "flagged as (select *, case when prev_ts is null "
            "or date_diff('second', prev_ts, ts) > 1800 then 1 else 0 end as is_new "
            "from lagged), "
            "sess as (select *, sum(is_new) over (partition by user_id "
            "order by ts asc, event_id asc rows unbounded preceding) as session_seq "
            "from flagged) "
            "select user_id, cast(session_seq as bigint) as session_seq, "
            "count(*) as n_events, "
            "min(ts) as session_start, max(ts) as session_end, "
            "cast(date_diff('second', min(ts), max(ts)) as bigint) as duration_s, "
            "round(sum(value), 4) as total_value "
            "from sess group by 1, 2"
        ),
        "window_topk": (
            "select o_custkey, o_orderkey, rn from (select o_custkey, o_orderkey, "
            "row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey asc) as rn "
            "from orders) t where rn <= 3"
        ),
        # ---- engine-native queries with SQL replicas ----
        "osm_label_pipeline": _label_pipeline_oracle_sql(),
        "osm_pip_admin": _staged_oracle("pip_admin"),
        "osm_dedup_labels": _staged_oracle("dedup_labels"),
        "osm_adaptive_cells": _staged_oracle("adaptive_cells"),
        "doc_dedup_first": _doc_dedup_oracle_sql(),
        "s2_cells": _s2_oracle_sql(level=12),
        "s2_compact": _s2_compact_oracle_sql(13, 10),
        "smooth_box": (
            f"with src as (select lat, lon, least(greatest(lat, -85.05112878), 85.05112878) as lc "
            f"from ({_PTS_SQL}) p), "
            "px as (select least(cast(floor((lon+180.0)/360.0*4096) as bigint), 4095) as gx, "
            "cast(least(greatest(floor((1.0 - ln(tan(radians(lc)) + 1.0/cos(radians(lc)))/pi())/2.0*4096), 0), 4095) as bigint) as gy "
            "from src), "
            "cells as (select gx, gy, cast(count(*) as double) as v from px group by 1,2), "
            "h as (select gx + d as gx, gy, sum(v) as v from cells "
            "cross join (select unnest(generate_series(-1, 1)) as d) ds "
            "where gx + d >= 0 and gx + d < 4096 group by 1, 2), "
            "v2 as (select gx, gy + d as gy, sum(v) as v from h "
            "cross join (select unnest(generate_series(-1, 1)) as d) ds "
            "where gy + d >= 0 and gy + d < 4096 group by 1, 2) "
            "select 6 as tile_z, gx//64 as tile_x, gy//64 as tile_y, "
            "gx%64 as px_x, gy%64 as px_y, round(v/9.0, 4) as value from v2"
        ),
        "contour_segments": (
            f"with src as (select lat, lon, least(greatest(lat, -85.05112878), 85.05112878) as lc "
            f"from ({_PTS_SQL}) p), "
            "px as (select least(cast(floor((lon+180.0)/360.0*2048) as bigint), 2047) as gx, "
            "cast(least(greatest(floor((1.0 - ln(tan(radians(lc)) + 1.0/cos(radians(lc)))/pi())/2.0*2048), 0), 2047) as bigint) as gy "
            "from src), "
            "cells as (select gx, gy, cast(count(*) as double) as v from px group by 1,2), "
            "fan as (select gx - dx.d as bx, gy - dy.d as by, dx.d as dx, dy.d as dy, v "
            "from cells cross join (select unnest([0,1]) as d) dx "
            "cross join (select unnest([0,1]) as d) dy), "
            "blocks as (select bx, by, "
            "coalesce(sum(case when dx=0 and dy=0 then v end), 0.0) as vtl, "
            "coalesce(sum(case when dx=1 and dy=0 then v end), 0.0) as vtr, "
            "coalesce(sum(case when dx=0 and dy=1 then v end), 0.0) as vbl, "
            "coalesce(sum(case when dx=1 and dy=1 then v end), 0.0) as vbr "
            "from fan group by 1,2), "
            "cse as (select *, (case when vtl > 0.5 then 8 else 0 end) + "
            "(case when vtr > 0.5 then 4 else 0 end) + "
            "(case when vbr > 0.5 then 2 else 0 end) + "
            "(case when vbl > 0.5 then 1 else 0 end) as c, "
            "(vtl+vtr+vbl+vbr)/4.0 > 0.5 as ctr from blocks), "
            "p2 as (select *, "
            "bx + (0.5 - vtl)/(vtr - vtl) as xt, cast(by as double) as yt, "
            "bx + 1.0 as xr, by + (0.5 - vtr)/(vbr - vtr) as yr, "
            "bx + (0.5 - vbl)/(vbr - vbl) as xb, by + 1.0 as yb, "
            "cast(bx as double) as xl, by + (0.5 - vtl)/(vbl - vtl) as yl "
            "from cse where c not in (0, 15)), "
            "seg as (select c, unnest(case "
            "when c = 1 then [{'x0': xl,'y0': yl,'x1': xb,'y1': yb}] "
            "when c = 2 then [{'x0': xb,'y0': yb,'x1': xr,'y1': yr}] "
            "when c = 3 then [{'x0': xl,'y0': yl,'x1': xr,'y1': yr}] "
            "when c = 4 then [{'x0': xt,'y0': yt,'x1': xr,'y1': yr}] "
            "when c = 5 and ctr then [{'x0': xt,'y0': yt,'x1': xl,'y1': yl}, {'x0': xb,'y0': yb,'x1': xr,'y1': yr}] "
            "when c = 5 then [{'x0': xt,'y0': yt,'x1': xr,'y1': yr}, {'x0': xl,'y0': yl,'x1': xb,'y1': yb}] "
            "when c = 6 then [{'x0': xt,'y0': yt,'x1': xb,'y1': yb}] "
            "when c = 7 then [{'x0': xl,'y0': yl,'x1': xt,'y1': yt}] "
            "when c = 8 then [{'x0': xt,'y0': yt,'x1': xl,'y1': yl}] "
            "when c = 9 then [{'x0': xt,'y0': yt,'x1': xb,'y1': yb}] "
            "when c = 10 and ctr then [{'x0': xt,'y0': yt,'x1': xr,'y1': yr}, {'x0': xl,'y0': yl,'x1': xb,'y1': yb}] "
            "when c = 10 then [{'x0': xt,'y0': yt,'x1': xl,'y1': yl}, {'x0': xb,'y0': yb,'x1': xr,'y1': yr}] "
            "when c = 11 then [{'x0': xt,'y0': yt,'x1': xr,'y1': yr}] "
            "when c = 12 then [{'x0': xl,'y0': yl,'x1': xr,'y1': yr}] "
            "when c = 13 then [{'x0': xb,'y0': yb,'x1': xr,'y1': yr}] "
            "when c = 14 then [{'x0': xl,'y0': yl,'x1': xb,'y1': yb}] "
            "end) as s from p2) "
            "select c as case_id, round(s.x0, 4) as x0, round(s.y0, 4) as y0, "
            "round(s.x1, 4) as x1, round(s.y1, 4) as y1 from seg"
        ),
        "radius_of_gyration": (
            "with fx as (select user_id, "
            "cast(user_id % 120 as double)/2.0 + value % 0.01 as lat, "
            "cast(user_id*37 % 360 as double) - 180.0 + value % 0.01 as lon from events), "
            "cent as (select *, avg(lat) over w as clat, avg(lon) over w as clon from fx "
            "window w as (partition by user_id)), "
            "d as (select user_id, "
            "2*6371008.8*asin(sqrt(pow(sin(radians(lat-clat)/2),2) + "
            "cos(radians(clat))*cos(radians(lat))*pow(sin(radians(lon-clon)/2),2))) as dist from cent) "
            "select user_id, count(*) as n_fixes, "
            "round(sqrt(avg(dist*dist)), 4) as rog_m from d group by 1"
        ),
        "stay_points": _stay_oracle_sql(rounded=True),
        "match_candidates_topk": _match_cand_oracle_sql(),
        "viterbi_match": _viterbi_oracle_sql(),
        "dbscan_clusters": _dbscan_oracle_sql(hav),
        "cluster_hulls": _hull_oracle_sql(hav),
        "sssp_6hop": sssp_oracle_sql(
            "select doc_id % 500 as src, (doc_id * 13 + j * 97 + 7) % 500 as dst, "
            "(doc_id + j * 31) % 97 + 1 as w from documents "
            "cross join (select unnest([0,1,2,3]) as j) where doc_id < 5000",
            "select doc_id as id from documents where doc_id < 5",
            6,
        ),
        # geofence: strict-box membership sets (== the even-odd PIP on axis
        # rects, proven by pip_rectangles), lag set-difference per mover
        "geofence_events": _GEOFENCE_SQL,
        # dwell: lead-pairing of the geofence event stream per (user, poly)
        "dwell_intervals": (
            "with dw as (select user_id, poly_id, ts_s, event, "
            "lead(ts_s) over (partition by user_id, poly_id "
            "order by ts_s asc, event desc) as nxt "
            f"from ({_GEOFENCE_SQL}) ev) "
            "select user_id, poly_id, ts_s as enter_s, "
            "cast(nxt as double) as exit_s, "
            "cast(nxt - ts_s as double) as dwell_s from dw where event = 'enter'"
        ),
        # spike filter: lag+lead legs with the engine's haversine, the
        # same null / zero-dt / threshold case chain as the operator
        "spike_filter": (
            "with fx as (select user_id, event_id, "
            "date_diff('second', TIMESTAMP '1970-01-01', date_trunc('second', ts)) as ts_s, "
            "cast(user_id % 120 as double)/2.0 + value % 0.01 + "
            "case when event_id % 17 = 0 then 25.0e0 else 0.0e0 end as lat, "
            "cast(user_id*37 % 360 as double) - 180.0 + value % 0.01 as lon from events), "
            "lg as (select *, lag(lat) over w as pla, lag(lon) over w as plo, "
            "lag(ts_s) over w as pts, lead(lat) over w as nla, "
            "lead(lon) over w as nlo, lead(ts_s) over w as nts from fx "
            "window w as (partition by user_id order by ts_s asc, event_id asc)), "
            "sp as (select *, "
            "case when abs(pts - ts_s) = 0 then "
            "2*6371008.8*asin(sqrt(pow(sin(radians(pla-lat)/2),2) + "
            "cos(radians(lat))*cos(radians(pla))*pow(sin(radians(plo-lon)/2),2))) > 0 "
            "else 2*6371008.8*asin(sqrt(pow(sin(radians(pla-lat)/2),2) + "
            "cos(radians(lat))*cos(radians(pla))*pow(sin(radians(plo-lon)/2),2))) "
            "/ cast(abs(pts - ts_s) as double) > 30.0 end as fin, "
            "case when abs(nts - ts_s) = 0 then "
            "2*6371008.8*asin(sqrt(pow(sin(radians(nla-lat)/2),2) + "
            "cos(radians(lat))*cos(radians(nla))*pow(sin(radians(nlo-lon)/2),2))) > 0 "
            "else 2*6371008.8*asin(sqrt(pow(sin(radians(nla-lat)/2),2) + "
            "cos(radians(lat))*cos(radians(nla))*pow(sin(radians(nlo-lon)/2),2))) "
            "/ cast(abs(nts - ts_s) as double) > 30.0 end as fout, "
            "case when abs(nts - pts) = 0 then "
            "2*6371008.8*asin(sqrt(pow(sin(radians(nla-pla)/2),2) + "
            "cos(radians(pla))*cos(radians(nla))*pow(sin(radians(nlo-plo)/2),2))) > 0 "
            "else 2*6371008.8*asin(sqrt(pow(sin(radians(nla-pla)/2),2) + "
            "cos(radians(pla))*cos(radians(nla))*pow(sin(radians(nlo-plo)/2),2))) "
            "/ cast(abs(nts - pts) as double) > 30.0 end as fbridge from lg) "
            "select user_id, event_id, ts_s, lat, lon from sp "
            "where not (pts is not null and nts is not null "
            "and fin and fout and not fbridge)"
        ),
        # resample: lead pair + generate_series grid, interpolation spelled
        # exactly like the Catalyst expression (int/int division -> double)
        "resample_track": (
            "with fx as (select user_id, event_id, "
            "date_diff('second', TIMESTAMP '1970-01-01', date_trunc('second', ts)) as ts_s, "
            "cast(user_id % 120 as double)/2.0 + value % 0.01 as lat, "
            "cast(user_id*37 % 360 as double) - 180.0 + value % 0.01 as lon from events), "
            "ld as (select *, lead(ts_s) over w as nts, lead(lat) over w as nla, "
            "lead(lon) over w as nlo from fx "
            "window w as (partition by user_id order by ts_s asc, event_id asc)), "
            "ex as (select user_id, ts_s, lat, lon, nts, nla, nlo, "
            "unnest(generate_series(cast(ceil(ts_s / 3600.0e0) as bigint) * 3600, "
            "nts - 1, 3600)) as g from ld "
            "where nts is not null and "
            "cast(ceil(ts_s / 3600.0e0) as bigint) * 3600 <= nts - 1) "
            "select user_id, g as ts_s, "
            "lat + (g - ts_s) / (nts - ts_s) * (nla - lat) as lat, "
            "lon + (g - ts_s) / (nts - ts_s) * (nlo - lon) as lon from ex"
        ),
        "od_flows": (
            "with stays as (" + _stay_oracle_sql(rounded=False) + "), "
            "legs as (select *, lead(lat) over w as nlat, lead(lon) over w as nlon, "
            "lead(t_start) over w as nstart from stays "
            "window w as (partition by user_id order by t_start asc)), "
            "keyed as (select "
            "least(cast(floor((lon+180.0)/360.0*128) as bigint), 127) as from_x, "
            "cast(least(greatest(floor((1.0 - ln(tan(radians(least(greatest(lat, -85.05112878), 85.05112878))) "
            "+ 1.0/cos(radians(least(greatest(lat, -85.05112878), 85.05112878))))/pi())/2.0*128), 0), 127) as bigint) as from_y, "
            "least(cast(floor((nlon+180.0)/360.0*128) as bigint), 127) as to_x, "
            "cast(least(greatest(floor((1.0 - ln(tan(radians(least(greatest(nlat, -85.05112878), 85.05112878))) "
            "+ 1.0/cos(radians(least(greatest(nlat, -85.05112878), 85.05112878))))/pi())/2.0*128), 0), 127) as bigint) as to_y, "
            "nstart - t_end as transit from legs where nlat is not null) "
            "select from_x, from_y, to_x, to_y, count(*) as n_trips, "
            "round(avg(transit), 4) as avg_transit_s "
            "from keyed group by 1, 2, 3, 4"
        ),
        "minhash_lsh_pairs": (
            # exact token-jaccard pairs over the same derived corpus; the
            # 32-single-row-band LSH config is full-recall on this data,
            # so the verified candidates equal this set (see the query)
            "with corpus as (select doc_id, text from documents where doc_id < 300 "
            "union all select doc_id + 1000000 as doc_id, text || ' tailword' as text "
            "from documents where doc_id < 30), "
            f"tok as (select distinct doc_id as id, unnest({tok}) as w from corpus), "
            "sizes as (select id, count(*) as sz from tok group by id), "
            "inter as (select a.id as id_a, b.id as id_b, count(*) as i from tok a "
            "join tok b on a.w = b.w and a.id < b.id group by 1, 2) "
            "select id_a, id_b, round(cast(i as double)/(sa.sz + sb.sz - i), 4) as jaccard "
            "from inter join sizes sa on id_a = sa.id join sizes sb on id_b = sb.id "
            "where cast(i as double)/(sa.sz + sb.sz - i) >= 0.6"
        ),
        "ann_lsh_topk": (
            "with q as (select vec_id as q_id, embedding as qv from embeddings where vec_id < 16), "
            "scored as (select q.q_id, e.vec_id, "
            "list_cosine_similarity(cast(e.embedding as double[]), cast(q.qv as double[])) as c "
            "from embeddings e, q) "
            "select q_id, vec_id, rk from (select q_id, vec_id, "
            "row_number() over (partition by q_id order by c desc, vec_id asc) as rk "
            "from scored) t where rk <= 5"
        ),
        "multimodal_features": (
            f"select media_id, cast(octet_length(payload) as bigint) as n_bytes "
            f"from read_parquet('{_stage_media_oracle()}')"
        ),
        "wav_decode": (
            # canonical PCM16 mono: 44-byte header, 2 bytes/sample; integer
            # math mirrors the kernel's n*1000 // rate exactly
            f"select media_id, rate as sample_rate, "
            "(octet_length(payload) - 44) // 2 as n_samples, "
            "(((octet_length(payload) - 44) // 2) * 1000) // rate as duration_ms "
            f"from read_parquet('{_stage_wav_oracle()}')"
        ),
        "png_decode": (
            # staged side-channel geometry/pixel-sum; the Spark side must
            # reproduce them from the PNG bytes (inflate + unfilter)
            f"select media_id, w as width, h as height, px_sum "
            f"from read_parquet('{_stage_png_oracle()}')"
        ),
        "jpeg_decode": (
            # staging-time decode ground truth; the Spark side must
            # reproduce it from the JPEG bytes (Huffman + IDCT + YCbCr)
            f"select media_id, w as width, h as height, px_sum "
            f"from read_parquet('{_stage_jpeg_oracle()}')"
        ),
        "mp4_decode": (
            # staged side-channel timing/geometry; the Spark side must
            # reproduce them from the ISO-BMFF bytes (box walk)
            f"select media_id, dur_ms as duration_ms, w as width, "
            f"h as height, cast(1 as bigint) as n_tracks "
            f"from read_parquet('{_stage_mp4_oracle()}')"
        ),
        "avi_frames": (
            # staging-time frame decode ground truth; the Spark side must
            # reproduce every sampled frame's pixels from the AVI bytes
            # (container walk + per-frame JPEG decode)
            f"select media_id, frame_idx, frame_ms, w as width, "
            f"h as height, px_sum "
            f"from read_parquet('{_stage_avi_oracle()[1]}')"
        ),
        "dedup_labels_pts": (
            f"with p as ({_PTS_SQL}) "
            "select a.pid from p a where not exists (select 1 from p b "
            f"where b.pid < a.pid and {hav} <= 200000.0)"
        ),
        "hex_cells": (
            f"with p as ({_PTS_SQL}) "
            f"select pid, {_hex_cell_sql_expr('lat', 'lon', 7)} as cell from p"
        ),
        "adaptive_cells_pts": _adaptive_cells_sql(base_res=0, max_rows=5, max_res=3),
        "simhash_pairs": (
            # bit-exact signature replay: h64(w) == md5_number_lower(w);
            # majority vote per bit, two's-complement fold, exact Hamming.
            # Empty tokens are filtered so the tokenization agrees with the
            # engine's str.split() on degenerate input (empty/whitespace
            # text), and token-less docs fall back to sig 0 via the left
            # join — exactly the kernel's behavior.
            "with corpus as (select doc_id, text from documents where doc_id < 300 "
            "union all select doc_id + 1000000 as doc_id, text from documents where doc_id < 30), "
            f"tok as (select doc_id as id, unnest(list_filter({tok}, w -> w <> '')) as w from corpus), "
            "bits as (select id, b, sum(case when (md5_number_lower(w) >> b) & 1 = 1 then 1 else -1 end) as votes "
            "from tok, range(64) t(b) group by id, b), "
            "sigs_u as (select id, sum(case when votes > 0 then cast(1::ubigint << b as hugeint) else 0 end) as s "
            "from bits group by id), "
            "sigs_s as (select id, cast(case when s >= 9223372036854775808 then s - 18446744073709551616 else s end as bigint) as sig from sigs_u), "
            "sigs as (select c.doc_id as id, coalesce(ss.sig, 0) as sig "
            "from corpus c left join sigs_s ss on c.doc_id = ss.id) "
            "select a.id as id_a, b.id as id_b, bit_count(xor(a.sig, b.sig)) as hamming "
            "from sigs a join sigs b on a.id < b.id "
            "where bit_count(xor(a.sig, b.sig)) <= 4"
        ),
        "legacy_split": (
            # L7 legacy split replica (osmpoi.cpp:121-199). DuckDB length/
            # substr/strpos are codepoint-based like the C++ u32string
            # math; strlen is bytes like the std::string radius math. The
            # center-out scan == argmin of |d-center|*2 + (d<center),
            # encoded into one BIGINT (key*1e6 + d) for list_min.
            r"with base as (select doc_id, substr(text, 1, 40) as s from documents), "
            r"norm as (select doc_id, s, regexp_replace(s, "
            r"'\r\n|[\n\x0B\x0C\r\x{0085}\x{2028}\x{2029}]|\^M', '%', 'g') as sn from base), "
            "pick as (select doc_id, s, sn, case when sn <> s then '%' else ' -/' end as delims, "
            "length(sn) as n, (length(sn) + 1) // 2 as center from norm), "
            "cand as (select *, case when n >= 2 then "
            "[ (abs(d - center) * 2 + case when d < center then 1 else 0 end) * 1000000 + d "
            "for d in range(1, n) if strpos(delims, substr(sn, d + 1, 1)) > 0 ] "
            "else [] end as ks from pick), "
            "best as (select *, case when len(ks) = 0 then null else list_min(ks) % 1000000 end as d from cand), "
            "split as (select doc_id, case when d is null then sn "
            "else substr(replace(sn, '%', ' '), 1, d + 1) || '%' || substr(replace(sn, '%', ' '), d + 2) "
            "end as r0 from best), "
            "c1 as (select doc_id, case when strpos(r0, ' %') > 0 then "
            "substr(r0, 1, strpos(r0, ' %') - 1) || '%' || substr(r0, strpos(r0, ' %') + 2) "
            "else r0 end as r1 from split), "
            "c2 as (select doc_id, case when strpos(r1, '% ') > 0 then "
            "substr(r1, 1, strpos(r1, '% ') - 1) || '%' || substr(r1, strpos(r1, '% ') + 2) "
            "else r1 end as res from c1) "
            "select doc_id, res as split_label, "
            "cast(case when strpos(res, '%') > 0 "
            "then (case when strlen(substr(res, 1, strpos(res, '%') - 1)) > strlen(res) // 2 "
            "then strlen(substr(res, 1, strpos(res, '%') - 1)) "
            "else strlen(res) - strlen(substr(res, 1, strpos(res, '%') - 1)) end) "
            "else (case when strlen(res) > strlen(res) // 2 then strlen(res) else 0 end) end / 2.0 "
            "as double) as radius from c2"
        ),
        # BM25: per-term contributions floored to 1e-9 fixed point in BOTH
        # engines so the score sum is an order-free int64 sum (see
        # osmgraft/operators/retrieval.py); arithmetic sub-expressions
        # mirror the Spark plan literal-for-literal
        "bm25_topk": (
            f"with base as (select doc_id, {tok} as w from documents), "
            "stats as (select count(*) as n_docs, avg(len(w)) as avgdl from base), "
            "t as (select doc_id, len(w) as dl, unnest(w) as term from base), "
            "tf as (select doc_id, dl, term, count(*) as tf from t "
            "where term in ('spark', 'join', 'window') group by doc_id, dl, term), "
            "dfreq as (select term, count(*) as df from tf group by term) "
            "select tf.doc_id, count(*) as matched_terms, "
            "sum(cast(floor(ln((n_docs - df + 0.5)/(df + 0.5) + 1.0) "
            "* ((tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))) "
            "* 1000000000.0) as bigint)) / 1000000000.0 as score "
            "from tf join dfreq using (term) cross join stats "
            "group by tf.doc_id order by score desc, tf.doc_id asc limit 100"
        ),
        # duplicated 5-gram positions -> per-doc gaps-and-islands merge
        "dup_spans": (
            f"with base as (select doc_id, {tok} as w from documents), "
            "idx as (select doc_id, w, unnest(range(1, len(w) - 5 + 2)) as i "
            "from base where len(w) >= 5), "
            "pos as (select doc_id, cast(i - 1 as int) as pos, "
            "md5(array_to_string(w[i:i+4], ' ')) as gh from idx), "
            "dup as (select gh from pos group by gh having count(distinct doc_id) >= 2), "
            "hits as (select doc_id, pos, "
            "row_number() over (partition by doc_id order by pos) as rn "
            "from pos where gh in (select gh from dup)) "
            "select doc_id, min(pos) as start_word, cast(max(pos) + 4 as int) as end_word, "
            "cast(max(pos) - min(pos) + 5 as int) as span_words "
            "from hits group by doc_id, pos - rn"
        ),
        # the five curation stages as chained CTEs: exact dedup (min id per
        # md5), quality predicate, 3-gram decontamination, Knuth-hash
        # sample, overlapping chunking — chunk-for-chunk with Spark
        "curation_pipeline": (
            "with corpus as (select doc_id, text from documents where doc_id % 10 != 7 "
            "union all select doc_id + 1000000 as doc_id, text from documents "
            "where doc_id % 10 != 7 and doc_id < 300), "
            "surv as (select doc_id, text from corpus where doc_id in "
            "(select min(doc_id) from corpus group by md5(text))), "
            "q as (select doc_id, text from surv where "
            "len(string_split_regex(trim(text), '\\s+')) >= 5 and "
            "cast(len(regexp_extract_all(text, '[^\\w\\s]')) as double)/length(text) <= 0.2 and "
            "cast(len(regexp_extract_all(text, '[A-Za-z]')) as double)/length(text) >= 0.5), "
            f"cw as (select doc_id, {tok} as ws from q), "
            f"bw as (select {tok} as ws from documents where doc_id % 10 = 7), "
            "cg as (select doc_id, unnest(case when len(ws) >= 3 then "
            "list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)]) "
            "else [array_to_string(ws, ' ')] end) as g from cw), "
            "bg as (select distinct g from (select unnest(case when len(ws) >= 3 then "
            "list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)]) "
            "else [array_to_string(ws, ' ')] end) as g from bw)), "
            "flag as (select doc_id from cg join bg using (g) "
            "group by doc_id having count(*) >= 10), "
            "kept as (select doc_id, text from q where doc_id not in "
            "(select doc_id from flag)), "
            "samp as (select doc_id, text from kept where "
            "(((doc_id % 2147483648) + 5) * 2654435761 % 4294967296) / 4294967296.0 < 0.5), "
            f"cbase as (select doc_id, {tok} as w from samp), "
            "ce as (select doc_id, len(w) as n, w, "
            "unnest(range(0, greatest(len(w) - 10, 1), 30)) as s from cbase) "
            "select doc_id, cast(s // 30 as int) as chunk_id, cast(s as int) as start_word, "
            "cast(least(40, n - s) as int) as n_words, "
            "array_to_string(w[s + 1 : s + 40], ' ') as chunk_text from ce"
        ),
        # HyperLogLog: identical md5-low-64 hash, integer registers, and
        # an order-free DECIMAL harmonic sum (osmgraft/operators/sketch.py)
        "hll_registers": hll_oracle_sql(
            f"select w || '-' || cast(doc_id % 1000 as varchar) as v "
            f"from (select doc_id, unnest({tok}) as w from documents)",
            p=10,
            registers_only=True,
        ),
        "hll_distinct_by_source": hll_by_oracle_sql(
            f"select source as g, w || '-' || cast(doc_id % 1000 as varchar) as v "
            f"from (select doc_id, source, unnest({tok}) as w from documents)",
            ["g"],
            p=9,
        ),
        "hll_distinct_tokens": hll_oracle_sql(
            f"select w || '-' || cast(doc_id % 1000 as varchar) as v "
            f"from (select doc_id, unnest({tok}) as w from documents)",
            p=10,
        ),
        # unrolled-CTE replica of the int64 fixed-point PageRank recurrence
        # (osmgraft/operators/graph.py) — value-identical, not approximate
        "pagerank_hosts": pagerank_oracle_sql(
            "select doc_id % 500 as src, (doc_id * 13 + 7) % 500 as dst "
            "from documents where doc_id < 5000",
            iterations=3,
        ),
        # chunk starts are multiples of the stride, so chunk_id = start // stride
        "chunk_docs": (
            f"with base as (select doc_id, {tok} as w from documents where doc_id < 500), "
            "e as (select doc_id, len(w) as n, w, "
            "unnest(range(0, greatest(len(w) - 10, 1), 30)) as s from base) "
            "select doc_id, cast(s // 30 as int) as chunk_id, cast(s as int) as start_word, "
            "cast(least(40, n - s) as int) as n_words, "
            "array_to_string(w[s + 1 : s + 40], ' ') as chunk_text from e"
        ),
        # URL canonicalization + registrable domain + per-domain cap,
        # reimplemented end-to-end in DuckDB string/list functions
        # (urltools.py is pure Catalyst; this is the independent replica)
        "domain_caps": (
            "with d as (select doc_id, source, n_chars from documents "
            "where doc_id < 1500), "
            f"u as (select doc_id, n_chars, {_URL_FRAG} as url from d), "
            "p1 as (select doc_id, n_chars, url, "
            "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) as s0, "
            "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://(.*)$', 1) as rest "
            "from u), "
            "p2 as (select *, case when s0 in ('http','https') then s0 end as scheme, "
            "split_part(rest, '#', 1) as nofrag from p1), "
            "p3 as (select *, regexp_extract(nofrag, '^([^/?]*)', 1) as hostport from p2), "
            "p4 as (select *, lower(split_part(hostport, ':', 1)) as host, "
            "case when contains(hostport, ':') then "
            "substr(hostport, length(split_part(hostport, ':', 1)) + 2) else '' end as port, "
            "substr(nofrag, length(hostport) + 1) as pathq from p3), "
            "p5 as (select *, split_part(pathq, '?', 1) as path, "
            "case when contains(pathq, '?') then "
            "substr(pathq, length(split_part(pathq, '?', 1)) + 2) else '' end as query "
            "from p4), "
            "p6 as (select *, list_filter(string_split(query, '&'), "
            "x -> x <> '' and not starts_with(x, 'utm_') and "
            "not starts_with(x, 'fbclid') and not starts_with(x, 'gclid')) as kp from p5), "
            "p7 as (select *, "
            "case when len(kp) > 0 then '?' || array_to_string(kp, '&') else '' end as qout, "
            "case when port <> '' and not (scheme = 'http' and port = '80') "
            "and not (scheme = 'https' and port = '443') "
            "then ':' || port else '' end as portpart from p6), "
            "p8 as (select doc_id, n_chars, scheme, host, "
            "case when scheme is not null and host <> '' then "
            "scheme || '://' || host || portpart || path || qout end as url_canon, "
            "string_split(host, '.') as labs from p7), "
            "p9 as (select doc_id, n_chars, url_canon, "
            "case when scheme is null or host = '' then null "
            "when len(labs) <= 1 then host "
            "when len(labs) >= 3 and (labs[-2] || '.' || labs[-1]) in "
            "('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au','org.au',"
            "'co.jp','ne.jp','or.jp','com.br','com.cn','com.mx','co.in','co.kr','co.za') "
            "then labs[-3] || '.' || labs[-2] || '.' || labs[-1] "
            "else labs[-2] || '.' || labs[-1] end as domain from p8) "
            "select doc_id, url_canon, domain, "
            "cast(row_number() over (partition by domain "
            "order by n_chars desc, doc_id asc) as int) as domain_rank, "
            "cast((domain is not null and row_number() over (partition by domain "
            "order by n_chars desc, doc_id asc) <= 3) as int) as kept from p9"
        ),
        # identical md5-derived u and ln(u)/w key -> the very same rows win
        "weighted_sample_docs": weighted_sample_oracle_sql(
            "select doc_id, lang, n_chars from documents",
            k=20,
            weight_col="n_chars",
            strata_cols=["lang"],
            seed=1,
        ),
        # sketch threshold + filter: the gate replays as the histogram
        # quantile SQL joined back as a scalar threshold
        "quantile_gate_p90": (
            "select d.doc_id, d.n_chars from documents d, ("
            + hist_quantiles_oracle_sql(
                "select n_chars as v from documents", [0.9], lo=0.0, hi=2048.0, nbins=256
            )
            + ") t where cast(d.n_chars as double) >= t.value_est"
        ),
        # Count-Min: identical row-salted md5 hash + power-of-two mask +
        # integer sums replay bit-exactly (osmgraft/operators/sketch.py)
        "cms_heavy_hitters": cms_oracle_sql(
            "select cast(doc_id % 37 as varchar) as v, n_chars from documents",
            "select cast(range as varchar) as v from range(40)",
            d=4,
            w=256,
            weight="n_chars",
        ),
        # fixed-bin histogram: identical clamp/floor binning + integer
        # cumulative ranks — deterministic, unlike approx_percentile
        "hist_quantiles": hist_quantiles_oracle_sql(
            "select n_chars as v from documents",
            [0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
            lo=0.0,
            hi=2048.0,
            nbins=256,
        ),
        "hist_quantiles_by_lang": hist_quantiles_by_oracle_sql(
            "select lang, n_chars as v from documents",
            ["lang"],
            [0.25, 0.5, 0.9],
            lo=0.0,
            hi=2048.0,
            nbins=256,
        ),
        # Morton key: same quantization + same spread masks; bigint bit
        # ops evaluate identically in both engines
        "zorder_keys": zorder_oracle_sql(_PTS_SQL, bits=16),
        "geohash_cells": geohash_oracle_sql(_PTS_SQL, precision=7),
        "quadkeys": quadkey_oracle_sql(_PTS_SQL, z=12),
        # per-level DIRECT aggregation (no rollup) — equality with the
        # engine's cached single-scan rollup proves the parent identity
        "tile_pyramid": " union all ".join(_tile_level_sql(z) for z in range(5, 9)),
        # per-segment haversine (identical formula), summed in pid order;
        # rounded to 3 decimals of km so float-order noise (~1e-15 rel)
        # stays far below the comparator's resolution
        "way_lengths": (
            "select way_id, round(length_m / 1000.0, 3) as length_km from ("
            + polyline_length_oracle_sql(
                "select grp as way_id, list(lat order by pid) as lats, "
                f"list(lon order by pid) as lons from ({_PTS_SQL}) p "
                "where pid < 2000 group by grp"
            )
            + ")"
        ),
        "way_midpoints": (
            "select way_id, round(plat, 4) as plat, round(plon, 4) as plon from ("
            + polyline_point_at_oracle_sql(
                "select grp as way_id, list(lat order by pid) as lats, "
                f"list(lon order by pid) as lons from ({_PTS_SQL}) p "
                "where pid < 2000 group by grp",
                frac=0.5,
            )
            + ")"
        ),
        "ring_centroids": (
            "select ring_id, round(clat, 4) as clat, round(clon, 4) as clon from ("
            + ring_centroid_oracle_sql(
                "select cast(n_nationkey as bigint) as ring_id, "
                "[la, la, la + 8.1234, la + 8.1234, la + 4.0] as lats, "
                "[lo, lo + 12.1234, lo + 12.1234, lo + 6.0, lo + 6.0] as lons from ("
                "select n_nationkey, (n_nationkey % 9) * 9.0 - 40.5678 as la, "
                "(n_nationkey * 29 % 300) - 150.5678 as lo from nation)"
            )
            + ")"
        ),
        # identical wrap-around Chamberlain-Duquette terms, summed in
        # index order, rounded to 3 decimals of km^2
        "ring_areas": (
            "select ring_id, round(area_m2 / 1e6, 3) as area_km2 from ("
            + ring_area_oracle_sql(
                "select cast(n_nationkey as bigint) as ring_id, "
                "[la, la, la + 8.1234, la + 8.1234] as lats, "
                "[lo, lo + 12.1234, lo + 12.1234, lo] as lons from ("
                "select n_nationkey, (n_nationkey % 9) * 9.0 - 40.5678 as la, "
                "(n_nationkey * 29 % 300) - 150.5678 as lo from nation)"
            )
            + ")"
        ),
        # the PIP rectangle join + one algebraic rollup; avg replays as
        # sum/count of exact doubles
        "zonal_stats_boxes": (
            "with boxes as (select cast(n_nationkey as bigint) as poly_id, "
            "n_name as poly_name, "
            "(n_nationkey % 9) * 9.0 - 40.5678 as la, "
            "(n_nationkey * 29 % 300) - 150.5678 as lo from nation), "
            f"pz as (select p.pid, cast(p.grp as double) as val, b.poly_id, b.poly_name "
            f"from ({_PTS_SQL}) p, boxes b "
            "where p.lat > la and p.lat < la + 8.1234 "
            "and p.lon > lo and p.lon < lo + 12.1234) "
            "select poly_id, poly_name, count(val) as count_val, "
            "sum(val) as sum_val, avg(val) as mean_val "
            "from pz group by poly_id, poly_name"
        ),
        # DuckDB's NATIVE ASOF JOIN — an independent implementation of the
        # same semantics, not a replica of the Spark plan
        "asof_join_events": asof_oracle_sql(
            "select event_id, user_id, ts, value from events",
            "select user_id, ts, max(value) as snap from events "
            "where event_id % 7 = 0 group by user_id, ts",
            key="user_id",
            left_cols=["event_id", "user_id", "ts", "value"],
            right_payload=["ts", "snap"],
        ),
        # plain theta join IS the semantics; the engine's bucketized
        # equi-join + broadcast long rail must reproduce it pair-for-pair
        "interval_join_events": (
            "with iv as (select event_id as iv_id, user_id, ts as start_ts, "
            "ts + to_hours(cast((event_id % 50) * 2 as int)) as end_ts "
            "from events where event_id % 97 = 0) "
            "select p.event_id, p.user_id, p.ts, i.iv_id as iv_id_iv "
            "from events p join iv i on p.user_id = i.user_id "
            "and p.ts >= i.start_ts and p.ts <= i.end_ts"
        ),
        # the Morton cover is pruning-only: conjoined with the exact box
        # predicate the result equals the plain filter — which IS the oracle
        "zorder_box_query": (
            f"select * from ({_PTS_SQL}) p where lat >= 10.0 and lat <= 35.0 "
            "and lon >= -20.0 and lon <= 40.0"
        ),
    }
