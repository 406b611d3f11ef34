"""Deterministic synthetic fixtures (seed 42) per FIXTURES.md.

The reference ships no algorithm fixtures (its test/ tree is Docker
installer smoke tests), so correctness is established against these
generated tables + pure-Python oracles (hypercane_spark.oracle).

Image payloads: the sandbox has no image codec (no PIL), so the codec is a
deterministic stand-in with the same *contract* as a real one:

- fmt='png'  → lossless: decode(encode(x)) == x exactly
- fmt='jpeg' → lossy: pixel values quantized to multiples of 4 →
  RMSE ≈ 1.15 → PSNR ≈ 47 dB (> the 40 dB fidelity bar), deterministic

``decode_image`` tries a real codec first (PIL, if ever present) and falls
back to the stand-in — the Spark-side plumbing (binary column, schema,
Arrow batching) is identical either way.
"""

from __future__ import annotations

import math
import random
import struct
from datetime import datetime, timedelta, timezone

import numpy as np

SEED = 42
MAGIC_RAW = b"HCRW"  # lossless stand-in container
MAGIC_LOSSY = b"HCLS"  # quantized stand-in container
MAGIC_VIDEO = b"HCVF"  # uncompressed stand-in video container

HOSTS_N = 40
URIRS_N = 400
ZIPF_A = 1.2

_WORDS = (
    "archive web memento crawl story news event page image caption time "
    "history record capture snapshot collection seed frontier host link "
    "the a of to in and is for on with report summary topic"
).split()
_NONEN = "le la de un une het der die das el los".split()


# ------------------------------------------------------------------ codec

def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: uint8 array (h, w, 3) → container bytes."""
    h, w, _ = pixels.shape
    if fmt == "png":
        payload, magic = pixels.tobytes(), MAGIC_RAW
    elif fmt == "jpeg":
        payload, magic = ((pixels >> 2) << 2).astype(np.uint8).tobytes(), MAGIC_LOSSY
    else:
        raise ValueError(f"unknown fmt {fmt}")
    return magic + struct.pack("<II", w, h) + payload


def decode_image(data: bytes) -> np.ndarray:
    """container bytes → uint8 (h, w, 3). Tries a real codec first."""
    magic = data[:4]
    if magic in (MAGIC_RAW, MAGIC_LOSSY):
        w, h = struct.unpack("<II", data[4:12])
        return np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 3)
    try:  # real codec path (PIL not installed in this sandbox)
        import io

        from PIL import Image  # type: ignore

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "real image codec unavailable; bytes are not in the stand-in container"
        ) from e


def encode_video(frames: np.ndarray, fps: int = 10) -> bytes:
    """frames: uint8 array (n, h, w, 3) → container bytes.

    Uncompressed deterministic stand-in container (the sandbox has no
    video codec): magic + (n, w, h, fps) header + raw frame planes. The
    fixed frame stride makes every frame RANDOM-ACCESSIBLE by offset —
    the property frame_sample exploits, mirroring keyframe seeks in a
    real container."""
    n, h, w, _ = frames.shape
    return MAGIC_VIDEO + struct.pack("<IIII", n, w, h, fps) + frames.tobytes()


def iter_video_frames(data: bytes, every_n: int = 1):
    """Yield (frame_idx, uint8 (h, w, 3)) for frames 0, every_n, 2·every_n…

    Stand-in container: each frame is SLICED by offset from the payload —
    sampling k of n frames reads k·frame_bytes, not the whole stream.
    Unknown magic tries a real codec (pyav, absent in this sandbox) so
    genuine videos plug into the same call."""
    magic = data[:4]
    if magic == MAGIC_VIDEO:
        n, w, h, _fps = struct.unpack("<IIII", data[4:20])
        stride = w * h * 3
        for idx in range(0, n, max(1, every_n)):
            off = 20 + idx * stride
            yield idx, np.frombuffer(
                data[off: off + stride], dtype=np.uint8
            ).reshape(h, w, 3)
        return
    try:  # real codec path (pyav not installed in this sandbox)
        import av  # type: ignore
        import io

        with av.open(io.BytesIO(data)) as container:  # pragma: no cover
            for idx, frame in enumerate(container.decode(video=0)):
                if idx % max(1, every_n) == 0:
                    yield idx, frame.to_ndarray(format="rgb24")
    except ImportError as e:
        raise NotImplementedError(
            "real video codec unavailable; bytes are not in the stand-in "
            "container (plug pyav/ffmpeg here)"
        ) from e


def gen_videos(
    n: int,
    seed: int = SEED,
    frames_range: tuple[int, int] = (12, 36),
    sizes: tuple[int, ...] = (16, 24),
) -> list[dict]:
    """Deterministic video fixture rows:
    (video_id, bytes, n_frames, w, h, fps, caption)."""
    rng = random.Random(seed + 7)
    rows = []
    for i in range(n):
        w = rng.choice(list(sizes))
        h = rng.choice(list(sizes))
        nf = rng.randint(*frames_range)
        px_rng = np.random.RandomState(seed + 1000 + i)
        frames = px_rng.randint(
            0, 256, size=(nf, h, w, 3), dtype=np.int64
        ).astype(np.uint8)
        rows.append(
            {
                "video_id": f"vid-{i:08d}",
                "bytes": encode_video(frames, fps=10),
                "n_frames": nf,
                "w": w,
                "h": h,
                "fps": 10,
                "caption": _caption(rng, i),
            }
        )
    return rows


def average_phash(pixels: np.ndarray) -> int:
    """64-bit average hash over an 8x8 gray downsample (signed int64)."""
    gray = pixels.mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.array(
        [
            gray[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
            for i in range(8)
            for j in range(8)
        ]
    )
    bits = cells > cells.mean()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(((a.astype(float) - b.astype(float)) ** 2).mean())
    return float("inf") if mse == 0 else 20 * math.log10(255.0 / math.sqrt(mse))


# ------------------------------------------------------------- generators

_ZIPF_CDFS: dict[int, list[float]] = {}


def _zipf_host(rng: random.Random, n_hosts: int = HOSTS_N) -> int:
    # Zipf(1.2) over n_hosts hosts via inverse-CDF on precomputed weights;
    # bisect keeps draws O(log n) for large host universes
    cdf = _ZIPF_CDFS.get(n_hosts)
    if cdf is None:
        w = [1.0 / (i + 1) ** ZIPF_A for i in range(n_hosts)]
        tot = sum(w)
        acc, cdf = 0.0, []
        for x in w:
            acc += x / tot
            cdf.append(acc)
        _ZIPF_CDFS[n_hosts] = cdf
    import bisect

    return min(bisect.bisect_left(cdf, rng.random()), n_hosts - 1)


def gen_urirs(n: int = URIRS_N, seed: int = SEED) -> list[str]:
    rng = random.Random(seed)
    out = []
    for i in range(n):
        h = _zipf_host(rng)
        depth = rng.randint(0, 4)
        path = "/".join(f"p{rng.randint(0, 9)}" for _ in range(depth))
        q = f"?id={i}" if rng.random() < 0.2 else ""
        out.append(f"http://host{h:02d}.example/{path}{q}".replace("//?", "/?"))
    return out


def _mdt(rng: random.Random) -> datetime:
    start = datetime(2015, 1, 1, tzinfo=timezone.utc)
    return start + timedelta(seconds=rng.randint(0, 7 * 365 * 86400))


def urim_for(urir: str, dt: datetime) -> str:
    return f"https://archive.example/web/{dt.strftime('%Y%m%d%H%M%S')}/{urir}"


def gen_timemaps(n_urits: int = 400, seed: int = SEED) -> list[dict]:
    """rows: {urit, urir, mementos: [{datetime, urim}, ...]} — array order =
    TimeMap document order (ascending datetime), the parity contract."""
    rng = random.Random(seed + 1)
    urirs = gen_urirs(n_urits, seed)
    rows = []
    for urir in urirs:
        k = rng.randint(1, 50)
        dts = sorted(_mdt(rng) for _ in range(k))
        rows.append(
            {
                "urit": f"https://archive.example/timemap/link/{urir}",
                "urir": urir,
                "mementos": [
                    {"datetime": dt.replace(tzinfo=None), "urim": urim_for(urir, dt)}
                    for dt in dts
                ],
            }
        )
    return rows


def _caption(rng: random.Random, i: int) -> str:
    n = rng.randint(5, 40)
    words = [rng.choice(_WORDS) for _ in range(n)]
    if rng.random() < 0.08:
        words = [rng.choice(_NONEN) for _ in range(n)]
    return " ".join(words) + f" c{i}"


def gen_images(
    n: int, seed: int = SEED, sizes: tuple[int, ...] = (32, 64, 128)
) -> list[dict]:
    """input_hint table: (image_id, bytes, w, h, fmt, caption, phash).

    ``sizes`` sets the candidate edge lengths; benches use larger edges
    (web-realistic) so per-row decode/verify cost reflects real payloads."""
    rng = random.Random(seed + 2)
    rows = []
    for i in range(n):
        w = rng.choice(list(sizes))
        h = rng.choice(list(sizes))
        fmt = rng.choice(["png", "jpeg"])
        px_rng = np.random.RandomState(seed + i)
        pixels = px_rng.randint(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
        data = encode_image(pixels, fmt)
        base = _caption(rng, i)
        # ~10% near-verbatim duplicates of the previous caption
        if rows and rng.random() < 0.10:
            base = rows[-1]["caption"].rsplit(" ", 1)[0] + f" c{i}"
        rows.append(
            {
                "image_id": f"img-{i:08d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": base,
                "phash": average_phash(decode_image(data)),
            }
        )
    return rows


def gen_mementos(n_urits: int = 400, seed: int = SEED) -> list[dict]:
    """Flat memento catalog (FIXTURES.md §3) derived from timemaps."""
    from hypercane_spark.oracle.simhash import py_simhash64, py_tf_simhash64

    rng = random.Random(seed + 3)
    tms = gen_timemaps(n_urits, seed)
    rows = []
    seq = 0
    for tm in tms:
        for m in tm["mementos"]:
            cap_rng = random.Random(seed + seq * 7)
            text = _caption(cap_rng, seq)
            host = tm["urir"].split("//", 1)[1].split("/", 1)[0]
            rows.append(
                {
                    "urim": m["urim"],
                    "urit": tm["urit"],
                    "urir": tm["urir"],
                    "host": host,
                    "memento_datetime": m["datetime"],
                    "pubdate": (
                        m["datetime"] - timedelta(days=rng.randint(0, 30))
                        if rng.random() > 0.3
                        else None
                    ),
                    "language": "en" if rng.random() < 0.85 else "fr",
                    "raw_simhash": py_simhash64(text),
                    "tf_simhash": py_tf_simhash64(text),
                    "bpfree_text": text,
                    "bpfree_len": len(text),
                    "image_count": rng.randint(0, 12),
                    "card_title": rng.random() < 0.7,
                    "card_desc": rng.random() < 0.5,
                    "card_image": rng.random() < 0.4,
                    "damage": round(rng.random(), 4),
                    "offtopic_score": round(rng.random(), 4),
                    "cluster": rng.choice(["a", "b", "c", "a~~~x", "b~~~y"]),
                    "score_seed": round(rng.random() * 10, 4),
                    "seq": seq,
                }
            )
            seq += 1
    return rows


def gen_robots(seed: int = SEED) -> list[dict]:
    rng = random.Random(seed + 4)
    rows = []
    for h in range(HOSTS_N):
        r = rng.random()
        if r < 0.05:
            dis = ["/"]  # disallow all
        elif r < 0.15:
            dis = [f"/p{rng.randint(0,9)}"]
        else:
            dis = []
        rows.append(
            {
                "host": f"host{h:02d}.example",
                "disallow": dis,
                "crawl_delay": float(rng.choice([0.0, 0.0, 1.0, 2.0])),
            }
        )
    return rows


def gen_politeness(budget: int = 4) -> list[dict]:
    return [
        {"host": f"host{h:02d}.example", "budget_per_round": budget}
        for h in range(HOSTS_N)
    ]


def gen_link_graph_df(
    spark,
    n_urls: int,
    max_outlinks: int = 3,
    n_images: int = 1000,
    n_hosts: int = HOSTS_N,
    seed: int = SEED,
):
    """Distributed synthetic memento web — the multi-million-URL analog of
    gen_link_graph (driver-side Python row generation stops scaling around
    ~1M rows). Every column is a pure hash function of the row id, so the
    table generates as `spark.range(n)` + column expressions with no
    driver data at all: same SCHEMA and distribution SHAPE (Zipf(1.2)
    hosts via an inverse-CDF literal, uniform datetimes over 2015-2022,
    priority = epoch/1e9 − damage, outlinks uniform over the id space).
    NOT row-identical to gen_link_graph — the crawl-order oracle tests
    keep the Python generator; this one feeds throughput benches."""
    from pyspark.sql import functions as F

    # Zipf(1.2) via a pre-sampled 4096-entry quantile table: host_idx is
    # ONE element_at into a literal array (O(1)) instead of an inverse-CDF
    # scan of n_hosts elements — CollapseProject re-inlines these
    # expressions ~10× per row (urim, urir, host, and once per outlink
    # target), so per-eval cost matters enormously at 10^7 rows.
    w = [1.0 / (i + 1) ** ZIPF_A for i in range(n_hosts)]
    tot = sum(w)
    acc, cum = 0.0, []
    for x in w:
        acc += x / tot
        cum.append(acc)
    import bisect

    qtab = [
        bisect.bisect_right(cum, (q + 0.5) / 4096)
        for q in range(4096)
    ]
    qtab = [min(x, n_hosts - 1) for x in qtab]
    qlit = F.array(*[F.lit(x) for x in qtab])
    epoch2015 = 1420070400  # 2015-01-01 UTC
    span = 7 * 365 * 86400

    def h(idc, salt: str):
        return F.abs(
            F.xxhash64(F.concat(F.lit(f"{salt}:{seed}:"), idc.cast("string")))
        )

    def u01(idc, salt: str):
        return (h(idc, salt) % F.lit(1_000_000_007)) / F.lit(1_000_000_007.0)

    def host_idx(idc):
        return F.element_at(qlit, (h(idc, "host") % 4096 + 1).cast("int"))

    def dt_of(idc):
        return F.timestamp_seconds(F.lit(epoch2015) + (h(idc, "dt") % span))

    def urir_of(idc):
        return F.format_string(
            "http://host%02d.example/page/%s",
            host_idx(idc),
            idc.cast("string"),
        )

    def urim_of(idc):
        return F.concat(
            F.lit("https://archive.example/web/"),
            F.date_format(dt_of(idc), "yyyyMMddHHmmss"),
            F.lit("/"),
            urir_of(idc),
        )

    i = F.col("id")
    damage = F.round(u01(i, "dmg"), 4)
    n_out = (h(i, "nout") % (max_outlinks + 1)).cast("int")
    targets = F.when(
        n_out >= 1,
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(1), n_out),
                        lambda k: h(
                            F.concat(i.cast("string"), F.lit("#"), k.cast("string")),
                            "out",
                        )
                        % n_urls,
                    ),
                    lambda j: j != i,
                )
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    return spark.range(n_urls).select(
        urim_of(i).alias("urim"),
        urir_of(i).alias("urir"),
        F.format_string("host%02d.example", host_idx(i)).alias("host"),
        dt_of(i).alias("memento_datetime"),
        damage.alias("damage"),
        F.round(
            (F.unix_timestamp(dt_of(i)) / F.lit(1e9)) - damage, 9
        ).alias("priority"),
        F.format_string(
            "img-%08d", (i * F.lit(2654435761)) % F.lit(n_images)
        ).alias("image_id"),
        F.transform(targets, lambda j: urim_of(j)).alias("outlinks"),
    )


def gen_link_graph(
    n_urls: int = 600,
    seed: int = SEED,
    max_outlinks: int = 5,
    n_images: int = 200,
    n_hosts: int = HOSTS_N,
) -> list[dict]:
    """Deterministic synthetic memento web for crawl tests.

    One row per URI-M: (urim, urir, host, memento_datetime, damage,
    priority, image_id, outlinks array<urim>). Hosts are Zipf-skewed (one
    hot host) to force politeness/salting to matter. priority =
    epoch/1e9 - damage (the north_star's recency+damage ordering), also
    precomputed per row so engine and oracle share one number.
    """
    rng = random.Random(seed + 7)
    urls = []
    for i in range(n_urls):
        h = _zipf_host(rng, n_hosts)
        urir = f"http://host{h:02d}.example/page/{i}"
        dt = _mdt(rng)
        urls.append((urim_for(urir, dt), urir, f"host{h:02d}.example", dt))
    rows = []
    for i, (urim, urir, host, dt) in enumerate(urls):
        n_out = rng.randint(0, max_outlinks)
        outlinks = []
        for _ in range(n_out):
            j = rng.randrange(n_urls)
            if j != i:
                outlinks.append(urls[j][0])
        damage = round(rng.random(), 4)
        rows.append(
            {
                "urim": urim,
                "urir": urir,
                "host": host,
                "memento_datetime": dt.replace(tzinfo=None),
                "damage": damage,
                "priority": round(dt.timestamp() / 1e9 - damage, 9),
                "image_id": f"img-{(i * 2654435761) % n_images:08d}",
                "outlinks": sorted(set(outlinks)),
            }
        )
    return rows
