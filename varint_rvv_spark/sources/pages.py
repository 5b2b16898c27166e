"""Deterministic Common-Crawl-style pages table (FIXTURES.md §F1).

Shape fixed by BASELINE.json input_hint:
  url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Every field is a pure vectorized function of the row id (splitmix64
bit mixing), so generation is partition-independent and reproducible —
the Spark analogue of the reference's fixed-seed generators
(/root/reference/benchmark/benchmark.cc:33-77 seed 12345,
example/example.c:11 xorshift).  Host-level skew is intentional
(Zipf-ish hosts, lognormal html sizes) to exercise salting + AQE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.blob import VarlenArray

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

PAGES_ARROW = pa.schema([
    ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
])

LANGS = np.array(["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "other"])
LANG_P = np.array([0.55, 0.10, 0.08, 0.07, 0.06, 0.05, 0.04, 0.03, 0.02])
BASE_TS_US = 1704067200_000_000  # 2024-01-01T00:00:00Z
N_HOSTS = 1000
VOCAB_BITS = 12  # 4096 tokens, 8 bytes each ("tokXXXX ")
TOKEN_W = 8

_VOCAB = np.array([f"tok{i:04x} ".encode() for i in range(1 << VOCAB_BITS)],
                  dtype=f"S{TOKEN_W}")

_SM_G = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    z = (x.astype(np.uint64) + _SM_G)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    mixer = (seed * 0x5851F42D4C957F2D + stream) & 0xFFFFFFFFFFFFFFFF
    bits = splitmix64(ids ^ np.uint64(mixer))
    return (bits >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def gen_pages_numpy(ids: np.ndarray, seed: int = 42) -> dict:
    """ids → columns dict (url/str-list handled as VarlenArray or arrays)."""
    ids = np.ascontiguousarray(ids, dtype=np.uint64)
    n = ids.shape[0]
    # hosts: Zipf-ish via Pareto inverse CDF, clipped to N_HOSTS
    u_host = _uniform(ids, 1, seed)
    host = np.minimum(u_host ** -1.8, float(N_HOSTS)).astype(np.int64) - 1
    host_bits = splitmix64(host.astype(np.uint64) ^ np.uint64(seed))
    # warc_ts: base + per-host day offset + monotone-ish id step + jitter
    # with mixed magnitudes so deltas sweep every varint byte-width
    host_off = (host_bits % np.uint64(30 * 86400_000_000)).astype(np.int64)
    jit_u = _uniform(ids, 2, seed)
    jit_mag = (10.0 ** (jit_u * 9.0)).astype(np.int64)  # 1 µs .. ~16 min
    ts = BASE_TS_US + host_off + (ids.astype(np.int64) * 1000) + jit_mag
    # lang: host-dominant (runs when host-clustered) + 10% page noise
    lang_cdf = np.cumsum(LANG_P)
    host_lang = np.searchsorted(lang_cdf, _uniform(host.astype(np.uint64),
                                                   3, seed))
    page_lang = np.searchsorted(lang_cdf, _uniform(ids, 4, seed))
    noisy = _uniform(ids, 5, seed) < 0.10
    lang_idx = np.where(noisy, page_lang, host_lang).clip(0, len(LANGS) - 1)
    # html: token soup, lognormal length clipped [256, 262144] bytes
    u1 = np.clip(_uniform(ids, 6, seed), 1e-12, 1 - 1e-12)
    u2 = _uniform(ids, 7, seed)
    normal = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    html_len = np.clip(np.exp(8.5 + 1.2 * normal), 256, 262144).astype(np.int64)
    n_tok = html_len // TOKEN_W
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total_tok = int(offsets[-1])
    row_id = np.repeat(ids, n_tok)
    pos = np.arange(total_tok, dtype=np.uint64) - offsets[
        np.repeat(np.arange(n), n_tok)].astype(np.uint64)
    tok_ids = (splitmix64(row_id * np.uint64(0x100000001B3) + pos)
               % np.uint64(1 << VOCAB_BITS)).astype(np.int64)
    flat = _VOCAB[tok_ids]  # fixed-width bytes, vectorized gather
    html_data = flat.view(np.uint8).reshape(-1)
    html = VarlenArray(offsets=offsets * TOKEN_W, data=html_data)
    # text: deterministic extraction = every 4th token of html
    keep = (pos % np.uint64(4)) == 0
    text_flat = flat[keep]
    text_counts = np.add.reduceat(
        keep.astype(np.int64), offsets[:-1]) if total_tok else np.zeros(
        n, dtype=np.int64)
    text_counts[n_tok == 0] = 0
    t_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(text_counts, out=t_off[1:])
    text = VarlenArray(offsets=t_off * TOKEN_W,
                       data=text_flat.view(np.uint8).reshape(-1))
    # urls: https://host{h}.example.com/p{a}/p{b}
    a = splitmix64(ids * np.uint64(3) + np.uint64(1)) % np.uint64(99999)
    hs = host.astype("U4")
    url_list = np.char.add(
        np.char.add(np.char.add("https://host", hs), ".example.com/p"),
        np.char.add(np.char.add(a.astype("U5"), "/d"), ids.astype("U12")))
    return {
        "url": url_list, "warc_ts": ts, "html": html, "text": text,
        "lang": LANGS[lang_idx], "host": host,
    }


def _pages_arrow_batch(ids: np.ndarray, seed: int) -> pa.RecordBatch:
    g = gen_pages_numpy(ids, seed)
    html = g["html"]
    text = g["text"]
    return pa.RecordBatch.from_arrays([
        pa.array(g["url"], type=pa.string()),
        pa.array(g["warc_ts"], type=pa.timestamp("us")),
        pa.Array.from_buffers(pa.large_binary(), len(html),
                              [None, pa.py_buffer(html.offsets),
                               pa.py_buffer(html.data)]).cast(pa.binary()),
        pa.Array.from_buffers(pa.large_binary(), len(text),
                              [None, pa.py_buffer(text.offsets),
                               pa.py_buffer(text.data)])
        .cast(pa.binary()).cast(pa.string()),
        pa.array(g["lang"], type=pa.string()),
    ], schema=PAGES_ARROW)


def pages_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Synthesize the pages table as a DataFrame (no external data)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batch_iter):
        for batch in batch_iter:
            ids = batch.column(0).to_numpy().astype(np.uint64)
            # cap generated batch to ~16k rows to bound memory
            for lo in range(0, ids.shape[0], 16384):
                yield _pages_arrow_batch(ids[lo:lo + 16384], seed)

    return (spark.range(0, n_rows, numPartitions=partitions)
            .mapInArrow(gen, PAGES_SCHEMA))
