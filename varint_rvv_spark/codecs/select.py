"""Per-chunk codec auto-selection (SURVEY.md §2.4 last row).

The macro version of the reference's all-1-byte fast-path dispatch
(/root/reference/lib/src/varint_decode_vecshift.c:23-32): look at the
data, pick the cheapest strategy.  Selection is driven by sampled
cardinality / run-length / entropy stats plus *exact* size formulas for
the varint family (cheap: one vectorized byte-length pass), with
trial-encoding of a sample as the tie-break.

Size guarantee: for integer columns the final chunk is never larger
than plain VARINT (the reference encoder's output, canonical per
/root/reference/lib/src/varint_encode.c:4-58) — if a sampled winner
loses on the full data we fall back, so "compressed size ≤ reference
encoder output" holds per chunk by construction.
"""

from __future__ import annotations

import numpy as np

from . import blob as B
from . import numeric as N
from .varint import varint_byte_lengths, zigzag_encode

SAMPLE = 4096
SAMPLE_VARLEN = 384  # varlen rows carry whole documents — keep trials cheap
PREFIX = 2048


def _sample_idx(n: int, k: int = SAMPLE) -> np.ndarray:
    if n <= k:
        return np.arange(n, dtype=np.int64)
    step = n // k
    return np.arange(0, step * k, step, dtype=np.int64)


SAMPLE_VARLEN_BYTES = 2 << 20  # cap trial/stat sample to ~2 MB of data


def _sample_k(dtype_code: int, values=None) -> int:
    if not B.is_varlen(dtype_code):
        return SAMPLE
    k = SAMPLE_VARLEN
    if values is not None and len(values):
        avg = max(values.nbytes / len(values), 1.0)
        k = int(min(SAMPLE_VARLEN, max(64, SAMPLE_VARLEN_BYTES / avg)))
    return k


def _take(values, dtype_code: int, idx: np.ndarray):
    if B.is_varlen(dtype_code):
        return values.take(idx)
    return np.ascontiguousarray(values)[idx]


def column_stats(values, dtype_code: int) -> dict:
    """Sampled stats: cardinality ratio, mean run length, byte entropy."""
    from .composite import run_bounds

    n = len(values)
    stats = {"n": n}
    if B.is_nested(dtype_code):
        # nested columns: the child/length streams are auto-selected
        # inside the LIST/STRUCT/MAP codecs; only shape stats here
        if n and hasattr(values, "lengths"):
            stats["avg_len"] = float(values.lengths().mean())
            stats["child_n"] = int(values.offsets[-1])
        return stats
    if n == 0:
        return stats
    idx = _sample_idx(n, _sample_k(dtype_code, values))
    sample = _take(values, dtype_code, idx)
    stats["_sample"] = sample  # reused by select_codec (stripped from
    # stats_json by the kernels' int/float filter)
    if B.is_varlen(dtype_code):
        from .composite import varlen_to_pa

        arr = varlen_to_pa(sample)
        card = len(arr.unique())
        data = sample.data[: 1 << 16]
        stats["avg_len"] = float(sample.lengths().mean())
    else:
        card = int(np.unique(sample).shape[0])
        data = sample.view(np.uint8)[: 1 << 16]
    # contiguous-prefix runs (sampling with stride destroys runs, so
    # measure runs on a contiguous prefix instead)
    prefix = values if n <= PREFIX else _take(
        values, dtype_code, np.arange(PREFIX, dtype=np.int64))
    nruns = int(run_bounds(prefix, dtype_code).sum()) + 1
    stats["card_sample"] = card
    stats["card_ratio"] = card / len(sample)
    stats["mean_run"] = len(prefix) / max(nruns, 1)
    if data.size:
        counts = np.bincount(data, minlength=256)
        p = counts[counts > 0] / data.size
        stats["byte_entropy"] = float(-(p * np.log2(p)).sum())
    else:
        stats["byte_entropy"] = 0.0
    return stats


def _exact_int_sizes(values, dtype_code: int,
                     stats: dict | None = None) -> dict:
    """Exact encoded sizes for the varint family — no trial encode.

    When a stats dict is passed, the plain-varint byte-length array is
    stashed as ``_varint_lens`` so the footer's per-chunk length
    histogram (encode.py) reuses it instead of re-running the
    searchsorted pass over the full column."""
    u = N._as_u64(values, dtype_code)
    n = u.shape[0]
    lens = varint_byte_lengths(u)
    if stats is not None:
        stats["_varint_lens"] = lens
    sizes = {B.VARINT: int(lens.sum())}
    d = np.empty_like(u)
    if n:
        d[0] = u[0]
        np.subtract(u[1:], u[:-1], out=d[1:])
        zz = zigzag_encode(d.view(np.int64))
        sizes[B.DELTA_VARINT] = int(varint_byte_lengths(zz).sum())
        rng = int(u.max() - u.min())  # modular, but fine as width proxy
        width = rng.bit_length()
        sizes[B.BITPACK] = 9 + (n * width + 7) // 8
    else:
        sizes[B.DELTA_VARINT] = 0
        sizes[B.BITPACK] = 9
    return sizes


def _trial_size(codec_id: int, sample, dtype_code: int, scale: float) -> float:
    try:
        return len(B.encode_blob(codec_id, dtype_code, sample)) * scale
    except Exception:
        return float("inf")


def select_codec(values, dtype_code: int, stats: dict | None = None) -> int:
    """Pick a codec id for one column chunk."""
    if B.is_nested(dtype_code):
        # container codecs; child streams auto-select inside
        return {B.DT_LIST: B.LIST, B.DT_STRUCT: B.STRUCT,
                B.DT_MAP: B.MAP}[dtype_code]
    n = len(values)
    if n == 0:
        return B.RAW
    stats = stats or column_stats(values, dtype_code)
    sample = stats.get("_sample")
    if sample is None:
        idx = _sample_idx(n, _sample_k(dtype_code, values))
        sample = _take(values, dtype_code, idx)
    scale = n / max(len(sample), 1)
    cand: dict[int, float] = {}
    if B.is_varlen(dtype_code):
        raw_bytes = values.nbytes
        cand[B.RAW] = float(raw_bytes)
        cand[B.ZSTD] = _trial_size(B.ZSTD, sample, dtype_code, scale)
        if stats["card_ratio"] < 0.6:
            cand[B.DICT] = _trial_size(B.DICT, sample, dtype_code, scale)
        if stats["mean_run"] >= 2.0:
            # RLE must see contiguous data — trial on the prefix
            prefix = _take(values, dtype_code,
                           np.arange(min(n, PREFIX), dtype=np.int64))
            cand[B.RLE] = _trial_size(B.RLE, prefix, dtype_code,
                                      n / len(prefix))
        if (_registered(B.FSST) and stats.get("avg_len", 1e9) <= 512):
            # FSST pays off on short strings (urls, tags); long documents
            # go to zstd without burning a trial pass
            cand[B.FSST] = _trial_size(B.FSST, sample, dtype_code, scale)
    elif B.NUMERIC_NP[dtype_code].kind == "f":
        cand[B.RAW] = float(np.ascontiguousarray(values).nbytes)
        cand[B.ZSTD] = _trial_size(B.ZSTD, sample, dtype_code, scale)
        cand[B.SPLIT] = _trial_size(B.SPLIT, sample, dtype_code, scale)
        if stats["card_ratio"] < 0.2:
            cand[B.DICT] = _trial_size(B.DICT, sample, dtype_code, scale)
        if dtype_code == B.DT_F64 and _registered(B.SCALED):
            from .scaled import scaled_exponent

            # eligibility is checked on the FULL chunk (a few vector
            # passes), so a chosen SCALED can never fail mid-encode;
            # the size trial stays sample-based like the others
            if scaled_exponent(values) is not None:
                cand[B.SCALED] = _trial_size(B.SCALED, sample,
                                             dtype_code, scale)
    else:
        exact = _exact_int_sizes(values, dtype_code, stats)
        stats["_exact_int_sizes"] = exact  # reused by encode_auto
        cand.update({k: float(v) for k, v in exact.items()})
        cand[B.RAW] = float(np.ascontiguousarray(values).nbytes)
        if stats["card_ratio"] < 0.1:
            cand[B.DICT] = _trial_size(B.DICT, sample, dtype_code, scale)
        if stats["mean_run"] >= 2.0:
            prefix = _take(values, dtype_code,
                           np.arange(min(n, PREFIX), dtype=np.int64))
            cand[B.RLE] = _trial_size(B.RLE, prefix, dtype_code,
                                      n / len(prefix))
    return min(cand, key=cand.get)


def _registered(codec_id: int) -> bool:
    return codec_id in B._ENCODERS


def encode_auto(values, dtype_code: int, stats: dict | None = None):
    """Encode with the auto-selected codec.

    Returns (blob, codec_id, stats).  Integer columns are guaranteed
    ≤ plain-varint size (the reference encoder's output).
    """
    stats = stats or column_stats(values, dtype_code)
    codec_id = select_codec(values, dtype_code, stats)
    out = B.encode_blob(codec_id, dtype_code, values)
    if (dtype_code in B.NUMERIC_NP
            and B.NUMERIC_NP[dtype_code].kind in "iu"
            and codec_id not in (B.VARINT, B.DELTA_VARINT, B.BITPACK)):
        exact = stats.get("_exact_int_sizes") or _exact_int_sizes(
            values, dtype_code)
        best_exact = min(exact, key=exact.get)
        if len(out) - B.HEADER_LEN > exact[best_exact]:
            codec_id = best_exact
            out = B.encode_blob(codec_id, dtype_code, values)
    return out, codec_id, stats
