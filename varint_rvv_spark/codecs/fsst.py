"""FSST-style symbol-table codec for varlen columns (codec 7).

Follows the published FSST idea (Boncz/Neumann/Freitag, VLDB 2020):
a per-chunk table of up to 254 byte-string symbols replaces frequent
substrings with 1-byte codes; bytes without a code are escaped
(0xFF + literal).  Differences from the paper, chosen so that both
training and the encode hot loop are pure vectorized numpy (no per-row
or per-byte Python):

* symbol lengths are {8, 4, 2, 1} (not 1-8);
* candidate symbols are counted over *all* byte offsets (unaligned)
  of a sample, matching at encode time is unaligned too, with overlap
  resolution by block-local greedy selection (at most one selected
  match per L-sized block, then adjacent-conflict pruning) — slightly
  suboptimal vs left-to-right greedy, but branch-free;
* byte 0xFF always gets a 1-byte symbol, so an escape's literal can
  never be 0xFF — decode can classify escape/literal/code positions
  without a sequential state machine.

The whole data buffer of a varlen chunk is one symbol stream (row
lengths are stored separately as varints), so row boundaries cost
nothing.  Auto-selection trials FSST against dict/zstd per chunk and
keeps the winner (SURVEY.md §7 step 7: dict+zstd fallback when FSST
loses).
"""

from __future__ import annotations

import struct

import numpy as np

from . import blob as B

ESCAPE = 255
MAX_SYMS = 254  # codes 0..253 usable, 254 reserved, 255 escape
_HDR = struct.Struct("<H")  # symbol count

LENGTHS = (8, 4, 2)


def _grams(buf: np.ndarray, L: int) -> np.ndarray:
    """All unaligned L-gram values of buf as unsigned ints."""
    if buf.size < L:
        return np.empty(0, dtype=np.uint64)
    n = buf.size - L + 1
    dt = {8: np.uint64, 4: np.uint32, 2: np.uint16}[L]
    view = np.lib.stride_tricks.sliding_window_view(buf, L)
    # little-endian pack
    out = np.zeros(n, dtype=np.uint64)
    for k in range(L):
        out |= view[:, k].astype(np.uint64) << np.uint64(8 * k)
    return out.astype(dt if L < 8 else np.uint64)


def train_symbols(sample: np.ndarray, budget: int = MAX_SYMS) -> list[bytes]:
    """Pick symbols by gain = count*(L-1) from a sample buffer."""
    sample = np.ascontiguousarray(sample, dtype=np.uint8)[: 1 << 14]
    chosen: list[tuple[int, bytes]] = []
    per_len = {8: budget // 4, 4: budget // 4, 2: budget // 4}
    for L in LENGTHS:
        g = _grams(sample, L)
        if g.size == 0:
            continue
        vals, counts = np.unique(g, return_counts=True)
        good = counts >= 4
        vals, counts = vals[good], counts[good]
        gain = counts * (L - 1)
        top = np.argsort(gain)[::-1][: per_len[L]]
        for i in top:
            sym = int(vals[i]).to_bytes(8, "little")[:L]
            chosen.append((int(gain[i]), sym))
    # 1-byte symbols: most frequent bytes, 0xFF forced
    byte_counts = np.bincount(sample, minlength=256)
    n_multi = len(chosen)
    n_single = budget - n_multi
    order = np.argsort(byte_counts)[::-1]
    singles = [bytes([ESCAPE])]
    for b in order:
        if len(singles) >= n_single:
            break
        if b != ESCAPE and byte_counts[b] > 0:
            singles.append(bytes([int(b)]))
    syms = [s for _, s in sorted(chosen, key=lambda t: -t[0])] + singles
    return syms[:budget]


def _select_nonoverlap(pos: np.ndarray, L: int, consumed_cum: np.ndarray
                       ) -> np.ndarray:
    """Block-local greedy non-overlap selection of match positions."""
    if pos.size == 0:
        return pos
    # drop matches crossing already-consumed bytes
    free = (consumed_cum[pos + L] - consumed_cum[pos]) == 0
    pos = pos[free]
    if pos.size == 0:
        return pos
    # at most one match per L-block (keep the first in each block)
    block = pos // L
    first = np.ones(pos.size, dtype=bool)
    first[1:] = block[1:] != block[:-1]
    pos = pos[first]
    # adjacent-block conflicts: with one match per block, a conflicting
    # pair always sits in *consecutive* blocks, so conflicts form
    # chains and the exact sequential greedy (keep, then skip the next
    # conflicting one, then keep, ...) is "keep the even offsets within
    # each maximal conflicting run" — fully vectorized, no cascade of
    # drops against already-dropped predecessors
    conflict = np.zeros(pos.size, dtype=bool)
    conflict[1:] = pos[1:] < pos[:-1] + L
    run_start = np.flatnonzero(~conflict)
    run_id = np.cumsum(~conflict) - 1
    offset = np.arange(pos.size) - run_start[run_id]
    return pos[offset % 2 == 0]


def fsst_compress(buf: np.ndarray, syms: list[bytes]) -> np.ndarray:
    """Compress a byte buffer with the given symbol table → uint8 codes
    stream (escapes inline)."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    n = buf.size
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    by_len: dict[int, dict[int, int]] = {8: {}, 4: {}, 2: {}}
    byte_code = np.full(256, ESCAPE, dtype=np.uint8)
    for code, s in enumerate(syms):
        if len(s) == 1:
            byte_code[s[0]] = code
        else:
            by_len[len(s)][int.from_bytes(s, "little")] = code
    consumed = np.zeros(n + 1, dtype=bool)  # +1 pad for cumsum ease
    seg_pos: list[np.ndarray] = []
    seg_code: list[np.ndarray] = []
    seg_len: list[np.ndarray] = []
    for L in LENGTHS:
        table = by_len[L]
        if not table or n < L:
            continue
        keys = np.array(sorted(table), dtype=np.uint64)
        codes = np.array([table[int(k)] for k in keys], dtype=np.uint8)
        g = _grams(buf, L).astype(np.uint64)
        idx = np.searchsorted(keys, g)
        idx[idx == keys.size] = 0
        hit = keys[idx] == g
        pos = np.flatnonzero(hit)
        ccum = np.concatenate(([0], np.cumsum(consumed[:n])))
        pos = _select_nonoverlap(pos, L, ccum)
        if pos.size == 0:
            continue
        # mark consumed
        for k in range(L):
            consumed[pos + k] = True
        seg_pos.append(pos)
        seg_code.append(codes[np.searchsorted(keys, g[pos])])
        seg_len.append(np.full(pos.size, L, dtype=np.int64))
    rest = np.flatnonzero(~consumed[:n])
    if rest.size:
        seg_pos.append(rest)
        seg_code.append(byte_code[buf[rest]])
        seg_len.append(np.ones(rest.size, dtype=np.int64))
    pos = np.concatenate(seg_pos)
    code = np.concatenate(seg_code)
    slen = np.concatenate(seg_len)
    order = np.argsort(pos, kind="stable")
    pos, code, slen = pos[order], code[order], slen[order]
    is_esc = (slen == 1) & (code == ESCAPE)
    out_len = np.where(is_esc, 2, 1)
    off = np.zeros(pos.size + 1, dtype=np.int64)
    np.cumsum(out_len, out=off[1:])
    out = np.empty(int(off[-1]), dtype=np.uint8)
    out[off[:-1]] = np.where(is_esc, ESCAPE, code)
    lit = off[:-1][is_esc] + 1
    out[lit] = buf[pos[is_esc]]
    return out


def fsst_decompress(stream: np.ndarray, syms: list[bytes],
                    out_size: int) -> np.ndarray:
    """Decode a code stream back to the original byte buffer."""
    stream = np.ascontiguousarray(stream, dtype=np.uint8)
    if stream.size == 0:
        return np.empty(0, dtype=np.uint8)
    sym_lens = np.array([len(s) for s in syms] +
                        [0] * (256 - len(syms)), dtype=np.int64)
    flat = b"".join(syms)
    sym_data = np.frombuffer(flat, dtype=np.uint8)
    sym_off = np.zeros(257, dtype=np.int64)
    np.cumsum(sym_lens, out=sym_off[1:])
    is_esc = stream == ESCAPE          # literals are never 0xFF
    is_lit = np.zeros(stream.size, dtype=bool)
    is_lit[1:] = is_esc[:-1]
    is_esc &= ~is_lit                  # (defensive; cannot co-occur)
    out_lens = np.where(is_esc, 0,
                        np.where(is_lit, 1, sym_lens[stream]))
    off = np.zeros(stream.size + 1, dtype=np.int64)
    np.cumsum(out_lens, out=off[1:])
    total = int(off[-1])
    if total != out_size:
        raise ValueError(f"fsst length mismatch {total} != {out_size}")
    out = np.empty(total, dtype=np.uint8)
    # literals
    lit_idx = np.flatnonzero(is_lit)
    out[off[lit_idx]] = stream[lit_idx]
    # codes: gather symbol bytes
    code_idx = np.flatnonzero(~is_esc & ~is_lit)
    if code_idx.size:
        codes = stream[code_idx]
        lens = sym_lens[codes]
        starts = off[code_idx]
        tot = int(lens.sum())
        rep = np.repeat(np.arange(code_idx.size), lens)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
        out[starts[rep] + within] = sym_data[sym_off[codes][rep] + within]
    return out


# --- blob-codec integration (varlen only) ---

def enc_fsst(values, dtype_code: int) -> bytes:
    from .varint import varint_encode

    if not B.is_varlen(dtype_code):
        raise TypeError("fsst is a varlen codec")
    lens = values.lengths().astype(np.uint64)
    lens_blob = varint_encode(lens).tobytes()
    syms = train_symbols(values.data)
    stream = fsst_compress(values.data, syms)
    table = b"".join(bytes([len(s)]) + s for s in syms)
    return (_HDR.pack(len(syms)) + struct.pack("<Q", values.data.size)
            + struct.pack("<I", len(table)) + table
            + struct.pack("<I", len(lens_blob)) + lens_blob
            + stream.tobytes())


def dec_fsst(payload, n: int, dtype_code: int):
    from .varint import varint_decode

    mv = memoryview(payload)
    (n_syms,) = _HDR.unpack_from(mv, 0)
    (data_size,) = struct.unpack_from("<Q", mv, 2)
    (table_len,) = struct.unpack_from("<I", mv, 10)
    p = 14
    syms = []
    end = p + table_len
    while p < end:
        ln = mv[p]
        syms.append(bytes(mv[p + 1:p + 1 + ln]))
        p += 1 + ln
    (lens_len,) = struct.unpack_from("<I", mv, p)
    p += 4
    lens = varint_decode(np.frombuffer(mv[p:p + lens_len], dtype=np.uint8))
    p += lens_len
    if lens.shape[0] != n:
        raise ValueError("fsst row-count mismatch")
    stream = np.frombuffer(mv[p:], dtype=np.uint8)
    data = fsst_decompress(stream, syms, int(data_size))
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens.astype(np.int64), out=offsets[1:])
    return B.VarlenArray(offsets=offsets, data=data)


def register_all() -> None:
    B.register(B.FSST, enc_fsst, dec_fsst)
