"""Delta + varint posting-payload codec (numpy-vectorized).

Posting blocks store doc ids and position lists as delta-encoded LEB128
varints inside Parquet ``binary`` cells, mirroring the layout role of the
reference codec (/root/reference/src/whoosh/util/varints.py:39-100 and
util/numlists.py:10-22 describe the on-disk format we re-express; the
implementation here is an independent vectorized design). Parquet adds
general-purpose compression (snappy/zstd) on top.

Both encode and decode operate on whole numpy arrays — no per-value Python
in the hot path — so they are cheap inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_LOW7 = _U64(0x7F)
_CONT = np.uint8(0x80)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array into a byte string (vectorized)."""
    v = values.astype(_U64, copy=False)
    n = v.size
    if n == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> _SEVEN
    while np.any(tmp):
        nbytes += (tmp != 0).astype(np.int64)
        tmp = tmp >> _SEVEN
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # position of first byte of each value
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    # byte index within each value: flat arange minus repeated starts
    flat = np.arange(total, dtype=np.int64)
    rep_starts = np.repeat(starts, nbytes)
    k = flat - rep_starts  # 0,1,2.. within each value
    rep_vals = np.repeat(v, nbytes)
    chunks = (rep_vals >> (k.astype(_U64) * _SEVEN)) & _LOW7
    out[:] = chunks.astype(np.uint8)
    # continuation bit on all but the last byte of each value
    ends = starts + nbytes - 1
    mask = np.ones(total, dtype=bool)
    mask[ends] = False
    out[mask] |= _CONT
    return out.tobytes()


def varint_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte string into a uint64 array (vectorized)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.int64)
    is_end = (buf & _CONT) == 0
    n = int(is_end.sum())
    if n == buf.size:
        # every varint is a single byte (small deltas/tfs — the common
        # posting payload): the bytes ARE the values
        res = buf.astype(np.int64)
        if count is not None and res.size != count:
            raise ValueError(f"varint_decode: expected {count} values, got {res.size}")
        return res
    starts = np.nonzero(np.concatenate(([True], is_end[:-1])))[0]
    # byte offset within its value: position minus the value's start,
    # propagated by repeat-free subtraction (starts is sorted)
    k = np.arange(buf.size, dtype=np.int64)
    k -= np.repeat(starts, np.diff(np.concatenate((starts, [buf.size]))))
    contrib = (buf & 0x7F).astype(_U64) << (k.astype(_U64) * _SEVEN)
    # values are contiguous byte groups -> reduceat (C-speed segmented sum;
    # np.add.at was ~5x slower here)
    out = np.add.reduceat(contrib, starts)
    res = out.astype(np.int64)
    if count is not None and res.size != count:
        raise ValueError(f"varint_decode: expected {count} values, got {res.size}")
    return res


def varint_decode_concat(buffers: list[bytes], total_count: int | None = None) -> np.ndarray:
    """Decode MANY independent LEB128 byte strings in one vectorized pass.

    Each buffer ends on a terminator byte (complete varints), so the
    concatenation decodes identically to per-buffer calls — but the numpy
    fixed overhead (~40us/call on 128-value blocks, measured) is paid once
    instead of once per block. The driver-local path decodes thousands of
    blocks per query; this is its batched entry point."""
    data = b"".join(b for b in buffers if b)
    return varint_decode(data, total_count)


def delta_decode_concat(buffers: list[bytes], counts: np.ndarray) -> np.ndarray:
    """Batched delta+varint decode of many blocks: one varint pass over the
    concatenated buffers, then a segmented cumsum that restarts at each
    block boundary (each block's first delta is the absolute value)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    deltas = varint_decode_concat(buffers, total)
    if total == 0:
        return deltas
    csum = np.cumsum(deltas)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    starts = starts[counts > 0]
    prev = np.zeros(total, dtype=np.int64)
    prev[starts[1:]] = csum[starts[1:] - 1]
    # csum is non-decreasing (ids/deltas are non-negative), so the running
    # "subtract everything before my segment" offset propagates by max
    np.maximum.accumulate(prev, out=prev)
    return csum - prev


def delta_encode(sorted_values: np.ndarray) -> bytes:
    """Delta + varint encode a non-decreasing int array."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    if deltas.size > 1 and deltas[1:].min() < 0:
        raise ValueError("delta_encode requires a sorted array")
    return varint_encode(deltas.astype(_U64))


def delta_decode(data: bytes, count: int | None = None) -> np.ndarray:
    deltas = varint_decode(data, count)
    return np.cumsum(deltas)


def encode_position_lists(positions: list[np.ndarray]) -> bytes:
    """Encode per-posting position lists: varint(len) then delta+varint body,
    all concatenated into one binary cell per block."""
    if not positions:
        return b""
    lens = np.array([len(p) for p in positions], dtype=_U64)
    header = varint_encode(lens)
    prefix = varint_encode(np.array([len(header)], dtype=_U64))
    if lens.sum() == 0:
        return prefix + header
    # delta-encode each list independently, then varint the whole stream
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in positions if len(p)])
    bounds = np.cumsum(lens.astype(np.int64))
    deltas = flat.copy()
    deltas[1:] -= flat[:-1]
    # reset the delta at the start of each list back to its absolute value
    starts = np.concatenate(([0], bounds[:-1]))
    starts = starts[lens.astype(np.int64) > 0]
    deltas[starts] = flat[starts]
    return prefix + header + varint_encode(deltas.astype(_U64))


def decode_position_lists(data: bytes, n_postings: int) -> list[np.ndarray]:
    if not data:
        return [np.empty(0, dtype=np.int64) for _ in range(n_postings)]
    buf = np.frombuffer(data, dtype=np.uint8)
    # first varint = header length
    i = 0
    hlen = 0
    shift = 0
    while True:
        b = int(buf[i])
        hlen |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not (b & 0x80):
            break
    lens = varint_decode(buf[i : i + hlen].tobytes(), n_postings)
    body = varint_decode(buf[i + hlen :].tobytes(), int(lens.sum()))
    # undo per-list delta: segmented cumsum — global cumsum, then subtract
    # the running total accumulated before each segment start
    total = int(lens.sum())
    if total == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(n_postings)]
    bounds = np.cumsum(lens)
    starts = np.concatenate(([0], bounds[:-1]))
    csum = np.cumsum(body)
    nz = starts[lens > 0]
    prev = np.zeros(total, dtype=np.int64)
    prev[nz[1:]] = csum[nz[1:] - 1]
    np.maximum.accumulate(prev, out=prev)  # csum is non-decreasing (positions ascend)
    out = csum - prev
    result = []
    for idx in range(n_postings):
        s, e = int(starts[idx]), int(bounds[idx])
        result.append(out[s:e])
    return result


def _split_position_payload(data: bytes) -> tuple[bytes, bytes]:
    """Split one positions cell into (header, body) byte strings."""
    buf = memoryview(data)
    i = 0
    hlen = 0
    shift = 0
    while True:
        b = buf[i]
        hlen |= (b & 0x7F) << shift
        i += 1
        shift += 7
        if not (b & 0x80):
            break
    return bytes(buf[i:i + hlen]), bytes(buf[i + hlen:])


def decode_position_lists_concat(buffers: list[bytes | None],
                                 counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batched position-list decode across many blocks.

    Returns (flat positions, per-posting lengths) — the ragged layout the
    vectorized local evaluator consumes directly (no per-posting Python
    lists). Headers and bodies of all blocks are each varint-decoded in ONE
    pass; the per-list delta reset is the same segmented-cumsum trick as
    decode_position_lists. A None/empty buffer (pre-positions segment)
    contributes zero-length lists for its postings."""
    counts = np.asarray(counts, dtype=np.int64)
    headers: list[bytes] = []
    bodies: list[bytes] = []
    lens_parts: list[np.ndarray] = []
    pending_hdr = 0  # postings covered by accumulated headers
    for buf, c in zip(buffers, counts):
        c = int(c)
        if not buf:
            if pending_hdr:
                lens_parts.append(varint_decode(b"".join(headers), pending_hdr))
                headers.clear()
                pending_hdr = 0
            lens_parts.append(np.zeros(c, dtype=np.int64))
            continue
        hdr, body = _split_position_payload(buf)
        headers.append(hdr)
        pending_hdr += c
        bodies.append(body)
    if pending_hdr:
        lens_parts.append(varint_decode(b"".join(headers), pending_hdr))
    lens = (np.concatenate(lens_parts) if lens_parts
            else np.zeros(0, dtype=np.int64))
    total = int(lens.sum())
    body_vals = varint_decode(b"".join(bodies), total)
    if total == 0:
        return body_vals, lens
    bounds = np.cumsum(lens)
    starts = np.concatenate(([0], bounds[:-1]))
    csum = np.cumsum(body_vals)
    nz = starts[lens > 0]
    prev = np.zeros(total, dtype=np.int64)
    prev[nz[1:]] = csum[nz[1:] - 1]
    np.maximum.accumulate(prev, out=prev)
    return csum - prev, lens


def encode_float_lists(lists: list[np.ndarray]) -> bytes:
    """Per-posting float lists (position boosts) whose lengths mirror the
    posting's position list — no length header needed; decode reuses the
    position-list lengths."""
    if not lists:
        return b""
    flat = np.concatenate([np.asarray(p, dtype=np.float64) for p in lists]) \
        if any(len(p) for p in lists) else np.empty(0, dtype=np.float64)
    return flat.tobytes()


def decode_float_lists(data: bytes, lens: list[int] | np.ndarray) -> list[np.ndarray]:
    """Split a float64 stream back into per-posting lists of the given
    lengths (taken from the decoded position lists)."""
    flat = np.frombuffer(data, dtype=np.float64) if data else np.empty(0, dtype=np.float64)
    out = []
    i = 0
    for n in lens:
        n = int(n)
        out.append(flat[i : i + n])
        i += n
    return out
