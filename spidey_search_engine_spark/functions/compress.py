"""Delta-gap + varint posting-list compression (BASELINE.json north_star).

The reference stores one MySQL row per term occurrence
(create_database.sql:88-95) — at 10^12-file scale that representation is the
single biggest storage/shuffle cost, so this engine stores each term's
posting list as ONE binary cell: sorted doc_ids delta-gapped then
LEB128-varint encoded, tfs varint encoded, and each doc's sorted positions
delta-gapped + varint encoded, concatenated with varint length headers.

Layout of one encoded posting list (all integers LEB128 varints):

    n_docs,
    doc_gap[0..n),          # doc_id deltas (first is absolute)
    tf[0..n),
    for each doc: positions as gaps (first absolute); position-block i has
    exactly tf[i] entries, so no per-doc length header is needed.

Encoding/decoding is numpy-vectorized (no per-int Python loop): gaps via
``np.diff``, varint bytes via byte-plane construction over the whole array.
Used from Arrow-batched pandas UDFs in operators/build.py and decoded the
same way at query time.

Round-trip is property-tested with hypothesis (tests/test_compress.py).
"""

from __future__ import annotations

import numpy as np

_MASKS = None


def encode_varints_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array, vectorized; also return the per-value
    byte length array (int64) so callers can slice the stream at arbitrary
    value boundaries without re-encoding (used by the batched row encoder in
    operators/build.py).

    Builds the byte stream by computing, per value, its 7-bit groups as
    parallel byte planes, then compacting with a boolean mask — O(n·maxlen)
    numpy ops, no Python loop over values."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    tmp = v.copy()
    # max 10 groups for 64-bit
    lengths = np.ones(v.shape, dtype=np.int64)
    tmp >>= np.uint64(7)
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    maxlen = int(lengths.max())
    total = int(lengths.sum())
    out = np.zeros((v.size, maxlen), dtype=np.uint8)
    valid = np.zeros((v.size, maxlen), dtype=bool)
    shifted = v.copy()
    for i in range(maxlen):
        group = (shifted & np.uint64(0x7F)).astype(np.uint8)
        is_valid = i < lengths
        not_last = i < (lengths - 1)
        out[:, i] = group | (np.uint8(0x80) * not_last.astype(np.uint8))
        valid[:, i] = is_valid
        shifted >>= np.uint64(7)
    buf = out[valid]
    assert buf.size == total
    return buf.tobytes(), lengths


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized (see
    encode_varints_with_lengths)."""
    return encode_varints_with_lengths(values)[0]


def decode_varints(buf: bytes | bytearray | memoryview, offset: int = 0,
                   count: int | None = None) -> tuple[np.ndarray, int]:
    """Decode `count` varints from buf starting at offset (all varints to the
    end if count is None). Returns (uint64 array, next_offset). Vectorized:
    one pass to find terminator bytes, then per-byte-position accumulation."""
    arr = np.frombuffer(buf, dtype=np.uint8)[offset:]
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64), offset
    is_last = (arr & 0x80) == 0
    ends = np.flatnonzero(is_last)
    if count is not None:
        if count == 0:
            return np.zeros(0, dtype=np.uint64), offset
        ends = ends[:count]
        if ends.size < count:
            raise ValueError("varint stream truncated")
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    maxlen = int(lengths.max())
    values = np.zeros(n, dtype=np.uint64)
    for i in range(maxlen):
        take = lengths > i
        idx = starts[take] + i
        values[take] |= (arr[idx].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * i)
    consumed = int(ends[-1]) + 1
    return values, offset + consumed


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    v = np.asarray(sorted_vals, dtype=np.int64)
    if v.size == 0:
        return v.astype(np.uint64)
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    if out[1:].size and (out[1:] < 0).any():
        raise ValueError("delta_encode requires sorted input")
    return out.astype(np.uint64)


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64).astype(np.int64)


def encode_posting_list(doc_ids: np.ndarray, tfs: np.ndarray,
                        positions: list[np.ndarray] | None = None) -> bytes:
    """Encode one term's postings. doc_ids must be sorted ascending unique;
    positions[i] (sorted) must have len == tfs[i] when provided (omitting
    positions writes tf-only postings for fields that don't need phrase
    support)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    header = encode_varints(np.array([n, 1 if positions is not None else 0],
                                     dtype=np.uint64))
    body = [header,
            encode_varints(delta_encode(doc_ids)),
            encode_varints(tfs.astype(np.uint64))]
    if positions is not None:
        if len(positions) != n:
            raise ValueError("positions length mismatch")
        # concatenate per-doc gap streams; block i has tf[i] entries
        gap_blocks = [delta_encode(np.asarray(p, dtype=np.int64)) for p in positions]
        allgaps = (np.concatenate(gap_blocks) if gap_blocks
                   else np.zeros(0, dtype=np.uint64))
        if allgaps.size != int(tfs.sum()):
            raise ValueError("sum(tf) != total positions")
        body.append(encode_varints(allgaps))
    return b"".join(body)


def decode_posting_list(buf: bytes) -> tuple[np.ndarray, np.ndarray, list[np.ndarray] | None]:
    """Inverse of encode_posting_list → (doc_ids, tfs, positions|None)."""
    hdr, off = decode_varints(buf, 0, 2)
    n, has_pos = int(hdr[0]), int(hdr[1])
    gaps, off = decode_varints(buf, off, n)
    doc_ids = delta_decode(gaps)
    tfs_u, off = decode_varints(buf, off, n)
    tfs = tfs_u.astype(np.int64)
    positions = None
    if has_pos:
        total = int(tfs.sum())
        allgaps, off = decode_varints(buf, off, total)
        positions = []
        start = 0
        for tf in tfs:
            block = allgaps[start:start + tf]
            positions.append(delta_decode(block))
            start += tf
    return doc_ids, tfs, positions
