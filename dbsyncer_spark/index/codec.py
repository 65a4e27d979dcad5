"""Posting-list codec: delta + variable-byte (VByte) blocks with skip
pointers and block-max metadata. Pure numpy, fully vectorized — this runs
inside Arrow batches (``applyInPandas``), never per-row Python.

Layout per (term, range) posting row:

- postings are (docId, tf, dl) triples sorted by docId ascending
- split into blocks of ``BLOCK_SIZE`` postings
- per block, three VByte streams concatenated into one ``bytes`` blob:
    docId deltas (first docId delta'd against block's ``first`` field),
    tf values, dl values
- block metadata kept as parquet list columns (the skip table):
    ``block_first`` (absolute first docId), ``block_n`` (postings in
    block), ``block_off`` (byte offset of block in blob),
    ``block_max_tf`` / ``block_min_dl`` (block-max bounds).

Optional positions stream (``store_positions`` builds — phrase query
support, the analog of Lucene's positional postings the reference
exercises via PhraseQuery, ``LuceneFactoryTest.java:351-367``): each
posting's in-doc token positions (ascending) are delta-encoded (first
position absolute, then gaps) into a SEPARATE per-block VByte stream,
stored as ``pos_blob`` + per-block ``pos_off`` offsets. Keeping
positions in their own parquet column means the BM25/WAND scorers never
read them (column pruning) — only phrase queries pay the extra I/O. The
per-posting value counts are the tf stream, so no extra length table is
needed.

``POS_CAP`` bounds in-doc token positions for positional builds: the
phrase matcher packs (doc, position) into a single int64 key as
``doc * POS_CAP + pos``, so the build REJECTS docs with more tokens than
``MAX_DOC_POSITIONS`` (cap minus a phrase-length margin) up front —
otherwise every phrase query touching that doc's range would fail at
query time instead (r2 review).

Block-max bounds are stored as (max tf, min dl) rather than a
precomputed tfnorm so the bound stays valid under *any* global avgdl —
BM25's tfnorm is monotone increasing in tf and decreasing in dl, so
``tfnorm(max_tf, min_dl)`` upper-bounds every posting in the block even
after incremental segments shift avgdl. (The analog of Lucene's per-block
max impacts; reference relevance layer: SURVEY.md §2.5 F11.)

VByte: little-endian 7-bit groups, MSB set = continuation.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_MAX_VBYTE_LEN = 10  # 64 bits / 7
POS_CAP = 1 << 22  # phrase-matcher (doc, pos) packing base
MAX_DOC_POSITIONS = POS_CAP - 1024  # margin covers the phrase length


def vbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized VByte encode of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value = number of 7-bit groups, min 1
    # (vectorized shift counting, <=10 iters)
    lengths = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    rem = v.copy()
    pos = offsets[:-1].copy()
    left = lengths.copy()
    for _ in range(_MAX_VBYTE_LEN):
        mask = left > 0
        if not mask.any():
            break
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (left[mask] > 1).astype(np.uint8) << 7
        out[pos[mask]] = byte | cont
        rem[mask] >>= np.uint64(7)
        pos[mask] += 1
        left[mask] -= 1
    return out.tobytes()


def vbyte_decode(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Vectorized VByte decode -> uint64 array (delegates to the array
    form; accepts any buffer)."""
    return _vbyte_decode_arr(np.frombuffer(buf, dtype=np.uint8), count)


def pack_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
    positions: np.ndarray | None = None,
) -> dict:
    """Pack sorted (docId, tf, dl) postings into compressed blocks.

    Returns dict with ``blob`` (bytes) and the skip-table list columns.
    ``doc_ids`` must be sorted ascending and unique. ``positions``
    (optional): flat int array of every posting's ascending in-doc token
    positions concatenated in posting order (length = tfs.sum()); when
    given, the result also carries ``pos_blob`` / ``pos_off``.
    """
    n = doc_ids.size
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    block_first, block_n, block_off = [], [], []
    block_max_tf, block_min_dl = [], []
    parts: list[bytes] = []
    off = 0
    with_pos = positions is not None
    if with_pos:
        positions = np.ascontiguousarray(positions, dtype=np.int64)
        tf_bounds = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs.astype(np.int64), out=tf_bounds[1:])
        pos_parts: list[bytes] = []
        pos_off: list[int] = []
        poff = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        ids = doc_ids[s:e]
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = 0  # first docId carried absolutely in block_first
        deltas[1:] = ids[1:] - ids[:-1]
        chunk = vbyte_encode(deltas) + vbyte_encode(tfs[s:e]) + vbyte_encode(dls[s:e])
        block_first.append(int(ids[0]))
        block_n.append(e - s)
        block_off.append(off)
        block_max_tf.append(int(tfs[s:e].max()))
        block_min_dl.append(int(dls[s:e].min()))
        parts.append(chunk)
        off += len(chunk)
        if with_pos:
            p = positions[tf_bounds[s]:tf_bounds[e]]
            d = np.diff(p, prepend=np.int64(0))
            starts = (tf_bounds[s:e] - tf_bounds[s]).astype(np.int64)
            d[starts] = p[starts]  # posting-first positions stay absolute
            pchunk = vbyte_encode(d.astype(np.uint64))
            pos_parts.append(pchunk)
            pos_off.append(poff)
            poff += len(pchunk)
    out = {
        "n_docs": n,
        "blob": b"".join(parts),
        "block_first": block_first,
        "block_n": block_n,
        "block_off": block_off,
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
    }
    if with_pos:
        out["pos_blob"] = b"".join(pos_parts)
        out["pos_off"] = pos_off
    return out


def _vbyte_decode_arr(b: np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized VByte decode of a uint8 array -> uint64 array.

    ``count`` caps the number of decoded values (None = all). A buffer
    holding fewer terminated values than ``count`` (including a buffer
    truncated to ZERO bytes — the early return must not swallow that
    case, r5 review), or whose tail is an unterminated value (trailing
    bytes past the last terminator, e.g. a blob truncated mid-value),
    raises a descriptive corruption error instead of an opaque
    IndexError (r3 review) or silently short data."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    if b.size == 0:
        if count is not None:  # and count > 0, per the guard above
            raise ValueError(
                f"vbyte stream corrupt/truncated: expected {count} values, "
                "buffer is empty"
            )
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    if count is not None:
        if ends.size < count:
            raise ValueError(
                f"vbyte stream corrupt/truncated: expected {count} values, "
                f"buffer of {b.size} bytes terminates only {ends.size}"
            )
        ends = ends[:count]
    else:
        if ends.size == 0:
            raise ValueError(
                f"vbyte stream corrupt: {b.size} bytes with no terminator byte"
            )
        if int(ends[-1]) != b.size - 1:
            raise ValueError(
                f"vbyte stream corrupt/truncated: {b.size - 1 - int(ends[-1])} "
                "trailing bytes after the last terminated value"
            )
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return vals


def unpack_blocks(blob, block_off, block_n, block_first, keep=None):
    """Decode all (or ``keep``, an index array of) blocks of one posting
    row in ONE vectorized pass -> (doc_ids, tfs, dls) uint64 arrays.

    Row-identical to concatenating per-block ``unpack_block`` results
    (pytest parity-gated), but the numpy call overhead is paid once per
    ROW instead of once per 128-posting block — the per-block loop was
    ~143 us/block of fixed overhead, which dominated hot-term scoring
    (~770 blocks = ~110 ms per query, measured r2)."""
    boff = np.asarray(block_off, dtype=np.int64)
    bn = np.asarray(block_n, dtype=np.int64)
    bf = np.asarray(block_first, dtype=np.uint64)
    blob_len = len(blob)
    if keep is not None:
        keep = np.asarray(keep, dtype=np.int64)
        if keep.size == 0:
            z = np.zeros(0, dtype=np.uint64)
            return z, z.copy(), z.copy()
        bends = np.empty_like(boff)
        bends[:-1] = boff[1:]
        bends[-1] = blob_len
        full = np.frombuffer(blob, dtype=np.uint8)
        b = np.concatenate([full[boff[i]:bends[i]] for i in keep])
        bn, bf = bn[keep], bf[keep]
    else:
        b = np.frombuffer(blob, dtype=np.uint8)
    if bn.size == 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    n_total = int(bn.sum())
    vals = _vbyte_decode_arr(b, 3 * n_total)
    # per-block value layout: [deltas(n) tfs(n) dls(n)]; map each posting
    # to its three value indexes with arange/repeat arithmetic
    v0 = np.zeros(bn.size, dtype=np.int64)
    np.cumsum(3 * bn[:-1], out=v0[1:])
    p0 = np.zeros(bn.size, dtype=np.int64)
    np.cumsum(bn[:-1], out=p0[1:])
    j = np.arange(n_total, dtype=np.int64) - np.repeat(p0, bn)
    bn_rep = np.repeat(bn, bn)
    d_idx = np.repeat(v0, bn) + j
    deltas = vals[d_idx]
    tfs = vals[d_idx + bn_rep]
    dls = vals[d_idx + 2 * bn_rep]
    # docIds: block-first absolute + within-block cumsum of deltas
    # (delta at each block start is stored as 0)
    c = deltas.cumsum(dtype=np.uint64)
    base = c[p0]  # c at block start == prefix before the block (delta=0)
    doc_ids = np.repeat(bf, bn) + c - np.repeat(base, bn)
    return doc_ids, tfs, dls


def unpack_block(blob, block_off, block_n, block_first, bi: int):
    """Decode one block -> (doc_ids, tfs, dls) uint64 arrays."""
    start = block_off[bi]
    end = block_off[bi + 1] if bi + 1 < len(block_off) else len(blob)
    n = block_n[bi]
    seg = np.frombuffer(blob, dtype=np.uint8, count=end - start, offset=start)
    ends = np.flatnonzero((seg & 0x80) == 0)
    # three streams of exactly n values each
    d_end = ends[n - 1] + 1
    t_end = ends[2 * n - 1] + 1
    deltas = _vbyte_decode_arr(seg[:d_end], n)
    tfs = _vbyte_decode_arr(seg[d_end:t_end], n)
    dls = _vbyte_decode_arr(seg[t_end:], n)
    doc_ids = deltas.cumsum(dtype=np.uint64)
    doc_ids += np.uint64(block_first[bi])
    return doc_ids, tfs, dls


def unpack_block_positions(pos_blob, pos_off, tfs_block: np.ndarray, bi: int) -> np.ndarray:
    """Decode one block's positions stream -> flat int64 array of absolute
    in-doc positions (posting order; per-posting counts = ``tfs_block``).
    """
    start = pos_off[bi]
    end = pos_off[bi + 1] if bi + 1 < len(pos_off) else len(pos_blob)
    tfs_block = np.asarray(tfs_block, dtype=np.int64)
    total = int(tfs_block.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    seg = np.frombuffer(pos_blob, dtype=np.uint8, count=end - start, offset=start)
    deltas = _vbyte_decode_arr(seg, total).astype(np.int64)
    c = np.cumsum(deltas)
    starts = np.zeros(tfs_block.size, dtype=np.int64)
    np.cumsum(tfs_block[:-1], out=starts[1:])
    base = np.where(starts > 0, c[starts - 1], 0)
    return c - np.repeat(base, tfs_block)


def unpack_row_positions(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode ALL blocks of one positional posting row (one vectorized
    pass per stream — see ``unpack_blocks``).

    Returns (doc_ids, tfs, dls, flat_positions) where ``flat_positions``
    concatenates each posting's ascending positions in posting order.
    """
    d, t, l = unpack_postings(row)
    total = int(t.sum())
    if total == 0:
        return d, t, l, np.zeros(0, dtype=np.int64)
    b = np.frombuffer(row["pos_blob"], dtype=np.uint8)
    vals = _vbyte_decode_arr(b, total).astype(np.int64)
    # each posting's first value is absolute, the rest are gaps: global
    # cumsum minus the cumsum just before each posting's start recovers
    # the absolute positions regardless of block/posting boundaries
    c = np.cumsum(vals)
    tfs_i = t.astype(np.int64)
    starts = np.zeros(tfs_i.size, dtype=np.int64)
    np.cumsum(tfs_i[:-1], out=starts[1:])
    base = np.where(starts > 0, c[starts - 1], 0)
    flat = c - np.repeat(base, tfs_i)
    return d, t, l, flat


def unpack_postings(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode all blocks of one posting row -> (doc_ids, tfs, dls)."""
    return unpack_blocks(
        row["blob"], row["block_off"], row["block_n"], row["block_first"]
    )
