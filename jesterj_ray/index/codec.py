"""Posting-list codec: docID delta encoding + varbyte compression + block-max.

From-scratch per the north_rule ("delta-encoded, varbyte-compressed posting
lists with per-block max-score metadata").  The reference delegates all
posting storage to Solr/OpenSearch; this module replaces that.

Layout of one encoded posting list (for one term, one doc-id shard):

    varbyte( delta(doc_ids) )  ++  varbyte( tfs )

with docIDs strictly ascending.  Block-max metadata is computed per
``BLOCK_SIZE`` postings: (last_doc_id, max_tf) per block, enabling
block-max WAND skipping at query time.

All encode/decode paths are vectorized numpy (no per-posting Python loop):
varbyte encode works by computing per-value byte lengths, a byte-position
prefix sum, and scattered writes; decode by masking continuation bits and
segment-summing 7-bit groups.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

BLOCK_SIZE = 128  # postings per block-max block


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte (LEB128, little-endian 7-bit groups) encode.

    ``values``: uint64/int64 ndarray, all >= 0.
    """
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # significant bits per value (float log2 exact for values < 2**53;
    # doc-id deltas / tfs stay far below that)
    nz = v > 0
    with np.errstate(divide="ignore"):
        nbits = np.where(nz, np.floor(np.log2(v.astype(np.float64) + 0.5)).astype(np.int64) + 1, 1)
    nbytes = (nbits + 6) // 7
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbytes
    # write byte k of each value (k < nbytes[i]) with continuation bits
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        if not mask.any():
            break
        vals = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        pos = starts[mask] + k
        cont = (nbytes[mask] - 1) > k
        out[pos] = vals.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varbyte_encode_one(v: int) -> bytes:
    """Scalar varbyte encode (same LEB128 layout as varbyte_encode).
    The k-way merge re-encodes exactly ONE delta per stitched run; the
    vectorized path costs ~200us of numpy setup per call at size 1
    (profiled r3) vs ~1us here."""
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def varbyte_decode(buf: bytes, count: int) -> np.ndarray:
    """Vectorized varbyte decode of ``count`` values.

    A value's 7-bit groups are CONTIGUOUS bytes, so the final gather is a
    segment sum over sorted boundaries — ``np.add.reduceat`` (18x faster
    than the scatter-add it replaces)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    # index of the value each byte belongs to = count of terminator bytes before it
    value_idx = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=value_idx[1:])
    # byte offset within its value = byte position - first byte position of the value
    last_pos = np.flatnonzero(is_last)
    first_byte_of_value = np.zeros(count, dtype=np.int64)
    first_byte_of_value[1:] = last_pos[:-1] + 1
    offset_in_value = np.arange(b.size, dtype=np.int64) - first_byte_of_value[value_idx]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * offset_in_value.astype(np.uint64))
    return np.add.reduceat(contrib, first_byte_of_value)


def varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length (same formula as varbyte_encode)."""
    v = np.asarray(values, dtype=np.uint64)
    nz = v > 0
    with np.errstate(divide="ignore"):
        nbits = np.where(nz, np.floor(np.log2(v.astype(np.float64) + 0.5))
                         .astype(np.int64) + 1, 1)
    return (nbits + 6) // 7


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray
                    ) -> Tuple[bytes, bytes, np.ndarray, np.ndarray,
                               np.ndarray, np.ndarray]:
    """Encode one posting list.

    Returns (doc_blob, tf_blob, block_last_doc, block_max_tf,
    block_doc_off, block_tf_off).  The off arrays give the byte offset of
    each block's first value inside the blob (one extra trailing entry =
    blob length), enabling per-block decode without touching earlier
    bytes: block b's deltas cumsum from base block_last[b-1].
    ``doc_ids`` must be strictly ascending int64; ``tfs`` positive int64.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    deltas = np.empty_like(doc_ids)
    if doc_ids.size:
        deltas[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    doc_blob = varbyte_encode(deltas.astype(np.uint64))
    tf_blob = varbyte_encode(tfs.astype(np.uint64))
    n = doc_ids.size
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_last = np.empty(nblocks, dtype=np.int64)
    block_max_tf = np.empty(nblocks, dtype=np.int64)
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min(n, (bi + 1) * BLOCK_SIZE)
        block_last[bi] = doc_ids[hi - 1]
        block_max_tf[bi] = tfs[lo:hi].max()
    dlen = varbyte_lengths(deltas.astype(np.uint64))
    tlen = varbyte_lengths(tfs.astype(np.uint64))
    bounds = np.arange(0, n + BLOCK_SIZE, BLOCK_SIZE)[:nblocks + 1]
    bounds[-1] = n
    doc_off = np.concatenate([[0], np.cumsum(dlen)])[bounds]
    tf_off = np.concatenate([[0], np.cumsum(tlen)])[bounds]
    return doc_blob, tf_blob, block_last, block_max_tf, doc_off, tf_off


def decode_postings(doc_blob: bytes, tf_blob: bytes, count: int) -> Tuple[np.ndarray, np.ndarray]:
    """Decode (doc_ids ascending int64, tfs int64)."""
    deltas = varbyte_decode(doc_blob, count).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    tfs = varbyte_decode(tf_blob, count).astype(np.int64)
    return doc_ids, tfs
