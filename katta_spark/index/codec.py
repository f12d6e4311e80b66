"""Posting-block codec: doc-gap + varint compression, fully
vectorized in numpy (no per-value Python loops — loop count is
bounded by the byte width, <= 10 iterations regardless of array
size).

This is the storage analogue of Lucene's postings format that the
reference serves via shards (doc-id delta + VInt in Lucene's .doc
files); block-max metadata rides alongside for WAND, per
BASELINE.json.north_star ("docID-gap + varint/PForDelta compression,
per-block max-score metadata").

A block covers a fixed doc_id RANGE (``BLOCK_RANGE``), not a fixed
posting count: block_id = doc_id // BLOCK_RANGE.  Doc-range-aligned
blocks make block_id a co-partitioning key — at query time every
query term's postings for the same doc range share a block_id, so a
single shuffle on block_id aligns all terms for exact per-doc
scoring, and a hot term ("import") is automatically split across as
many blocks as there are doc ranges (this is the explicit salt for
skewed terms required by north_rule: the build groups by
(term, block_id), never by term alone, so no reducer ever sees more
than BLOCK_RANGE postings of one term).
"""

from __future__ import annotations

import numpy as np

BLOCK_RANGE = 4096  # docs per block range


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array. Vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    pos = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=pos[1:])
    shifted = v.copy()
    j = 0
    alive = np.arange(v.size)
    while alive.size:
        idx = pos[alive] + j
        byte = (shifted[alive] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[alive] > j + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        shifted[alive] >>= np.uint64(7)
        j += 1
        alive = alive[nbytes[alive] > j]
    return out.tobytes()


def decode_varint(buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_varint`. Vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.nonzero(b < 128)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    values = np.zeros(ends.size, dtype=np.uint64)
    width = ends - starts + 1
    j = 0
    alive = np.arange(ends.size)
    while alive.size:
        idx = starts[alive] + j
        values[alive] |= (b[idx] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * j)
        j += 1
        alive = alive[width[alive] > j]
    return values.astype(np.int64)


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                 block_id: int, block_range: int = BLOCK_RANGE
                 ) -> tuple[bytes, bytes, bytes]:
    """Encode one (term, block) posting run. ``doc_ids`` must be
    sorted ascending and lie in [block_id*block_range, (block_id+1)*
    block_range). Returns (doc_gaps, tfs, dls) varint buffers; the
    first gap is relative to the block base so every value is small."""
    base = block_id * block_range
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.diff(d, prepend=base)
    return encode_varint(gaps), encode_varint(tfs), encode_varint(dls)


def decode_block(doc_gaps: bytes, tfs: bytes, dls: bytes,
                 block_id: int, block_range: int = BLOCK_RANGE
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_block`."""
    base = block_id * block_range
    gaps = decode_varint(doc_gaps)
    doc_ids = np.cumsum(gaps) + base
    return doc_ids, decode_varint(tfs), decode_varint(dls)


def encode_positions(pos_lists: list[np.ndarray]) -> tuple[bytes, bytes]:
    """Encode per-posting token-position lists (one list per posting
    of a (term, block) run, each sorted ascending) as two varint
    buffers: (pos_lens, pos_deltas) — the storage analogue of
    Lucene's .prx/.pos proximity files (delta-encoded positions).

    Stored in SEPARATE parquet columns from doc_gaps/tfs, so queries
    that never verify phrases never read a position byte (parquet
    column pruning)."""
    lens = np.array([len(p) for p in pos_lists], dtype=np.int64)
    if lens.sum() == 0:
        return encode_varint(lens), b""
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_lists])
    return encode_positions_flat(lens, flat)


def encode_positions_flat(lens: np.ndarray, flat: np.ndarray
                          ) -> tuple[bytes, bytes]:
    """Flat-form position encoder: ``lens[i]`` positions of posting i,
    concatenated in ``flat``.  The build feeds this form directly —
    the JVM flattens the per-posting lists before the Arrow transfer,
    so Python never materializes nested lists (measured ~1.6x faster
    posting phase at 8 cores vs the nested form)."""
    if flat.size == 0:
        return encode_varint(lens), b""
    deltas = np.diff(flat, prepend=np.int64(0))
    starts = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    nz = starts[lens > 0]
    deltas[nz] = flat[nz]  # each list restarts its delta chain at 0
    return encode_varint(lens), encode_varint(deltas)


def decode_positions(pos_lens: bytes, pos_deltas: bytes
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_positions`: (lens, flat_positions);
    split with ``np.split(flat, np.cumsum(lens)[:-1])``."""
    lens = decode_varint(pos_lens)
    deltas = decode_varint(pos_deltas)
    if deltas.size == 0:
        return lens, deltas
    c = np.cumsum(deltas)
    starts = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    nzmask = lens > 0
    nz = starts[nzmask]
    base = np.zeros(lens.size, dtype=np.int64)
    base[nzmask] = np.where(nz > 0, c[nz - 1], 0)
    flat = c - np.repeat(base, lens)
    return lens, flat


def bm25_tfnorm(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
                k1: float, b: float) -> np.ndarray:
    """tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) in float64 — identical
    formula to the Column expression in fulltext.analysis and to the
    DuckDB oracle, so all three paths agree bit-for-bit-ish (<1e-12)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_idf(df: float, n_docs: float) -> float:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — Lucene BM25Similarity."""
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


# ------------------------------------------------------------- id bitsets
# Per-(term, block) doc-id BITSET: bit i set <=> doc (block_base + i)
# carries the term.  Little-endian bit order, truncated after the last
# set bit (a rare term costs ~1 byte, a dense block block_range/8).
# This is the roaring-style membership sidecar the serving tier's
# count()/boolean set ops run on: union/intersection are uint8
# bitwise ops + a popcount table — postings (tfs/dls/positions) are
# never varint-decoded just to COUNT hits.  The reference's count RPC
# similarly reads totalHits without materializing hits
# (katta-core lib/lucene/LuceneServer.java:768-773).

_POPCNT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1, bitorder="little"
).sum(axis=1).astype(np.int64)


def encode_id_bits(doc_ids: np.ndarray, block_base: int) -> bytes:
    """Pack block-local doc offsets (doc_ids - block_base, each in
    [0, block_range)) into a truncated little-endian bitset."""
    off = np.asarray(doc_ids, dtype=np.int64) - np.int64(block_base)
    if off.size == 0:
        return b""
    nbits = int(off.max()) + 1
    bits = np.zeros(nbits, dtype=np.uint8)
    bits[off] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def decode_id_bits(buf: bytes, block_base: int) -> np.ndarray:
    """Inverse of :func:`encode_id_bits` -> sorted absolute doc_ids."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(b, bitorder="little")
    return np.nonzero(bits)[0].astype(np.int64) + np.int64(block_base)


def popcount(arr: np.ndarray) -> int:
    """Total set bits of a uint8 buffer."""
    if arr.size == 0:
        return 0
    return int(_POPCNT[arr].sum())


def bitset_or(bufs: list[bytes], nbytes: int) -> np.ndarray:
    """Union of truncated bitsets into one uint8 array of ``nbytes``."""
    acc = np.zeros(nbytes, dtype=np.uint8)
    for buf in bufs:
        a = np.frombuffer(buf, dtype=np.uint8)
        acc[: a.size] |= a
    return acc


def bitset_and(sets: list[np.ndarray], nbytes: int) -> np.ndarray:
    """Intersection of uint8 bitset arrays (padded to ``nbytes``)."""
    acc = np.zeros(nbytes, dtype=np.uint8)
    first = sets[0]
    acc[: first.size] = first
    for a in sets[1:]:
        if a.size < nbytes:
            acc[a.size:] = 0
        acc[: a.size] &= a
    return acc


def _block_bits(grp, n_terms: int, mode: str, tomb: np.ndarray | None,
                base: int, nbytes: int) -> np.ndarray | None:
    """Live-match bitset of ONE block: per-term union of the block's
    (possibly duplicate, disjoint-subset) rows, AND across terms when
    required, tombstones cleared with one AND-NOT.  None when an AND
    block is missing a term (contributes nothing)."""
    if mode == "and" and n_terms > 1:
        per_term = grp.groupby("term", sort=False)["id_bits"]
        if per_term.ngroups < n_terms:
            return None
        sets = [bitset_or(list(bufs), nbytes) for _, bufs in per_term]
        acc = bitset_and(sets, nbytes)
    else:
        acc = bitset_or(list(grp["id_bits"]), nbytes)
    if tomb is not None and tomb.size:
        lo = np.searchsorted(tomb, base)
        hi = np.searchsorted(tomb, base + nbytes * 8)
        if hi > lo:
            tb = np.frombuffer(
                encode_id_bits(tomb[lo:hi], base), np.uint8
            )
            acc[: tb.size] &= ~tb
    return acc


def bit_count_frame(pdf, n_terms: int, mode: str,
                    tomb: np.ndarray | None, block_range: int) -> int:
    """Hit count for a (term, block_id, id_bits) frame from the doc-id
    BITSETS alone — union/intersection are uint8 bitwise ops + a
    popcount table; postings (tfs/dls/positions) are never
    varint-decoded just to COUNT (the reference's count RPC likewise
    reads totalHits without materializing hits,
    katta-core lib/lucene/LuceneServer.java:768-773).

    Duplicate (term, block) rows across commits hold DISJOINT doc
    subsets of the same range (commits append past the watermark), so
    the per-term union inside a block is exact; AND requires all
    ``n_terms`` present in the block, else the block contributes 0.
    Tombstones (sorted unique doc_ids) are cleared with one AND-NOT
    per touched block.  Shared by the serving tier (node-local call)
    and the Spark tier (inside the per-block Arrow kernel)."""
    if not len(pdf):
        return 0
    nbytes = block_range // 8
    total = 0
    for blk, grp in pdf.groupby("block_id", sort=False):
        acc = _block_bits(grp, n_terms, mode, tomb,
                          int(blk) * block_range, nbytes)
        if acc is not None:
            total += popcount(acc)
    return total


def bit_matched_frame(pdf, n_terms: int, mode: str,
                      tomb: np.ndarray | None,
                      block_range: int) -> np.ndarray:
    """Sorted live matching doc_ids for a (term, block_id, id_bits)
    frame from the BITSETS alone — the membership analogue of
    :func:`bit_count_frame`.  Every stored-field surface that starts
    from a non-scoring match set (field sort, facet, range facet,
    stats, pivot) can take its ids from here without varint-decoding
    tfs/dls: union/intersect the block bitsets, unpack the surviving
    bits to absolute ids.  Same block algebra as the count path
    (duplicate commit rows union per term; AND needs all terms in the
    block; tombstones AND-NOT)."""
    if not len(pdf):
        return np.empty(0, dtype=np.int64)
    nbytes = block_range // 8
    out = []
    for blk, grp in pdf.groupby("block_id", sort=False):
        base = int(blk) * block_range
        acc = _block_bits(grp, n_terms, mode, tomb, base, nbytes)
        if acc is None:
            continue
        bits = np.unpackbits(acc, bitorder="little")
        ids = np.nonzero(bits)[0].astype(np.int64) + np.int64(base)
        if ids.size:
            out.append(ids)
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(out))
