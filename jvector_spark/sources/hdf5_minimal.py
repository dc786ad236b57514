"""Minimal pure-python HDF5 reader/writer for ann-benchmarks layouts.

Reference mapping: jvector-examples/.../util/Hdf5Loader.java:87 loads
ann-benchmarks datasets (HDF5 files with root-level 2-D datasets named
'train'/'test'/'neighbors'/'distances'). This container ships no h5py, so
this module implements the SUBSET of the public HDF5 file format
(https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html) that h5py emits for
exactly that shape with `libver='earliest'` defaults and no compression:

  * superblock version 0, offsets/lengths 8 bytes;
  * old-style root group: symbol-table message -> v1 B-tree + local heap
    -> SNOD symbol nodes;
  * version-1 object headers (with continuation blocks);
  * dataspace v1 (simple, any rank), datatype class 0 (fixed-point) and
    class 1 (IEEE float), little-endian, 1/2/4/8-byte widths;
  * data layout v3 class 1 (contiguous) — ann-benchmarks datasets are
    typically written uncompressed/contiguous;
  * data layout v3 class 2 (chunked, UNfiltered) — `h5py ... chunks=...`
    without a compression filter: the chunk v1 B-tree (node type 1) is
    walked and edge-padded chunks are assembled into the full array.

Anything outside that subset (filtered/compressed chunks, compact
layout, v2 superblocks, dense-link groups, big-endian types) raises a
clear error naming the unsupported feature rather than mis-parsing.

The writer exists so the loader is testable in-container AND as the
export path for recall fixtures; it emits the same subset (checked
byte-level against the reader, round-trip property in test_vecfiles).
"""

from __future__ import annotations

import struct

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------- reader


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf

    def u(self, off: int, n: int) -> int:
        return int.from_bytes(self.b[off:off + n], "little")

    def datasets(self) -> dict[str, dict]:
        if self.b[:8] != _SIG:
            raise ValueError("not an HDF5 file (bad signature)")
        ver = self.b[8]
        if ver != 0:
            raise ValueError(f"unsupported HDF5 superblock version {ver} "
                             "(only v0 — h5py libver='earliest')")
        size_off, size_len = self.b[13], self.b[14]
        if (size_off, size_len) != (8, 8):
            raise ValueError("unsupported offset/length sizes")
        # v0 superblock: 24 bytes fixed fields, 4 addresses (base, free
        # space, EOF, driver info), then the root group symbol-table
        # entry: link-name-offset(8) object-header-addr(8) ...
        root_hdr = self.u(56 + 8, 8)
        msgs = self._object_header(root_hdr)
        st = [m for t, m in msgs if t == 0x0011]
        if not st:
            raise ValueError("root group has no symbol-table message "
                             "(dense-link groups unsupported)")
        btree_addr = int.from_bytes(st[0][0:8], "little")
        heap_addr = int.from_bytes(st[0][8:16], "little")
        out = {}
        for name, hdr_addr in self._walk_btree(btree_addr, heap_addr):
            out[name] = self._parse_dataset(hdr_addr)
        return out

    def _object_header(self, addr: int) -> list[tuple[int, bytes]]:
        """v1 object header -> [(msg_type, raw_body)], following
        continuation messages (type 0x0010)."""
        if self.b[addr] != 1:
            raise ValueError(f"unsupported object header version "
                             f"{self.b[addr]} at {addr} (only v1)")
        nmsg = self.u(addr + 2, 2)
        hsize = self.u(addr + 8, 4)
        blocks = [(addr + 16, hsize)]
        msgs: list[tuple[int, bytes]] = []
        bi = 0
        while bi < len(blocks) and len(msgs) < nmsg:
            off, remaining = blocks[bi]
            bi += 1
            while remaining >= 8 and len(msgs) < nmsg:
                mtype = self.u(off, 2)
                msize = self.u(off + 2, 2)
                body = self.b[off + 8: off + 8 + msize]
                if mtype == 0x0010:  # continuation: (offset, length)
                    blocks.append((int.from_bytes(body[0:8], "little"),
                                   int.from_bytes(body[8:16], "little")))
                else:
                    msgs.append((mtype, body))
                step = 8 + msize
                off += step
                remaining -= step
        return msgs

    def _heap_str(self, heap_data: int, off: int) -> str:
        end = self.b.index(b"\x00", heap_data + off)
        return self.b[heap_data + off:end].decode()

    def _walk_btree(self, btree_addr: int, heap_addr: int):
        if self.b[heap_addr:heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        heap_data = self.u(heap_addr + 24, 8)
        stack = [btree_addr]
        while stack:
            addr = stack.pop()
            if self.b[addr:addr + 4] != b"TREE":
                raise ValueError("bad B-tree signature")
            level = self.b[addr + 5]
            n = self.u(addr + 6, 2)
            # entries: key0(len=8) child0 key1 child1 ... at addr+24
            # (after signature, type, level, entries, left+right siblings)
            p = addr + 8 + 16
            children = [self.u(p + 8 + i * 16, 8) for i in range(n)]
            if level > 0:
                stack.extend(children)
                continue
            for snod in children:
                if self.b[snod:snod + 4] != b"SNOD":
                    raise ValueError("bad symbol node signature")
                nsym = self.u(snod + 6, 2)
                for i in range(nsym):
                    e = snod + 8 + i * 40
                    name_off = self.u(e, 8)
                    hdr = self.u(e + 8, 8)
                    yield self._heap_str(heap_data, name_off), hdr

    def _walk_chunk_btree(self, addr: int, ndims: int):
        """Walk a v1 B-tree of node type 1 (raw data chunks), yielding
        (dim_offsets, chunk_addr, stored_nbytes, filter_mask) per chunk.
        Keys are 8 (size+mask) + 8*ndims bytes; the trailing
        greater-than-all key after the last child is skipped."""
        keysize = 8 + 8 * ndims
        stack = [addr]
        while stack:
            a = stack.pop()
            if self.b[a:a + 4] != b"TREE":
                raise ValueError("bad chunk B-tree signature")
            ntype, level = self.b[a + 4], self.b[a + 5]
            if ntype != 1:
                raise ValueError("chunk index is not a raw-data-chunk "
                                 f"B-tree (node type {ntype})")
            n = self.u(a + 6, 2)
            p = a + 24
            for i in range(n):
                koff = p + i * (keysize + 8)
                child = self.u(koff + keysize, 8)
                if level > 0:
                    stack.append(child)
                else:
                    yield ([self.u(koff + 8 + 8 * j, 8)
                            for j in range(ndims)],
                           child, self.u(koff, 4), self.u(koff + 4, 4))

    def _parse_dataset(self, hdr_addr: int) -> dict:
        dims = dtype = None
        data_addr = data_size = None
        chunk_btree = chunk_dims = None
        for mtype, body in self._object_header(hdr_addr):
            if mtype == 0x0001:  # dataspace
                if body[0] != 1:
                    raise ValueError("unsupported dataspace version")
                rank, flags = body[1], body[2]
                p = 8
                dims = [int.from_bytes(body[p + 8 * i:p + 8 * i + 8],
                                       "little") for i in range(rank)]
            elif mtype == 0x0003:  # datatype
                cls_ver = body[0]
                cls, ver = cls_ver & 0x0F, cls_ver >> 4
                bits0 = body[1]
                if bits0 & 1:
                    raise ValueError("big-endian datatypes unsupported")
                size = int.from_bytes(body[4:8], "little")
                if cls == 0:
                    signed = bool(body[1] & 0x08)
                    dtype = np.dtype(f"<{'i' if signed else 'u'}{size}")
                elif cls == 1:
                    dtype = np.dtype(f"<f{size}")
                else:
                    raise ValueError(f"unsupported datatype class {cls} "
                                     "(only fixed-point/float)")
            elif mtype == 0x0008:  # data layout
                if body[0] != 3:
                    raise ValueError("unsupported layout version "
                                     f"{body[0]} (only v3)")
                if body[1] == 1:  # contiguous
                    data_addr = int.from_bytes(body[2:10], "little")
                    data_size = int.from_bytes(body[10:18], "little")
                elif body[1] == 2:  # chunked: ndims, btree addr, chunk dims
                    ndims = body[2]  # dataset rank + 1 (element-size dim)
                    chunk_btree = int.from_bytes(body[3:11], "little")
                    chunk_dims = [
                        int.from_bytes(body[11 + 4 * i:15 + 4 * i],
                                       "little") for i in range(ndims)]
                else:
                    raise ValueError(f"unsupported layout class {body[1]} "
                                     "(only contiguous/chunked — compact "
                                     "unsupported)")
            elif mtype == 0x000B:  # filter pipeline
                raise ValueError("filtered (compressed) chunked data "
                                 "unsupported — rewrite without filters "
                                 "or use h5py")
        if dims is None or dtype is None or (
                data_addr is None and chunk_btree is None):
            raise ValueError("dataset header missing dataspace/datatype/"
                             "layout message")
        return {"shape": tuple(dims), "dtype": dtype,
                "addr": data_addr, "nbytes": data_size,
                "chunk_btree": chunk_btree, "chunk_dims": chunk_dims}


def read_hdf5(path: str, dataset: str | None = None):
    """Read one dataset (or list names when dataset=None) from an
    ann-benchmarks-style HDF5 file — pure python/numpy, no h5py."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    dsets = r.datasets()
    if dataset is None:
        return sorted(dsets)
    if dataset not in dsets:
        raise KeyError(f"dataset {dataset!r} not in file "
                       f"(has: {sorted(dsets)})")
    d = dsets[dataset]
    n = int(np.prod(d["shape"])) if d["shape"] else 1
    if d["chunk_btree"] is not None:
        return _assemble_chunked(r, buf, d)
    if d["addr"] == _UNDEF:
        return np.zeros(d["shape"], d["dtype"])
    arr = np.frombuffer(buf, dtype=d["dtype"], count=n, offset=d["addr"])
    return arr.reshape(d["shape"]).copy()


def _assemble_chunked(r: _Reader, buf: bytes, d: dict) -> np.ndarray:
    """Gather an unfiltered chunked dataset: every stored chunk is a
    full chunk-shaped block (edge chunks zero-padded by the writer), so
    each is clipped to the dataset bounds and scattered into place."""
    shape, dtype = d["shape"], d["dtype"]
    cdims = d["chunk_dims"][:-1]  # drop the trailing element-size dim
    if len(cdims) != len(shape):
        raise ValueError("chunk rank does not match dataspace rank")
    out = np.zeros(shape, dtype)
    per_chunk = int(np.prod(cdims)) if cdims else 1
    if d["chunk_btree"] == _UNDEF:  # no chunks ever written
        return out
    for offs, addr, nbytes, fmask in r._walk_chunk_btree(
            d["chunk_btree"], len(d["chunk_dims"])):
        if fmask:
            raise ValueError("chunk has filtered lanes (filter mask "
                             f"{fmask:#x}) — compression unsupported")
        if nbytes != per_chunk * dtype.itemsize:
            raise ValueError("stored chunk size mismatch (filtered or "
                             "torn chunk)")
        block = np.frombuffer(buf, dtype, count=per_chunk,
                              offset=addr).reshape(cdims)
        dst = tuple(slice(o, min(o + c, s))
                    for o, c, s in zip(offs[:-1], cdims, shape))
        src = tuple(slice(0, sl.stop - sl.start) for sl in dst)
        out[dst] = block[src]
    return out


# ---------------------------------------------------------------- writer


def _dataspace_msg(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBB5x", 1, len(shape), 0)
    for s in shape:
        body += struct.pack("<Q", s)
    return body


def _datatype_msg(dtype: np.dtype) -> bytes:
    if dtype.kind == "f":
        # class 1 v1; bit field: LE, lo-pad 0, hi-pad 0, mantissa norm 2
        # (msb set, not stored), sign location byte
        bits = dtype.itemsize * 8
        if dtype.itemsize == 4:
            exp_loc, exp_sz, man_sz, bias, sign = 23, 8, 23, 127, 31
        elif dtype.itemsize == 8:
            exp_loc, exp_sz, man_sz, bias, sign = 52, 11, 52, 1023, 63
        else:
            raise ValueError("only f4/f8 supported")
        head = struct.pack("<BBBBI", 0x11, 0x20, sign, 0, dtype.itemsize)
        props = struct.pack("<HHBBBBI", 0, bits, exp_loc, exp_sz, 0,
                            man_sz, bias)
        return head + props
    if dtype.kind in "iu":
        head = struct.pack("<BBBBI", 0x10,
                           0x08 if dtype.kind == "i" else 0x00, 0, 0,
                           dtype.itemsize)
        props = struct.pack("<HH", 0, dtype.itemsize * 8)
        return head + props
    raise ValueError(f"unsupported dtype {dtype}")


def _layout_msg(addr: int, nbytes: int) -> bytes:
    return struct.pack("<BBQQ", 3, 1, addr, nbytes)


def _chunked_layout_msg(btree_addr: int, cdims: tuple[int, ...],
                        itemsize: int) -> bytes:
    # v3 class 2: dimensionality counts the trailing element-size dim
    body = struct.pack("<BBBQ", 3, 2, len(cdims) + 1, btree_addr)
    for c in cdims:
        body += struct.pack("<I", c)
    return body + struct.pack("<I", itemsize)


def _chunk_starts(shape: tuple[int, ...],
                  cdims: tuple[int, ...]) -> list[tuple[int, ...]]:
    """Chunk origin coordinates in row-major order — ascending key
    order, the v1 B-tree invariant."""
    import itertools
    return list(itertools.product(
        *[range(0, max(s, 1), c) for s, c in zip(shape, cdims)]))


def _msg(mtype: int, body: bytes) -> bytes:
    pad = (-len(body)) % 8
    return struct.pack("<HHB3x", mtype, len(body) + pad, 0) + body + b"\x00" * pad


def _object_header(messages: list[bytes]) -> bytes:
    body = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body


def write_hdf5(path: str, datasets: dict[str, np.ndarray],
               chunks: dict[str, tuple[int, ...]] | None = None) -> None:
    """Write root-level datasets in the reader's subset (superblock v0,
    v1 headers, symbol-table group, little-endian data). Datasets named
    in `chunks` are written with layout v3 class 2 — unfiltered chunks
    of the given shape indexed by a type-1 v1 B-tree, edge chunks
    zero-padded to full chunk size, exactly as libhdf5 stores
    `chunks=..., compression=None` — so the chunked read path is
    round-trip testable without h5py in the container."""
    chunks = dict(chunks or {})
    names = sorted(datasets)
    arrays = {n: np.ascontiguousarray(datasets[n]) for n in names}
    for n, a in arrays.items():
        if a.dtype.byteorder == ">":
            arrays[n] = a.astype(a.dtype.newbyteorder("<"))
    for n, cd in chunks.items():
        if n not in arrays:
            raise KeyError(f"chunks given for unknown dataset {n!r}")
        if (len(cd) != arrays[n].ndim
                or any(int(c) <= 0 for c in cd)):
            raise ValueError(f"chunk shape {cd} invalid for dataset "
                             f"{n!r} of rank {arrays[n].ndim}")
        chunks[n] = tuple(int(c) for c in cd)

    # ---- local heap: name strings, 8-aligned, offset 0 reserved ("")
    heap_entries = b"\x00" * 8
    name_offs = {}
    for n in names:
        name_offs[n] = len(heap_entries)
        raw = n.encode() + b"\x00"
        heap_entries += raw + b"\x00" * ((-len(raw)) % 8)
    # tail free block is 16 bytes (8-byte next-offset + 8-byte size, and
    # per spec `size` counts the block itself) — reserving only 8 would
    # let the size field spill into the next allocation (the SNOD), and
    # conforming readers that walk the free list would reject the heap
    heap_data_size = len(heap_entries) + 16

    # ---- layout plan (addresses assigned in file order)
    pos = 96  # superblock v0 with 8-byte offsets is 96 bytes

    def take(nbytes: int, align: int = 8) -> int:
        nonlocal pos
        pos += (-pos) % align
        start = pos
        pos += nbytes
        return start

    # dataset object headers come first (sizes known up front — the
    # chunked layout msg has the same size with a placeholder address)
    ds_hdr_sizes = {}
    for n in names:
        a = arrays[n]
        lay = (_chunked_layout_msg(0, chunks[n], a.itemsize)
               if n in chunks else _layout_msg(0, a.nbytes))
        msgs = [_msg(0x0001, _dataspace_msg(a.shape)),
                _msg(0x0003, _datatype_msg(a.dtype)),
                _msg(0x0008, lay)]
        ds_hdr_sizes[n] = 16 + sum(len(m) for m in msgs)
    ds_hdr_addr = {n: take(ds_hdr_sizes[n]) for n in names}
    data_addr = {}
    chunk_plan = {}  # name -> (starts, chunk_addrs, btree_addr)
    for n in names:
        a = arrays[n]
        if n not in chunks:
            data_addr[n] = take(max(a.nbytes, 1))
            continue
        cd = chunks[n]
        starts = _chunk_starts(a.shape, cd)
        if len(starts) > 0xFFFF:
            # single-leaf writer: entries-used is a u16 field. The READER
            # walks multi-level trees fine; only this writer is bounded.
            raise ValueError(
                f"dataset {n!r} would need {len(starts)} chunks — this "
                "writer emits one B-tree leaf (max 65535); use larger "
                "chunks")
        per_bytes = int(np.prod(cd)) * a.itemsize
        caddrs = [take(max(per_bytes, 1)) for _ in starts]
        keysize = 8 + 8 * (a.ndim + 1)
        bt = take(24 + len(starts) * (keysize + 8) + keysize)
        chunk_plan[n] = (starts, caddrs, bt)
    heap_hdr = take(32)
    heap_data = take(heap_data_size)
    snod = take(8 + 40 * max(len(names), 1))
    btree = take(24 + 16 + 8)  # header + 2 keys + 1 child
    root_hdr_msgs = [_msg(0x0011, struct.pack("<QQ", btree, heap_hdr))]
    root_hdr = take(16 + sum(len(m) for m in root_hdr_msgs))
    eof = pos

    out = bytearray(eof)

    def put(addr: int, data: bytes) -> None:
        out[addr:addr + len(data)] = data

    # superblock v0
    sb = _SIG + struct.pack("<BBBBBBBxHHI", 0, 0, 0, 0, 0, 8, 8, 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    # root symbol-table entry: name off 0, header addr, cached stab
    sb += struct.pack("<QQII", 0, root_hdr, 1, 0)
    sb += struct.pack("<QQ", btree, heap_hdr)  # scratch: cached btree+heap
    put(0, sb)

    for n in names:
        a = arrays[n]
        if n in chunks:
            starts, caddrs, bt = chunk_plan[n]
            cd = chunks[n]
            lay = _chunked_layout_msg(bt, cd, a.itemsize)
            per_bytes = int(np.prod(cd)) * a.itemsize
            ent = b""
            for st, caddr in zip(starts, caddrs):
                block = np.zeros(cd, a.dtype)
                dst = tuple(slice(o, min(o + c, s))
                            for o, c, s in zip(st, cd, a.shape))
                block[tuple(slice(0, sl.stop - sl.start)
                            for sl in dst)] = a[dst]
                put(caddr, block.tobytes())
                key = struct.pack("<II", per_bytes, 0)
                key += b"".join(struct.pack("<Q", o) for o in st)
                key += struct.pack("<Q", 0)  # element-size dim offset
                ent += key + struct.pack("<Q", caddr)
            # greater-than-all key: first chunk origin past the data
            over = [((s + c - 1) // c) * c for s, c in zip(a.shape, cd)]
            ent += struct.pack("<II", per_bytes, 0)
            ent += b"".join(struct.pack("<Q", o) for o in over)
            ent += struct.pack("<Q", 0)
            put(bt, b"TREE" + struct.pack("<BBHQQ", 1, 0, len(starts),
                                          _UNDEF, _UNDEF) + ent)
        else:
            lay = _layout_msg(data_addr[n], a.nbytes)
            put(data_addr[n], a.tobytes())
        msgs = [_msg(0x0001, _dataspace_msg(a.shape)),
                _msg(0x0003, _datatype_msg(a.dtype)),
                _msg(0x0008, lay)]
        put(ds_hdr_addr[n], _object_header(msgs))

    # local heap: header + data (free block at tail, head offset = used)
    put(heap_hdr, b"HEAP" + struct.pack("<B3xQQQ", 0, heap_data_size,
                                        len(heap_entries), heap_data))
    put(heap_data, heap_entries
        + struct.pack("<QQ", 1, heap_data_size - len(heap_entries)))

    # SNOD: entries must be in increasing NAME order (B-tree invariant;
    # `names` is sorted)
    ent = b""
    for n in names:
        ent += struct.pack("<QQII16x", name_offs[n], ds_hdr_addr[n], 0, 0)
    put(snod, b"SNOD" + struct.pack("<BxH", 1, len(names)) + ent)

    # B-tree v1: one leaf pointing at the single SNOD; key0 = offset of
    # name < all (0 = ""), key1 = offset of the LAST name (max key)
    key1 = name_offs[names[-1]] if names else 0
    put(btree, b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, _UNDEF, _UNDEF)
        + struct.pack("<QQQ", 0, snod, key1))

    put(root_hdr, _object_header(root_hdr_msgs))

    with open(path, "wb") as f:
        f.write(bytes(out))
