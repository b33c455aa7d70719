"""Minimal pure-Python HDF5 writer — the inverse of
:mod:`sed_binning_spark.io.hdf5_read` for the engine's own outputs.

Writes classic (superblock v0) files limited to what the cube sink and
the reader's fixture tests need: nested groups (v1 B-tree + local heap +
SNOD symbol tables), CONTIGUOUS datasets of native numeric, fixed-length
string, or COMPOUND (structured, incl. array members) type, soft links
(symbol-table cache type 2), and numeric / string attributes. Datasets default to uncompressed contiguous — the
cubes this serializes are driver-sized, and the simple layout keeps every
structure inside the subset the companion reader (and libhdf5) understands.
``add_dataset(chunks=...)`` opts into CHUNKED layout-v4 messages (fixed
array / extensible array / v2 B-tree / single chunk / implicit indexes,
optional per-chunk deflate) — fixture surface for the reader's
"latest"-format chunk-index paths, covering all five index types the
format defines.

``dense_links=True`` / ``dense_attrs=True`` switch groups and attribute
sets to the post-1.8 DENSE layout (fractal heap 'FRHP'/'FHDB'/'FHIB' +
name-index v2 B-tree 'BTHD'/'BTIN'/'BTLF', format spec III.A.2/III.G) —
the layout h5py emits once a group exceeds its compact-storage phase
thresholds. Name hashes and node checksums are Jenkins lookup3, matching
libhdf5's H5_checksum_lookup3. Primary use: spec-built fixtures for the
reader's dense-storage path, since this container has no h5py.
"""

from __future__ import annotations

import struct

import numpy as np

from sed_binning_spark.io.hdf5_read import (
    _grid_coords,
    _min_bytes,
    jenkins_lookup3,
)

UNDEF = 0xFFFFFFFFFFFFFFFF


def _msb_bitpack(fields: np.ndarray, nbits: int) -> bytes:
    """Pack ``fields`` (uint64) as consecutive ``nbits``-wide bit fields,
    MSB first — the stream layout of the n-bit and scale-offset filters
    (the encode half of hdf5_read._unpack_bit_fields)."""
    if nbits == 0:
        return b""
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint64)
    bits = ((fields[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _nbit_encode(raw: bytes, dtype: np.dtype, precision: int, offset: int) -> bytes:
    """The n-bit filter's compress half (H5Znbit.c, atomic class, LE):
    each element's ``precision``-bit span at bit ``offset``, packed
    MSB-first."""
    size = dtype.itemsize
    if precision == 0 or precision + offset > size * 8:
        raise ValueError(
            f"n-bit precision {precision} + offset {offset} exceeds the "
            f"{size * 8}-bit element",
        )
    vals = np.frombuffer(raw, dtype=f"<u{size}").astype(np.uint64)
    if precision + offset < size * 8 and bool(
        (vals >> np.uint64(precision + offset)).any(),
    ) or offset and bool((vals & np.uint64((1 << offset) - 1)).any()):
        # bits outside the declared span would be silently dropped —
        # refuse loudly instead of writing a corrupted chunk
        raise ValueError(
            f"n-bit data has significant bits outside the declared "
            f"[{offset}, {offset + precision}) span",
        )
    span = (vals >> np.uint64(offset)) & np.uint64((1 << precision) - 1)
    return _msb_bitpack(span, precision)


def _scaleoffset_encode(raw: bytes, dtype: np.dtype, scale_factor: int) -> bytes:
    """The scale-offset filter's compress half (H5Zscaleoffset.c, LE,
    fill undefined): 21-byte header (minbits, minval size, minval) +
    ``value − min`` fields at minbits bits. Integers scale-type
    H5Z_SO_INT; floats D-scale (llround(v·10^D))."""
    size = dtype.itemsize
    if dtype.kind == "f":
        v = np.frombuffer(raw, dtype).astype(np.float64)
        scaled = np.rint(v * 10.0 ** scale_factor).astype(np.int64)
    else:
        scaled = np.frombuffer(raw, dtype).astype(np.int64)
    mn, mx = int(scaled.min()), int(scaled.max())
    minbits = min((mx - mn).bit_length(), size * 8)
    header = (
        minbits.to_bytes(4, "little") + bytes([8])
        + (mn & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little") + b"\x00" * 8
    )
    if minbits == size * 8:
        # no shrink possible: libhdf5 stores the ORIGINAL buffer verbatim
        # (H5Zscaleoffset.c guards the min-subtraction — and for floats
        # even the int conversion — behind `if (*minbits != sizeof*8)`)
        return header + raw
    transformed = (scaled - mn).astype(np.uint64)
    return header + _msb_bitpack(transformed, minbits)


def _filter_pipeline_entries(pipeline: list, dtype: np.dtype, chunks: tuple):
    """Writer filter specs → ``(filter id, cd_values, encode_fn)`` rows,
    cd_values laid out exactly as libhdf5's set_local callbacks store
    them (what hdf5_read's decoders parse)."""
    import zlib

    nelmts = int(np.prod(chunks)) if chunks else 1
    out = []
    for spec in pipeline:
        kind = spec[0]
        if kind == "deflate":
            level = int(spec[1]) if len(spec) > 1 else 6
            out.append((1, [level],
                        lambda raw, lv=level: zlib.compress(raw, lv)))
        elif kind == "nbit":
            precision = int(spec[1])
            offset = int(spec[2]) if len(spec) > 2 else 0
            cd = [8, 0, nelmts, 1, dtype.itemsize, 0, precision, offset]
            out.append((5, cd,
                        lambda raw, p=precision, o=offset:
                        _nbit_encode(raw, dtype, p, o)))
        elif kind == "scaleoffset":
            sf = int(spec[1]) if len(spec) > 1 else 0
            scale_type = 0 if dtype.kind == "f" else 2
            cls = 1 if dtype.kind == "f" else 0
            sign = 1 if dtype.kind == "i" else 0
            cd = [scale_type, sf, nelmts, cls, dtype.itemsize, sign, 0, 0]
            out.append((6, cd,
                        lambda raw, s=sf: _scaleoffset_encode(raw, dtype, s)))
        else:
            raise ValueError(f"unknown filter {kind!r}")
    return out

# The superblock advertises group leaf k=4 and internal k=16 (libhdf5's
# defaults); libhdf5 trusts those numbers and reads every SNOD / TREE node
# at its FULL advertised size, so nodes must be emitted padded to exactly
# these sizes and never hold more than 2k entries.
_LEAF_K = 4
_NODE_K = 16
_SNOD_CAP = 2 * _LEAF_K                       # max symbols per SNOD
_SNOD_SIZE = 8 + _SNOD_CAP * 40               # header + 2k symbol entries
_TREE_CAP = 2 * _NODE_K                       # max children per TREE node
_TREE_SIZE = 24 + (_TREE_CAP + 1) * 8 + _TREE_CAP * 8  # hdr + keys + children


class H5Writer:
    """Build an in-memory tree with :meth:`add_dataset` / :meth:`add_attr`
    (paths are '/'-separated; intermediate groups auto-create), then
    :meth:`write` the file."""

    def __init__(self, *, dense_links: bool = False,
                 dense_attrs: bool = False) -> None:
        self._root: dict = {"__kind__": "group", "__attrs__": {}, "__children__": {}}
        self._dense_links = dense_links
        self._dense_attrs = dense_attrs

    # -- tree building ------------------------------------------------------
    def _group(self, parts: list[str], create: bool = True) -> dict:
        node = self._root
        for p in parts:
            kids = node["__children__"]
            if p not in kids:
                if not create:
                    raise KeyError(p)
                kids[p] = {"__kind__": "group", "__attrs__": {}, "__children__": {}}
            node = kids[p]
            if node["__kind__"] != "group":
                raise ValueError(f"{p!r} is a dataset, not a group")
        return node

    def add_group(self, path: str) -> None:
        self._group([p for p in path.strip("/").split("/") if p])

    def add_dataset(self, path: str, data, *, chunks: tuple | None = None,
                    chunk_index: str = "fixed", deflate: bool = False,
                    filters: list | None = None,
                    committed_dtype: str | None = None) -> None:
        """``chunks`` switches the dataset to a CHUNKED layout-v4 message
        (the post-1.10 "latest" format) indexed by ``chunk_index``:
        "fixed" (fixed array, libhdf5's default for fixed-shape chunked
        data), "single" (one chunk covering the whole dataset), or
        "implicit" (chunks contiguous in C grid order — no filters by
        spec). ``deflate`` zlib-compresses each chunk; ``filters`` is
        the general pipeline form — a list applied in order, each entry
        ``("deflate", level=6)``, ``("nbit", precision, offset=0)``, or
        ``("scaleoffset", scale_factor=0)`` (integer or float D-scale
        by dtype; fill treated as undefined) — recorded as the 0x000B
        filter-pipeline message. ``committed_dtype`` names a type
        committed via :meth:`add_committed_datatype`; the dataset's
        datatype message is then a shared reference to it (the type
        must match the data)."""
        parts = [p for p in path.strip("/").split("/") if p]
        parent = self._group(parts[:-1])
        arr = _as_h5_array(data)
        pipeline = list(filters or [])
        if deflate:
            pipeline.append(("deflate",))
        for spec in pipeline:
            if spec[0] not in ("deflate", "nbit", "scaleoffset"):
                raise ValueError(f"unknown filter {spec[0]!r}")
        if chunks is not None:
            chunks = tuple(int(c) for c in chunks)
            if len(chunks) != arr.ndim or any(c < 1 for c in chunks):
                raise ValueError(f"chunks {chunks} do not fit rank-{arr.ndim}")
            if chunk_index not in ("fixed", "single", "implicit",
                                   "extensible", "btree2"):
                raise ValueError(f"unknown chunk index {chunk_index!r}")
            if chunk_index == "single" and any(
                c < s for c, s in zip(chunks, arr.shape)
            ):
                raise ValueError("single-chunk index needs one covering chunk")
            if chunk_index == "implicit" and pipeline:
                raise ValueError("implicit indexing forbids filters (spec)")
        elif pipeline:
            raise ValueError("filters require a chunked layout")
        parent["__children__"][parts[-1]] = {
            "__kind__": "dataset", "__attrs__": {}, "__data__": arr,
            "__chunks__": chunks, "__index__": chunk_index,
            "__filters__": pipeline, "__committed__": committed_dtype,
        }

    def add_committed_datatype(self, path: str, dtype) -> None:
        """Commit a named datatype at ``path`` (an object header holding
        only the datatype message — what ``h5py.File[...] = np.dtype``
        produces). Datasets created with ``committed_dtype=path`` then
        carry a SHARED datatype message (v3 type 2: the address of this
        object header) instead of an inline definition."""
        parts = [p for p in path.strip("/").split("/") if p]
        parent = self._group(parts[:-1])
        parent["__children__"][parts[-1]] = {
            "__kind__": "named_dtype", "__attrs__": {},
            "__dtype__": np.dtype(dtype), "__path__": "/" + "/".join(parts),
        }

    def add_externallink(self, path: str, file: str, target: str) -> None:
        """External link at ``path`` into another FILE's object (H5L link
        type 64). Only dense-link groups can carry it (classic
        symbol-table groups have no link-message storage — libhdf5 has
        the same constraint pre-1.8), so construct the writer with
        ``dense_links=True``."""
        if not self._dense_links:
            raise ValueError(
                "external links need link-message storage: construct "
                "H5Writer(dense_links=True)",
            )
        parts = [p for p in path.strip("/").split("/") if p]
        parent = self._group(parts[:-1])
        parent["__children__"][parts[-1]] = {
            "__kind__": "extlink", "__file__": file, "__target__": target,
        }

    def add_softlink(self, path: str, target: str) -> None:
        """Symbolic link at ``path`` pointing at ``target`` (absolute or
        relative HDF5 path) — classic symbol-table form: cache type 2,
        undefined header address, target string in the local heap."""
        parts = [p for p in path.strip("/").split("/") if p]
        parent = self._group(parts[:-1])
        parent["__children__"][parts[-1]] = {
            "__kind__": "softlink", "__target__": target,
        }

    def add_attr(self, path: str, name: str, value) -> None:
        # validate the serialized size NOW: the v1 object-header message
        # length field is uint16, so an attribute body past 64 KiB would
        # otherwise surface only at write() time as an opaque struct.error
        # with no hint which attribute overflowed
        nbytes = len(_attribute(name, value))
        if nbytes + (-nbytes % 8) > 0xFFFF:
            raise ValueError(
                f"attribute {name!r} at {path!r} serializes to {nbytes} "
                "bytes, over the 64 KiB HDF5 v1 header-message limit — "
                "store large arrays as a dataset instead",
            )
        parts = [p for p in path.strip("/").split("/") if p]
        node = self._root
        for p in parts:
            node = node["__children__"][p]
        node["__attrs__"][name] = value

    # -- serialization ------------------------------------------------------
    def write(self, path: str) -> None:
        buf = bytearray(96)  # superblock v0 + root symbol-table entry
        # committed datatypes are emitted FIRST so datasets referencing
        # them already know the target object-header addresses
        self._dtype_addrs: dict[str, int] = {}
        self._emit_named_dtypes(buf, self._root)
        root_addr = self._emit(buf, self._root)
        # superblock
        struct.pack_into(
            "<8s4B4B2HI", buf, 0, b"\x89HDF\r\n\x1a\n",
            0, 0, 0, 0,      # superblock/freespace/root-symtab versions + reserved
            0, 8, 8, 0,      # shared-header version, offsets, lengths, reserved
            4, 16,           # group leaf k, group internal k
            0,               # consistency flags
        )
        struct.pack_into("<QQQQ", buf, 24, 0, UNDEF, len(buf), UNDEF)
        # root symbol-table entry: name offset 0, header addr, no cache
        struct.pack_into("<QQII16x", buf, 56, 0, root_addr, 0, 0)
        with open(path, "wb") as f:
            f.write(buf)

    def _emit_named_dtypes(self, buf: bytearray, node: dict) -> None:
        if node["__kind__"] == "named_dtype":
            addr = _emit_object_header(
                buf, [(0x0003, _datatype(node["__dtype__"]))],
            )
            node["__addr__"] = addr
            self._dtype_addrs[node["__path__"]] = addr
            return
        for child in node.get("__children__", {}).values():
            self._emit_named_dtypes(buf, child)

    def _emit(self, buf: bytearray, node: dict):
        if node["__kind__"] == "softlink":
            return ("soft", node["__target__"])
        if node["__kind__"] == "extlink":
            return ("ext", node["__file__"], node["__target__"])
        if node["__kind__"] == "named_dtype":
            return node["__addr__"]  # pre-emitted; link like any object
        if node["__kind__"] == "dataset":
            return self._emit_dataset(buf, node)
        children = [
            (name, self._emit(buf, child))
            for name, child in sorted(node["__children__"].items())
        ]
        return self._emit_group(buf, children, node["__attrs__"])

    def _emit_dataset(self, buf: bytearray, node: dict) -> int:
        arr, attrs = node["__data__"], node["__attrs__"]
        chunks = node.get("__chunks__")
        committed = node.get("__committed__")
        if committed:
            cpath = "/" + committed.strip("/")
            addr = self._dtype_addrs.get(cpath)
            if addr is None:
                raise ValueError(
                    f"committed_dtype {committed!r} was never committed "
                    "(add_committed_datatype first)",
                )
            # shared-message reference, version 3 type 2 (committed),
            # header-message flag bit 1 marks the body as shared
            dt_msg = (0x0003, struct.pack("<BBQ", 3, 2, addr), 0x02)
        else:
            dt_msg = (0x0003, _datatype(arr.dtype))
        msgs = [
            (0x0001, _dataspace(arr.shape)),
            dt_msg,
        ]
        if chunks is None:
            _align(buf)
            data_addr = len(buf)
            raw = arr.tobytes()
            buf += raw
            msgs.append((0x0008, struct.pack("<BBQQ", 3, 1, data_addr, len(raw))))
        else:
            msgs += self._emit_chunked(
                buf, arr, chunks, node["__index__"], node["__filters__"],
            )
        msgs += self._attr_msgs(buf, attrs)
        return _emit_object_header(buf, msgs)

    @staticmethod
    def _emit_chunked(
        buf: bytearray, arr: np.ndarray, chunks: tuple,
        index: str, pipeline: list,
    ) -> list[tuple[int, bytes]]:
        """Chunked layout-v4 emission: full-size (edge-padded) chunk
        buffers in C grid order, run through the filter ``pipeline``,
        indexed by a single-chunk message, an implicit contiguous run,
        or a fixed array ('FAHD' + 'FADB', client 1 when filtered).
        Returns the layout (+ filter pipeline) messages."""
        entries = _filter_pipeline_entries(pipeline, arr.dtype, chunks)
        deflate = bool(entries)  # "filtered" for index-flavor purposes
        grid = [-(-s // c) for s, c in zip(arr.shape, chunks)]
        nchunks = int(np.prod(grid)) if grid else 1
        if any(g == 0 for g in grid):
            nchunks = 0
        blobs = []
        for i in range(nchunks):
            offs = _grid_coords(i, grid)
            block = np.zeros(chunks, dtype=arr.dtype)
            sel = tuple(
                slice(o * c, min((o + 1) * c, s))
                for o, c, s in zip(offs, chunks, arr.shape)
            )
            block[tuple(slice(0, s.stop - s.start) for s in sel)] = arr[sel]
            raw = block.tobytes()
            for _fid, _cd, encode in entries:
                raw = encode(raw)
            blobs.append(raw)

        if not blobs:
            # zero-size dataset: no chunks exist; record the index flavor
            # with an undefined address (the reader returns background fill)
            itype, extra = {
                "single": (1, b""),
                "implicit": (2, b""),
                "fixed": (3, bytes([10])),
                "extensible": (4, bytes([_EA_MAX_BITS, _EA_IDX_ELMTS,
                                         _EA_MIN_PTRS, _EA_MIN_ELMTS,
                                         _EA_PAGE_BITS])),
                "btree2": (5, struct.pack("<IBB", 512, 100, 40)),
            }[index]
            index_addr, flags = UNDEF, 0
        elif index == "implicit":  # back-to-back, addresses are arithmetic
            _align(buf)
            base = len(buf)
            for b in blobs:
                buf += b
            index_addr, itype, extra, flags = base, 2, b"", 0
        else:
            addrs = []
            for b in blobs:
                _align(buf)
                addrs.append(len(buf))
                buf += b
            if index == "single":
                itype, flags = 1, 0
                extra = b""
                if deflate:
                    flags = 0x02
                    extra = struct.pack("<QI", len(blobs[0]), 0)
                index_addr = addrs[0]
            elif index == "extensible":
                index_addr, extra = _emit_extensible_array(
                    buf, addrs, blobs, deflate,
                )
                itype, flags = 4, 0
            elif index == "btree2":
                # records in C grid order = lexicographic scaled offsets,
                # the v2 B-tree's chunk sort order
                btype = 11 if deflate else 10
                size_len = _min_bytes(max(len(b) for b in blobs)) \
                    if deflate else 0
                records = []
                for i, (a, b) in enumerate(zip(addrs, blobs)):
                    rec = struct.pack("<Q", a)
                    if deflate:
                        rec += len(b).to_bytes(size_len, "little")
                        rec += struct.pack("<I", 0)
                    for o in _grid_coords(i, grid):
                        rec += struct.pack("<Q", o)
                    records.append(rec)
                index_addr = _emit_v2_btree(
                    buf, btype, len(records[0]), records,
                )
                itype, extra, flags = 5, struct.pack("<IBB", 512, 100, 40), 0
            else:  # fixed array
                client = 1 if deflate else 0
                size_len = _min_bytes(max(len(b) for b in blobs))
                entry_size = 8 if client == 0 else 8 + size_len + 4
                page_bits = 10  # libhdf5's default 1024-element pages

                def fa_entry(i: int) -> bytes:
                    e = struct.pack("<Q", addrs[i])
                    if client == 1:
                        e += len(blobs[i]).to_bytes(size_len, "little")
                        e += struct.pack("<I", 0)  # filter mask
                    return e

                _align(buf)
                index_addr = len(buf)
                buf += b"\x00" * 28  # FAHD placeholder, patched below
                _align(buf)
                dblk = len(buf)
                fadb = bytearray(b"FADB" + bytes([0, client])
                                 + struct.pack("<Q", index_addr))
                page_n = 1 << page_bits
                if nchunks <= page_n:
                    for i in range(nchunks):
                        fadb += fa_entry(i)
                    fadb += struct.pack("<I", jenkins_lookup3(bytes(fadb)))
                    buf += fadb
                else:
                    # paged: the block itself holds only the page bitmap
                    # (all pages initialized); pages follow back-to-back,
                    # each with its own trailing checksum
                    npages = -(-nchunks // page_n)
                    bitmap = bytearray((npages + 7) // 8)
                    for pg in range(npages):
                        # H5VM_bit_set order: bit 0 = the byte's HIGH bit
                        bitmap[pg // 8] |= 0x80 >> (pg % 8)
                    fadb += bitmap
                    fadb += struct.pack("<I", jenkins_lookup3(bytes(fadb)))
                    buf += fadb
                    for pg in range(npages):
                        count = min(page_n, nchunks - pg * page_n)
                        page = bytearray()
                        for i in range(pg * page_n, pg * page_n + count):
                            page += fa_entry(i)
                        page += struct.pack(
                            "<I", jenkins_lookup3(bytes(page)),
                        )
                        buf += page
                fahd = bytearray(b"FAHD" + bytes([0, client, entry_size,
                                                  page_bits]))
                fahd += struct.pack("<QQ", nchunks, dblk)
                fahd += struct.pack("<I", jenkins_lookup3(bytes(fahd)))
                buf[index_addr : index_addr + 28] = fahd
                itype, extra, flags = 3, bytes([page_bits]), 0
        # dimensionality is rank + 1: libhdf5 keeps the datatype size as
        # the trailing chunk "dimension" in v4 exactly as in v3
        body = bytes([4, 2, flags, arr.ndim + 1, 8])
        for c in (*chunks, arr.dtype.itemsize):
            body += struct.pack("<Q", c)
        body += bytes([itype]) + extra + struct.pack("<Q", index_addr)
        msgs = [(0x0008, body)]
        if entries:
            # filter pipeline v2: per filter (id < 256, so no name field)
            # id(2) flags(2) n-cd-values(2) then the u32 client values
            pmsg = bytes([2, len(entries)])
            for fid, cdv, _enc in entries:
                pmsg += struct.pack("<HHH", fid, 0, len(cdv))
                for v in cdv:
                    pmsg += struct.pack("<I", v & 0xFFFFFFFF)
            msgs.append((0x000B, pmsg))
        return msgs

    def _attr_msgs(self, buf: bytearray, attrs: dict) -> list[tuple[int, bytes]]:
        """Attribute messages for an object header: one compact 0x000C per
        attribute, or (``dense_attrs``) a single 0x0015 Attribute Info
        pointing at a fractal heap of version-3 attribute messages keyed
        by a type-8 name-index v2 B-tree."""
        if not (self._dense_attrs and attrs):
            return [(0x000C, _attribute(n, v)) for n, v in attrs.items()]
        bodies = [_attribute_v3(n, v) for n, v in attrs.items()]
        heap_addr, ids = _emit_fractal_heap(buf, bodies, max_heap_bits=40)
        recs = []
        for corder, ((name, _), hid) in enumerate(zip(attrs.items(), ids)):
            h = jenkins_lookup3(name.encode("utf-8"))
            hid8 = hid + b"\x00" * (8 - len(hid))
            recs.append((h, hid8 + b"\x00" + struct.pack("<II", corder, h)))
        recs.sort()
        bt = _emit_v2_btree(buf, 8, 17, [r for _, r in recs])
        return [(0x0015, struct.pack("<BBQQ", 0, 0, heap_addr, bt))]

    def _emit_group_dense(self, buf: bytearray, children, attrs: dict) -> int:
        """New-style dense group: hard/soft link messages live in a fractal
        heap, enumerated through the type-5 (hash, heap ID) name-index
        B-tree; the header carries only the Link Info message."""
        if children:
            bodies = [_link_message(n, a) for n, a in children]
            heap_addr, ids = _emit_fractal_heap(buf, bodies, max_heap_bits=32)
            recs = sorted(
                (jenkins_lookup3(name.encode("utf-8")), hid)
                for (name, _), hid in zip(children, ids)
            )
            record_size = 4 + len(ids[0])
            bt = _emit_v2_btree(
                buf, 5, record_size,
                [struct.pack("<I", h) + hid for h, hid in recs],
            )
            msgs = [(0x0002, struct.pack("<BBQQ", 0, 0, heap_addr, bt))]
        else:
            msgs = [(0x0002, struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF))]
        msgs += self._attr_msgs(buf, attrs)
        return _emit_object_header(buf, msgs)

    def _emit_group(self, buf: bytearray, children, attrs: dict) -> int:
        if self._dense_links:
            return self._emit_group_dense(buf, children, attrs)
        # local heap: offset 0 holds the empty name (the B-tree's low key);
        # names first, then soft-link target strings
        heap_data = bytearray(8)
        offsets = []
        for name, _ in children:
            offsets.append(len(heap_data))
            nb = name.encode("utf-8") + b"\x00"
            heap_data += nb + b"\x00" * (-len(nb) % 8)
        target_offsets = {}
        for _, addr in children:
            if isinstance(addr, tuple) and addr[0] == "soft" \
                    and addr[1] not in target_offsets:
                target_offsets[addr[1]] = len(heap_data)
                tb = addr[1].encode("utf-8") + b"\x00"
                heap_data += tb + b"\x00" * (-len(tb) % 8)
        _align(buf)
        heap_addr = len(buf)
        data_addr = heap_addr + 32
        buf += struct.pack("<4sB3xQQQ", b"HEAP", 0, len(heap_data), 1, data_addr)
        buf += heap_data

        snod_addrs = []
        snod_key_offsets = []  # heap offset of the LAST name in each SNOD
        for i in range(0, len(children), _SNOD_CAP):
            batch = children[i : i + _SNOD_CAP]
            _align(buf)
            snod_addrs.append(len(buf))
            node = bytearray(struct.pack("<4sBxH", b"SNOD", 1, len(batch)))
            for (name, addr), off in zip(batch, offsets[i : i + _SNOD_CAP]):
                if isinstance(addr, tuple) and addr[0] == "soft":
                    node += struct.pack(
                        "<QQIII12x", off, UNDEF, 2, 0,
                        target_offsets[addr[1]],
                    )
                else:
                    node += struct.pack("<QQII16x", off, addr, 0, 0)
            node += b"\x00" * (_SNOD_SIZE - len(node))  # full advertised size
            buf += node
            snod_key_offsets.append(offsets[min(i + _SNOD_CAP, len(children)) - 1])

        if children:
            btree_addr = _emit_group_btree(buf, snod_addrs, snod_key_offsets)
        else:
            btree_addr = UNDEF

        msgs = [(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
        msgs += self._attr_msgs(buf, attrs)
        return _emit_object_header(buf, msgs)


# -- low-level pieces -------------------------------------------------------
def _align(buf: bytearray, n: int = 8) -> None:
    buf += b"\x00" * (-len(buf) % n)


def _emit_group_btree(
    buf: bytearray,
    child_addrs: list[int],
    child_last_keys: list[int],
) -> int:
    """Emit the v1 group B-tree over the SNOD leaf list and return the root
    node address, growing levels until one node covers everything.

    Every node is padded to the full advertised size (internal k=16 →
    544 bytes), holds at most 2k children, and same-level nodes are chained
    through their left/right sibling pointers — the exact on-disk shape
    libhdf5 assumes when it reads nodes whole and iterates leaf chains.
    Keys are local-heap name offsets: node key_0 is the previous sibling
    subtree's last name (0 = the empty name for the leftmost), key_{i+1}
    child i's last name.
    """
    level = 0
    while True:
        node_addrs: list[int] = []
        node_last: list[int] = []
        prev_key = 0
        for i in range(0, len(child_addrs), _TREE_CAP):
            batch_a = child_addrs[i : i + _TREE_CAP]
            batch_k = child_last_keys[i : i + _TREE_CAP]
            _align(buf)
            addr = len(buf)
            node = bytearray(
                struct.pack("<4sBBHQQ", b"TREE", 0, level, len(batch_a), UNDEF, UNDEF),
            )
            node += struct.pack("<Q", prev_key)
            for a, k in zip(batch_a, batch_k):
                node += struct.pack("<QQ", a, k)
            node += b"\x00" * (_TREE_SIZE - len(node))  # full advertised size
            buf += node
            node_addrs.append(addr)
            node_last.append(batch_k[-1])
            prev_key = batch_k[-1]
        for j, a in enumerate(node_addrs):  # sibling chain within the level
            left = node_addrs[j - 1] if j > 0 else UNDEF
            right = node_addrs[j + 1] if j + 1 < len(node_addrs) else UNDEF
            struct.pack_into("<QQ", buf, a + 8, left, right)
        if len(node_addrs) == 1:
            return node_addrs[0]
        child_addrs, child_last_keys = node_addrs, node_last
        level += 1


def _link_message(name: str, addr) -> bytes:
    """Serialized link message (0x0006 wire format, version 1) — the byte
    form dense link storage keeps in its fractal heap. Hard links carry
    the object-header address; soft links the target path."""
    nb = name.encode("utf-8")
    if not 1 <= len(nb) <= 255:
        raise ValueError(f"link name {name!r} must encode to 1-255 bytes")
    if isinstance(addr, tuple) and addr[0] == "soft":
        tb = addr[1].encode("utf-8")
        return (bytes([1, 0x08, 1, len(nb)]) + nb
                + struct.pack("<H", len(tb)) + tb)
    if isinstance(addr, tuple) and addr[0] == "ext":
        # H5L_TYPE_EXTERNAL payload: version/flags byte 0, then
        # file_name\0 + object_path\0
        blob = (b"\x00" + addr[1].encode("utf-8") + b"\x00"
                + addr[2].encode("utf-8") + b"\x00")
        return (bytes([1, 0x08, 64, len(nb)]) + nb
                + struct.pack("<H", len(blob)) + blob)
    return bytes([1, 0x00, len(nb)]) + nb + struct.pack("<Q", addr)


def _attribute_v3(name: str, value) -> bytes:
    """Version-3 attribute message (1-byte charset, unpadded name/datatype/
    dataspace blocks) — the form libhdf5 stores in dense attribute heaps."""
    arr = _as_h5_array(value)
    nb = name.encode("utf-8") + b"\x00"
    dt = _datatype(arr.dtype)
    sp = _dataspace(arr.shape if arr.shape else ())
    return (struct.pack("<BBHHHB", 3, 0, len(nb), len(dt), len(sp), 0)
            + nb + dt + sp + arr.tobytes())


# fractal-heap doubling-table geometry (libhdf5's dense-storage defaults):
# 4 blocks per row, 512-byte starting blocks doubling up to 64 KiB
_FH_WIDTH = 4
_FH_START = 512
_FH_MAX_DIRECT = 65536
_FH_MAX_MANAGED = 4096
_FH_MAX_ROWS = _FH_MAX_DIRECT.bit_length() - _FH_START.bit_length() + 2


def _fh_row_size(row: int) -> int:
    return _FH_START if row < 2 else _FH_START << (row - 1)


def _emit_fractal_heap(
    buf: bytearray, objects: list[bytes], max_heap_bits: int,
) -> tuple[int, list[bytes]]:
    """Emit a managed-object fractal heap holding ``objects`` and return
    (header address, per-object heap IDs). Objects pack greedily into
    consecutive doubling-table direct blocks (objects never span blocks);
    a single starting-size block stays the ROOT DIRECT BLOCK, anything
    more gets a root indirect block whose unused slots are UNDEF. Direct
    blocks are checksummed (header flag 0x02) the way libhdf5 writes
    them: lookup3 over the whole block with the checksum field zeroed."""
    if not objects:
        raise ValueError("fractal heap needs at least one object")
    offset_size = (max_heap_bits + 7) // 8
    length_size = _min_bytes(_FH_MAX_MANAGED)  # reader's sizing rule
    id_len = 1 + offset_size + length_size
    hdr_size = 13 + offset_size + 4  # FHDB header incl. checksum field

    blocks: list[list] = []  # [heap_off, size, [(off_in_block, obj)], cursor]

    def new_block() -> None:
        b = len(blocks)
        row = b // _FH_WIDTH
        if row >= _FH_MAX_ROWS:
            raise ValueError(
                "fractal heap fixture writer: objects exceed the root "
                "indirect block's direct-row capacity",
            )
        heap_off = blocks[-1][0] + blocks[-1][1] if blocks else 0
        blocks.append([heap_off, _fh_row_size(row), [], hdr_size])

    ids: list[bytes] = []
    new_block()
    for obj in objects:
        if len(obj) > _FH_MAX_MANAGED:
            raise ValueError(
                f"heap object of {len(obj)} bytes exceeds the "
                f"{_FH_MAX_MANAGED}-byte managed-object ceiling",
            )
        while blocks[-1][3] + len(obj) > blocks[-1][1]:
            new_block()
        blk = blocks[-1]
        ids.append(
            bytes([0])  # version 0, type 0 (managed)
            + (blk[0] + blk[3]).to_bytes(offset_size, "little")
            + len(obj).to_bytes(length_size, "little"),
        )
        blk[2].append((blk[3], obj))
        blk[3] += len(obj)

    _align(buf)
    hdr_addr = len(buf)
    buf += b"\x00" * 146  # fixed unfiltered header size; patched below
    block_addrs: list[int] = []
    for heap_off, size, items, _cursor in blocks:
        if not items:  # skipped over by a too-big object: never allocated
            block_addrs.append(UNDEF)
            continue
        _align(buf)
        addr = len(buf)
        blk = bytearray(size)
        blk[0:4] = b"FHDB"
        struct.pack_into("<Q", blk, 5, hdr_addr)
        blk[13 : 13 + offset_size] = heap_off.to_bytes(offset_size, "little")
        for off_in, obj in items:
            blk[off_in : off_in + len(obj)] = obj
        struct.pack_into(
            "<I", blk, 13 + offset_size, jenkins_lookup3(bytes(blk)),
        )
        buf += blk
        block_addrs.append(addr)

    if len(blocks) == 1:
        root_addr, root_rows = block_addrs[0], 0
        managed_space = blocks[0][1]
    else:
        nrows = (len(blocks) + _FH_WIDTH - 1) // _FH_WIDTH
        _align(buf)
        root_addr = len(buf)
        fhib = bytearray(
            b"FHIB\x00" + struct.pack("<Q", hdr_addr)
            + (0).to_bytes(offset_size, "little"),
        )
        entries = block_addrs + [UNDEF] * (nrows * _FH_WIDTH - len(blocks))
        for a in entries:
            fhib += struct.pack("<Q", a)
        fhib += struct.pack("<I", jenkins_lookup3(bytes(fhib)))
        buf += fhib
        root_rows = nrows
        managed_space = sum(
            _FH_WIDTH * _fh_row_size(r) for r in range(nrows)
        )

    next_off = blocks[-1][0] + blocks[-1][3]
    hdr = bytearray(146)
    hdr[0:4] = b"FRHP"
    struct.pack_into("<HHB", hdr, 5, id_len, 0, 0x02)
    struct.pack_into("<I", hdr, 10, _FH_MAX_MANAGED)
    struct.pack_into("<QQ", hdr, 14, 0, UNDEF)  # next huge ID, huge B-tree
    struct.pack_into("<QQ", hdr, 30, managed_space - next_off, UNDEF)
    struct.pack_into("<QQ", hdr, 46, managed_space, managed_space)
    struct.pack_into("<QQ", hdr, 62, next_off, len(objects))
    # huge/tiny sizes and counts (offsets 78-110) stay zero
    struct.pack_into("<H", hdr, 110, _FH_WIDTH)
    struct.pack_into("<QQ", hdr, 112, _FH_START, _FH_MAX_DIRECT)
    struct.pack_into("<HH", hdr, 128, max_heap_bits, 1)
    struct.pack_into("<Q", hdr, 132, root_addr)
    struct.pack_into("<H", hdr, 140, root_rows)
    struct.pack_into("<I", hdr, 142, jenkins_lookup3(bytes(hdr[:142])))
    buf[hdr_addr : hdr_addr + 146] = hdr
    return hdr_addr, ids


def _emit_v2_btree(
    buf: bytearray, btype: int, record_size: int, records: list[bytes],
) -> int:
    """Emit a v2 B-tree over pre-sorted fixed-size records and return the
    'BTHD' header address. One leaf when the records fit, else a depth-1
    tree: separator records live in the root internal node, the rest
    split evenly across leaves — the shape libhdf5 builds for dense
    groups up to ~2000 links. Node checksums cover the used prefix."""
    node_size = 512
    leaf_cap = (node_size - 10) // record_size
    nrec_width = _min_bytes(leaf_cap)  # must match the reader's sizing
    if len(records) <= leaf_cap:
        leaves, seps = [records], []
    else:
        k = 2
        while len(records) - (k - 1) > k * leaf_cap:
            k += 1
        int_cap = (node_size - 10 - (8 + nrec_width)) // (
            record_size + 8 + nrec_width
        )
        if k - 1 > int_cap:
            raise ValueError(
                "v2 B-tree fixture writer: record count needs depth > 1",
            )
        n_leaf = len(records) - (k - 1)
        base, extra = divmod(n_leaf, k)
        leaves, seps = [], []
        pos = 0
        for i in range(k):
            take = base + (1 if i < extra else 0)
            leaves.append(records[pos : pos + take])
            pos += take
            if i < k - 1:
                seps.append(records[pos])
                pos += 1

    leaf_addrs = []
    for leaf in leaves:
        _align(buf)
        leaf_addrs.append(len(buf))
        node = bytearray(b"BTLF" + bytes([0, btype])) + b"".join(leaf)
        node += struct.pack("<I", jenkins_lookup3(bytes(node)))
        buf += node + b"\x00" * (node_size - len(node))
    if len(leaves) == 1:
        root_addr, root_nrec, depth = leaf_addrs[0], len(leaves[0]), 0
    else:
        _align(buf)
        root_addr = len(buf)
        node = bytearray(b"BTIN" + bytes([0, btype])) + b"".join(seps)
        for a, leaf in zip(leaf_addrs, leaves):
            node += struct.pack("<Q", a) + len(leaf).to_bytes(
                nrec_width, "little",
            )
        node += struct.pack("<I", jenkins_lookup3(bytes(node)))
        buf += node + b"\x00" * (node_size - len(node))
        root_nrec, depth = len(seps), 1
    _align(buf)
    addr = len(buf)
    hdr = bytearray(struct.pack(
        "<4sBBIHHBB", b"BTHD", 0, btype, node_size, record_size, depth,
        100, 40,  # split / merge percents (libhdf5 defaults)
    ))
    hdr += struct.pack("<QHQ", root_addr, root_nrec, len(records))
    hdr += struct.pack("<I", jenkins_lookup3(bytes(hdr)))
    buf += hdr
    return addr


# extensible-array creation parameters (libhdf5's chunk-index defaults):
# 32-bit element space, 4 elements in the index block, 16-element minimum
# data blocks, 4-pointer minimum super blocks, 1024-element pages
_EA_MAX_BITS = 32
_EA_IDX_ELMTS = 4
_EA_MIN_ELMTS = 16
_EA_MIN_PTRS = 4
_EA_PAGE_BITS = 10


def _emit_extensible_array(
    buf: bytearray, addrs: list[int], blobs: list[bytes], deflate: bool,
) -> tuple[int, bytes]:
    """Emit an extensible-array chunk index over already-written chunks
    and return (EAHD address, the layout message's creation-parameter
    bytes). Mirrors the reader's generation walk: ``idx_elmts`` records
    in the index block, then generation s = 2^(s//2) data blocks of
    ``min_elmts << ((s+1)//2)`` records, generations past
    2*log2(min_ptrs) behind super blocks; unallocated record and pointer
    slots are UNDEF."""
    client = 1 if deflate else 0
    size_len = _min_bytes(max(len(b) for b in blobs)) if deflate else 0
    elt_size = 8 if client == 0 else 12 + size_len
    arr_off_size = (_EA_MAX_BITS + 7) // 8
    nsblks = _EA_MAX_BITS - (_EA_MIN_ELMTS.bit_length() - 1)
    first = 2 * (_EA_MIN_PTRS.bit_length() - 1)
    iblk_nptrs = sum(1 << (s // 2) for s in range(min(first, nsblks)))
    nchunks = len(addrs)

    def element(i: int) -> bytes:
        if i >= nchunks:
            return struct.pack("<Q", UNDEF) + b"\x00" * (elt_size - 8)
        e = struct.pack("<Q", addrs[i])
        if client == 1:
            e += len(blobs[i]).to_bytes(size_len, "little")
            e += struct.pack("<I", 0)  # filter mask
        return e

    _align(buf)
    hdr_addr = len(buf)
    buf += b"\x00" * 72  # EAHD placeholder, patched below

    def block_prefix(sig: bytes, offset: int) -> bytearray:
        return bytearray(
            sig + bytes([0, client]) + struct.pack("<Q", hdr_addr)
            + offset.to_bytes(arr_off_size, "little"),
        )

    elem_idx = _EA_IDX_ELMTS
    dblk_addrs: list[int] = []       # embedded-generation data blocks
    sblk_addrs: list[int] = []       # one per generation >= first
    ndblks_emitted = 0
    for s in range(nsblks):
        if elem_idx >= nchunks:
            break
        ndblks = 1 << (s // 2)
        dblk_n = _EA_MIN_ELMTS << ((s + 1) // 2)
        if dblk_n > (1 << _EA_PAGE_BITS):
            raise ValueError(
                f"extensible-array fixture writer: generation {s} needs "
                f"{dblk_n}-element data blocks past the "
                f"{1 << _EA_PAGE_BITS}-element page threshold (paging "
                "unimplemented) — use a fixed-array index instead",
            )
        gen_start = elem_idx
        gen_dblks: list[int] = []
        for _ in range(ndblks):
            if elem_idx >= nchunks:
                gen_dblks.append(UNDEF)
                continue
            _align(buf)
            daddr = len(buf)
            node = block_prefix(b"EADB", elem_idx)
            for k in range(dblk_n):
                node += element(elem_idx + k)
            node += struct.pack("<I", jenkins_lookup3(bytes(node)))
            buf += node
            gen_dblks.append(daddr)
            ndblks_emitted += 1
            elem_idx += dblk_n
        if s < first:
            dblk_addrs += gen_dblks
        else:
            _align(buf)
            saddr = len(buf)
            node = block_prefix(b"EASB", gen_start)
            for a in gen_dblks:
                node += struct.pack("<Q", a)
            node += struct.pack("<I", jenkins_lookup3(bytes(node)))
            buf += node
            sblk_addrs.append(saddr)

    _align(buf)
    iblk_addr = len(buf)
    node = bytearray(b"EAIB" + bytes([0, client])
                     + struct.pack("<Q", hdr_addr))
    for i in range(_EA_IDX_ELMTS):
        node += element(i)
    dblk_addrs += [UNDEF] * (iblk_nptrs - len(dblk_addrs))
    sblk_addrs += [UNDEF] * (nsblks - first - len(sblk_addrs))
    for a in dblk_addrs + sblk_addrs:
        node += struct.pack("<Q", a)
    node += struct.pack("<I", jenkins_lookup3(bytes(node)))
    buf += node

    hdr = bytearray(b"EAHD" + bytes([
        0, client, elt_size, _EA_MAX_BITS, _EA_IDX_ELMTS,
        _EA_MIN_ELMTS, _EA_MIN_PTRS, _EA_PAGE_BITS,
    ]))
    hdr += struct.pack("<QQQQQQ", len(sblk_addrs), 0, ndblks_emitted, 0,
                       nchunks, nchunks)
    hdr += struct.pack("<Q", iblk_addr)
    hdr += struct.pack("<I", jenkins_lookup3(bytes(hdr)))
    buf[hdr_addr : hdr_addr + 72] = hdr
    extra = bytes([_EA_MAX_BITS, _EA_IDX_ELMTS, _EA_MIN_PTRS,
                   _EA_MIN_ELMTS, _EA_PAGE_BITS])
    return hdr_addr, extra


def _emit_object_header(buf: bytearray, msgs: list[tuple]) -> int:
    body = bytearray()
    for m in msgs:  # (mtype, body) or (mtype, body, header-message flags)
        mtype, mbody = m[0], m[1]
        mflags = m[2] if len(m) > 2 else 0
        mbody = mbody + b"\x00" * (-len(mbody) % 8)
        body += struct.pack("<HHB3x", mtype, len(mbody), mflags) + mbody
    _align(buf)
    addr = len(buf)
    buf += struct.pack("<BxHII4x", 1, len(msgs), 1, len(body))
    buf += body
    return addr


def _dataspace(shape: tuple[int, ...]) -> bytes:
    return struct.pack("<BBB5x", 1, len(shape), 0) + struct.pack(
        f"<{len(shape)}Q", *shape,
    )


def _datatype(dtype: np.dtype) -> bytes:
    if dtype.kind in ("i", "u"):
        bits0 = 0x08 if dtype.kind == "i" else 0
        head = struct.pack("<B3BI", 0x10, bits0, 0, 0, dtype.itemsize)
        return head + struct.pack("<HH", 0, 8 * dtype.itemsize)
    if dtype.kind == "f":
        if dtype.itemsize == 4:
            prec, exploc, expsz, mantsz, bias, sign = 32, 23, 8, 23, 127, 31
        elif dtype.itemsize == 8:
            prec, exploc, expsz, mantsz, bias, sign = 64, 52, 11, 52, 1023, 63
        else:
            raise ValueError(f"unsupported float size {dtype.itemsize}")
        bits0 = 0x20  # mantissa normalization: implied msb
        head = struct.pack("<B3BI", 0x11, bits0, sign, 0, dtype.itemsize)
        return head + struct.pack("<HHBBBBI", 0, prec, exploc, expsz, 0, mantsz, bias)
    if dtype.kind == "S":
        head = struct.pack("<B3BI", 0x13, 0, 0, 0, dtype.itemsize)
        return head
    if dtype.kind == "V" and dtype.names:
        # compound datatype message, version 1 (classic): per member a
        # null-padded name, 4-byte offset, the v1 dims scratch (zeros —
        # subarray members encode as array datatypes instead), then the
        # member's own datatype message
        nm = len(dtype.names)
        out = bytearray(
            struct.pack("<B3BI", 0x16, nm & 0xFF, (nm >> 8) & 0xFF, 0,
                        dtype.itemsize),
        )
        for name in dtype.names:
            fdt, off = dtype.fields[name][:2]
            nb = name.encode("ascii") + b"\x00"
            out += nb + b"\x00" * (-len(nb) % 8)
            out += struct.pack("<IB3xII", off, 0, 0, 0)
            out += struct.pack("<4I", 0, 0, 0, 0)
            if fdt.subdtype is not None:  # array member (class 10, v2)
                base, shape = fdt.subdtype
                out += struct.pack("<B3BI", 0x2A, 0, 0, 0, fdt.itemsize)
                out += struct.pack("<B3x", len(shape))
                out += struct.pack(f"<{len(shape)}I", *shape)
                out += struct.pack(f"<{len(shape)}I", *([0] * len(shape)))
                out += _datatype(base)
            else:
                out += _datatype(fdt)
        return bytes(out)
    raise ValueError(f"unsupported dtype {dtype}")


def _attribute(name: str, value) -> bytes:
    arr = _as_h5_array(value)
    nb = name.encode("utf-8") + b"\x00"
    dt = _datatype(arr.dtype)
    sp = _dataspace(arr.shape if arr.shape else ())
    out = struct.pack("<BxHHH", 1, len(nb), len(dt), len(sp))
    out += nb + b"\x00" * (-len(nb) % 8)
    out += dt + b"\x00" * (-len(dt) % 8)
    out += sp + b"\x00" * (-len(sp) % 8)
    out += arr.tobytes()
    return out


def _as_h5_array(value) -> np.ndarray:
    if isinstance(value, str):
        b = value.encode("utf-8")
        return np.array(b or b"\x00", dtype=f"S{max(len(b), 1)}")
    if isinstance(value, bytes):
        return np.array(value or b"\x00", dtype=f"S{max(len(value), 1)}")
    arr = np.asarray(value)
    if arr.dtype.kind == "b":
        arr = arr.astype("<u1")
    elif arr.dtype.kind == "U":
        arr = np.char.encode(arr, "utf-8")
    elif arr.dtype.kind in ("i", "u", "f"):
        arr = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
    elif arr.dtype.kind == "V" and arr.dtype.names:
        # structured records -> HDF5 compound; members little-endian
        arr = arr.astype(
            np.dtype({
                "names": list(arr.dtype.names),
                "formats": [
                    (arr.dtype.fields[n][0].base.newbyteorder("<"),
                     arr.dtype.fields[n][0].shape)
                    for n in arr.dtype.names
                ],
            }),
            copy=False,
        )
    elif arr.dtype.kind != "S":
        raise ValueError(f"unsupported value type {arr.dtype}")
    # NOT ascontiguousarray: that would promote 0-d scalars to 1-d
    return arr if arr.flags.c_contiguous else np.ascontiguousarray(arr)
