"""Minimal pure-Python HDF5 writer — the inverse of
:mod:`sed_binning_spark.io.hdf5_read` for the engine's own outputs.

Writes classic (superblock v0) files limited to what the cube sink and
the reader's fixture tests need: nested groups (v1 B-tree + local heap +
SNOD symbol tables), CONTIGUOUS datasets of native numeric, fixed-length
string, or COMPOUND (structured, incl. array members) type, soft links
(symbol-table cache type 2), and numeric / string attributes. Datasets are uncompressed and unchunked by design — the
cubes this serializes are driver-sized, and the simple layout keeps every
structure inside the subset the companion reader (and libhdf5) understands.
"""

from __future__ import annotations

import struct

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF

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

    def __init__(self) -> None:
        self._root: dict = {"__kind__": "group", "__attrs__": {}, "__children__": {}}

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

    def add_dataset(self, path: str, data) -> None:
        parts = [p for p in path.strip("/").split("/") if p]
        parent = self._group(parts[:-1])
        arr = _as_h5_array(data)
        parent["__children__"][parts[-1]] = {
            "__kind__": "dataset", "__attrs__": {}, "__data__": arr,
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

    def _emit(self, buf: bytearray, node: dict):
        if node["__kind__"] == "softlink":
            return ("soft", node["__target__"])
        if node["__kind__"] == "dataset":
            return self._emit_dataset(buf, node["__data__"], node["__attrs__"])
        children = [
            (name, self._emit(buf, child))
            for name, child in sorted(node["__children__"].items())
        ]
        return self._emit_group(buf, children, node["__attrs__"])

    def _emit_dataset(self, buf: bytearray, arr: np.ndarray, attrs: dict) -> int:
        _align(buf)
        data_addr = len(buf)
        raw = arr.tobytes()
        buf += raw
        msgs = [
            (0x0001, _dataspace(arr.shape)),
            (0x0003, _datatype(arr.dtype)),
            (0x0008, struct.pack("<BBQQ", 3, 1, data_addr, len(raw))),
        ]
        msgs += [(0x000C, _attribute(n, v)) for n, v in attrs.items()]
        return _emit_object_header(buf, msgs)

    def _emit_group(self, buf: bytearray, children, attrs: dict) -> int:
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
        msgs += [(0x000C, _attribute(n, v)) for n, v in attrs.items()]
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


def _emit_object_header(buf: bytearray, msgs: list[tuple[int, bytes]]) -> int:
    body = bytearray()
    for mtype, mbody in msgs:
        mbody = mbody + b"\x00" * (-len(mbody) % 8)
        body += struct.pack("<HHB3x", mtype, len(mbody), 0) + mbody
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
