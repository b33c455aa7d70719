"""Minimal pure-Python HDF5 reader — enough of the format to extract the
instrument datasets the loaders need (S4/S6/S7) without h5py.

Scope (what h5py-written instrument files actually use — verified against
the reference's real fixtures ``Scan0030_2.h5`` /
``FLASH1_USER3_stream_2_run43878...h5`` / ``RAW-R0016-DA03-S00000.h5``):

- superblocks v0 (classic) and v2/v3 (libver "latest"), 8-byte
  offsets/lengths
- object headers v1 (+ continuation blocks) and v2 (``OHDR``/``OCHK``)
- groups: old-style v1 B-tree (node type 0) over SNOD symbol-table nodes
  with names in a local heap; new-style COMPACT link storage (link
  messages in the header); and new-style DENSE link storage (fractal
  heap + type-5 name-index v2 B-tree, enumerated leaf-by-leaf)
- datasets: contiguous and chunked layouts (layout message v3 AND v4);
  chunk indexes: v1 B-tree (node type 1), and the "latest"-format v4
  flavors single-chunk, implicit, fixed array (FAHD/FADB),
  extensible array (EAHD/EAIB/EASB/EADB — the one-unlimited-dimension
  index, walked generation by generation with every block offset
  cross-checked), and v2 B-tree (record types 10/11, scaled grid
  offsets — several unlimited dimensions), filtered and unfiltered
  clients, checksums verified;
  filters deflate (zlib), shuffle, fletcher32, LZF (h5py's built-in
  filter 32000 — pure-Python decoder from the public liblzf stream
  format), n-bit (atomic class, LE), and scale-offset (integer and
  float D-scaling, LE, fill-value aware — E-scaling refuses)
- datatypes: fixed-point and IEEE-float scalars (little/big endian),
  fixed-size and variable-length strings (attributes)
- attributes (message 0x000C), including scalar numerics, strings, and
  NULL-dataspace (h5py.Empty) attributes (read as None); DENSE attribute
  storage (message 0x0015: fractal heap + type-8 name-index v2 B-tree),
  with v2 B-tree / fractal-heap checksums (Jenkins lookup3) verified
- fill values (0x0004/0x0005): unwritten chunks/regions materialize the
  defined fill instead of assuming zeros

- compound, enum (decoded as their base integers), and array datatypes
  (including nested members), surfacing as numpy structured dtypes
- soft links (symbol-table cache type 2 and v1 link messages), absolute
  or relative, cycle-guarded; dangling links list as absent and raise
  KeyError only when followed

- committed (named) datatypes on datasets AND on attributes (v2/v3
  attribute flag bit 0): the shared-message reference (versions 1/2 and
  v3 type 2) resolves to the named type's object header and the real
  datatype message is parsed from there; the named datatype object
  itself lists as an (empty) node
- external links (H5L type 64): followed lazily into the target file
  (relative names resolve against the linking file's directory, opened
  once and cached); like soft links they are never followed during
  traversal and a dangling target fails only on follow

NOT supported (all raise): paged extensible-array data blocks, the szip
filter, n-bit on array/compound classes, scale-offset E-scaling,
dataset regions, SOHM-heap shared
messages and shared dataspaces, vlen
members inside compounds,
filtered/huge/tiny/multi-level fractal heaps, v2 B-trees deeper than two
levels, writes (see ``hdf5_write`` for the companion writer). Paged
FIXED arrays (chunk counts past the 1024-element page threshold) ARE
supported.
Everything raises a clear ``UnsupportedHDF5`` rather than misreading.

The point: a facility user's raw files open end-to-end on any executor
with only numpy + stdlib zlib — the byte-read is no longer gated on an
absent dependency. (Reference reads the same structures through h5py:
sed/loader/mpes/loader.py:267-347, sed/loader/flash/loader.py:617-742.)
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF


class UnsupportedHDF5(Exception):
    """File uses an HDF5 feature outside this reader's documented scope."""


@dataclass
class Datatype:
    kind: str          # "int"|"uint"|"float"|"string"|"vlen_str"|"compound"|"enum"|"array"
    size: int
    byteorder: str     # "<" | ">"
    # compound: (name, byte offset, member Datatype) triples
    members: list | None = None
    # array: element dimensions
    shape: tuple | None = None
    # enum/array: the underlying Datatype
    base: "Datatype | None" = None

    @property
    def np_dtype(self) -> np.dtype:
        if self.kind == "float":
            return np.dtype(f"{self.byteorder}f{self.size}")
        if self.kind in ("int", "uint"):
            return np.dtype(f"{self.byteorder}{'i' if self.kind == 'int' else 'u'}{self.size}")
        if self.kind == "string":
            return np.dtype(f"S{self.size}")
        if self.kind == "enum":
            return self.base.np_dtype
        if self.kind == "array":
            return np.dtype((self.base.np_dtype, self.shape))
        if self.kind == "compound":
            return np.dtype({
                "names": [n for n, _, _ in self.members],
                "formats": [m.np_dtype for _, _, m in self.members],
                "offsets": [o for _, o, _ in self.members],
                "itemsize": self.size,
            })
        raise UnsupportedHDF5(f"no numpy dtype for {self.kind}")


@dataclass
class SoftLink:
    """A symbolic link's target path — resolved lazily at traversal time
    (HDF5 permits dangling soft links; only following one must fail)."""
    target: str


@dataclass
class ExternalLink:
    """An external link (H5L_TYPE_EXTERNAL, link type 64): a path inside
    ANOTHER HDF5 file. Resolved lazily on follow — relative file names
    resolve against the linking file's directory, the libhdf5 default
    search — and never during traversal (dangling targets only fail when
    followed, like soft links)."""
    file: str
    target: str


class _ExternalJump(Exception):
    """Internal control flow: _resolve hit an ExternalLink; the public
    entry point must re-dispatch the remaining path into the target
    file's own H5File."""

    def __init__(self, file: str, path: str) -> None:
        super().__init__(file, path)
        self.file = file
        self.path = path


@dataclass
class Dataset:
    shape: tuple[int, ...]
    dtype: Datatype
    layout: str                          # "contiguous" | "chunked" | "compact"
    data_addr: int = UNDEF
    data_size: int = 0
    compact_data: bytes = b""
    chunk_shape: tuple[int, ...] = ()
    btree_addr: int = UNDEF      # chunk index address (any index flavor)
    filters: list[tuple[int, list[int]]] = field(default_factory=list)
    attrs: dict = field(default_factory=dict)
    fill: bytes | None = None  # raw fill-value bytes (None/empty -> zeros)
    # layout-v4 chunk indexing: "btree1" (v3 message), "single",
    # "implicit", "fixed" (fixed array), "extensible", or "btree2"; aux
    # carries the single-chunk (filtered size, filter mask) pair or the
    # extensible array's creation parameters
    chunk_index: str = "btree1"
    chunk_aux: tuple = ()
    chunk_elem_size: int = 0   # v4 message's trailing element-size dim
    chunk_flags: int = 0       # v4 message flags byte


@dataclass
class Group:
    btree_addr: int
    heap_addr: int
    attrs: dict = field(default_factory=dict)
    # new-style compact storage: explicit (name, header addr) links instead
    # of a symbol-table B-tree
    links: list[tuple[str, int]] | None = None


def _struct_guard(fn):
    """Translate bare struct.error from parsing a short/corrupt buffer into
    a named UnsupportedHDF5 ('truncated or corrupt') at the public surface."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except struct.error as exc:
            raise UnsupportedHDF5(
                f"truncated or corrupt HDF5 file ({exc})",
            ) from exc
    return wrapper


_M32 = 0xFFFFFFFF


def _rot32(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _M32


def jenkins_lookup3(data: bytes, init: int = 0) -> int:
    """Bob Jenkins' lookup3 ``hashlittle`` (public domain, lookup3.c) —
    the checksum/name-hash function every post-1.8 HDF5 metadata structure
    uses (libhdf5's H5_checksum_lookup3). Pure Python over 12-byte blocks;
    these are tiny metadata buffers, never event data."""
    a = b = c = (0xDEADBEEF + len(data) + init) & _M32
    i, length = 0, len(data)
    while length > 12:
        a = (a + int.from_bytes(data[i : i + 4], "little")) & _M32
        b = (b + int.from_bytes(data[i + 4 : i + 8], "little")) & _M32
        c = (c + int.from_bytes(data[i + 8 : i + 12], "little")) & _M32
        a = (a - c) & _M32; a ^= _rot32(c, 4); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot32(a, 6); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot32(b, 8); b = (b + a) & _M32
        a = (a - c) & _M32; a ^= _rot32(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot32(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot32(b, 4); b = (b + a) & _M32
        i += 12
        length -= 12
    if length == 0:
        return c  # lookup3's switch returns c untouched for an empty tail
    tail = bytes(data[i : i + length]) + b"\x00" * (12 - length)
    a = (a + int.from_bytes(tail[0:4], "little")) & _M32
    b = (b + int.from_bytes(tail[4:8], "little")) & _M32
    c = (c + int.from_bytes(tail[8:12], "little")) & _M32
    c ^= b; c = (c - _rot32(b, 14)) & _M32
    a ^= c; a = (a - _rot32(c, 11)) & _M32
    b ^= a; b = (b - _rot32(a, 25)) & _M32
    c ^= b; c = (c - _rot32(b, 16)) & _M32
    a ^= c; a = (a - _rot32(c, 4)) & _M32
    b ^= a; b = (b - _rot32(a, 14)) & _M32
    c ^= b; c = (c - _rot32(b, 24)) & _M32
    return c


def _min_bytes(n: int) -> int:
    """Least number of bytes that can represent ``n`` (≥1) — the sizing
    rule the format spec uses for fractal-heap ID length fields and v2
    B-tree child record counts."""
    return max(1, (int(n).bit_length() + 7) // 8)


def _grid_coords(i: int, grid) -> tuple:
    """Linear chunk index (C order over the chunk grid) -> grid
    coordinates — the addressing rule every chunk index flavor shares
    (and the writer mirrors)."""
    coords = []
    for g in reversed(grid):
        coords.append(i % g)
        i //= g
    return tuple(reversed(coords))


def _verify_checksum(buf, addr: int, used: int, what: str) -> None:
    """Trailing lookup3 checksum check for post-1.8 metadata blocks (the
    stored sum sits immediately after the ``used`` content bytes)."""
    (stored,) = struct.unpack_from("<I", buf, addr + used)
    if jenkins_lookup3(buf[addr : addr + used]) != stored:
        raise UnsupportedHDF5(
            f"truncated or corrupt HDF5 file ({what} checksum mismatch)",
        )


class _FractalHeap:
    """Managed-object fractal heap (format spec III.G: 'FRHP' header, then
    a root direct block 'FHDB' or one root indirect block 'FHIB' over
    direct blocks) — the storage behind dense links and dense attributes.
    Those only ever hold small serialized messages, so the exotic reaches
    of the structure raise instead of parsing: filtered heaps, huge/tiny
    heap IDs, and indirect-block CHILDREN (a root indirect block's direct
    rows already span width * (2*max_direct - start) bytes ≈ 0.5 MiB of
    link messages at libhdf5's defaults)."""

    def __init__(self, buf, addr: int) -> None:
        if buf[addr : addr + 4] != b"FRHP":
            raise UnsupportedHDF5("bad fractal heap signature")
        if buf[addr + 4] != 0:
            raise UnsupportedHDF5(f"fractal heap version {buf[addr + 4]}")
        self.id_len, filter_len = struct.unpack_from("<HH", buf, addr + 5)
        self.flags = buf[addr + 9]
        (self.max_managed,) = struct.unpack_from("<I", buf, addr + 10)
        # fixed 8-byte statistics block: next-huge-id, huge B-tree addr,
        # free space, free-space-manager addr, managed space, allocated
        # space, iterator offset, object/huge/tiny counts and sizes
        (self.managed_space,) = struct.unpack_from("<Q", buf, addr + 46)
        (self.width,) = struct.unpack_from("<H", buf, addr + 110)
        self.start_size, self.max_direct = struct.unpack_from(
            "<QQ", buf, addr + 112,
        )
        (self.max_heap_bits,) = struct.unpack_from("<H", buf, addr + 128)
        (self.root_addr,) = struct.unpack_from("<Q", buf, addr + 132)
        (self.root_rows,) = struct.unpack_from("<H", buf, addr + 140)
        _verify_checksum(buf, addr, 142, "fractal heap header")
        if filter_len:
            raise UnsupportedHDF5("filtered fractal heap")
        self.offset_size = (self.max_heap_bits + 7) // 8
        self.length_size = _min_bytes(self.max_managed)
        if 1 + self.offset_size + self.length_size > self.id_len:
            raise UnsupportedHDF5("fractal heap ID narrower than its fields")
        self.max_direct_rows = (
            self.max_direct.bit_length() - self.start_size.bit_length() + 2
        )
        self._buf = buf
        self._addr = addr
        # blocks whose checksum already verified this session — dense
        # enumeration reads every object, so without this each read would
        # re-hash its whole (up to 64 KiB) block in the Python lookup3 loop
        self._verified: set[int] = set()

    def read(self, heap_id: bytes) -> bytes:
        vt = heap_id[0]
        if vt >> 6:
            raise UnsupportedHDF5(f"fractal heap ID version {vt >> 6}")
        if (vt >> 4) & 0x3:
            raise UnsupportedHDF5("huge/tiny fractal heap object")
        off = int.from_bytes(heap_id[1 : 1 + self.offset_size], "little")
        length = int.from_bytes(
            heap_id[1 + self.offset_size:
                    1 + self.offset_size + self.length_size],
            "little",
        )
        baddr, boff, bsize = self._locate(off)
        buf = self._buf
        if buf[baddr : baddr + 4] != b"FHDB":
            raise UnsupportedHDF5("bad fractal heap direct-block signature")
        back = struct.unpack_from("<Q", buf, baddr + 5)[0]
        stored_off = int.from_bytes(
            buf[baddr + 13 : baddr + 13 + self.offset_size], "little",
        )
        if back != self._addr or stored_off != boff:
            raise UnsupportedHDF5(
                "truncated or corrupt HDF5 file (direct block does not "
                "match its doubling-table slot)",
            )
        if self.flags & 0x02 and baddr not in self._verified:
            csum_at = 13 + self.offset_size
            block = bytearray(buf[baddr : baddr + bsize])
            (stored,) = struct.unpack_from("<I", block, csum_at)
            struct.pack_into("<I", block, csum_at, 0)
            if jenkins_lookup3(bytes(block)) != stored:
                raise UnsupportedHDF5(
                    "truncated or corrupt HDF5 file (fractal heap direct "
                    "block checksum mismatch)",
                )
            self._verified.add(baddr)
        if off + length > boff + bsize:
            raise UnsupportedHDF5(
                "truncated or corrupt HDF5 file (heap object overruns its "
                "direct block)",
            )
        p = baddr + (off - boff)
        return bytes(buf[p : p + length])

    def _locate(self, off: int) -> tuple[int, int, int]:
        """Map a heap-space offset to (file addr, heap offset, size) of the
        direct block containing it, via the doubling table: rows 0 and 1
        hold ``width`` starting-size blocks, row r ≥ 2 holds ``width``
        blocks of ``start << (r - 1)`` bytes."""
        if self.root_rows == 0:
            # root IS a single direct block covering all managed space
            return self.root_addr, 0, self.managed_space
        buf = self._buf
        a = self.root_addr
        if buf[a : a + 4] != b"FHIB":
            raise UnsupportedHDF5("bad fractal heap indirect-block signature")
        if self.root_rows > self.max_direct_rows:
            raise UnsupportedHDF5(
                "multi-level fractal heap (indirect-block children)",
            )
        entries = a + 13 + self.offset_size
        if a not in self._verified:
            _verify_checksum(
                buf, a,
                13 + self.offset_size + self.root_rows * self.width * 8,
                "fractal heap indirect block",
            )
            self._verified.add(a)
        base = 0
        for row in range(self.root_rows):
            size = self.start_size if row < 2 else self.start_size << (row - 1)
            span = self.width * size
            if off < base + span:
                idx = (off - base) // size
                p = entries + (row * self.width + idx) * 8
                baddr = struct.unpack_from("<Q", buf, p)[0]
                if baddr == UNDEF:
                    raise UnsupportedHDF5(
                        "truncated or corrupt HDF5 file (heap offset in an "
                        "unallocated direct block)",
                    )
                return baddr, base + idx * size, size
            base += span
        raise UnsupportedHDF5(
            "truncated or corrupt HDF5 file (heap offset beyond the root "
            "indirect block's rows)",
        )


class H5File:
    """Read-only minimal HDF5 file. ``visit()`` lists paths,
    ``dataset(path)`` parses metadata, ``read(path)`` returns the ndarray,
    ``attrs(path)`` the attribute dict."""

    def __init__(self, path: str) -> None:
        # mmap, not read(): metadata walks (visit/attrs/dataset) touch only
        # header pages, so a driver can cheaply inspect files whose DATA is
        # extracted executor-side
        import mmap

        with open(path, "rb") as f:
            try:
                self._buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            except (ValueError, OSError):  # zero-byte or unmappable file
                self._buf = f.read()
        if self._buf[:8] != SIGNATURE:
            raise UnsupportedHDF5("not an HDF5 file (bad signature)")
        try:
            ver = self._buf[8]
            if ver == 0:
                if self._buf[13] != 8 or self._buf[14] != 8:
                    raise UnsupportedHDF5("only 8-byte offsets/lengths supported")
                # root group symbol-table entry starts at 56: link name
                # offset(8), object header address(8), cache type(4),
                # reserved(4), scratch(16)
                self._root_addr = struct.unpack_from("<Q", self._buf, 64)[0]
            elif ver in (2, 3):
                if self._buf[9] != 8 or self._buf[10] != 8:
                    raise UnsupportedHDF5("only 8-byte offsets/lengths supported")
                # v2/v3: base, extension, eof, root OBJECT HEADER address
                self._root_addr = struct.unpack_from("<Q", self._buf, 36)[0]
            else:
                raise UnsupportedHDF5(f"superblock version {ver}")
        except (struct.error, IndexError) as exc:
            # file shorter than a superblock: name the truncation instead
            # of leaking the parser's internal error
            raise UnsupportedHDF5(
                f"truncated or corrupt HDF5 file (superblock: {exc})",
            ) from exc
        self._cache: dict[str, object] = {}
        self._path = path
        self._ext_files: dict[str, H5File] = {}

    def close(self) -> None:
        """Release the mmap and every cached external-link target file.
        A file linking to many distinct targets otherwise accumulates one
        open mapping per target for its whole lifetime (the depth-8 chain
        guard bounds recursion, not fan-out). Idempotent; reads after
        close raise."""
        for f in self._ext_files.values():
            f.close()
        self._ext_files.clear()
        buf = self._buf
        if hasattr(buf, "close"):
            buf.close()

    def __enter__(self) -> "H5File":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- public surface -----------------------------------------------------
    @_struct_guard
    def visit(self) -> list[str]:
        """All dataset paths (depth-first, '/'-separated). Each GROUP object
        is walked once by address — H5Ovisit semantics: a group hard-linked
        under two parents lists its subtree under the first path only
        (matching h5py's ``visit``), and ancestor cycles terminate. Every
        path remains resolvable via ``read()`` regardless."""
        out: list[str] = []
        seen: set[int] = set()

        def _walk(prefix: str, addr: int) -> None:
            if addr in seen:
                return
            seen.add(addr)
            obj = self._object(addr)
            if isinstance(obj, Group):
                for name, child in self._group_entries(obj):
                    if isinstance(child, (SoftLink, ExternalLink)):
                        # H5Ovisit semantics (h5py .visit): soft/external
                        # links are not followed during traversal — their
                        # targets list under their hard path (or in their
                        # own file), and read() resolves them on demand
                        continue
                    p = f"{prefix}/{name}"
                    if isinstance(self._object(child), Group):
                        _walk(p, child)
                    else:
                        out.append(p)

        _walk("", self._root_addr)
        return out

    # external-link chains hop across H5File INSTANCES, so the soft-link
    # depth counter cannot see them — each public entry threads this
    # private depth through its re-dispatch instead (a 2-file cycle would
    # otherwise recurse to RecursionError with one live mmap per hop)
    _MAX_EXT_DEPTH = 8

    def _external(self, fname: str) -> "H5File":
        """The H5File behind an external link, opened once and cached;
        relative names resolve against this file's directory (libhdf5's
        default external-link search). A missing target file is a
        KeyError on FOLLOW, like a dangling soft link."""
        f = self._ext_files.get(fname)
        if f is None:
            import os as _os

            p = fname if _os.path.isabs(fname) else _os.path.join(
                _os.path.dirname(_os.path.abspath(self._path)), fname,
            )
            if not _os.path.exists(p):
                raise KeyError(
                    f"external link target file {fname!r} not found",
                )
            f = self._ext_files[fname] = H5File(p)
        return f

    def _dataset(self, path: str) -> Dataset:
        obj = self._object(self._resolve(path))
        if not isinstance(obj, Dataset):
            raise KeyError(f"{path} is a group, not a dataset")
        return obj

    @_struct_guard
    def dataset(self, path: str, _ext_depth: int = 0) -> Dataset:
        try:
            return self._dataset(path)
        except _ExternalJump as jump:
            self._check_ext_depth(_ext_depth, path)
            return self._external(jump.file).dataset(
                jump.path, _ext_depth=_ext_depth + 1,
            )

    @_struct_guard
    def attrs(self, path: str = "/", _ext_depth: int = 0) -> dict:
        try:
            return self._object(self._resolve(path)).attrs
        except _ExternalJump as jump:
            self._check_ext_depth(_ext_depth, path)
            return self._external(jump.file).attrs(
                jump.path, _ext_depth=_ext_depth + 1,
            )

    @classmethod
    def _check_ext_depth(cls, depth: int, path: str) -> None:
        if depth >= cls._MAX_EXT_DEPTH:
            raise UnsupportedHDF5(
                f"external-link chain deeper than {cls._MAX_EXT_DEPTH} "
                f"at {path!r} (cycle?)",
            )

    def _data_slice(self, addr: int, nbytes: int, what: str) -> bytes:
        """Bounds-checked buffer slice: a region past EOF means a truncated
        or corrupt file, named as such — bare np.frombuffer/struct errors
        from a short slice read as library bugs, not file problems."""
        if addr + nbytes > len(self._buf):
            raise UnsupportedHDF5(
                f"truncated or corrupt HDF5 file: {what} at offset {addr} "
                f"needs {nbytes} bytes but the file has "
                f"{max(0, len(self._buf) - addr)} left",
            )
        return self._buf[addr : addr + nbytes]

    @_struct_guard
    def read(self, path: str, _ext_depth: int = 0) -> np.ndarray:
        """Materialize a dataset as a numpy array (C order).

        Always WRITABLE, matching h5py's read semantics: a bare
        ``np.frombuffer`` view of the file bytes is read-only, and user
        code doing in-place math on loaded data (``cube.data *= norm``)
        would crash only when this backend — not h5py — happened to read
        the file. The copy costs one memcpy on the fast layouts; the
        chunked path assembles a fresh array anyway."""
        try:
            ds = self._dataset(path)
        except _ExternalJump as jump:
            # the dataset lives in ANOTHER file: its addresses are only
            # meaningful against that file's buffer, so the whole read
            # re-dispatches there
            self._check_ext_depth(_ext_depth, path)
            return self._external(jump.file).read(
                jump.path, _ext_depth=_ext_depth + 1,
            )
        dtype = ds.dtype.np_dtype
        if ds.layout == "compact":
            return (
                np.frombuffer(ds.compact_data, dtype=dtype)
                .reshape(ds.shape).copy()
            )
        if ds.layout == "contiguous":
            if ds.data_addr == UNDEF:       # allocated lazily, never written
                return self._background(ds, dtype, ds.shape)
            n = int(np.prod(ds.shape, dtype=np.int64)) if ds.shape else 1
            raw = self._data_slice(
                ds.data_addr, n * dtype.itemsize, f"dataset {path} data",
            )
            return np.frombuffer(raw, dtype=dtype).reshape(ds.shape).copy()
        # chunked: unwritten regions take the dataset's fill value
        out = self._background(ds, dtype, ds.shape)
        if ds.chunk_elem_size and ds.chunk_elem_size != dtype.itemsize:
            raise UnsupportedHDF5(
                f"truncated or corrupt HDF5 file: dataset {path} layout "
                f"declares {ds.chunk_elem_size}-byte elements but the "
                f"datatype is {dtype.itemsize} bytes",
            )
        if ds.chunk_flags & 0x01 and ds.filters:
            # H5D_CHUNK_DONT_FILTER_PARTIAL_CHUNKS: edge chunks are stored
            # raw while interior chunks are filtered — defiltering them
            # uniformly would scramble edges, so refuse
            raise UnsupportedHDF5(
                "unfiltered-partial-edge-chunks option with a filter "
                "pipeline",
            )
        if ds.chunk_index == "implicit" and ds.filters:
            raise UnsupportedHDF5(
                "implicit chunk index with a filter pipeline (the format "
                "forbids filters on implicit chunks)",
            )
        if ds.btree_addr == UNDEF:
            return out
        if ds.chunk_index == "btree1":
            chunks = self._iter_chunks(ds.btree_addr, len(ds.shape))
        else:
            chunks = self._iter_chunks_v4(ds, dtype.itemsize)
        for offsets, addr, nbytes, filter_mask in chunks:
            raw = self._data_slice(addr, nbytes, f"dataset {path} chunk")
            raw = self._defilter(raw, ds.filters, filter_mask, dtype.itemsize)
            n_chunk = int(np.prod(ds.chunk_shape, dtype=np.int64))
            if len(raw) < n_chunk * dtype.itemsize:
                raise UnsupportedHDF5(
                    f"truncated or corrupt HDF5 file: dataset {path} chunk "
                    f"decompressed to {len(raw)} bytes, expected "
                    f"{n_chunk * dtype.itemsize}",
                )
            chunk = np.frombuffer(raw, dtype=dtype)[:n_chunk].reshape(ds.chunk_shape)
            sel_out, sel_in = [], []
            clipped = False
            for dim, (o, c, s) in enumerate(zip(offsets, ds.chunk_shape, ds.shape)):
                hi = min(o + c, s)
                if hi <= o:
                    clipped = True
                    break
                sel_out.append(slice(o, hi))
                sel_in.append(slice(0, hi - o))
            if not clipped:
                out[tuple(sel_out)] = chunk[tuple(sel_in)]
        return out

    @staticmethod
    def _background(ds: Dataset, dtype: np.dtype, shape) -> np.ndarray:
        """Array a dataset's unwritten regions materialize as: the fill
        value when one is defined and non-zero, else zeros (the HDF5
        default fill)."""
        fill = ds.fill
        if fill and len(fill) >= dtype.itemsize and any(fill):
            val = np.frombuffer(fill[: dtype.itemsize], dtype=dtype)[0]
            return np.full(shape, val, dtype=dtype)
        return np.zeros(shape, dtype=dtype)

    # -- object headers -----------------------------------------------------
    def _resolve(self, path: str, _depth: int = 0) -> int:
        """Walk ``path`` from the root, following soft links (absolute
        targets restart at the root; relative ones resolve against the
        link's parent group), with a depth guard so a link cycle raises
        instead of recursing forever."""
        if _depth > 16:
            raise UnsupportedHDF5(f"soft-link chain too deep at {path!r}")
        addr = self._root_addr
        parts = [p for p in path.strip("/").split("/") if p]
        for i, part in enumerate(parts):
            obj = self._object(addr)
            if not isinstance(obj, Group):
                raise KeyError(f"{part!r}: parent is not a group")
            for name, child in self._group_entries(obj):
                if name == part:
                    if isinstance(child, SoftLink):
                        t = child.target
                        if not t.startswith("/"):
                            t = "/".join(parts[:i] + [t])
                        return self._resolve(
                            "/".join([t] + parts[i + 1 :]), _depth + 1,
                        )
                    if isinstance(child, ExternalLink):
                        raise _ExternalJump(child.file, "/".join(
                            [child.target.rstrip("/")] + parts[i + 1 :],
                        ))
                    addr = child
                    break
            else:
                raise KeyError(f"path component {part!r} not found")
        return addr

    def _object(self, addr: int):
        key = f"obj:{addr}"
        if key not in self._cache:
            self._cache[key] = self._parse_object_header(addr)
        return self._cache[key]

    def _parse_object_header(self, addr: int):
        if self._buf[addr : addr + 4] == b"OHDR":
            msgs = self._messages_v2(addr)
        else:
            msgs = self._messages_v1(addr)
        return self._interpret_messages(msgs)

    def _shared_message_body(self, body: bytes, want_type: int) -> bytes:
        """Resolve a shared-message reference (header-message flag bit 1)
        to the referenced message's REAL body: versions 1/2 and version-3
        type-2 store the address of the object header that holds the
        message (the committed-datatype form); version-3 types 0/1 live
        in the SOHM fractal heap, which no real instrument file uses —
        refused loudly."""
        if len(body) < 2:
            raise UnsupportedHDF5("truncated shared-message reference")
        version = body[0]
        if version == 1:
            off = 8  # version, type, 6 reserved bytes
        elif version == 2:
            off = 2
        elif version == 3:
            if body[1] != 2:
                raise UnsupportedHDF5(
                    "SOHM-heap shared message (type "
                    f"{body[1]}) is unsupported",
                )
            off = 2
        else:
            raise UnsupportedHDF5(
                f"shared-message version {version} is unsupported",
            )
        if len(body) < off + 8:
            raise UnsupportedHDF5("truncated shared-message reference")
        (addr,) = struct.unpack_from("<Q", body, off)
        if addr == UNDEF or addr >= len(self._buf):
            raise UnsupportedHDF5(
                "shared message points outside the file",
            )
        if self._buf[addr : addr + 4] == b"OHDR":
            msgs = self._messages_v2(addr)
        else:
            msgs = self._messages_v1(addr)
        for mtype, mbody, mflags in msgs:
            if mtype == want_type:
                if mflags & 0x02:
                    # a chained shared reference would otherwise parse as
                    # a garbage inline definition — refuse, don't misread
                    raise UnsupportedHDF5(
                        "shared message chains to another shared message",
                    )
                return mbody
        raise UnsupportedHDF5(
            f"shared-message target holds no 0x{want_type:04x} message",
        )

    def _messages_v1(self, addr: int) -> list[tuple[int, bytes, int]]:
        buf = self._buf
        version, _, nmsg, _refcnt, hdr_size = struct.unpack_from("<BBHII", buf, addr)
        if version != 1:
            raise UnsupportedHDF5(f"object header version {version}")
        blocks = [(addr + 16, hdr_size)]  # 12 bytes + 4 pad to 8-byte align
        msgs: list[tuple[int, bytes, int]] = []
        bi = 0
        while bi < len(blocks) and len(msgs) < nmsg:
            pos, remaining = blocks[bi]
            bi += 1
            while remaining >= 8 and len(msgs) < nmsg:
                mtype, msize, mflags = struct.unpack_from("<HHB", buf, pos)
                body = buf[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == 0x0010:  # continuation
                    caddr, clen = struct.unpack("<QQ", body[:16])
                    blocks.append((caddr, clen))
                msgs.append((mtype, body, mflags))
        return msgs

    def _messages_v2(self, addr: int) -> list[tuple[int, bytes, int]]:
        """Version-2 ('OHDR') object header: 1-byte message types, variable
        chunk-size field, optional times/attr-phase fields, trailing
        checksum; continuations are 'OCHK' blocks."""
        buf = self._buf
        if buf[addr + 4] != 2:
            raise UnsupportedHDF5(f"OHDR version {buf[addr + 4]}")
        flags = buf[addr + 5]
        pos = addr + 6
        if flags & 0x20:
            pos += 16  # access/mod/change/birth times
        if flags & 0x10:
            pos += 4   # compact/dense attribute phase-change thresholds
        size_width = 1 << (flags & 0x3)
        chunk0 = int.from_bytes(buf[pos : pos + size_width], "little")
        pos += size_width
        tracked = bool(flags & 0x04)  # creation order tracked per message
        msgs: list[tuple[int, bytes, int]] = []
        # the chunk-0 size field counts MESSAGE bytes only — libhdf5 encodes
        # chunk[0].size - H5O_SIZEOF_HDR, and its prefix macro already
        # includes the trailing 4-byte checksum (not verified here)
        blocks = [(pos, chunk0)]
        bi = 0
        while bi < len(blocks):
            p, remaining = blocks[bi]
            bi += 1
            while remaining >= 4:
                mtype = buf[p]
                msize = struct.unpack_from("<H", buf, p + 1)[0]
                mflags = buf[p + 3]
                head = 4 + (2 if tracked else 0)
                body = buf[p + head : p + head + msize]
                p += head + msize
                remaining -= head + msize
                if mtype == 0x10:  # continuation -> OCHK block
                    caddr, clen = struct.unpack("<QQ", body[:16])
                    if buf[caddr : caddr + 4] != b"OCHK":
                        raise UnsupportedHDF5("bad OCHK signature")
                    blocks.append((caddr + 4, clen - 8))  # sig + checksum
                msgs.append((mtype, body, mflags))
        return msgs

    # message types whose body we interpret inline; a SHARED instance of
    # one of these (flag bit 1: the body is a shared-message reference into
    # the SOHM table, not an inline definition) would silently parse as
    # garbage — raise instead
    _INTERPRETED = frozenset(
        {0x0001, 0x0003, 0x0004, 0x0005, 0x0006, 0x0008, 0x000B, 0x000C, 0x0011},
    )

    def _interpret_messages(self, msgs: list[tuple[int, bytes, int]]):
        attrs: dict = {}
        group: Group | None = None
        links: list[tuple[str, int]] = []
        saw_link_storage = False
        ds: dict = {}
        for mtype, body, mflags in msgs:
            if (mflags & 0x02) and mtype in self._INTERPRETED:
                if mtype == 0x0003:
                    # committed (named) datatype: the body is a shared-
                    # message reference to the object header that holds
                    # the real datatype message
                    ds["dtype"] = self._parse_datatype(
                        self._shared_message_body(body, 0x0003),
                    )
                    continue
                raise UnsupportedHDF5(
                    f"shared message (type 0x{mtype:04x}) — shared "
                    "dataspaces / SOHM-table messages are unsupported",
                )
            if mtype == 0x0011:  # symbol table -> old-style group
                btree, heap = struct.unpack_from("<QQ", body, 0)
                group = Group(btree, heap)
            elif mtype == 0x0001:
                shape = self._parse_dataspace(body)
                if shape is None:
                    raise UnsupportedHDF5("NULL-dataspace dataset")
                ds["shape"] = shape
            elif mtype == 0x0003:
                ds["dtype"] = self._parse_datatype(body)
            elif mtype == 0x0008:
                ds.update(self._parse_layout(body))
            elif mtype == 0x000B:
                ds["filters"] = self._parse_filters(body)
            elif mtype == 0x000C:
                name, value = self._parse_attribute(body)
                attrs[name] = value
            elif mtype in (0x0004, 0x0005):  # fill value (old / new)
                fill = self._parse_fill_value(mtype, body)
                if fill is not None:
                    ds["fill"] = fill
            elif mtype == 0x0002:  # link info: compact (0x0006 msgs follow)
                # or dense (fractal heap + name-index v2 B-tree)
                saw_link_storage = True
                flags = body[1]
                p = 2 + (8 if flags & 0x1 else 0)
                fheap, name_bt = struct.unpack_from("<QQ", body, p)
                if fheap != UNDEF:
                    links.extend(self._dense_links(fheap, name_bt))
            elif mtype == 0x0015:  # attribute info: dense attrs live in a
                # fractal heap keyed by the type-8 name-index B-tree
                flags = body[1]
                p = 2 + (2 if flags & 0x1 else 0)
                fheap, name_bt = struct.unpack_from("<QQ", body, p)
                if fheap != UNDEF:
                    attrs.update(self._dense_attrs(fheap, name_bt))
            elif mtype == 0x0006:
                saw_link_storage = True
                links.append(self._parse_link(body))
        if group is not None:
            group.attrs = attrs
            return group
        if "shape" in ds and "dtype" in ds:
            return Dataset(
                shape=ds["shape"],
                dtype=ds["dtype"],
                layout=ds.get("layout", "contiguous"),
                data_addr=ds.get("data_addr", UNDEF),
                data_size=ds.get("data_size", 0),
                compact_data=ds.get("compact_data", b""),
                chunk_shape=ds.get("chunk_shape", ()),
                btree_addr=ds.get("btree_addr", UNDEF),
                filters=ds.get("filters", []),
                attrs=attrs,
                fill=ds.get("fill"),
                chunk_index=ds.get("chunk_index", "btree1"),
                chunk_aux=ds.get("chunk_aux", ()),
                chunk_elem_size=ds.get("chunk_elem_size", 0),
                chunk_flags=ds.get("chunk_flags", 0),
            )
        if saw_link_storage:
            return Group(UNDEF, UNDEF, attrs=attrs, links=sorted(links))
        # attribute-only object (e.g. empty group written without symbols)
        return Group(UNDEF, UNDEF, attrs=attrs)

    @staticmethod
    def _parse_link(body: bytes) -> tuple[str, int]:
        """Link message (0x0006), hard links only."""
        version, flags = body[0], body[1]
        if version != 1:
            raise UnsupportedHDF5(f"link message version {version}")
        pos = 2
        link_type = 0
        if flags & 0x08:
            link_type = body[pos]
            pos += 1
        if flags & 0x04:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # name character set
        len_width = 1 << (flags & 0x3)
        name_len = int.from_bytes(body[pos : pos + len_width], "little")
        pos += len_width
        name = body[pos : pos + name_len].decode("utf-8")
        pos += name_len
        if link_type == 1:  # soft: 2-byte length + target path
            (tlen,) = struct.unpack_from("<H", body, pos)
            target = body[pos + 2 : pos + 2 + tlen].decode("utf-8")
            return name, SoftLink(target)
        if link_type == 64:  # external: 2-byte length + version/flags +
            # file_name\0 + object_path\0 (H5L registered type 64)
            (tlen,) = struct.unpack_from("<H", body, pos)
            blob = body[pos + 2 : pos + 2 + tlen]
            if not blob:
                raise UnsupportedHDF5("empty external link payload")
            if blob[0] >> 4:
                raise UnsupportedHDF5(
                    f"external link version {blob[0] >> 4}",
                )
            fname, _, rest = blob[1:].partition(b"\x00")
            objpath = rest.split(b"\x00")[0]
            return name, ExternalLink(
                fname.decode("utf-8"), objpath.decode("utf-8"),
            )
        if link_type != 0:
            raise UnsupportedHDF5(
                f"link type {link_type} (hard, soft, and external only)",
            )
        return name, struct.unpack_from("<Q", body, pos)[0]

    # -- message parsers ----------------------------------------------------
    @staticmethod
    def _parse_fill_value(mtype: int, body: bytes) -> bytes | None:
        """Fill value messages: 0x0004 (old: size + value) and 0x0005
        (new: v1/v2 defined-byte form, v3 flags form). None = undefined
        (reads as zeros, the library default)."""
        if mtype == 0x0004:
            size = struct.unpack_from("<I", body, 0)[0]
            return bytes(body[4 : 4 + size]) or None
        version = body[0]
        if version in (1, 2):
            defined = body[3]
            if version == 1 or defined:
                size = struct.unpack_from("<I", body, 4)[0]
                return bytes(body[8 : 8 + size]) or None
            return None
        if version == 3:
            flags = body[1]
            if flags & 0x20:  # fill value defined and present
                size = struct.unpack_from("<I", body, 2)[0]
                return bytes(body[6 : 6 + size]) or None
            return None
        raise UnsupportedHDF5(f"fill value message version {version}")

    @staticmethod
    def _parse_dataspace(body: bytes) -> tuple[int, ...] | None:
        version = body[0]
        ndims = body[1]
        flags = body[2]
        if version == 1:
            pos = 8
        elif version == 2:
            if body[3] == 2:  # NULL dataspace (h5py.Empty): no elements
                return None
            pos = 4
        else:
            raise UnsupportedHDF5(f"dataspace version {version}")
        dims = struct.unpack_from(f"<{ndims}Q", body, pos)
        return tuple(int(d) for d in dims)  # ignore max dims (flags & 1)

    @classmethod
    def _parse_datatype(cls_, body: bytes) -> Datatype:
        return cls_._parse_datatype_at(body, 0)[0]

    @classmethod
    def _parse_datatype_at(cls_, body: bytes, pos: int) -> tuple[Datatype, int]:
        """Parse one (possibly nested) datatype message at ``pos``; returns
        (Datatype, position after the encoding) — the consumed length is
        what lets compound members, enum bases, and array elements nest."""
        cls_ver = body[pos]
        cls = cls_ver & 0x0F
        version = cls_ver >> 4
        bits0, bits1 = body[pos + 1], body[pos + 2]
        size = struct.unpack_from("<I", body, pos + 4)[0]
        byteorder = ">" if (bits0 & 1) else "<"
        p = pos + 8
        if cls == 0:  # fixed-point: bit offset + precision properties
            signed = bool(bits0 & 0x08)
            return Datatype("int" if signed else "uint", size, byteorder), p + 4
        if cls == 1:  # floating point: 12 property bytes
            return Datatype("float", size, byteorder), p + 12
        if cls == 3:  # string (fixed length): no properties
            return Datatype("string", size, "<"), p
        if cls == 9:  # variable length: base datatype follows
            base, p2 = cls_._parse_datatype_at(body, p)
            kind = "vlen_str" if (bits0 & 0x0F) == 1 or base.kind == "string" \
                else "vlen"
            return Datatype(kind, size, "<"), p2
        if cls == 6:  # compound
            nmembers = bits0 | (bits1 << 8)
            members = []
            for _ in range(nmembers):
                if version == 3:
                    end = body.index(b"\x00", p)
                    name = body[p:end].decode("utf-8")
                    p = end + 1
                    # offset width = minimum bytes representing `size`
                    ow = max((int(size).bit_length() + 7) // 8, 1)
                    off = int.from_bytes(body[p : p + ow], "little")
                    p += ow
                else:
                    end = body.index(b"\x00", p)
                    name = body[p:end].decode("utf-8")
                    p += (end - p) // 8 * 8 + 8  # null-padded to 8
                    (off,) = struct.unpack_from("<I", body, p)
                    p += 4
                    if version == 1:
                        ndims = body[p]
                        p += 1 + 3 + 4 + 4 + 16  # dims/perm scratch (v1 only)
                        if ndims:
                            raise UnsupportedHDF5(
                                "v1 compound member with dimensions "
                                "(use an array datatype)",
                            )
                mt, p = cls_._parse_datatype_at(body, p)
                members.append((name, off, mt))
            return Datatype("compound", size, "<", members=members), p
        if cls == 8:  # enum: base type, then named values
            base, p = cls_._parse_datatype_at(body, p)
            nmembers = bits0 | (bits1 << 8)
            for _ in range(nmembers):
                end = body.index(b"\x00", p)
                p = (end + 1 if version == 3
                     else p + (end - p) // 8 * 8 + 8)  # v1/2 pad names to 8
            p += nmembers * base.size  # values (decoded data keeps the ints)
            return Datatype("enum", size, base.byteorder, base=base), p
        if cls == 10:  # array
            ndims = body[p]
            p += 1 if version == 3 else 4  # v2: 3 reserved bytes
            dims = struct.unpack_from(f"<{ndims}I", body, p)
            p += 4 * ndims
            if version == 2:
                p += 4 * ndims  # permutation indices (always identity)
            base, p = cls_._parse_datatype_at(body, p)
            return Datatype(
                "array", size, base.byteorder,
                shape=tuple(int(d) for d in dims), base=base,
            ), p
        raise UnsupportedHDF5(f"datatype class {cls}")

    @staticmethod
    def _parse_layout(body: bytes) -> dict:
        version = body[0]
        if version not in (3, 4):
            raise UnsupportedHDF5(f"data layout message version {version}")
        layout_class = body[1]
        if layout_class == 0:  # compact
            size = struct.unpack_from("<H", body, 2)[0]
            return {"layout": "compact", "compact_data": body[4 : 4 + size]}
        if layout_class == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", body, 2)
            return {"layout": "contiguous", "data_addr": addr, "data_size": size}
        if layout_class != 2:
            raise UnsupportedHDF5(f"layout class {layout_class}")
        if version == 3:  # chunked, v1 B-tree index
            ndims = body[2]
            dims = struct.unpack_from(f"<Q{ndims}I", body, 3)
            btree = dims[0]
            # last "dimension" is the element size, not a real dim
            return {
                "layout": "chunked",
                "btree_addr": btree,
                "chunk_shape": tuple(int(d) for d in dims[1:-1]),
            }
        # version 4 chunked ("latest" format): rank+1 dims where the LAST
        # entry is the datatype size (same internal layout libhdf5 keeps
        # for v3), then one of five chunk index flavors + the index address
        flags = body[2]
        ndims = body[3]
        enc = body[4]
        if ndims < 2:
            raise UnsupportedHDF5(
                f"v4 chunked layout with dimensionality {ndims} (needs the "
                "trailing element-size entry)",
            )
        dims = tuple(
            int.from_bytes(body[5 + i * enc : 5 + (i + 1) * enc], "little")
            for i in range(ndims)
        )
        p = 5 + ndims * enc
        itype = body[p]
        p += 1
        out = {
            "layout": "chunked",
            "chunk_shape": dims[:-1],
            "chunk_elem_size": int(dims[-1]),
            "chunk_flags": flags,
        }
        if itype == 1:  # single chunk
            out["chunk_index"] = "single"
            if flags & 0x02:  # filtered single chunk: size + mask inline
                size, mask = struct.unpack_from("<QI", body, p)
                p += 12
                out["chunk_aux"] = (int(size), int(mask))
        elif itype == 2:  # implicit: chunks contiguous in C grid order
            out["chunk_index"] = "implicit"
        elif itype == 3:  # fixed array
            out["chunk_index"] = "fixed"
            p += 1  # page bits (the header restates them)
        elif itype == 4:  # extensible array (one unlimited dimension)
            out["chunk_index"] = "extensible"
            # creation params: max-nelmts bits, index-block elements,
            # secondary-block min pointers, data-block min elements,
            # page bits — the EAHD header restates them (cross-checked)
            out["chunk_aux"] = tuple(body[p : p + 5])
            p += 5
        elif itype == 5:  # v2 B-tree (several unlimited dimensions)
            out["chunk_index"] = "btree2"
            p += 6  # node size (4) + split/merge percents (restated by BTHD)
        else:
            raise UnsupportedHDF5(f"chunk index type {itype}")
        (out["btree_addr"],) = struct.unpack_from("<Q", body, p)
        return out

    @staticmethod
    def _parse_filters(body: bytes) -> list[tuple[int, list[int]]]:
        version = body[0]
        nfilters = body[1]
        filters = []
        if version == 1:
            pos = 8
        elif version == 2:
            pos = 2
        else:
            raise UnsupportedHDF5(f"filter pipeline version {version}")
        for _ in range(nfilters):
            fid = struct.unpack_from("<H", body, pos)[0]
            pos += 2
            # v2 OMITS the Name Length field for built-in filters (id < 256)
            if version == 1 or fid >= 256:
                namelen = struct.unpack_from("<H", body, pos)[0]
                pos += 2
            else:
                namelen = 0
            _flags, ncli = struct.unpack_from("<HH", body, pos)
            pos += 4
            if namelen:
                pos += namelen + ((-namelen) % 8 if version == 1 else 0)
            cd = list(struct.unpack_from(f"<{ncli}I", body, pos))
            pos += 4 * ncli
            if version == 1 and ncli % 2:
                pos += 4
            filters.append((fid, cd))
        return filters

    def _parse_attribute(self, body: bytes):
        version = body[0]
        if version not in (1, 2, 3):
            raise UnsupportedHDF5(f"attribute message version {version}")
        flags = body[1] if version in (2, 3) else 0
        if flags & 0x02:
            # flag bit 1 marks a SHARED dataspace — the block below would
            # be a shared-message reference, not an inline definition
            raise UnsupportedHDF5("shared attribute dataspace")
        name_size, dt_size, sp_size = struct.unpack_from("<HHH", body, 2)
        # v3 inserts a 1-byte name character-set encoding before the name;
        # v1 pads name/datatype/dataspace blocks to 8 bytes, v2/v3 don't
        pos = 9 if version == 3 else 8
        name = body[pos : pos + name_size].split(b"\x00")[0].decode("utf-8")
        pos += name_size + ((-name_size) % 8 if version == 1 else 0)
        dt_block = body[pos : pos + dt_size]
        if flags & 0x01:  # shared (committed) attribute datatype
            dt_block = self._shared_message_body(dt_block, 0x0003)
        dtype = self._parse_datatype(dt_block)
        pos += dt_size + ((-dt_size) % 8 if version == 1 else 0)
        shape = self._parse_dataspace(body[pos : pos + sp_size])
        pos += sp_size + ((-sp_size) % 8 if version == 1 else 0)
        if shape is None:  # NULL dataspace (h5py.Empty): no stored value
            return name, None
        data = body[pos:]
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if dtype.kind in ("int", "uint", "float", "string"):
            arr = np.frombuffer(data[: n * dtype.size], dtype=dtype.np_dtype)
            if dtype.kind == "string":
                vals = [v.split(b"\x00")[0].decode("utf-8", "replace") for v in arr]
                return name, (vals[0] if not shape else vals)
            vals = arr.reshape(shape) if shape else arr[0]
            return name, (vals.item() if not shape else vals)
        if dtype.kind == "vlen_str":
            vals = []
            for i in range(n):
                length, heap_addr, index = struct.unpack_from("<IQI", data, 16 * i)
                vals.append(self._global_heap_object(heap_addr, index)[:length]
                            .decode("utf-8", "replace"))
            return name, (vals[0] if not shape else vals)
        raise UnsupportedHDF5(f"attribute datatype {dtype.kind}")

    # -- heaps --------------------------------------------------------------
    def _local_heap_string(self, heap_addr: int, offset: int) -> str:
        buf = self._buf
        if buf[heap_addr : heap_addr + 4] != b"HEAP":
            raise UnsupportedHDF5("bad local heap signature")
        data_addr = struct.unpack_from("<Q", buf, heap_addr + 24)[0]
        end = buf.find(b"\x00", data_addr + offset)
        if end < 0:
            raise UnsupportedHDF5("unterminated heap string")
        return buf[data_addr + offset : end].decode("utf-8")

    def _global_heap_object(self, heap_addr: int, index: int) -> bytes:
        buf = self._buf
        if buf[heap_addr : heap_addr + 4] != b"GCOL":
            raise UnsupportedHDF5("bad global heap signature")
        size = struct.unpack_from("<Q", buf, heap_addr + 8)[0]
        pos = heap_addr + 16
        endpos = heap_addr + size
        while pos < endpos:
            idx, _refc, _res, osize = struct.unpack_from("<HHIQ", buf, pos)
            if idx == 0:
                break
            if idx == index:
                return buf[pos + 16 : pos + 16 + osize]
            pos += 16 + osize + ((-osize) % 8)
        raise KeyError(f"global heap object {index} not found")

    # -- group B-tree (node type 0) -----------------------------------------
    def _group_entries(self, group: Group) -> list[tuple[str, int]]:
        if group.links is not None:  # new-style compact storage
            return group.links
        key = f"grp:{group.btree_addr}"
        if key in self._cache:
            return self._cache[key]
        entries: list[tuple[str, int]] = []
        if group.btree_addr != UNDEF:
            self._walk_group_btree(group.btree_addr, group.heap_addr, entries)
        self._cache[key] = entries
        return entries

    def _walk_group_btree(self, addr: int, heap: int, out: list) -> None:
        buf = self._buf
        if buf[addr : addr + 4] == b"SNOD":
            self._read_snod(addr, heap, out)
            return
        if buf[addr : addr + 4] != b"TREE":
            raise UnsupportedHDF5("bad B-tree signature")
        node_type = buf[addr + 4]
        level = buf[addr + 5]
        nentries = struct.unpack_from("<H", buf, addr + 6)[0]
        if node_type != 0:
            raise UnsupportedHDF5(f"B-tree node type {node_type} in group walk")
        pos = addr + 8 + 16  # skip left/right sibling
        pos += 8  # key 0
        for _ in range(nentries):
            child = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
            pos += 8  # key i+1
            if level == 0:
                self._read_snod(child, heap, out)
            else:
                self._walk_group_btree(child, heap, out)

    def _read_snod(self, addr: int, heap: int, out: list) -> None:
        buf = self._buf
        if buf[addr : addr + 4] != b"SNOD":
            raise UnsupportedHDF5("bad symbol node signature")
        nsyms = struct.unpack_from("<H", buf, addr + 6)[0]
        pos = addr + 8
        for _ in range(nsyms):
            name_off, obj_addr, cache_type = struct.unpack_from("<QQI", buf, pos)
            if cache_type == 2:
                # symbolic link: obj_addr is undefined; the first 4 scratch
                # bytes hold the local-heap offset of the target path
                (toff,) = struct.unpack_from("<I", buf, pos + 24)
                out.append((
                    self._local_heap_string(heap, name_off),
                    SoftLink(self._local_heap_string(heap, toff)),
                ))
            else:
                out.append((self._local_heap_string(heap, name_off), obj_addr))
            pos += 40  # entry: 8+8+4+4+16

    # -- dense (fractal heap) link / attribute storage ----------------------
    def _dense_links(self, fheap_addr: int, btree_addr: int):
        """Dense link storage: the name-index v2 B-tree (type 5, records =
        4-byte name hash + fractal heap ID) enumerates every link; each
        heap object is a serialized link message (same wire format as
        header message 0x0006)."""
        heap = _FractalHeap(self._buf, fheap_addr)
        out = []
        for rec in self._v2_btree_records(btree_addr, expected_type=5):
            out.append(self._parse_link(heap.read(rec[4 : 4 + heap.id_len])))
        return out

    def _dense_attrs(self, fheap_addr: int, btree_addr: int) -> dict:
        """Dense attribute storage: type-8 records are an 8-byte heap ID,
        1-byte message flags, 4-byte creation order, 4-byte name hash; the
        heap objects are attribute messages (0x000C bodies, version 3 in
        libhdf5-written files)."""
        heap = _FractalHeap(self._buf, fheap_addr)
        if heap.id_len > 8:
            raise UnsupportedHDF5(
                f"dense attribute heap ID length {heap.id_len} overruns the "
                "8-byte record field",
            )
        attrs: dict = {}
        for rec in self._v2_btree_records(btree_addr, expected_type=8):
            if rec[8] & 0x02:  # shared-message flag on the stored message
                raise UnsupportedHDF5("shared dense attribute message")
            name, value = self._parse_attribute(heap.read(rec[: heap.id_len]))
            attrs[name] = value
        return attrs

    def _v2_btree_records(self, addr: int, expected_type: int) -> list[bytes]:
        """Walk a version-2 B-tree ('BTHD' header over 'BTIN'/'BTLF' nodes)
        and return every record in tree order. Depths 0 and 1 only: a
        512-byte node holds ~45 link records, so two levels already index
        ~2000 links per group; anything deeper raises. Checksums (trailing
        lookup3 over the used prefix, libhdf5's serialization) verify."""
        buf = self._buf
        if buf[addr : addr + 4] != b"BTHD":
            raise UnsupportedHDF5("bad v2 B-tree header signature")
        if buf[addr + 4] != 0:
            raise UnsupportedHDF5(f"v2 B-tree version {buf[addr + 4]}")
        btype = buf[addr + 5]
        if btype != expected_type:
            raise UnsupportedHDF5(
                f"v2 B-tree type {btype} where type {expected_type} expected",
            )
        node_size, record_size, depth = struct.unpack_from("<IHH", buf, addr + 6)
        root_addr, root_nrec = struct.unpack_from("<QH", buf, addr + 16)
        _verify_checksum(buf, addr, 34, "v2 B-tree header")
        out: list[bytes] = []
        if root_addr == UNDEF:
            return out
        if depth == 0:
            self._v2_leaf(root_addr, root_nrec, record_size, btype, out)
            return out
        if depth > 1:
            raise UnsupportedHDF5(f"v2 B-tree depth {depth} (0 or 1 supported)")
        if buf[root_addr : root_addr + 4] != b"BTIN":
            raise UnsupportedHDF5("bad v2 B-tree internal-node signature")
        if buf[root_addr + 4] != 0 or buf[root_addr + 5] != btype:
            raise UnsupportedHDF5("v2 B-tree internal node version/type mismatch")
        # child-pointer record counts are sized for the most records a
        # LEAF child can hold (spec III.A.2) — prefix 6 + trailing sum 4
        leaf_cap = (node_size - 10) // record_size
        nrec_width = _min_bytes(leaf_cap)
        rec_base = root_addr + 6
        ptr_base = rec_base + root_nrec * record_size
        used = 6 + root_nrec * record_size + (root_nrec + 1) * (8 + nrec_width)
        _verify_checksum(buf, root_addr, used, "v2 B-tree internal node")
        for i in range(root_nrec + 1):
            p = ptr_base + i * (8 + nrec_width)
            child = struct.unpack_from("<Q", buf, p)[0]
            child_nrec = int.from_bytes(
                buf[p + 8 : p + 8 + nrec_width], "little",
            )
            self._v2_leaf(child, child_nrec, record_size, btype, out)
            if i < root_nrec:
                out.append(bytes(
                    buf[rec_base + i * record_size:
                        rec_base + (i + 1) * record_size],
                ))
        return out

    def _v2_leaf(
        self, addr: int, nrec: int, record_size: int, btype: int, out: list,
    ) -> None:
        buf = self._buf
        if buf[addr : addr + 4] != b"BTLF":
            raise UnsupportedHDF5("bad v2 B-tree leaf signature")
        if buf[addr + 4] != 0 or buf[addr + 5] != btype:
            raise UnsupportedHDF5("v2 B-tree leaf version/type mismatch")
        _verify_checksum(buf, addr, 6 + nrec * record_size, "v2 B-tree leaf")
        for i in range(nrec):
            out.append(bytes(
                buf[addr + 6 + i * record_size:
                    addr + 6 + (i + 1) * record_size],
            ))

    # -- chunk B-tree (node type 1) -----------------------------------------
    def _iter_chunks(self, addr: int, ndims: int):
        buf = self._buf
        if buf[addr : addr + 4] != b"TREE":
            raise UnsupportedHDF5("bad chunk B-tree signature")
        node_type = buf[addr + 4]
        level = buf[addr + 5]
        nentries = struct.unpack_from("<H", buf, addr + 6)[0]
        if node_type != 1:
            raise UnsupportedHDF5(f"B-tree node type {node_type} in chunk walk")
        key_size = 8 + 8 * (ndims + 1)
        pos = addr + 8 + 16
        for _ in range(nentries):
            nbytes, fmask = struct.unpack_from("<II", buf, pos)
            offsets = struct.unpack_from(f"<{ndims}Q", buf, pos + 8)
            child = struct.unpack_from("<Q", buf, pos + key_size)[0]
            pos += key_size + 8
            if level == 0:
                yield tuple(int(o) for o in offsets), child, nbytes, fmask
            else:
                yield from self._iter_chunks(child, ndims)

    # -- layout-v4 chunk indexes ---------------------------------------------
    def _chunk_grid(self, ds: Dataset) -> list[int]:
        return [
            -(-s // c) for s, c in zip(ds.shape, ds.chunk_shape)
        ]

    @staticmethod
    def _grid_offsets(i: int, grid: list[int], chunk_shape) -> tuple:
        """Chunk linear index -> element offsets (grid coords scaled by
        the chunk shape)."""
        return tuple(
            g * c for g, c in zip(_grid_coords(i, grid), chunk_shape)
        )

    def _iter_chunks_v4(self, ds: Dataset, itemsize: int):
        """Chunk records from a layout-v4 index: single chunk (the address
        in the message, size/mask inline when filtered), implicit
        (chunks contiguous in C grid order, unfiltered by spec), or a
        fixed array ('FAHD' header + 'FADB' element block; client 0 =
        bare addresses, client 1 = address + stored size + filter mask).
        Paged fixed arrays (element count past the data block's page
        threshold) raise — a page walk is mechanical but unexercisable
        here, and silence would skip chunks."""
        nominal = int(np.prod(ds.chunk_shape, dtype=np.int64)) * itemsize
        if ds.chunk_index == "extensible":
            yield from self._iter_extensible(ds, nominal)
            return
        if ds.chunk_index == "btree2":
            yield from self._iter_btree2_chunks(ds, nominal)
            return
        if ds.chunk_index == "single":
            if ds.chunk_aux:
                size, mask = ds.chunk_aux
            else:
                size, mask = nominal, 0
            yield tuple(0 for _ in ds.shape), ds.btree_addr, size, mask
            return
        grid = self._chunk_grid(ds)
        nchunks = int(np.prod(grid, dtype=np.int64))
        if ds.chunk_index == "implicit":
            for i in range(nchunks):
                yield (self._grid_offsets(i, grid, ds.chunk_shape),
                       ds.btree_addr + i * nominal, nominal, 0)
            return
        if ds.chunk_index != "fixed":
            raise UnsupportedHDF5(f"chunk index {ds.chunk_index!r}")
        buf = self._buf
        addr = ds.btree_addr
        if buf[addr : addr + 4] != b"FAHD":
            raise UnsupportedHDF5("bad fixed-array header signature")
        if buf[addr + 4] != 0:
            raise UnsupportedHDF5(f"fixed array version {buf[addr + 4]}")
        client = buf[addr + 5]
        entry_size = buf[addr + 6]
        page_bits = buf[addr + 7]
        nelmts, dblk = struct.unpack_from("<QQ", buf, addr + 8)
        _verify_checksum(buf, addr, 24, "fixed-array header")
        if client not in (0, 1):
            raise UnsupportedHDF5(f"fixed array client {client}")
        if dblk == UNDEF:
            return
        if buf[dblk : dblk + 4] != b"FADB":
            raise UnsupportedHDF5("bad fixed-array data block signature")
        if buf[dblk + 4] != 0 or buf[dblk + 5] != client:
            raise UnsupportedHDF5("fixed-array data block version/client "
                                  "mismatch")
        if struct.unpack_from("<Q", buf, dblk + 6)[0] != addr:
            raise UnsupportedHDF5(
                "truncated or corrupt HDF5 file (fixed-array data block "
                "does not point back at its header)",
            )
        if nelmts != nchunks:
            raise UnsupportedHDF5(
                f"fixed array holds {nelmts} entries for a {nchunks}-chunk "
                "grid",
            )
        nelmts = int(nelmts)

        def entries(base: int, start: int, count: int):
            for k in range(count):
                e = buf[base + k * entry_size : base + (k + 1) * entry_size]
                (caddr,) = struct.unpack_from("<Q", e, 0)
                if caddr == UNDEF:
                    continue
                if client == 0:
                    size, mask = nominal, 0
                else:
                    size = int.from_bytes(e[8 : entry_size - 4], "little")
                    (mask,) = struct.unpack_from("<I", e, entry_size - 4)
                yield (self._grid_offsets(start + k, grid, ds.chunk_shape),
                       caddr, size, mask)

        page_n = 1 << page_bits
        if nelmts <= page_n:
            _verify_checksum(buf, dblk, 14 + nelmts * entry_size,
                             "fixed-array data block")
            yield from entries(dblk + 14, 0, nelmts)
            return
        # paged data block: prefix holds only the page bitmap; the pages
        # (page_n elements each, last one truncated, own trailing
        # checksums) sit back-to-back right after the block
        npages = -(-nelmts // page_n)
        bitmap_bytes = (npages + 7) // 8
        _verify_checksum(buf, dblk, 14 + bitmap_bytes,
                         "fixed-array data block")
        bitmap = buf[dblk + 14 : dblk + 14 + bitmap_bytes]
        page_addr = dblk + 14 + bitmap_bytes + 4
        for pg in range(npages):
            count = min(page_n, nelmts - pg * page_n)
            # libhdf5's H5VM_bit_get numbers bit 0 as the byte's HIGH bit
            if bitmap[pg // 8] & (0x80 >> (pg % 8)):
                _verify_checksum(buf, page_addr, count * entry_size,
                                 "fixed-array data block page")
                yield from entries(page_addr, pg * page_n, count)
            page_addr += count * entry_size + 4

    def _iter_btree2_chunks(self, ds: Dataset, nominal: int):
        """Chunk records from a v2 B-tree index (types 10/11 — several
        unlimited dimensions): each record is the chunk address, then
        (filtered only) stored size + filter mask, then the chunk's
        SCALED offsets (grid coordinates, 8 bytes each); the filtered
        record's size-field width falls out of the header's record size.
        Reuses the dense-storage v2 B-tree walker (depths 0-1,
        checksums verified)."""
        buf = self._buf
        ndims = len(ds.shape)
        btype = buf[ds.btree_addr + 5] if \
            buf[ds.btree_addr : ds.btree_addr + 4] == b"BTHD" else -1
        if btype not in (10, 11):
            raise UnsupportedHDF5(
                f"v2 B-tree chunk index with record type {btype}",
            )
        (record_size,) = struct.unpack_from("<H", buf, ds.btree_addr + 10)
        size_len = 0 if btype == 10 else record_size - 12 - 8 * ndims
        if (btype == 10 and record_size != 8 + 8 * ndims) or (
            btype == 11 and size_len < 1
        ):
            raise UnsupportedHDF5(
                f"v2 B-tree chunk record size {record_size} does not fit "
                f"a rank-{ndims} chunk record",
            )
        for rec in self._v2_btree_records(ds.btree_addr, expected_type=btype):
            (caddr,) = struct.unpack_from("<Q", rec, 0)
            if caddr == UNDEF:
                continue
            if btype == 10:
                size, mask, p = nominal, 0, 8
            else:
                size = int.from_bytes(rec[8 : 8 + size_len], "little")
                (mask,) = struct.unpack_from("<I", rec, 8 + size_len)
                p = 12 + size_len
            scaled = struct.unpack_from(f"<{ndims}Q", rec, p)
            offsets = tuple(
                int(o) * c for o, c in zip(scaled, ds.chunk_shape)
            )
            if any(o >= s for o, s in zip(offsets, ds.shape)):
                raise UnsupportedHDF5(
                    "truncated or corrupt HDF5 file (chunk record beyond "
                    "the dataset extent)",
                )
            yield offsets, caddr, size, mask

    def _iter_extensible(self, ds: Dataset, nominal: int):
        """Chunk records from an extensible-array index ('EAHD' header,
        'EAIB' index block, 'EASB' super blocks, 'EADB' data blocks) —
        the v4 flavor libhdf5 picks for ONE unlimited dimension. The
        element space is: ``idx_elmts`` records directly in the index
        block, then super-block generations where generation s holds
        2^(s//2) data blocks of ``min_elmts * 2^((s+1)//2)`` records; the
        index block embeds the data-block pointers of generations below
        2*log2(min_ptrs) and points at the later generations' super
        blocks. Every block's stored array offset is cross-checked
        against the walk (a geometry disagreement raises — never a
        misread), paged data blocks raise, and all checksums verify."""
        buf = self._buf
        a = ds.btree_addr
        if buf[a : a + 4] != b"EAHD":
            raise UnsupportedHDF5("bad extensible-array header signature")
        if buf[a + 4] != 0:
            raise UnsupportedHDF5(f"extensible array version {buf[a + 4]}")
        client = buf[a + 5]
        if client not in (0, 1):
            raise UnsupportedHDF5(f"extensible array client {client}")
        elt_size = buf[a + 6]
        max_bits, idx_elmts, min_elmts, min_ptrs, page_bits = buf[a + 7 : a + 12]
        _verify_checksum(buf, a, 68, "extensible-array header")
        if ds.chunk_aux and tuple(ds.chunk_aux) != (
            max_bits, idx_elmts, min_ptrs, min_elmts, page_bits,
        ):
            raise UnsupportedHDF5(
                "truncated or corrupt HDF5 file (extensible-array header "
                "disagrees with the layout message's creation parameters)",
            )
        (iblk,) = struct.unpack_from("<Q", buf, a + 60)
        if client == 0 and elt_size != 8:
            raise UnsupportedHDF5(
                f"extensible array element size {elt_size} for bare chunks",
            )
        if client == 1 and elt_size < 13:
            raise UnsupportedHDF5(
                f"extensible array element size {elt_size} cannot hold "
                "address + size + filter mask",
            )
        grid = self._chunk_grid(ds)
        nchunks = int(np.prod(grid, dtype=np.int64))
        nsblks = max_bits - (min_elmts.bit_length() - 1)
        first = 2 * (min_ptrs.bit_length() - 1)
        arr_off_size = (max_bits + 7) // 8

        def record(e: bytes, i: int):
            (caddr,) = struct.unpack_from("<Q", e, 0)
            if caddr == UNDEF or i >= nchunks:
                return None
            if client == 0:
                size, mask = nominal, 0
            else:
                size = int.from_bytes(e[8 : elt_size - 4], "little")
                (mask,) = struct.unpack_from("<I", e, elt_size - 4)
            return (self._grid_offsets(i, grid, ds.chunk_shape),
                    caddr, size, mask)

        if iblk == UNDEF:
            return
        if buf[iblk : iblk + 4] != b"EAIB":
            raise UnsupportedHDF5("bad extensible-array index block signature")
        if buf[iblk + 4] != 0 or buf[iblk + 5] != client:
            raise UnsupportedHDF5("extensible-array index block "
                                  "version/client mismatch")
        if struct.unpack_from("<Q", buf, iblk + 6)[0] != a:
            raise UnsupportedHDF5(
                "truncated or corrupt HDF5 file (index block does not point "
                "back at its extensible-array header)",
            )
        iblk_nptrs = sum(1 << (s // 2) for s in range(min(first, nsblks)))
        n_sblk_ptrs = max(nsblks - first, 0)
        used = 14 + idx_elmts * elt_size + (iblk_nptrs + n_sblk_ptrs) * 8
        _verify_checksum(buf, iblk, used, "extensible-array index block")
        elems_at = iblk + 14
        dptr_at = elems_at + idx_elmts * elt_size
        sptr_at = dptr_at + iblk_nptrs * 8

        for k in range(min(idx_elmts, nchunks)):
            rec = record(buf[elems_at + k * elt_size:
                             elems_at + (k + 1) * elt_size], k)
            if rec:
                yield rec

        def read_dblk(addr: int, start: int, count: int):
            if buf[addr : addr + 4] != b"EADB":
                raise UnsupportedHDF5(
                    "bad extensible-array data block signature",
                )
            if buf[addr + 4] != 0 or buf[addr + 5] != client:
                raise UnsupportedHDF5("extensible-array data block "
                                      "version/client mismatch")
            if struct.unpack_from("<Q", buf, addr + 6)[0] != a:
                raise UnsupportedHDF5(
                    "truncated or corrupt HDF5 file (data block does not "
                    "point back at its extensible-array header)",
                )
            stored = int.from_bytes(
                buf[addr + 14 : addr + 14 + arr_off_size], "little",
            )
            if stored != start:
                raise UnsupportedHDF5(
                    "truncated or corrupt HDF5 file (extensible-array data "
                    f"block offset {stored} where the walk expected {start})",
                )
            base = addr + 14 + arr_off_size
            _verify_checksum(buf, addr, 14 + arr_off_size + count * elt_size,
                             "extensible-array data block")
            for k in range(count):
                rec = record(buf[base + k * elt_size:
                                 base + (k + 1) * elt_size], start + k)
                if rec:
                    yield rec

        elem_idx = idx_elmts
        dptr_seen = 0
        for s in range(nsblks):
            if elem_idx >= nchunks:
                return
            ndblks = 1 << (s // 2)
            dblk_n = min_elmts << ((s + 1) // 2)
            if s < first:  # data-block pointers embedded in the index block
                for d in range(ndblks):
                    if elem_idx >= nchunks:
                        return
                    (daddr,) = struct.unpack_from(
                        "<Q", buf, dptr_at + (dptr_seen + d) * 8,
                    )
                    if daddr != UNDEF:
                        if dblk_n > (1 << page_bits):
                            raise UnsupportedHDF5(
                                "paged extensible-array data block",
                            )
                        yield from read_dblk(daddr, elem_idx, dblk_n)
                    elem_idx += dblk_n
                dptr_seen += ndblks
                continue
            (saddr,) = struct.unpack_from(
                "<Q", buf, sptr_at + (s - first) * 8,
            )
            if saddr == UNDEF:
                elem_idx += ndblks * dblk_n
                continue
            if buf[saddr : saddr + 4] != b"EASB":
                raise UnsupportedHDF5(
                    "bad extensible-array super block signature",
                )
            if buf[saddr + 4] != 0 or buf[saddr + 5] != client:
                raise UnsupportedHDF5("extensible-array super block "
                                      "version/client mismatch")
            if struct.unpack_from("<Q", buf, saddr + 6)[0] != a:
                raise UnsupportedHDF5(
                    "truncated or corrupt HDF5 file (super block does not "
                    "point back at its extensible-array header)",
                )
            stored = int.from_bytes(
                buf[saddr + 14 : saddr + 14 + arr_off_size], "little",
            )
            if stored != elem_idx:
                raise UnsupportedHDF5(
                    "truncated or corrupt HDF5 file (extensible-array super "
                    f"block offset {stored} where the walk expected "
                    f"{elem_idx})",
                )
            if dblk_n > (1 << page_bits):
                raise UnsupportedHDF5("paged extensible-array data block")
            sbase = saddr + 14 + arr_off_size
            _verify_checksum(buf, saddr, 14 + arr_off_size + ndblks * 8,
                             "extensible-array super block")
            for d in range(ndblks):
                if elem_idx >= nchunks:
                    return
                (daddr,) = struct.unpack_from("<Q", buf, sbase + d * 8)
                if daddr != UNDEF:
                    yield from read_dblk(daddr, elem_idx, dblk_n)
                elem_idx += dblk_n
        if elem_idx < nchunks:
            raise UnsupportedHDF5(
                f"extensible array exhausted its {nsblks} super-block "
                f"generations before covering {nchunks} chunks",
            )

    # -- filters ------------------------------------------------------------
    @staticmethod
    def _defilter(raw: bytes, filters, filter_mask: int, itemsize: int) -> bytes:
        # applied in reverse pipeline order; bit i of filter_mask = skip i
        for i in range(len(filters) - 1, -1, -1):
            fid, cd = filters[i]
            if filter_mask & (1 << i):
                continue
            if fid == 1:          # deflate
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as exc:
                    # bit-flipped/garbage chunk bytes within file bounds:
                    # name the corruption, don't leak zlib internals
                    raise UnsupportedHDF5(
                        f"truncated or corrupt HDF5 file (deflate chunk: {exc})",
                    ) from exc
            elif fid == 2:        # shuffle
                size = cd[0] if cd else itemsize
                arr = np.frombuffer(raw, dtype=np.uint8)
                n = arr.size // size
                raw = arr[: n * size].reshape(size, n).T.tobytes() + bytes(
                    arr[n * size :],
                )
            elif fid == 3:        # fletcher32: trailing 4-byte checksum
                raw = raw[:-4]
            elif fid == 5:        # n-bit
                raw = _nbit_decode(raw, cd)
            elif fid == 6:        # scale-offset
                raw = _scaleoffset_decode(raw, cd)
            elif fid == 32000:    # LZF (h5py's built-in filter)
                raw = _lzf_decompress(raw)
            else:
                raise UnsupportedHDF5(f"filter id {fid}")
        return raw


def _unpack_bit_fields(raw: bytes, nelmts: int, nbits: int) -> np.ndarray:
    """MSB-first bit stream → ``(nelmts,)`` uint64 of consecutive
    ``nbits``-wide fields — the packing both the n-bit and scale-offset
    filters use (each element's significant bits appended most
    significant first; H5Znbit.c / H5Zscaleoffset.c)."""
    if nbits == 0:
        return np.zeros(nelmts, dtype=np.uint64)
    if nbits > 64:
        raise UnsupportedHDF5(f"{nbits}-bit packed fields exceed 64 bits")
    need = nelmts * nbits
    try:
        packed = np.frombuffer(raw, np.uint8, count=(need + 7) // 8)
    except ValueError as exc:
        raise UnsupportedHDF5(
            "truncated or corrupt HDF5 file (bit-packed chunk shorter "
            "than its element count)",
        ) from exc
    bits = np.unpackbits(packed)[:need].reshape(nelmts, nbits)
    # per-plane shift-accumulate, not a (nelmts × nbits) uint64 product:
    # a 1M-element chunk at minbits ~50 would otherwise build ~400 MB
    # temporaries on the executor decode path; this keeps 8 B/element
    out = np.zeros(nelmts, dtype=np.uint64)
    for j in range(nbits):
        out = (out << np.uint64(1)) | bits[:, j]
    return out


def _nbit_decode(raw: bytes, cd) -> bytes:
    """H5Z_FILTER_NBIT (id 5) for the ATOMIC datatype class, from the
    public H5Znbit.c parameter layout: ``cd = [nparms, no-op flag,
    nelmts, class, size, order, precision, offset]``. The stream is each
    element's ``precision``-bit span packed MSB-first; reconstruction
    places the span at bit ``offset`` with zeros elsewhere (the filter
    zero-initializes the output buffer). Array/compound classes and
    big-endian data refuse loudly."""
    if len(cd) < 4:
        raise UnsupportedHDF5("n-bit filter with malformed parameters")
    if cd[1]:  # "no need to compress" flag: chunk stored verbatim
        return raw
    nelmts, cls = cd[2], cd[3]
    if cls != 1 or len(cd) < 8:  # H5Z_NBIT_ATOMIC
        raise UnsupportedHDF5(
            "n-bit filter on a non-atomic (array/compound) datatype",
        )
    size, order, precision, offset = cd[4], cd[5], cd[6], cd[7]
    if order != 0:  # H5Z_NBIT_ORDER_LE
        raise UnsupportedHDF5("n-bit filter on big-endian data")
    if not 1 <= size <= 8 or precision == 0 or precision + offset > size * 8:
        raise UnsupportedHDF5(
            f"n-bit parameters out of range (size {size}, precision "
            f"{precision}, offset {offset})",
        )
    vals = _unpack_bit_fields(raw, nelmts, precision) << np.uint64(offset)
    return vals.astype("<u8").view(np.uint8).reshape(nelmts, 8)[:, :size].tobytes()


def _scaleoffset_decode(raw: bytes, cd) -> bytes:
    """H5Z_FILTER_SCALEOFFSET (id 6), public H5Zscaleoffset.c layout:
    ``cd = [scale_type, scale_factor, nelmts, class, size, sign, order,
    fill_available, fill_value words…]``. The compressed chunk is a
    21-byte header (minbits u32 LE at 0, minval byte count at 4, minval
    LE from 5; data at the fixed buf_offset 21) followed by each
    element's ``value − minval`` packed MSB-first at ``minbits`` bits.
    A defined fill value encodes as the all-ones field. Integer
    (H5Z_SO_INT) and float D-scaling are implemented; E-scaling and
    big-endian refuse loudly. minbits == element width means the
    ORIGINAL untransformed elements are stored verbatim after the
    header (H5Zscaleoffset.c's compressor guards the min-subtraction —
    and for floats even the int conversion — behind
    ``if (*minbits != sizeof(type)*8)``, and its decompressor memcpys
    and early-returns, skipping postdecompress entirely), so that
    branch returns the bytes with no minval restore or fill mapping."""
    if len(cd) < 8:
        raise UnsupportedHDF5("scale-offset filter with malformed parameters")
    scale_type, scale_factor, nelmts = cd[0], cd[1], cd[2]
    size, order, filavail = cd[4], cd[6], cd[7]
    if order != 0:  # H5Z_SCALEOFFSET_ORDER_LE
        raise UnsupportedHDF5("scale-offset filter on big-endian data")
    if scale_type not in (0, 2):  # H5Z_SO_FLOAT_DSCALE / H5Z_SO_INT
        raise UnsupportedHDF5(
            "scale-offset E-scaling (H5Z_SO_FLOAT_ESCALE) unsupported",
        )
    if not 1 <= size <= 8:
        raise UnsupportedHDF5(f"scale-offset on {size}-byte elements")
    if len(raw) < 21:
        raise UnsupportedHDF5("truncated scale-offset chunk header")
    minbits = int.from_bytes(raw[0:4], "little")
    minval = int.from_bytes(raw[5 : 5 + min(raw[4], 8)], "little")
    data = raw[21:]
    width = size * 8
    if minbits > width:
        raise UnsupportedHDF5(
            f"scale-offset minbits {minbits} exceeds the {width}-bit element",
        )
    if minbits == width:
        # full precision: the ORIGINAL buffer verbatim — no minval add,
        # no fill mapping, no D-scale (libhdf5's decompressor memcpys
        # and returns before postdecompress)
        if len(data) < nelmts * size:
            raise UnsupportedHDF5(
                "truncated or corrupt HDF5 file (scale-offset full-"
                "precision chunk shorter than its element count)",
            )
        return data[: nelmts * size]
    packed = _unpack_bit_fields(data, nelmts, minbits)
    fill_bytes = None
    if filavail and minbits > 0:  # H5Z_SCALEOFFSET_FILL_DEFINED
        nwords = (size + 3) // 4
        words = cd[8 : 8 + nwords]
        if len(words) < nwords:
            raise UnsupportedHDF5(
                "scale-offset pipeline message declares a fill value but "
                "omits its words",
            )
        fill_bytes = b"".join(
            int(w).to_bytes(4, "little") for w in words
        )[:size]
    is_fill = (
        packed == np.uint64((1 << minbits) - 1)
        if fill_bytes is not None else None
    )
    vals = packed + np.uint64(minval & 0xFFFFFFFFFFFFFFFF)
    if scale_type == 2:  # integers: minval restore is two's-complement
        if fill_bytes is not None:
            fv = np.uint64(int.from_bytes(fill_bytes.ljust(8, b"\0"), "little"))
            vals = np.where(is_fill, fv, vals)
        return vals.astype("<u8").view(np.uint8).reshape(nelmts, 8)[:, :size].tobytes()
    # float D-scaling: value = (signed scaled + minval) / 10^scale_factor
    if size not in (4, 8):
        raise UnsupportedHDF5(
            f"scale-offset D-scaling on a {size}-byte float",
        )
    if width < 64:
        vals = vals & np.uint64((1 << width) - 1)
        signed = vals.astype(np.int64)
        signed[signed >= (1 << (width - 1))] -= 1 << width
    else:
        signed = vals.view(np.int64)
    fdtype = np.dtype(f"<f{size}")
    ftype = np.float32 if size == 4 else np.float64
    out = (signed.astype(ftype) / ftype(10.0 ** scale_factor)).astype(fdtype)
    if fill_bytes is not None:
        fv = np.frombuffer(fill_bytes, fdtype)[0]
        out = np.where(is_fill, fv, out).astype(fdtype)
    return out.tobytes()


def _lzf_decompress(data: bytes) -> bytes:
    """Pure-Python LZF decompression (h5py's built-in filter, id 32000;
    the liblzf stream format is public: a control byte < 0x20 introduces
    a literal run of ctrl+1 bytes, anything else a back-reference of
    length (ctrl >> 5) [+ one extension byte when 7] + 2 at distance
    ((ctrl & 0x1f) << 8 | next) + 1). Back-references may self-overlap
    (run-length encoding), so they copy byte-ranged with an explicit
    overlap loop; literal runs are slice copies. h5py stores chunks the
    filter could not shrink UNCOMPRESSED with the chunk's filter-mask bit
    set, so only genuine LZF streams reach here."""
    out = bytearray()
    pos, n = 0, len(data)
    try:
        while pos < n:
            ctrl = data[pos]
            pos += 1
            if ctrl < 0x20:  # literal run
                out += data[pos : pos + ctrl + 1]
                if pos + ctrl + 1 > n:
                    raise IndexError
                pos += ctrl + 1
            else:
                length = ctrl >> 5
                if length == 7:
                    length += data[pos]
                    pos += 1
                length += 2
                ref = len(out) - (((ctrl & 0x1F) << 8) | data[pos]) - 1
                pos += 1
                if ref < 0:
                    raise IndexError
                while length > 0:  # overlap-safe: copy what exists so far
                    take = min(length, len(out) - ref)
                    out += out[ref : ref + take]
                    ref += take
                    length -= take
    except IndexError as exc:
        raise UnsupportedHDF5(
            "truncated or corrupt HDF5 file (LZF chunk reads past its "
            "bounds)",
        ) from exc
    return bytes(out)


def _lzf_compress(data: bytes) -> bytes:
    """Greedy LZF compression (the encoder half, for fixtures and the
    writer's tests): hash-chained longest-match search emitting the same
    stream grammar _lzf_decompress reads. Format-compatible with liblzf,
    not byte-identical to it — any valid stream decodes the same."""
    out = bytearray()
    lit = bytearray()
    table: dict[bytes, int] = {}
    pos, n = 0, len(data)

    def flush_literals() -> None:
        i = 0
        while i < len(lit):
            run = lit[i : i + 32]
            out.append(len(run) - 1)
            out.extend(run)
            i += 32
        lit.clear()

    while pos < n:
        key = bytes(data[pos : pos + 3])
        ref = table.get(key) if len(key) == 3 else None
        if ref is not None and 0 <= pos - ref - 1 < (1 << 13):
            length = 3
            limit = min(n - pos, 264)  # max encodable: 7 + 255 + 2
            while length < limit and data[ref + length] == data[pos + length]:
                length += 1
            flush_literals()
            dist = pos - ref - 1
            ctl_len = length - 2
            if ctl_len < 7:
                out.append((ctl_len << 5) | (dist >> 8))
            else:
                out.append((7 << 5) | (dist >> 8))
                out.append(ctl_len - 7)
            out.append(dist & 0xFF)
            for k in range(pos, min(pos + length, n - 2)):
                table[bytes(data[k : k + 3])] = k
            pos += length
        else:
            if len(key) == 3:
                table[key] = pos
            lit.append(data[pos])
            pos += 1
    flush_literals()
    return bytes(out)
