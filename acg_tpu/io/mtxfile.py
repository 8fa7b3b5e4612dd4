"""Matrix Market I/O: text, gzip, and aCG-compatible binary formats.

Re-expresses the reference's ``acg/mtxfile.{h,c}`` (its largest module,
~7k LoC of C): header parsing, coordinate/array formats, real/integer/
pattern fields, general/symmetric symmetry, gzip filtering, and the custom
binary format produced by the reference's ``mtx2bin`` tool.

Binary format parity (mtxfile.c:1460-1500, 660-760): the header and size
lines are plain text exactly as in the text format; the data section is raw
native-endian arrays — all row indices (1-based, ``acgidx_t`` = int32 or
int64 depending on the build's ACG_IDX_SIZE), then all column indices, then
all values (float64).  ``idx_size`` selects the index width (default 64).

Unlike the reference we parse with vectorized numpy instead of per-line C
loops; a native C++ fast path can be added behind the same API if needed.
"""

from __future__ import annotations

import dataclasses
import gzip as gzip_mod
import io as io_mod
import os

import numpy as np

from ..config import idx_dtype as _idx_dtype
from ..errors import InvalidFormatError, NotSupportedError, UnexpectedEofError

OBJECTS = ("matrix", "vector")
FORMATS = ("coordinate", "array")
FIELDS = ("real", "integer", "pattern", "complex")
SYMMETRIES = ("general", "symmetric", "skew-symmetric", "hermitian")


@dataclasses.dataclass
class MtxFile:
    """An in-memory Matrix Market file (struct acgmtxfile analogue).

    Indices are stored 0-based; I/O converts to/from 1-based.
    """

    object: str = "matrix"
    format: str = "coordinate"
    field: str = "real"
    symmetry: str = "general"
    nrows: int = 0
    ncols: int = 0
    nnz: int = 0                      # stored entries (lines in the file)
    rowidx: np.ndarray | None = None  # (nnz,) for coordinate format
    colidx: np.ndarray | None = None
    data: np.ndarray | None = None    # (nnz,) values; None for pattern
    comments: list[str] = dataclasses.field(default_factory=list)

    @property
    def is_vector_shaped(self) -> bool:
        return self.object == "vector" or self.ncols == 1

    def to_dense_vector(self) -> np.ndarray:
        """Materialize a (nrows,) dense vector from an array or coordinate file."""
        if self.format == "array":
            return np.asarray(self.data, dtype=np.float64).reshape(self.nrows * max(self.ncols, 1))[: self.nrows]
        x = np.zeros(self.nrows, dtype=np.float64)
        x[self.rowidx] = self.data if self.data is not None else 1.0
        return x


def _open(path_or_file, mode: str, gzip: bool):
    if hasattr(path_or_file, "read") or hasattr(path_or_file, "write"):
        return path_or_file, False
    if gzip:
        return gzip_mod.open(path_or_file, mode), True
    return open(path_or_file, mode), True


def _parse_header(line: bytes) -> tuple[str, str, str, str]:
    parts = line.decode("ascii", "replace").strip().split()
    if len(parts) < 5 or parts[0] != "%%MatrixMarket":
        raise InvalidFormatError(f"invalid Matrix Market header: {line!r}")
    obj, fmt, field, symmetry = parts[1].lower(), parts[2].lower(), parts[3].lower(), parts[4].lower()
    if obj not in OBJECTS:
        raise InvalidFormatError(f"invalid object: {obj}")
    if fmt not in FORMATS:
        raise InvalidFormatError(f"invalid format: {fmt}")
    if field not in FIELDS:
        raise InvalidFormatError(f"invalid field: {field}")
    if symmetry not in SYMMETRIES:
        raise InvalidFormatError(f"invalid symmetry: {symmetry}")
    if field == "complex":
        raise NotSupportedError("complex matrices are not supported")
    return obj, fmt, field, symmetry


def read_mtx(
    path,
    gzip: bool | None = None,
    binary: bool = False,
    idx_size: int = 64,
) -> MtxFile:
    """Read a Matrix Market file (acgmtxfile_read analogue, mtxfile.h:416).

    ``gzip=None`` auto-detects from a ``.gz`` suffix.  ``binary`` selects the
    aCG binary data layout; ``idx_size`` (32/64) must match the writer.
    """
    if gzip is None:
        gzip = isinstance(path, (str, os.PathLike)) and str(path).endswith(".gz")
    f, close = _open(path, "rb", gzip)
    try:
        return _read_stream(f, binary=binary, idx_size=idx_size)
    finally:
        if close:
            f.close()


def _read_stream(f, binary: bool, idx_size: int) -> MtxFile:
    header = f.readline()
    if not header:
        raise UnexpectedEofError("empty file")
    obj, fmt, field, symmetry = _parse_header(header)
    comments = []
    line = f.readline()
    while line.startswith(b"%"):
        comments.append(line.decode("utf-8", "replace").rstrip("\n"))
        line = f.readline()
    if not line:
        raise UnexpectedEofError("missing size line")
    sizes = line.split()
    m = MtxFile(object=obj, format=fmt, field=field, symmetry=symmetry, comments=comments)
    if fmt == "coordinate":
        if len(sizes) != 3:
            raise InvalidFormatError(f"invalid size line: {line!r}")
        m.nrows, m.ncols, m.nnz = int(sizes[0]), int(sizes[1]), int(sizes[2])
        _read_coordinate_data(f, m, binary, idx_size)
    else:  # array
        if obj == "vector" and len(sizes) == 1:
            m.nrows, m.ncols = int(sizes[0]), 1
        elif len(sizes) == 2:
            m.nrows, m.ncols = int(sizes[0]), int(sizes[1])
        else:
            raise InvalidFormatError(f"invalid size line: {line!r}")
        m.nnz = m.nrows * m.ncols
        _read_array_data(f, m, binary)
    return m


def _read_coordinate_data(f, m: MtxFile, binary: bool, idx_size: int) -> None:
    idt = _idx_dtype(idx_size)
    nnz = m.nnz
    if binary:
        isz = np.dtype(idt).itemsize
        rowidx = np.frombuffer(f.read(nnz * isz), dtype=idt)
        if rowidx.size != nnz:
            raise UnexpectedEofError()
        colidx = np.frombuffer(f.read(nnz * isz), dtype=idt)
        if colidx.size != nnz:
            raise UnexpectedEofError()
        m.rowidx = rowidx.astype(np.int64) - 1
        m.colidx = colidx.astype(np.int64) - 1
        if m.field != "pattern":
            vdt = np.float64 if m.field == "real" else np.int32
            data = np.frombuffer(f.read(nnz * np.dtype(vdt).itemsize), dtype=vdt)
            if data.size != nnz:
                raise UnexpectedEofError()
            m.data = np.array(data)
        return
    # Text: native parallel parser if built, else vectorized numpy tokens.
    raw = f.read()
    ncols_per_line = 2 + (0 if m.field == "pattern" else 1)
    from .. import _native
    if _native.available():
        has_vals = m.field != "pattern"
        try:
            rowidx, colidx, vals = _native.parse_coord(raw, nnz, has_vals)
        except ValueError as e:
            raise UnexpectedEofError(str(e))
        m.rowidx, m.colidx = rowidx, colidx
        if m.field == "real":
            m.data = vals
        elif m.field == "integer":
            m.data = vals.astype(np.int64)
        return
    toks = raw.split()
    if len(toks) < nnz * ncols_per_line:
        raise UnexpectedEofError(
            f"expected {nnz * ncols_per_line} tokens, found {len(toks)}")
    toks = toks[: nnz * ncols_per_line]
    arr = np.array(toks, dtype="S32").reshape(nnz, ncols_per_line)
    m.rowidx = arr[:, 0].astype(np.int64) - 1
    m.colidx = arr[:, 1].astype(np.int64) - 1
    if m.field == "real":
        m.data = arr[:, 2].astype(np.float64)
    elif m.field == "integer":
        m.data = arr[:, 2].astype(np.int64)


def _read_array_data(f, m: MtxFile, binary: bool) -> None:
    n = m.nnz
    vdt = np.float64 if m.field == "real" else np.int64
    if binary:
        wire = np.float64 if m.field == "real" else np.int32
        data = np.frombuffer(f.read(n * np.dtype(wire).itemsize), dtype=wire)
        if data.size != n:
            raise UnexpectedEofError()
        m.data = data.astype(vdt)
        return
    raw = f.read()
    toks = raw.split()
    if len(toks) < n:
        raise UnexpectedEofError(f"expected {n} values, found {len(toks)}")
    m.data = np.array(toks[:n], dtype="S32").astype(vdt)


def write_mtx(
    path,
    m: MtxFile,
    gzip: bool = False,
    binary: bool = False,
    idx_size: int = 64,
    numfmt: str | None = None,
    comments: list[str] | None = None,
) -> None:
    """Write a Matrix Market file (mtxfile_fwrite_double analogue, mtxfile.h:997)."""
    f, close = _open(path, "wb", gzip)
    try:
        hdr = f"%%MatrixMarket {m.object} {m.format} {m.field} {m.symmetry}\n"
        f.write(hdr.encode())
        for c in comments if comments is not None else m.comments:
            c = c if c.startswith("%") else "%" + c
            f.write((c.rstrip("\n") + "\n").encode())
        if m.format == "coordinate":
            f.write(f"{m.nrows} {m.ncols} {m.nnz}\n".encode())
            _write_coordinate_data(f, m, binary, idx_size, numfmt)
        else:
            if m.object == "vector":
                f.write(f"{m.nrows}\n".encode())
            else:
                f.write(f"{m.nrows} {m.ncols}\n".encode())
            _write_array_data(f, m, binary, numfmt)
    finally:
        if close:
            f.close()


def _write_coordinate_data(f, m: MtxFile, binary: bool, idx_size: int, numfmt) -> None:
    idt = _idx_dtype(idx_size)
    rowidx = np.asarray(m.rowidx, dtype=idt) + 1
    colidx = np.asarray(m.colidx, dtype=idt) + 1
    if binary:
        f.write(rowidx.tobytes())
        f.write(colidx.tobytes())
        if m.field != "pattern" and m.data is not None:
            wire = np.float64 if m.field == "real" else np.int32
            f.write(np.asarray(m.data, dtype=wire).tobytes())
        return
    if m.field == "pattern" or m.data is None:
        out = io_mod.StringIO()
        np.savetxt(out, np.column_stack([rowidx, colidx]), fmt="%d %d")
        f.write(out.getvalue().encode())
        return
    fmt = numfmt if numfmt else ("%.15g" if m.field == "real" else "%d")
    # Vectorized text formatting: build the three columns then join.
    rows = np.char.mod("%d", rowidx)
    cols = np.char.mod("%d", colidx)
    vals = np.char.mod(fmt, np.asarray(m.data))
    lines = np.char.add(np.char.add(np.char.add(np.char.add(rows, " "), cols), " "), vals)
    f.write(("\n".join(lines.tolist()) + "\n").encode())


def _write_array_data(f, m: MtxFile, binary: bool, numfmt) -> None:
    data = np.asarray(m.data)
    if binary:
        wire = np.float64 if m.field == "real" else np.int32
        f.write(np.asarray(data, dtype=wire).tobytes())
        return
    fmt = numfmt if numfmt else ("%.15g" if m.field == "real" else "%d")
    lines = np.char.mod(fmt, data)
    f.write(("\n".join(lines.tolist()) + "\n").encode())


def vector_to_mtx(x: np.ndarray, field: str = "real") -> MtxFile:
    """Wrap a dense vector as an array-format MtxFile (for b/x0/solution I/O)."""
    x = np.asarray(x)
    return MtxFile(object="matrix", format="array", field=field,
                   symmetry="general", nrows=x.shape[0], ncols=1,
                   nnz=x.shape[0], data=x)


def partition_to_mtx(part: np.ndarray) -> MtxFile:
    """Partition vector as integer array file (mtxpartition.c:258-294 parity)."""
    part = np.asarray(part, dtype=np.int64)
    return MtxFile(object="matrix", format="array", field="integer",
                   symmetry="general", nrows=part.shape[0], ncols=1,
                   nnz=part.shape[0], data=part)


def read_partition(path, gzip: bool | None = None, binary: bool = False) -> np.ndarray:
    """Read a partition vector written by mtxpartition (--partition=FILE)."""
    m = read_mtx(path, gzip=gzip, binary=binary)
    if m.format == "array":
        return np.asarray(m.data, dtype=np.int64)
    part = np.zeros(m.nrows, dtype=np.int64)
    part[m.rowidx] = np.asarray(m.data, dtype=np.int64)
    return part
