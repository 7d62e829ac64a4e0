"""Field-mutating update processors (ingest middleware battery).

One function per reference factory from
`solr/core/src/java/org/apache/solr/update/processor/` — each is a pure
``map_batches`` projection over Arrow kernels, composable through
``functions.registry.ingest_chain`` (the UpdateRequestProcessorChain analog).
All are vectorized C++ kernels; none loops rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _col(t: pa.Table, name: str):
    c = t[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _set(t: pa.Table, name: str, arr) -> pa.Table:
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, arr)
    return t.append_column(name, arr)


def trim_fields(t: pa.Table, *, fields: tuple) -> pa.Table:
    """TrimFieldUpdateProcessorFactory: strip surrounding whitespace."""
    for f in fields:
        t = _set(t, f, pc.utf8_trim_whitespace(_col(t, f)))
    return t


def regex_replace(t: pa.Table, *, field: str, pattern: str, replacement: str,
                  out: str | None = None) -> pa.Table:
    """RegexReplaceProcessorFactory (replace ALL, like the reference)."""
    return _set(t, out or field, pc.replace_substring_regex(_col(t, field), pattern, replacement))


def truncate_field(t: pa.Table, *, field: str, max_length: int) -> pa.Table:
    """TruncateFieldUpdateProcessorFactory."""
    return _set(t, field, pc.utf8_slice_codeunits(_col(t, field), 0, max_length))


def concat_fields(t: pa.Table, *, fields: tuple, out: str, sep: str = " ") -> pa.Table:
    """ConcatFieldUpdateProcessorFactory: join several fields into one."""
    cols = [pc.fill_null(pc.cast(_col(t, f), pa.string()), "") for f in fields]
    return _set(t, out, pc.binary_join_element_wise(*cols, sep))


def field_length(t: pa.Table, *, field: str, out: str) -> pa.Table:
    """FieldLengthUpdateProcessorFactory: character count."""
    return _set(t, out, pc.cast(pc.utf8_length(_col(t, field)), pa.int64()))


def parse_numeric(t: pa.Table, *, field: str, kind: str = "double",
                  out: str | None = None) -> pa.Table:
    """ParseInt/Long/Float/DoubleFieldUpdateProcessorFactory."""
    typ = {"int": pa.int32(), "long": pa.int64(), "float": pa.float32(), "double": pa.float64()}[kind]
    return _set(t, out or field, pc.cast(_col(t, field), typ))


def parse_date(t: pa.Table, *, field: str, fmt: str = "%Y-%m-%dT%H:%M:%S",
               out: str | None = None) -> pa.Table:
    """ParseDateFieldUpdateProcessorFactory."""
    return _set(t, out or field, pc.strptime(_col(t, field), format=fmt, unit="us"))


def clone_field(t: pa.Table, *, src: str, dest: str) -> pa.Table:
    """CloneFieldUpdateProcessorFactory."""
    return _set(t, dest, _col(t, src))


def count_field_values(t: pa.Table, *, field: str, out: str) -> pa.Table:
    """CountFieldValuesUpdateProcessorFactory (multi-valued length)."""
    return _set(t, out, pc.cast(pc.list_value_length(_col(t, field)), pa.int64()))


def first_field_value(t: pa.Table, *, field: str, out: str | None = None) -> pa.Table:
    """FirstFieldValueUpdateProcessorFactory (empty lists -> null)."""
    col = _col(t, field)
    lens = pc.fill_null(col.value_lengths(), 0).to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    flat = col.flatten()
    valid = lens > 0
    picked = flat.take(pa.array(np.where(valid, starts, 0).astype(np.int64)))
    return _set(
        t, out or field,
        pc.if_else(pa.array(valid), picked, pa.scalar(None, type=flat.type)),
    )


def max_field_value(t: pa.Table, *, field: str, out: str | None = None) -> pa.Table:
    """MaxFieldValueUpdateProcessorFactory (multi-valued max, numeric)."""
    col = _col(t, field)
    flat = np.asarray(col.flatten(), dtype=np.float64)
    lens = pc.fill_null(col.value_lengths(), 0).to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    out_v = np.full(len(col), np.nan)
    nz = lens > 0
    if nz.any():
        out_v[nz] = np.maximum.reduceat(flat, starts[nz])
    return _set(t, out or field, pa.array(out_v, type=pa.float64()))


def min_field_value(t: pa.Table, *, field: str, out: str | None = None) -> pa.Table:
    """MinFieldValueUpdateProcessorFactory."""
    col = _col(t, field)
    flat = np.asarray(col.flatten(), dtype=np.float64)
    lens = pc.fill_null(col.value_lengths(), 0).to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    out_v = np.full(len(col), np.nan)
    nz = lens > 0
    if nz.any():
        out_v[nz] = np.minimum.reduceat(flat, starts[nz])
    return _set(t, out or field, pa.array(out_v, type=pa.float64()))


def remove_blank(t: pa.Table, *, fields: tuple) -> pa.Table:
    """RemoveBlankFieldUpdateProcessorFactory: "" -> null."""
    for f in fields:
        col = _col(t, f)
        t = _set(t, f, pc.if_else(pc.equal(col, ""), pa.scalar(None, type=col.type), col))
    return t


def default_value(t: pa.Table, *, field: str, value) -> pa.Table:
    """DefaultValueUpdateProcessorFactory: null -> constant."""
    return _set(t, field, pc.fill_null(_col(t, field), value))


def content_uuid(t: pa.Table, *, fields: tuple, out: str = "id") -> pa.Table:
    """UUIDUpdateProcessorFactory analog — DETERMINISTIC (content-derived,
    uuid5 shape) rather than random, so reruns are idempotent (documented
    deviation; random ids break per-partition resume)."""
    from ..hashing import hash_strings_u64

    acc = None
    for f in fields:
        h = hash_strings_u64(pc.cast(_col(t, f), pa.string()))
        with np.errstate(over="ignore"):
            acc = h if acc is None else acc * np.uint64(1099511628211) + h
    hx = [f"{int(v):016x}" for v in acc]
    ids = [f"{s[:8]}-{s[8:12]}-5{s[12:15]}-8{s[1:4]}-{s[4:16]}" for s in hx]
    return _set(t, out, pa.array(ids, type=pa.string()))
