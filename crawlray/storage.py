"""Pluggable doc-corpus storage formats (the north-rule input is "Lance
tables of interleaved text+media documents").

The engine writes corpus partitions through a format object so the
physical format is a config flip (``EngineConfig.corpus_format``):

- ``parquet`` (default fallback): columnar files, BYTE-identical across
  reruns/resumes (schema metadata stripped at the writer) — the format
  the byte-identity e2e contract is stated for.
- ``ipc``: Arrow IPC/Feather files, also byte-identical; exists so the
  seam is exercised end-to-end by a second real format in this sandbox.
- ``lance``: the intended production format (north rule). Engaged by
  ``corpus_format="auto"`` whenever the ``lance`` package imports; it is
  NOT installed in this sandbox (verified), so auto falls back to
  parquet. Contract difference: Lance datasets are versioned directory
  trees with internal manifests — reruns are ROW-identical (same rows,
  same order, same schema) but not byte-identical on disk.

Frontier / metrics / manifests stay Parquet+JSON: they are control-plane
checkpoints, not the doc table the north rule speaks about.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.parquet as pq


class ParquetFormat:
    name = "parquet"
    ext = ".parquet"
    available = True

    @staticmethod
    def write(table: pa.Table, path: str | Path) -> None:
        pq.write_table(table, path)

    @staticmethod
    def read(path: str | Path, columns: list[str] | None = None) -> pa.Table:
        return pq.read_table(path, columns=columns)


class IpcFormat:
    name = "ipc"
    ext = ".arrow"
    available = True

    @staticmethod
    def write(table: pa.Table, path: str | Path) -> None:
        # uncompressed IPC: deterministic bytes for the identity contract
        feather.write_feather(table, str(path), compression="uncompressed")

    @staticmethod
    def read(path: str | Path, columns: list[str] | None = None) -> pa.Table:
        return feather.read_table(str(path), columns=columns)


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


class LanceFormat:
    """Lance dataset per corpus partition (``part-RRRR-PPPPP.lance`` is a
    directory, one fragment). Public API only: ``lance.write_dataset`` /
    ``lance.dataset().to_table()``."""

    name = "lance"
    ext = ".lance"
    available = _lance_available()

    @staticmethod
    def write(table: pa.Table, path: str | Path) -> None:
        import lance

        lance.write_dataset(table, str(path), mode="create")

    @staticmethod
    def read(path: str | Path, columns: list[str] | None = None) -> pa.Table:
        import lance

        return lance.dataset(str(path)).to_table(columns=columns)


FORMATS = {f.name: f for f in (ParquetFormat, IpcFormat, LanceFormat)}


def resolve_format(name: str):
    """'auto' -> lance when importable (north rule), else parquet; a
    concrete name must exist and be available."""
    if name == "auto":
        return LanceFormat if LanceFormat.available else ParquetFormat
    fmt = FORMATS.get(name)
    if fmt is None:
        raise ValueError(f"unknown corpus_format {name!r}; known: {sorted(FORMATS)}")
    if not fmt.available:
        raise ValueError(f"corpus_format {name!r} is not importable in this environment")
    return fmt


def corpus_paths(out_dir: str | Path) -> list[str]:
    """All corpus partition paths under ``out_dir``, any format, sorted
    (deterministic part naming makes sort order == (round, part))."""
    root = Path(out_dir) / "corpus"
    return sorted(
        str(p) for p in root.glob("round-*/part-*") if not str(p).endswith(".tmp")
    )


def read_corpus(out_dir: str | Path, columns: list[str] | None = None) -> pa.Table:
    """Read the whole corpus tree back as one Arrow table (format
    dispatched per file extension)."""
    paths = corpus_paths(out_dir)
    tables = []
    for p in paths:
        ext = "." + p.rsplit(".", 1)[-1]
        for fmt in FORMATS.values():
            if fmt.ext == ext:
                tables.append(fmt.read(p, columns=columns))
                break
        else:
            raise ValueError(f"unrecognized corpus file {p}")
    if not tables:
        raise FileNotFoundError(f"no corpus partitions under {out_dir}")
    return pa.concat_tables(tables)
