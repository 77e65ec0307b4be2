"""Bit-exact GDALChecksumImage port (alg/gdalchecksum.cpp:54-400).

Semantics transcribed from the reference:
- primes ``{7,11,13,17,19,23,29,31,37,41,43}``; a pixel at row-major
  window position ``i = y*XSize + x`` contributes
  ``int32(v) % primes[i % 11]`` with **C truncated** modulo (negative
  results possible);
- the running sum is masked ``& 0xffff`` after each addition — for
  two's-complement ints that equals a plain modular sum, so the
  checksum is ``(Σ terms) mod 65536``: **commutative and therefore
  exactly distributable** (per-tile partial sums combine in any
  order);
- float bands convert via GDALCopyWords double→Int32: ``v+0.5``,
  clamp to ±2147483647, ``floor`` (gdalchecksum.cpp:67-88);
  non-finite → INT_MIN.

The survey flagged the checksum "order-dependent" (SURVEY.md §7.4);
the transcription shows the mask commutes — a welcome simplification,
verified by tests against a direct sequential scalar port.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _int_from_double(v: np.ndarray) -> np.ndarray:
    out = np.empty(v.shape, dtype=np.int64)
    finite = np.isfinite(v)
    shifted = np.where(finite, v + 0.5, 0.0)
    clamped = np.clip(shifted, -2147483647.0, 2147483647.0)
    out[:] = np.floor(clamped).astype(np.int64)
    out[~finite] = np.iinfo(np.int32).min
    return out


def checksum_tile(
    arr: np.ndarray, x0: int, y0: int, window_xsize: int
) -> int:
    """Partial checksum contribution of one tile at window offset
    (x0, y0) inside a window of total width ``window_xsize``.

    Combine partials with ``sum(...) % 65536``.
    """
    h, w = arr.shape
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.int64), np.arange(w, dtype=np.int64), indexing="ij"
    )
    gidx = (yy + y0) * np.int64(window_xsize) + (xx + x0)
    primes = PRIMES[gidx % 11]
    if arr.dtype.kind == "f":
        vals = _int_from_double(arr.astype(np.float64).ravel()).reshape(arr.shape)
    else:
        # GDALChecksumImage reads every non-float band through GDT_Int32
        # (GDALCopyWords clamps out-of-range values), so uint32/int64/
        # uint64 rasters must clamp before the modulo to stay bit-exact.
        # unsigned clamps before the int64 cast (uint64 would wrap).
        if arr.dtype.kind == "u":
            vals = np.minimum(
                arr, arr.dtype.type(np.iinfo(np.int32).max)
            ).astype(np.int64)
        else:
            vals = np.clip(
                arr.astype(np.int64),
                np.int64(np.iinfo(np.int32).min),
                np.int64(np.iinfo(np.int32).max),
            )
    # C truncated modulo: np.fmod matches C's % for integers
    terms = np.fmod(vals, primes)
    return int(terms.sum() % 65536)


def checksum_array(arr: np.ndarray) -> int:
    """Whole-array checksum (window = the array)."""
    return checksum_tile(arr, 0, 0, arr.shape[1]) % 65536


def checksum_scalar_oracle(arr: np.ndarray) -> int:
    """Direct sequential transcription of the reference loop — the
    test oracle for the vectorized/distributable version."""
    n = 0
    iprime = 0
    flat = arr
    for y in range(arr.shape[0]):
        for x in range(arr.shape[1]):
            v = flat[y, x]
            if arr.dtype.kind == "f":
                fv = float(v)
                if not np.isfinite(fv):
                    iv = -(2**31)
                else:
                    fv += 0.5
                    fv = min(max(fv, -2147483647.0), 2147483647.0)
                    iv = int(np.floor(fv))
            else:
                # GDT_Int32 read path clamps (GDALCopyWords semantics)
                iv = min(max(int(v), -(2**31)), 2**31 - 1)
            n += int(np.fmod(iv, int(PRIMES[iprime])))
            iprime += 1
            if iprime > 10:
                iprime = 0
            n &= 0xFFFF
    return n


def checksum_dataset(tiles, band: int = 1, window_xsize: int | None = None) -> int:
    """Distributed checksum over a tile table: per-tile partial terms
    (map_batches when given a Ray Dataset), modular sum of the tiny
    partials. ``window_xsize`` (the full raster width) is required for
    a Dataset; inferred for a local pa.Table."""
    from gdal_ray.raster import model

    def partial(batch: pa.Table) -> pa.Table:
        sums = []
        for row in batch.to_pylist():
            if row["band"] != band:
                continue
            arr = model.tile_array(row)
            sums.append(checksum_tile(arr, row["x0"], row["y0"], window_xsize))
        return pa.table({"partial": pa.array(sums, pa.int64())})

    if hasattr(tiles, "map_batches"):  # ray Dataset
        if window_xsize is None:
            raise ValueError("window_xsize required for a Dataset input")
        parts = tiles.map_batches(partial, batch_format="pyarrow").to_pandas()
        return int(parts["partial"].sum() % 65536)
    # pa.Table path (local)
    if window_xsize is None:
        window_xsize = max(
            r["x0"] + r["width"] for r in tiles.to_pylist() if r["band"] == band
        )
    total = 0
    for row in tiles.to_pylist():
        if row["band"] != band:
            continue
        arr = model.tile_array(row)
        total += checksum_tile(arr, row["x0"], row["y0"], window_xsize)
    return total % 65536
