"""NITF (National Imagery Transmission Format) reader — frmts/nitf role.

From-scratch parse of the published MIL-STD-2500C / NSIF STANAG 4545
layout (reference roles: frmts/nitf/nitffile.cpp header + segment
walk, nitfimage.c image subheader + block layout, nitfdataset.cpp
band semantics).  Values pinned against the reference autotest NITF
baseline fixtures in tests/test_nitf.py.

Supported: NITF02.10/NSIF01.00 and NITF02.00 file headers (incl. the
2.0 conditional FSDEVT/ISDEVT 40-byte shifts), image segments with
full subheader decode (PVTYPE/IREP/ABPP, ICORDS+IGEOLO geographic and
decimal-degree corner coords, band LUTs skipped over, blocked layout
NBPR×NBPC of NPPBH×NPPBV), IMODE B/P/S, IC=NC/NM uncompressed (1/8/
16/32-bit incl. the bit-packed 1-bit form), IC=C3/M3 JPEG blocks via
the in-repo T.81 decoder with the M3 block-offset mask table,
IC=C8/M8 JPEG 2000 segments via the in-repo T.800 decoder
(raster/jp2.py), IC=C1/M1 bilevel fax via the in-repo CCITT G3 codec
(raster/ccitt.py; 2-D when COMRAT starts with '2', the
nitfbilevel.cpp rule).  ARIDPCM is a named boundary.

Scale: one read task per image segment (file × segment sharding, the
raster tile-table contract).
"""
from __future__ import annotations

import struct

import numpy as np


class NitfImage:
    __slots__ = ("nrows", "ncols", "pvtype", "irep", "icat", "abpp",
                 "icords", "igeolo", "ic", "comrat", "nbands", "imode",
                 "nbpr", "nbpc", "nppbh", "nppbv", "nbpp",
                 "data_offset", "data_size", "bands", "gt", "idlvl")


def _f(h: bytes, off: int, n: int) -> str:
    return h[off:off + n].decode("latin1")


def _i(h: bytes, off: int, n: int) -> int:
    s = _f(h, off, n).strip()
    return int(s) if s else 0


class NitfFile:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.data = f.read()
        d = self.data
        self.version = _f(d, 0, 9)
        if not self.version.startswith(("NITF", "NSIF")):
            raise ValueError(f"{path}: not a NITF file")
        if self.version.startswith("NITF01."):
            raise ValueError("NITF 1.x not supported (named boundary)")
        # header length offset: 2.1/NSIF at 354; 2.0 may shift by the
        # conditional FSDEVT block
        off20 = 0
        if self.version == "NITF02.00" and d[280:286] == b"999998":
            off20 = 40
        hl = _i(d, 354 + off20, 6)
        self.header = d[:hl]
        self.images: list[NitfImage] = []
        pos = 360 + off20
        numi = _i(d, pos, 3)
        pos += 3
        seg_sizes = []
        for _ in range(numi):
            lish = _i(d, pos, 6)
            li = _i(d, pos + 6, 10)
            seg_sizes.append((lish, li))
            pos += 16
        data_start = hl
        for lish, li in seg_sizes:
            img = self._parse_image(d[data_start:data_start + lish],
                                    data_start + lish, li)
            if img is not None:
                self.images.append(img)
            data_start += lish + li

    # -- image subheader -----------------------------------------------------

    def _parse_image(self, h: bytes, data_off: int, data_len: int):
        if h[:2] != b"IM":
            return None
        img = NitfImage()
        img.data_offset = data_off
        img.data_size = data_len
        off = 333
        if self.version == "NITF02.00" and h[284:290] == b"999998":
            off += 40
        img.nrows = _i(h, off, 8)
        img.ncols = _i(h, off + 8, 8)
        img.pvtype = _f(h, off + 16, 3).strip()
        img.irep = _f(h, off + 19, 8).strip()
        img.icat = _f(h, off + 27, 8).strip()
        img.abpp = _i(h, off + 35, 2)
        off += 38
        img.icords = chr(h[off])
        if self.version.startswith("NITF02.0") and img.icords == "N":
            img.icords = " "
        off += 1
        img.igeolo = None
        img.gt = None
        if img.icords not in (" ", "\x00"):
            img.igeolo = _f(h, off, 60)
            off += 60
            img.gt = self._igeolo_gt(img)
        nicom = _i(h, off, 1)
        off += 1 + 80 * nicom
        img.ic = _f(h, off, 2)
        off += 2
        img.comrat = ""
        if img.ic[0] not in ("N",):
            img.comrat = _f(h, off, 4).strip()
            off += 4
        nbands = _i(h, off, 1)
        off += 1
        if nbands == 0:
            nbands = _i(h, off, 5)
            off += 5
        img.nbands = nbands
        for _ in range(nbands):
            off += 2 + 6 + 4  # IREPBAND, ISUBCAT, IFC+IMFLT
            nluts = _i(h, off, 1)
            off += 1
            if nluts:
                nelut = _i(h, off, 5)
                off += 5 + nluts * nelut
        off += 1  # ISYNC
        img.imode = chr(h[off])
        off += 1
        img.nbpr = _i(h, off, 4)
        img.nbpc = _i(h, off + 4, 4)
        img.nppbh = _i(h, off + 8, 4)
        img.nppbv = _i(h, off + 12, 4)
        img.nbpp = _i(h, off + 16, 2)
        off += 18
        img.idlvl = _i(h, off, 3)
        return img

    def _igeolo_gt(self, img: NitfImage):
        """IGEOLO corner coords → north-up geotransform (G/D forms)."""
        s = img.igeolo
        pts = []
        try:
            for i in range(4):
                part = s[i * 15:(i + 1) * 15]
                if img.icords == "G":
                    lat = (float(part[0:2]) + float(part[2:4]) / 60
                           + float(part[4:6]) / 3600)
                    if part[6] == "S":
                        lat = -lat
                    lon = (float(part[7:10]) + float(part[10:12]) / 60
                           + float(part[12:14]) / 3600)
                    if part[14] == "W":
                        lon = -lon
                elif img.icords == "D":
                    lat = float(part[0:7])
                    lon = float(part[7:15])
                else:
                    return None
                pts.append((lon, lat))
        except ValueError:
            return None
        (ulx, uly), (urx, _ury), (_lrx, lry), (_llx, _lly) = pts
        if img.ncols < 1 or img.nrows < 1:
            return None
        dx = (urx - ulx) / img.ncols
        dy = (lry - uly) / img.nrows
        return (ulx, dx, 0.0, uly, 0.0, dy)

    # -- data decode -----------------------------------------------------------

    _DTYPES = {("INT", 8): np.uint8, ("INT", 16): ">u2", ("INT", 32): ">u4",
               ("SI", 16): ">i2", ("SI", 32): ">i4",
               ("R", 32): ">f4", ("R", 64): ">f8", ("B", 1): np.uint8}

    def read_image(self, idx: int = 0) -> list[np.ndarray]:
        img = self.images[idx]
        d = self.data
        nb = img.nbands
        h, w = img.nrows, img.ncols
        bh, bv = img.nppbh, img.nppbv
        ic = img.ic
        pos = img.data_offset
        mask_offsets = None
        if ic in ("NM", "M3", "M1", "M4", "M8"):
            # image data mask table: IMDATOFF(4) BMRLNTH(2) TMRLNTH(2)
            # TPXCDLNTH(2) [TPXCD] [BMR offsets]
            imdatoff = struct.unpack_from(">I", d, pos)[0]
            bmr, tmr, tpxcdl = struct.unpack_from(">HHH", d, pos + 4)
            p = pos + 10 + (tpxcdl + 7) // 8
            nblocks = img.nbpr * img.nbpc * (nb if img.imode == "S" else 1)
            if bmr == 32:
                mask_offsets = np.frombuffer(d, ">u4", count=nblocks,
                                             offset=p)
            pos += imdatoff
        out = [np.zeros((img.nbpc * bv, img.nbpr * bh), np.float64)
               for _ in range(nb)]

        if ic in ("C3", "M3"):
            from gdal_ray.raster.jpeg import decode_jpeg
            nblocks = img.nbpr * img.nbpc
            for blk in range(nblocks):
                if mask_offsets is not None:
                    o = int(mask_offsets[blk])
                    if o == 0xFFFFFFFF:
                        continue
                    bpos = pos + o
                else:
                    bpos = pos
                end = d.find(b"\xff\xd9", bpos) + 2
                if end < 2:
                    break
                arr = np.asarray(decode_jpeg(d[bpos:end]), np.float64)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                by, bx = divmod(blk, img.nbpr)
                for b in range(min(nb, arr.shape[2])):
                    out[b][by * bv:(by + 1) * bv,
                           bx * bh:(bx + 1) * bh] = \
                        arr[:bv, :bh, b]
                if mask_offsets is None:
                    pos = end
            return [o[:h, :w] for o in out]

        if ic in ("C1", "M1"):
            # bilevel fax: CCITT G3, 2-D when COMRAT starts with '2'
            # (nitfbilevel.cpp wraps the bytes in a CCITTFAX3 TIFF)
            from gdal_ray.raster.ccitt import decode_g3

            seg_end = pos + img.data_size if img.data_size else len(d)
            bits = decode_g3(bytes(d[pos:seg_end]), img.nbpr * bh,
                             img.nbpc * bv,
                             two_d=img.comrat.startswith("2"))
            return [bits[:h, :w].astype(np.float64)]

        if ic in ("C8", "M8"):
            # IC=C8: the whole image segment is one JPEG 2000
            # codestream (either raw J2K or JP2-wrapped) — decode with
            # the in-repo T.800 codec (raster/jp2.py)
            from gdal_ray.raster.jp2 import decode_j2k, find_codestream

            seg_end = pos + img.data_size if img.data_size else len(d)
            arrs = decode_j2k(find_codestream(bytes(d[pos:seg_end])))
            return [np.asarray(a, np.float64)[:h, :w] for a in arrs]

        if ic not in ("NC", "NM"):
            raise NotImplementedError(
                f"NITF IC={ic} ({img.comrat}) — named boundary "
                "(bilevel fax / ARIDPCM codecs not in-repo)")

        dt = self._DTYPES.get((img.pvtype, img.nbpp))
        if img.nbpp == 1:
            blk_bytes = (bh * bv + 7) // 8
        elif dt is None:
            raise NotImplementedError(
                f"NITF PVTYPE={img.pvtype} NBPP={img.nbpp}")
        else:
            blk_bytes = bh * bv * np.dtype(dt).itemsize
        nper = nb if img.imode in ("B", "P") else 1
        total_blocks = img.nbpr * img.nbpc * \
            (nb if img.imode == "S" else 1)

        def decode_block(bpos) -> np.ndarray:
            if img.nbpp == 1:
                bits = np.unpackbits(
                    np.frombuffer(d, np.uint8, count=blk_bytes,
                                  offset=bpos))
                return bits[:bh * bv].reshape(bv, bh).astype(np.float64)
            a = np.frombuffer(d, dt, count=bh * bv, offset=bpos)
            return a.reshape(bv, bh).astype(np.float64)

        bi = 0
        for blk in range(total_blocks):
            if img.imode == "S":
                band = blk // (img.nbpr * img.nbpc)
                cell = blk % (img.nbpr * img.nbpc)
                bands_here = [band]
            else:
                cell = blk
                bands_here = list(range(nb))
            by, bx = divmod(cell, img.nbpr)
            if img.imode == "P":
                # pixel-interleaved within the block
                if mask_offsets is not None:
                    o = int(mask_offsets[bi])
                    bi += 1
                    if o == 0xFFFFFFFF:
                        continue
                    bpos = pos + o
                else:
                    bpos = pos
                    pos += blk_bytes * nb
                a = np.frombuffer(d, dt, count=bh * bv * nb, offset=bpos)
                a = a.reshape(bv, bh, nb).astype(np.float64)
                for b in range(nb):
                    out[b][by * bv:(by + 1) * bv, bx * bh:(bx + 1) * bh] \
                        = a[:, :, b]
                continue
            for b in bands_here:
                if mask_offsets is not None:
                    o = int(mask_offsets[bi])
                    bi += 1
                    if o == 0xFFFFFFFF:
                        continue
                    bpos = pos + o
                else:
                    bpos = pos
                    pos += blk_bytes
                out[b][by * bv:(by + 1) * bv, bx * bh:(bx + 1) * bh] = \
                    decode_block(bpos)
        return [o[:h, :w] for o in out]


def read_nitf(path: str) -> dict:
    """load_raster-convention dict for the first image segment."""
    nf = NitfFile(path)
    if not nf.images:
        return {"bands": [], "crs": "", "geotransform": None,
                "nodata": None}
    img = nf.images[0]
    bands = nf.read_image(0)
    # cast back to the natural dtype
    cast = {("INT", 8): np.uint8, ("INT", 16): np.uint16,
            ("SI", 16): np.int16, ("R", 32): np.float32}.get(
        (img.pvtype, img.nbpp))
    if img.nbpp == 1:
        cast = np.uint8
    if cast is not None:
        bands = [b.astype(cast) for b in bands]
    return {"bands": bands, "crs": "EPSG:4326" if img.gt else "",
            "geotransform": img.gt, "nodata": None}
