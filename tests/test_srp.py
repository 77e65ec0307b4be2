"""ASRP/USRP reader — reference autotest pins (gdrivers/srp.py):
checksum 24576 at PCB 0/4/8, the literal UTM-17 geotransform and
EPSG:32617, the 4-entry QAL palette, the SRP_* metadata set, and the
THF transmittal / SRP:gen,img forms."""

import pytest

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.srp import read_srp, srp_subdatasets

S = "/root/reference/autotest/gdrivers/data/srp"

EXPECTED_MD = {
    "SRP_CLASSIFICATION": "U",
    "SRP_CREATIONDATE": "20120505",
    "SRP_EDN": "0",
    "SRP_NAM": "FKUSRP",
    "SRP_PRODUCT": "USRP",
    "SRP_REVISIONDATE": "20120505",
    "SRP_SCA": "50000",
    "SRP_ZNA": "17",
    "SRP_PSP": "100.0",
}


class TestUSRP:
    @pytest.mark.parametrize("pcb", (0, 4, 8))
    def test_pcb_variants(self, pcb):
        d = read_srp(f"{S}/USRP_PCB{pcb}/FKUSRP01.GEN")
        assert checksum_array(d["bands"][0]) == 24576
        assert d["geotransform"] == (500000.0, 5.0, 0.0,
                                     5000000.0, 0.0, -5.0)
        assert d["crs"] == "EPSG:32617"

    def test_palette_and_metadata(self):
        d = read_srp(f"{S}/USRP_PCB0/FKUSRP01.GEN")
        ct = d["color_table"]
        assert len(ct) == 4
        assert ct[0] == (0, 0, 0, 255)
        assert ct[1] == (255, 0, 0, 255)
        md = d["metadata"]
        for k, v in EXPECTED_MD.items():
            assert md.get(k) == v, (k, md.get(k))

    def test_thf(self):
        d = read_srp(f"{S}/USRP_PCB0/TRANSH01.THF")
        assert checksum_array(d["bands"][0]) == 24576

    def test_subdatasets(self):
        subs = srp_subdatasets(f"{S}/USRP_PCB0/TRANSH01.THF")
        assert subs == [
            f"SRP:{S}/USRP_PCB0/FKUSRP01.GEN,"
            f"{S}/USRP_PCB0/FKUSRP01.IMG"]
        d = read_srp(subs[0])
        assert checksum_array(d["bands"][0]) == 24576
