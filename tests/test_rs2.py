"""RADARSAT-2 reader — autotest pins (gdrivers/rs2.py): band cs
4672, BETA0 calibrated cs 4848, the verbatim rationalFunctions →
RPC name mapping, tie-point GCPs."""

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.rs2 import read_rs2

R = "/root/reference/autotest/gdrivers/data/rs2"

EXPECTED_RPC = {
    "ERR_BIAS": "biasError", "ERR_RAND": "randomError",
    "HEIGHT_OFF": "heightOffset", "HEIGHT_SCALE": "heightScale",
    "LAT_OFF": "latitudeOffset", "LAT_SCALE": "latitudeScale",
    "LINE_DEN_COEFF": "lineDenominatorCoefficients",
    "LINE_NUM_COEFF": "lineNumeratorCoefficients",
    "LINE_OFF": "lineOffset", "LINE_SCALE": "lineScale",
    "LONG_OFF": "longitudeOffset", "LONG_SCALE": "longitudeScale",
    "SAMP_DEN_COEFF": "pixelDenominatorCoefficients",
    "SAMP_NUM_COEFF": "pixelNumeratorCoefficients",
    "SAMP_OFF": "pixelOffset", "SAMP_SCALE": "pixelScale",
}


class TestRS2:
    def test_bands(self):
        d = read_rs2(f"{R}/product.xml")
        assert len(d["bands"]) == 2  # HH + HV
        assert checksum_array(d["bands"][0]) == 4672
        assert d["band_metadata"][0]["POLARIMETRIC_INTERP"] == "HH"

    def test_beta0_calibration(self):
        c = read_rs2(f"RADARSAT_2_CALIB:BETA0:{R}/product.xml")
        assert c["bands"][0].dtype.kind == "f"
        assert checksum_array(c["bands"][0]) == 4848

    def test_uncalib_prefix(self):
        c = read_rs2(f"RADARSAT_2_CALIB:UNCALIB:{R}/product.xml")
        assert checksum_array(c["bands"][0]) == 4672

    def test_rpc_mapping(self):
        assert read_rs2(f"{R}/product.xml")["rpc"] == EXPECTED_RPC

    def test_gcps(self):
        g = read_rs2(f"{R}/product.xml")["gcps"]
        assert len(g) == 4
        assert g[0] == {"pixel": 0.0, "line": 0.0, "x": 2.0,
                        "y": 49.0, "z": 0.0}
