"""DIMAP v1 + v2 driver — pinned to the reference autotest
(gdrivers/dimap.py): v1 METADATA.DIM window checksum 21586, literal
GCPs/metadata; v2 single_component full metadata + RPC dicts and
band checksum 7024; bundle volume components."""

import shutil

import pytest

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.dimap import dimap_components, read_dimap

D = "/root/reference/autotest/gdrivers/data"
D2 = f"{D}/dimap2"

EXPECTED_MD = {
    "GEOMETRIC_ATTITUDES_USED": "ACCURATE",
    "FACILITY_PROCESSING_CENTER": "PROCESSING_CENTER",
    "GEOMETRIC_VERTICAL_DESC": "REFERENCE3D",
    "EPHEMERIS_ACQUISITION_ORBIT_DIRECTION": "DESCENDING",
    "BAND_MODE": "PX",
    "EPHEMERIS_NADIR_LON": "NADIR_LON",
    "EPHEMERIS_ACQUISITION_ORBIT_NUMBER": "ACQUISITION_ORBIT_NUMBER",
    "SPECTRAL_PROCESSING": "PMS",
    "CLOUDCOVER_MEASURE_TYPE": "AUTOMATIC",
    "DATASET_JOB_ID": "JOB_ID",
    "MISSION": "PHR",
    "GEOMETRIC_GROUND_SETTING": "true",
    "GEOMETRIC_VERTICAL_SETTING": "true",
    "DATASET_PRODUCTION_DATE": "PRODUCTION_DATE",
    "DATASET_PRODUCER_CONTACT": "PRODUCER_CONTACT",
    "IMAGING_DATE": "2016-06-17",
    "CLOUDCOVER_QUALITY_TABLES": "PHR",
    "DATASET_PRODUCER_NAME": "PRODUCER_NAME",
    "GEOMETRIC_GEOMETRIC_PROCESSING": "SENSOR",
    "GEOMETRIC_EPHEMERIS_USED": "CORRECTED",
    "GEOMETRIC_GROUND_DESC": "R3D_ORTHO",
    "DATASET_DELIVERY_TYPE": "DELIVERY_TYPE",
    "PROCESSING_LEVEL": "SENSOR",
    "DATASET_PRODUCER_ADDRESS": "PRODUCER_ADDRESS",
    "DATASET_PRODUCT_CODE": "PRODUCT_CODE",
    "INSTRUMENT_INDEX": "1A",
    "EPHEMERIS_NADIR_LAT": "NADIR_LAT",
    "INSTRUMENT": "PHR",
    "CLOUDCOVER_MEASURE_NAME": "Cloud_Cotation (CLD)",
    "FACILITY_SOFTWARE": "SOFTWARE",
    "IMAGING_TIME": "12:34:56",
    "MISSION_INDEX": "1A",
    "SUN_AZIMUTH": "CENTER_SUN_AZIMUTH",
    "SUN_ELEVATION": "CENTER_SUN_ELEVATION",
    "VIEWING_ANGLE": "CENTER_VIEWING_ANGLE",
    "VIEWING_ANGLE_ACROSS_TRACK": "CENTER_VIEWING_ANGLE_ACROSS_TRACK",
    "VIEWING_ANGLE_ALONG_TRACK": "CENTER_VIEWING_ANGLE_ALONG_TRACK",
    "SATELLITE_ALTITUDE": "CENTER_SATELLITE_ALTITUDE",
    "INCIDENCE_ANGLE": "CENTER_INCIDENCE_ANGLE",
    "INCIDENCE_ANGLE_ACROSS_TRACK": "CENTER_INCIDENCE_ANGLE_ACROSS_TRACK",
    "INCIDENCE_ANGLE_ALONG_TRACK": "CENTER_INCIDENCE_ANGLE_ALONG_TRACK",
    "GSD_ACROSS_TRACK": "CENTER_GSD_ACROSS_TRACK",
    "GSD_ALONG_TRACK": "CENTER_GSD_ALONG_TRACK",
    "IMAGE_ORIENTATION": "CENTER_IMAGE_ORIENTATION",
    "AZIMUTH_ANGLE": "CENTER_AZIMUTH_ANGLE",
    "RADIOMETRIC_RADIOMETRIC_PROCESSING": "BASIC",
    "RADIOMETRIC_INTER_DETECTOR_NORMALIZATION": "false",
    "RADIOMETRIC_DETECTORS_INTERPOLATION": "true",
    "RADIOMETRIC_STRAYLIGHT_CORRECTION": "false",
    "RADIOMETRIC_VCTI_CORRECTION": "false",
    "RADIOMETRIC_INTER_ARRAY_RECONSTRUCTION": "true",
    "RADIOMETRIC_RADIOMETRIC_STRETCH": "false",
    "RADIOMETRIC_OUT_OF_ORDER_THRESHOLD": "0.5",
}


class TestDimap1:
    def test_metadata_dim(self, tmp_path):
        # the autotest copies the triplet side by side (IMAGERY.TIF
        # is a raster VRT referencing rgbsmall.tif)
        for f in (f"{D}/dimap/METADATA.DIM", f"{D}/dimap/IMAGERY.TIF",
                  f"{D}/rgbsmall.tif"):
            shutil.copy(f, tmp_path)
        d = read_dimap(str(tmp_path / "METADATA.DIM"))
        assert d["bands"][0].shape == (6000, 6000)
        assert checksum_array(d["bands"][0][:100, :100]) == 21586
        assert d["metadata"]["PROCESSING_LEVEL"] == "1A"
        assert d["metadata"]["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"
        g0 = d["gcps"][0]
        assert g0["pixel"] == 0.5 and g0["line"] == 0.5
        assert g0["x"] == pytest.approx(4.3641728, abs=2e-7)
        assert g0["y"] == pytest.approx(44.2082255, abs=2e-7)
        assert len(d["gcps"]) == 4


class TestDimap2:
    @pytest.mark.parametrize("name", [
        "single_component",
        "single_component/VOL_PHR.XML",
        "single_component/DIM_foo.XML",
    ])
    def test_single_component(self, name):
        d = read_dimap(f"{D2}/{name}")
        assert len(d["bands"]) == 4
        assert d["bands"][0].shape == (30, 20)
        assert d["metadata"] == EXPECTED_MD
        assert checksum_array(d["bands"][0]) == 7024

    def test_rpc(self):
        rpc = read_dimap(f"{D2}/single_component")["rpc"]
        assert rpc["SAMP_OFF"] == "4"  # 1-based 5 → 0-based 4
        assert rpc["LINE_OFF"] == "9"
        assert rpc["LAT_SCALE"] == "LAT_SCALE"
        assert rpc["SAMP_NUM_COEFF"].split() == [
            f"SAMP_NUM_COEFF_{i}" for i in range(1, 21)]
        assert rpc["LINE_DEN_COEFF"].startswith(" LINE_DEN_COEFF_1 ")

    def test_bundle_components(self):
        comps = dimap_components(f"{D2}/bundle")
        assert [c.rsplit("/", 1)[1] for c in comps] == [
            "DIM_foo.XML", "DIM_foo2.XML"]
        d1 = read_dimap(comps[0])
        d2 = read_dimap(comps[1])
        assert len(d1["bands"]) == 4 and len(d2["bands"]) == 1
        assert d1["bands"][0].shape == (30, 20)
