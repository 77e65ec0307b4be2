"""PDS3 driver tests, pinned against the reference autotest
(gdrivers/pds.py) checksums, geotransforms and WKT/proj strings."""

import numpy as np
import pytest

from gdal_ray.raster.checksum import checksum_array
from gdal_ray.raster.pds import parse_odl, pds_files, read_pds

D = "/root/reference/autotest/gdrivers/data/pds"

# the reference's own default tolerance: |gt1| / 100 (gdaltest.py:280)
def _check_gt(got, expected):
    eps = (abs(expected[1]) + abs(expected[2])) / 100.0
    for g, e in zip(got, expected):
        assert g == pytest.approx(e, abs=eps), (got, expected)


def test_pds_1_simple_cylindrical():
    g = read_pds(f"{D}/mc02_truncated.img",
                 sample_shift=-0.5, line_shift=-0.5)
    assert checksum_array(g["bands"][0]) == 47151
    _check_gt(g["geotransform"],
              (-10668384.903788566589355, 926.115274429321289, 0,
               3852176.483988761901855, 0, -926.115274429321289))
    assert g["crs"].startswith(
        'PROJCS["SIMPLE_CYLINDRICAL MARS",GEOGCS["GCS_MARS",'
        'DATUM["D_MARS",SPHEROID["MARS",3396000,0]]')
    assert 'PROJECTION["Equirectangular"]' in g["crs"]


def test_pds_2_sinusoidal_scale_offset():
    g = read_pds(f"{D}/fl73n003_truncated.img",
                 sample_shift=-0.5, line_shift=-0.5)
    assert checksum_array(g["bands"][0]) == 34962
    _check_gt(g["geotransform"],
              (587861.55900404998, 75.000002980232239, 0.0,
               -7815243.4746123618, 0.0, -75.000002980232239))
    assert 'SPHEROID["VENUS",6051000,0]' in g["crs"]
    assert 'PROJECTION["Sinusoidal"]' in g["crs"]
    assert 'PARAMETER["longitude_of_center",18]' in g["crs"]
    assert g["nodata"] == 7
    assert g["scale"] == 0.2
    assert g["offset"] == -20.2
    # MISSING_CONSTANT variant (gdal #3939)
    g2 = read_pds(f"{D}/fl73n003_alt_truncated.img")
    assert g2["nodata"] == 7


def test_pds_3_no_projection():
    g = read_pds(f"{D}/EN0001426030M_truncated.IMG")
    assert checksum_array(g["bands"][0]) == 1367
    assert g["geotransform"] is None
    assert g["nodata"] == 0


def test_pds_4_detached_with_byte_offset():
    g = read_pds(f"{D}/pds_3177.lbl", sample_shift=-0.5, line_shift=-0.5)
    assert checksum_array(g["bands"][0]) == 3418
    _check_gt(g["geotransform"],
              (6119184.3590369327, 1.0113804322107001, 0.0,
               -549696.39009125973, 0.0, -1.0113804322107001))


def test_pds_5_line_prefix():
    g = read_pds(f"{D}/pds_3355.lbl")
    assert checksum_array(g["bands"][0]) == 2748


def test_pds_6_compressed_tif_delegation():
    """ESP label points at byte.tif; georef from the label; the
    autotest's exact WKT pin."""
    g = read_pds(f"{D}/ESP_013951_1955_RED.LBL",
                 sample_shift=-0.5, line_shift=-0.5)
    assert checksum_array(g["bands"][0]) == 4672
    _check_gt(g["geotransform"], (-6139197.5, 0.5, 0.0, 936003.0,
                                  0.0, -0.5))
    assert g["crs"] == (
        'PROJCS["EQUIRECTANGULAR MARS",GEOGCS["GCS_MARS",'
        'DATUM["D_MARS",SPHEROID["MARS_localRadius",3394839.8133163,0]],'
        'PRIMEM["Reference_Meridian",0],'
        'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]]],'
        'PROJECTION["Equirectangular"],'
        'PARAMETER["standard_parallel_1",15],'
        'PARAMETER["central_meridian",180],'
        'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
        'UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
        'AXIS["Easting",EAST],AXIS["Northing",NORTH]]')
    files = pds_files(f"{D}/ESP_013951_1955_RED.LBL")
    assert len(files) == 2


def test_pds_7_uncompressed_file_object():
    g = read_pds(f"{D}/LDEM_4.LBL", sample_shift=-0.5, line_shift=-0.5)
    assert checksum_array(g["bands"][0][0:2, 0:1440]) == 50938
    _check_gt(g["geotransform"],
              (-5450622.3254203796, 7580.8377265930176, 0.0,
               2721520.7438468933, 0.0, -7580.8377265930176))
    assert 'SPHEROID["MOON",1737400,0]' in g["crs"]
    assert 'PARAMETER["central_meridian",180]' in g["crs"]


def test_pds_8_offset_multipliers():
    g = read_pds(f"{D}/mc02_truncated.img", sample_shift=1.5,
                 line_shift=1.5, sample_mult=1.0, line_mult=-1.0)
    assert checksum_array(g["bands"][0]) == 47151
    _check_gt(g["geotransform"],
              (10670237.134337425, 926.11527442932129, 0.0,
               -3854028.7145376205, 0.0, -926.11527442932129))


def test_pds_9_zip_image():
    g = read_pds(f"{D}/PDS_WITH_ZIP_IMG.LBL")
    assert checksum_array(g["bands"][0]) == 0
    expected_nd = -3.40282265508890445e38
    assert abs((g["nodata"] - expected_nd) / expected_nd) <= 1e-5
    assert g["crs"]


def test_pds_10_metadata_normalization():
    kw = parse_odl('^IMAGE = 1 <BYTES>\nNOTE = ((1, 2, 3))\n'
                   'PRODUCT_ID = ({1, 2}, {3,4})\nEND\n')
    assert kw["NOTE"] == "((1,2,3))"
    assert kw["PRODUCT_ID"] == "({1,2},{3,4})"
    with pytest.raises(ValueError):
        parse_odl('NOTE = (x, y}\nEND\n')


def test_pds_line_interleaved_crism():
    """OBJECT=FILE + BAND_STORAGE_TYPE=LINE_INTERLEAVED (CRISM)."""
    g = read_pds(f"{D}/hsp00017ba0_01_ra218s_trr3_truncated.lbl")
    assert checksum_array(g["bands"][0]) == 64740
    assert len(g["bands"]) == 107


def test_pds_oblique_cylindrical():
    """BIBQH: WEST longitudes, MAP_PROJECTION_ROTATION=90, ob_tran
    proj string — the autotest's exact pins."""
    g = read_pds(f"{D}/BIBQH03N123_D101_T020S03_V03_truncated.IMG")
    assert g["crs"] == ("+proj=ob_tran +o_proj=eqc +o_lon_p=-257.744003 "
                        "+o_lat_p=120.374532 +lon_0=-303.571748 "
                        "+R=2575000 +units=m +no_defs")
    assert g["geotransform"] == pytest.approx(
        (-5347774.07796, 0, 351.11116, -2561707.02336, 351.11116, 0))


def test_pds_mercator_2sp_ceres():
    g = read_pds(f"{D}/CE_LAMO_Q_00N_036E_MER_CLR_truncated.IMG")
    assert 'PROJECTION["Mercator_2SP"]' in g["crs"]
    assert 'PARAMETER["standard_parallel_1",-12.99]' in g["crs"]
    assert 'PARAMETER["central_meridian",36]' in g["crs"]
    assert 'SPHEROID["1_CERES",470000,0]' in g["crs"]


def test_pds_map_fit():
    g = read_pds(f"{D}/map_000_038_truncated.lbl")
    assert checksum_array(g["bands"][0]) == 14019
