"""Deterministic geoparsing: text → lon/lat points.

The reference's geocoding operator (ogr/ogr_geocoding.cpp:197) resolves
place names through a web service with a side cache; in a sealed
100 TB batch pipeline that becomes a **deterministic offline
gazetteer** (SURVEY.md §2.3/§2.4 "geocoding lookup" mapping):

1. ``extract_coords`` — vectorized pyarrow regex pull of literal
   ``lat,lon`` coordinate mentions (the FIXTURES.md §1 corpus embeds
   them so parsing is exactly invertible).
2. ``GazetteerGeoparser`` — an actor-pool stage that compiles one
   alternation regex over the gazetteer once per actor
   (``__init__``), then matches place names per batch and joins their
   coordinates (the broadcast-small-side join pattern).

Both keep ``text`` untouched (per-row invariant: byte-identical text
per url).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 64 fixed cities (FIXTURES.md §2): name, lon, lat — 6-decimal constants,
# lat inside the WebMercator clip bound. Index 0 is the designated HOT
# city (20 % of synthetic pages mention it → hot-cell skew fixture).
GAZETTEER: list[tuple[str, float, float]] = [
    ("Jakarta", 106.845599, -6.208763),  # hot city
    ("London", -0.127600, 51.507400),
    ("Tokyo", 139.691700, 35.689500),
    ("New York", -74.006000, 40.712800),
    ("Paris", 2.352200, 48.856600),
    ("Berlin", 13.405000, 52.520000),
    ("Madrid", -3.703800, 40.416800),
    ("Rome", 12.496400, 41.902800),
    ("Moscow", 37.617600, 55.755800),
    ("Beijing", 116.407400, 39.904200),
    ("Shanghai", 121.473700, 31.230400),
    ("Delhi", 77.102500, 28.704100),
    ("Mumbai", 72.877700, 19.076000),
    ("Cairo", 31.235700, 30.044400),
    ("Lagos", 3.379200, 6.524400),
    ("Nairobi", 36.817200, -1.292100),
    ("Johannesburg", 28.047300, -26.204100),
    ("Sydney", 151.209300, -33.868800),
    ("Melbourne", 144.963100, -37.813600),
    ("Auckland", 174.763300, -36.848500),
    ("Sao Paulo", -46.633300, -23.550500),
    ("Buenos Aires", -58.381600, -34.603700),
    ("Lima", -77.042800, -12.046400),
    ("Bogota", -74.072100, 4.710900),
    ("Mexico City", -99.133200, 19.432600),
    ("Toronto", -79.383200, 43.653200),
    ("Vancouver", -123.120700, 49.282700),
    ("Chicago", -87.629800, 41.878100),
    ("Los Angeles", -118.243700, 34.052200),
    ("San Francisco", -122.419400, 37.774900),
    ("Seattle", -122.332100, 47.606200),
    ("Miami", -80.191800, 25.761700),
    ("Houston", -95.369800, 29.760400),
    ("Denver", -104.990300, 39.739200),
    ("Boston", -71.058900, 42.360100),
    ("Dublin", -6.260300, 53.349800),
    ("Lisbon", -9.139300, 38.722300),
    ("Amsterdam", 4.904100, 52.367600),
    ("Brussels", 4.351700, 50.850300),
    ("Vienna", 16.373800, 48.208200),
    ("Prague", 14.437800, 50.075500),
    ("Warsaw", 21.012200, 52.229700),
    ("Stockholm", 18.068600, 59.329300),
    ("Oslo", 10.752200, 59.913900),
    ("Helsinki", 24.938400, 60.169900),
    ("Copenhagen", 12.568300, 55.676100),
    ("Athens", 23.727500, 37.983800),
    ("Istanbul", 28.978400, 41.008200),
    ("Dubai", 55.270800, 25.204800),
    ("Tehran", 51.389000, 35.689200),
    ("Karachi", 67.001100, 24.860700),
    ("Dhaka", 90.412500, 23.810300),
    ("Bangkok", 100.501800, 13.756300),
    ("Singapore", 103.819800, 1.352100),
    ("Kuala Lumpur", 101.686900, 3.139000),
    ("Manila", 120.984200, 14.599500),
    ("Seoul", 126.978000, 37.566500),
    ("Osaka", 135.502200, 34.693700),
    ("Taipei", 121.565400, 25.033000),
    ("Hanoi", 105.834200, 21.027800),
    ("Reykjavik", -21.817400, 64.126500),
    ("Anchorage", -149.900300, 61.218100),
    ("Ushuaia", -68.303000, -54.801900),
    ("Honolulu", -157.858300, 21.306900),
]
assert len(GAZETTEER) == 64

HOT_CITY = GAZETTEER[0][0]

# literal "lat,lon" mention as written by the FIXTURES corpus
# (" at {lat:.4f},{lon:.4f} ")
COORD_PATTERN = r"(?P<lat>-?\d{1,2}\.\d{4}),(?P<lon>-?\d{1,3}\.\d{4})"


def extract_coords(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized literal-coordinate extraction (stateless map_batches).

    Appends ``lon``/``lat`` float64 columns (NaN where no coordinate
    mention) and ``has_coords`` bool. Text passes through zero-copy.
    """
    ext = pc.extract_regex(batch[text_col], COORD_PATTERN)
    lat = pc.cast(pc.struct_field(ext, "lat"), pa.float64())
    lon = pc.cast(pc.struct_field(ext, "lon"), pa.float64())
    has = pc.is_valid(lat)
    # NaN (not null) for misses so downstream numpy kernels are branch-free
    lat = pc.coalesce(lat, pa.scalar(float("nan"), pa.float64()))
    lon = pc.coalesce(lon, pa.scalar(float("nan"), pa.float64()))
    return (
        batch.append_column("lon", lon)
        .append_column("lat", lat)
        .append_column("has_coords", has)
    )


class GazetteerGeoparser:
    """Actor-pool stage: place-name → lon/lat via the offline gazetteer.

    Regex alternation compiled ONCE per actor (longest-name-first so
    multi-word names win), lookup dict broadcast-free (the gazetteer is
    a code constant; for a real corpus it would arrive via
    ``ray.put`` + ``ray.get`` in ``__init__``).

    Use: ``ds.map_batches(GazetteerGeoparser, batch_format="pyarrow",
    concurrency=N)``.
    """

    def __init__(self, gazetteer: list[tuple[str, float, float]] | None = None):
        gaz = gazetteer or GAZETTEER
        names = sorted((g[0] for g in gaz), key=len, reverse=True)
        # RE2-style alternation evaluated by Arrow's C++ regex kernel —
        # the whole batch is matched without touching Python rows
        self._pattern = "(?P<place>" + "|".join(re.escape(n) for n in names) + ")"
        lut = {g[0]: (g[1], g[2]) for g in gaz}
        self._names = pa.array(list(lut.keys()), pa.string())
        self._lon = np.array([lut[n][0] for n in lut], dtype=np.float64)
        self._lat = np.array([lut[n][1] for n in lut], dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["text"], self._pattern)
        place = pc.struct_field(ext, "place")
        # nulls (no place matched) surface as NaN after the numpy cast
        idxf = (
            pc.index_in(place, value_set=self._names)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        miss = np.isnan(idxf)
        idx_i = np.where(miss, 0, idxf).astype(np.int64)
        lon = np.where(miss, np.nan, self._lon[idx_i])
        lat = np.where(miss, np.nan, self._lat[idx_i])
        return (
            batch.append_column("place", place)
            .append_column("place_lon", pa.array(lon))
            .append_column("place_lat", pa.array(lat))
        )


def gazetteer_table() -> pa.Table:
    return pa.table(
        {
            "place": [g[0] for g in GAZETTEER],
            "lon": [g[1] for g in GAZETTEER],
            "lat": [g[2] for g in GAZETTEER],
        }
    )
