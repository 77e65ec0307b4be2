"""Multimodal plumbing tests (decode stubbed, pipeline real)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import multimodal as mm


def test_decoder_requires_codec():
    with pytest.raises(NotImplementedError):
        mm.ImageDecoder()


def test_media_batch_size():
    assert mm.media_batch_size(1024 * 1024) == 64
    assert mm.media_batch_size(0) > 0


def test_full_pipeline_with_fake_decoder(ray_session):
    import ray.data as rd

    payloads = [bytes([i] * (10 + i)) for i in range(20)]
    t = pa.table(
        {"id": pa.array(range(20), pa.int64()),
         "media": pa.array(payloads, pa.binary())}
    )
    ds = rd.from_arrow(t)
    ds = ds.map_batches(lambda b: mm.media_meta(b, "media", "fake"),
                        batch_format="pyarrow")
    ds = ds.map_batches(
        mm.FakeImageDecoder,
        batch_format="pyarrow",
        batch_size=mm.media_batch_size(16),
        concurrency=(1, 2),
    )
    ds = ds.map_batches(mm.resize_stage, batch_format="pyarrow")
    out = ds.to_pandas()
    assert len(out) == 20
    assert out["media_meta"][0]["n_bytes"] == 10
    shp = out["pixels_shape"][0]
    assert list(shp) == [4, 4, 3]
    px = np.frombuffer(out["pixels"][0], dtype=np.uint8)
    assert px.shape == (48,)
    # determinism: same payload -> same pixels
    t2 = rd.from_arrow(t).map_batches(
        mm.FakeImageDecoder, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    ds3 = rd.from_arrow(t).map_batches(
        mm.FakeImageDecoder, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert (t2["pixels"] == ds3["pixels"]).all()


def test_png_decoder_real_roundtrip(ray_session):
    """The PNG decode path is REAL (no fake): encode tensors with the
    engine codec, run the actor-pool decode stage, get the exact
    pixels back."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.raster.png import encode_png
    from gdal_ray.stages.multimodal import png_decode_stage

    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, (12, 9, 3), dtype=np.uint8) for _ in range(6)]
    t = pa.table(
        {
            "img_id": pa.array(np.arange(6, dtype=np.int64)),
            "media": pa.array([encode_png(im) for im in imgs], pa.binary()),
        }
    )
    out = png_decode_stage(rd.from_arrow(t)).to_pandas().sort_values("img_id")
    for i, row in out.iterrows():
        shape = tuple(row["pixels_shape"])
        got = np.frombuffer(row["pixels"], dtype=np.uint8).reshape(shape)
        assert (got == imgs[row["img_id"]]).all()


class TestWebpDecodeStage:
    def test_webp_actor_pool_decode(self, ray_session):
        """Lossless-WebP media column decodes to RGBA tensors through
        the same actor-pool plumbing (engine VP8L codec)."""
        import ray.data as rd

        from gdal_ray.raster.webp import encode_webp_lossless
        from gdal_ray.stages.multimodal import webp_decode_stage

        rng = np.random.default_rng(12)
        imgs = [rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
                for _ in range(4)]
        t = pa.table({
            "id": pa.array(range(4), pa.int64()),
            "media": pa.array([encode_webp_lossless(i) for i in imgs],
                              pa.binary()),
        })
        out = webp_decode_stage(rd.from_arrow(t), concurrency=1) \
            .to_pandas().sort_values("id")
        for i, row in out.iterrows():
            got = np.frombuffer(row["pixels"], np.uint8).reshape(
                row["pixels_shape"])
            assert np.array_equal(got, imgs[row["id"]])
