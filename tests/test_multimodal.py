"""Multimodal plumbing: deterministic codec stub, actor decode stage,
byte-budget batching, frame sampling."""

import pyarrow as pa
import pytest

from cattle_ray.stages.multimodal import (
    FrameSampler,
    ImageDecoder,
    add_fake_images,
    decode_fake_image,
    encode_fake_image,
    rows_for_byte_budget,
)


def test_codec_roundtrip_deterministic():
    a = encode_fake_image(64, 48, 3, seed=7)
    b = encode_fake_image(64, 48, 3, seed=7)
    assert a == b
    meta = decode_fake_image(a)
    assert (meta["width"], meta["height"], meta["channels"]) == (64, 48, 3)
    assert meta["n_bytes"] == len(a)


def test_decoder_stage_drops_binary():
    batch = add_fake_images(pa.table({"doc_id": [1, 2, 3]}))
    out = ImageDecoder()(batch)
    assert "image" not in out.column_names
    assert out["width"].to_pylist() == [64 + 1, 64 + 2, 64 + 3]
    assert out["features"].type.list_size == 8


def test_pil_backend_is_marked_stub():
    with pytest.raises(NotImplementedError):
        ImageDecoder(backend="pil")


def test_frame_sampler_flatmap():
    out = FrameSampler(every_k=10)(
        pa.table({"clip_id": [1, 2], "n_frames": [25, 5]})
    )
    assert out["clip_id"].to_pylist() == [1, 1, 1, 2]
    assert out["frame_idx"].to_pylist() == [0, 10, 20, 0]


def test_audio_featurizer_flatmap():
    from cattle_ray.stages.multimodal import AudioFeaturizer, encode_fake_audio

    def _torchaudio_double(buf: bytes) -> dict:
        return {"n_samples": 32000, "sample_rate": 16000, "duration_s": 2.0,
                "n_bytes": len(buf)}

    batch = pa.table(
        {
            "clip_id": [1, 2],
            "audio": [encode_fake_audio(48000, 16000, seed=1),
                      encode_fake_audio(16000, 16000, seed=2)],
        }
    )
    out = AudioFeaturizer()(batch)
    # 3s clip → 3 frames; 1s clip → 1 frame
    assert out["clip_id"].to_pylist() == [1, 1, 1, 2]
    assert out["features"].type.list_size == 4
    out2 = AudioFeaturizer()(batch)
    assert out["features"].to_pylist() == out2["features"].to_pylist()


def test_audio_real_backend_is_stub():
    from cattle_ray.stages.multimodal import AudioFeaturizer

    with pytest.raises(NotImplementedError):
        AudioFeaturizer(backend="torchaudio")


def test_byte_budget():
    assert rows_for_byte_budget(1 << 20, 64 << 20) == 64
    assert rows_for_byte_budget(0) >= 1


def test_decode_in_ray_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": list(range(40))})).repartition(4)
    out = (
        ds.map_batches(add_fake_images, batch_format="pyarrow")
        .map_batches(ImageDecoder, batch_format="pyarrow", concurrency=2,
                     batch_size=rows_for_byte_budget(4200, 1 << 20))
        .to_pandas()
    )
    assert len(out) == 40
    assert out["payload_crc"].nunique() > 1


def test_image_decoder_real_backend_double(ray_session):
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.multimodal import ImageDecoder, add_fake_images

    def _pil_double(buf: bytes) -> dict:
        # backend double standing in for a PIL-backed decoder: honors the
        # seam contract (width/height/channels/payload_crc/n_bytes); defined
        # inside the test so cloudpickle ships it by value
        return {"width": 7, "height": 9, "channels": 1, "payload_crc": 42,
                "n_bytes": len(buf)}

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3]})).map_batches(
        add_fake_images, batch_format="pyarrow"
    )
    out = ds.map_batches(
        ImageDecoder, fn_constructor_kwargs=dict(backend=_pil_double),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert out["width"].tolist() == [7, 7, 7]
    assert "image" not in out.columns  # binary dropped before any shuffle
    assert len(out["features"].iloc[0]) == 8


def test_audio_featurizer_real_backend_double(ray_session):
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.multimodal import AudioFeaturizer, encode_fake_audio

    def _torchaudio_double(buf: bytes) -> dict:
        return {"n_samples": 32000, "sample_rate": 16000, "duration_s": 2.0,
                "n_bytes": len(buf)}

    ds = rd.from_pandas(pd.DataFrame(
        {"clip_id": [1], "audio": [encode_fake_audio(100, 16000)]}))
    out = ds.map_batches(
        AudioFeaturizer, fn_constructor_kwargs=dict(backend=_torchaudio_double),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert sorted(out["frame_idx"]) == [0, 1]  # duration 2.0s → 2 frames


def test_audio_wav_backend_decodes_real_bytes(ray_session):
    """The seam proven with a REAL decoder: stdlib `wave` bytes (an actual
    RIFF/WAV file synthesized in-test) decode through the actor pool —
    frame count equals the true duration, features deterministic."""
    import io
    import wave as wave_mod

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.multimodal import AudioFeaturizer, decode_wav

    def make_wav(seconds: float, sr: int = 8000) -> bytes:
        n = int(seconds * sr)
        t = np.arange(n) / sr
        pcm = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
        bio = io.BytesIO()
        with wave_mod.open(bio, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        return bio.getvalue()

    b3, b1 = make_wav(3.0), make_wav(1.25)
    meta = decode_wav(b3)
    assert meta["n_samples"] == 24000 and meta["sample_rate"] == 8000
    assert abs(meta["duration_s"] - 3.0) < 1e-9

    ds = rd.from_arrow(pa.table({
        "clip_id": pa.array([1, 2], pa.int64()),
        "audio": pa.array([b3, b1], pa.binary()),
    }))
    out = ds.map_batches(
        AudioFeaturizer, fn_constructor_kwargs=dict(backend="wav"),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert sorted(out[out["clip_id"] == 1]["frame_idx"]) == [0, 1, 2]
    assert sorted(out[out["clip_id"] == 2]["frame_idx"]) == [0]
    # deterministic: same bytes → same features
    out2 = ds.map_batches(
        AudioFeaturizer, fn_constructor_kwargs=dict(backend="wav"),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    a = sorted(map(tuple, out["features"]))
    b = sorted(map(tuple, out2["features"]))
    assert a == b


def test_image_stdlib_backend_decodes_real_bytes(ray_session):
    """Round-4: the image seam's stdlib proof (twin of the audio `wave`
    backend). Real BMP and PPM bytes — padded bottom-up BGR rows for BMP,
    commented header for PPM — flow through the actor pool and decode to
    the SAME canonical pixel crc, so a header-only parse cannot pass."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    import zlib

    from cattle_ray.stages.multimodal import (
        ImageDecoder, decode_bmp, decode_ppm, encode_bmp, encode_ppm)

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(13, 10, 3), dtype=np.uint8)  # w*3 not %4
    want_crc = zlib.crc32(np.ascontiguousarray(px)) & 0xFFFFFFFF

    bmp, ppm = encode_bmp(px), encode_ppm(px)
    # header grammar: comments + arbitrary whitespace must parse
    ppm_c = ppm.replace(b"P6\n", b"P6\n# a comment\n  ", 1)
    for d in (decode_bmp(bmp), decode_ppm(ppm), decode_ppm(ppm_c)):
        assert (d["width"], d["height"], d["channels"]) == (10, 13, 3)
        assert d["payload_crc"] == want_crc

    ds = rd.from_arrow(pa.table({
        "img_id": [1, 2, 3],
        "image": pa.array([bmp, ppm, ppm_c], pa.binary()),
    })).repartition(2)
    out = ds.map_batches(
        ImageDecoder, fn_constructor_kwargs=dict(backend="stdlib"),
        batch_format="pyarrow", concurrency=2,
    ).to_pandas().sort_values("img_id")
    assert (out["payload_crc"] == want_crc).all()
    assert (out["width"] == 10).all() and (out["height"] == 13).all()
    assert "image" not in out.columns  # binary dropped before any shuffle
    # features are derived from the DECODED crc → identical across formats
    assert len({tuple(f) for f in out["features"]}) == 1

    with pytest.raises(ValueError, match="unrecognized image magic"):
        ImageDecoder(backend="stdlib")._decode(b"GIF89a...")
