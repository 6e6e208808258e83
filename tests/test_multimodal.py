import numpy as np
import pytest

from ds2_spark.operators.multimodal import (
    decode_video_frame,
    frame_sample,
    image_features,
)


@pytest.fixture(scope="module")
def media(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        payload = rng.integers(0, 255, size=8 * 8 * 3, dtype=np.uint8).tobytes()
        rows.append((f"m{i}", payload, "image/fake-rgb", 8, 8, 10))
    rows.append(("bad", b"\x01\x02", "image/png", 0, 0, 4))  # no decoder registered
    return spark.createDataFrame(
        rows, "media_id string, bytes binary, mime string, width int, height int, n_frames int"
    )


def test_image_features_plumbing(spark, media):
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(out) == 7
    ok = out["m0"]
    assert ok["decoded_ok"] and 0 <= ok["mean_luma"] <= 255
    assert len(ok["feature"]) == 16
    assert abs(sum(ok["feature"]) - 1.0) < 1e-5  # normalized histogram
    # unregistered codec: explicit stub path, no crash
    assert not out["bad"]["decoded_ok"]
    assert out["bad"]["feature"] == [0.0] * 16


def test_frame_sample_fanout(spark, media):
    rows = frame_sample(media, every_n=3).collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(per["m0"]) == [0, 3, 6, 9]
    assert sorted(per["bad"]) == [0, 3]


def test_video_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_video_frame(b"x", 0)
