"""Cross-tier integration: WARC archives carrying image payloads feed the
multimodal decode tier directly — the shape of a real multimodal
web-crawl pipeline (Common Crawl → image extraction → features)."""
import numpy as np
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.media_codecs import encode_bmp
from duckdb_spatial_spark.operators.multimodal import image_features
from duckdb_spatial_spark.sources.warc import st_read_warc, st_write_warc


def _img(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)


def test_warc_image_pipeline(spark, tmp_path):
    rows = [(f"https://img.test/{i}.bmp", bytearray(encode_bmp(_img(i))))
            for i in range(12)]
    df = spark.createDataFrame(rows, "uri string, body binary")
    st_write_warc(df, str(tmp_path), "uri", "body",
                  content_type_col=None, num_files=3)

    back = st_read_warc(spark, str(tmp_path))
    feats = image_features(
        back.filter(F.col("http_status") == 200), payload_col="payload")
    got = {r.target_uri: r.img_features for r in feats.collect()}
    assert len(got) == 12
    for i in range(12):
        f = got[f"https://img.test/{i}.bmp"]
        img = _img(i).astype(np.float64)
        assert abs(f.mean_r - img[:, :, 0].mean()) < 1e-6
        assert abs(f.mean_g - img[:, :, 1].mean()) < 1e-6
        assert abs(f.mean_b - img[:, :, 2].mean()) < 1e-6
