"""Round-12 scaling probe: media codec passes (VERDICT r11 ask #6).

SCALE.md carried no 10x probe for the codec passes. Claim under test:
an Arrow mapInPandas codec pass over PRE-SPREAD ids is per-byte map
work with no shuffle, so wall time is linear in corpus size (alpha ~ 1
per item, no hidden partition collapse beyond the pre-spread fix that
x_jpeg_decode already carries from round 11's x_video_shots lesson).

Probe: run the exact x_jpeg_decode and x_mp3_decode worker kernels
(synthesize -> encode -> decode -> stats) over an id range of size N
and 10N, same distribution of sizes/qualities/bitrates, min-of-3 each,
noop count sink. alpha = wall(10N) / (10 * wall(N)); alpha <= ~1.2
passes (fixed per-job overhead pushes alpha BELOW 1 at these sizes —
anything far above 1 would mean a serialization point that scales with
input, the x_video_shots failure shape).

Usage: python scripts/scale_probe_r12.py   (from the repo root)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.session import get_spark


def timed(label, fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best or 9e9, time.time() - t0)
    print(f"{label}: {best:.2f}s (min of {runs})", flush=True)
    return best


def jpeg_pass(spark, n):
    ids = spark.range(0, n * 2, 2).select(F.col("id").alias("c_custkey"))
    ids = ids.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches):
        import numpy as np
        import pandas as pd

        from gramene_mongodb_spark.operators import jpeg as J

        for pdf in batches:
            ks = pdf["c_custkey"]
            payloads = []
            for kk in ks:
                kk = int(kk)
                w, h = (kk % 24) + 8, (kk % 16) + 8
                color = np.array(
                    [(kk * 7 + 31) % 256, (kk * 13 + 5) % 256, (kk * 29 + 11) % 256],
                    np.uint8,
                )
                px = np.tile(color, (h, w, 1))
                enc = (J.encode_jpeg_progressive if kk % 4 == 2
                       else J.encode_jpeg_baseline)
                payloads.append(enc(
                    w, h, px.tobytes(), quality=(35, 75, 92)[kk % 3],
                    subsampling="420" if kk % 4 == 0 else "444",
                ))
            yield pd.DataFrame({"media_id": ks, "payload": payloads})

    corpus = ids.mapInPandas(gen, "media_id BIGINT, payload BINARY")
    from gramene_mongodb_spark.operators import multimodal as MM

    return MM.pixel_stats(corpus)


def mp3_pass(spark, n):
    # same kernel as the x_mp3_decode derivation, over a dense id range
    ids = spark.range(7, n * 101, 101).select(F.col("id").alias("c_custkey"))
    ids = ids.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches):
        import numpy as np
        import pandas as pd

        from gramene_mongodb_spark.operators import mp3 as M

        for pdf in batches:
            rows = []
            for kk in pdf["c_custkey"]:
                kk = int(kk)
                nsig = 1 + kk % 3
                kbps = (96, 128, 192)[kk % 3]
                t = np.arange(nsig * 1152)
                x = (0.2 + (kk % 5) * 0.1) * np.sin(
                    2.0 * np.pi * (200.0 + (kk % 20) * 150.0) * t / 48000.0)
                x = x[:, None]
                padded = np.concatenate([x, np.zeros((1152, 1))])
                raw = M.encode_mp3(padded, 48000, kbps)
                rate, nch, pcm = M.decode_mp3(raw)
                rows.append({"media_id": kk, "n_samples": pcm.shape[0]})
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, "media_id BIGINT, n_samples BIGINT")


def main():
    spark = get_spark("scale-probe-r12")
    n_jpeg = 7500
    n_mp3 = 150
    w1 = timed("jpeg 1x (%d imgs)" % n_jpeg, lambda: jpeg_pass(spark, n_jpeg).count())
    w10 = timed("jpeg 10x (%d imgs)" % (10 * n_jpeg),
                lambda: jpeg_pass(spark, 10 * n_jpeg).count())
    print("jpeg alpha = %.2f (wall ratio %.1f / 10)" % (w10 / w1 / 10, w10 / w1))
    m1 = timed("mp3 1x (%d clips)" % n_mp3, lambda: mp3_pass(spark, n_mp3).count())
    m10 = timed("mp3 10x (%d clips)" % (10 * n_mp3),
                lambda: mp3_pass(spark, 10 * n_mp3).count())
    print("mp3 alpha = %.2f (wall ratio %.1f / 10)" % (m10 / m1 / 10, m10 / m1))


if __name__ == "__main__":
    main()
