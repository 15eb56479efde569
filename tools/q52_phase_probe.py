"""Phase probe for q52_media_feature_neardup at a given SF dir.

Times: (a) media relation materialize, (b) featurize+bucket count,
(c) full query. Run: python tools/q52_phase_probe.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from terrorblade_spark.multimodal.media import media_from_documents, extract_features
from terrorblade_spark.operators.vector import sign_lsh_bucket
from terrorblade_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("q52_phase_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from terrorblade_spark.queries.multimodal import q52_media_feature_neardup

    for rep in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        m = media_from_documents(load_table(spark, sf_dir, "documents"))
        n_media = m.count()
        t1 = time.time()
        feats = extract_features(m, dim=32).withColumn(
            "bucket", sign_lsh_bucket(F.col("features"), planes=6, dims=32)
        )
        n_feats = feats.count()
        t2 = time.time()
        spark.catalog.clearCache()
        df = q52_media_feature_neardup(spark, sf_dir)
        n_rows = df.count()
        t3 = time.time()
        print(
            f"rep{rep}: media={t1-t0:.2f}s ({n_media} rows) "
            f"featurize={t2-t1:.2f}s ({n_feats}) full_query={t3-t2:.2f}s "
            f"({n_rows} pairs)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
