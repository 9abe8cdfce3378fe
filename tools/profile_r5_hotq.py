"""One-session profile of the round-5 flagged queries: partition counts
and stage timings for q_image_classify_all / q_embed_docs /
q_simhash_neardup, plus a spread_scan variant of the inference chains to
test the single-partition-scan hypothesis."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from informers_spark.operators.dedup import spread_scan  # noqa: E402
from informers_spark.queries import QUERIES  # noqa: E402
from informers_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="profile_r5", cores=32)
spark.range(1).count()


def _warm():
    def _noop(it):
        from informers_spark.backend.base import get_backend

        get_backend("hash")
        for p in it:
            yield p

    spark.range(0, 128, numPartitions=64).mapInPandas(_noop, "id long").count()


_warm()


def t(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


out = {}

docs = spark.read.parquet(f"{SF}/documents.parquet")
out["docs_scan_partitions"] = docs.rdd.getNumPartitions()

# --- image classify: current vs spread variant
from informers_spark.operators.multimodal import media_from_documents  # noqa: E402
from informers_spark.pipelines.vision import image_classify  # noqa: E402

def img_current():
    media = media_from_documents(docs, kind="image").select("doc_id", "payload")
    return image_classify(media, top_k=1, backend="hash").select(
        "doc_id", "label", "score"
    ).orderBy("doc_id").count()

def img_spread():
    media = media_from_documents(spread_scan(docs), kind="image").select(
        "doc_id", "payload"
    )
    return image_classify(media, top_k=1, backend="hash").select(
        "doc_id", "label", "score"
    ).orderBy("doc_id").count()

out["img_classify_current"] = t(img_current)
out["img_classify_spread"] = t(img_spread)

# --- embed: current vs spread
from informers_spark.pipelines.embed import embed  # noqa: E402

def emb_current():
    return embed(docs.select("doc_id", "text"), backend="hash").count()

def emb_spread():
    return embed(spread_scan(docs.select("doc_id", "text")), backend="hash").count()

out["embed_current"] = t(emb_current)
out["embed_spread"] = t(emb_spread)
out["q_embed_docs_full"] = t(lambda: QUERIES["q_embed_docs"](spark, SF).count())

# --- simhash_neardup stage split
from informers_spark.functions.similarity import simhash  # noqa: E402
from informers_spark.operators import dedup  # noqa: E402

def sh_fold_only():
    return (
        spread_scan(docs)
        .select(F.col("doc_id").alias("id"), simhash(F.col("text"), 31).alias("sh"))
        .count()
    )

out["simhash_fold_only"] = t(sh_fold_only)

base = (
    spread_scan(docs)
    .select(F.col("doc_id").alias("id"), simhash(F.col("text"), 31).alias("sh"))
    .localCheckpoint()
)

def sh_pairs_from_checkpointed():
    return dedup.simhash_pairs_from_hashes(base, max_hamming=2).count()

out["simhash_pairs_given_hashes"] = t(sh_pairs_from_checkpointed)
out["q_simhash_neardup_full"] = t(
    lambda: QUERIES["q_simhash_neardup"](spark, SF).count()
)

print(json.dumps(out, indent=1))
