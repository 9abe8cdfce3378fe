from informers_spark.pipelines.embed import embed  # noqa: F401
from informers_spark.pipelines.ner import ner  # noqa: F401
from informers_spark.pipelines.classify import classify, zero_shot  # noqa: F401
from informers_spark.pipelines.rerank import rerank  # noqa: F401
