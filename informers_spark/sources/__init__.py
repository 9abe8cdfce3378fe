from informers_spark.sources.corpus import generate_files, expected_triples  # noqa: F401
from informers_spark.sources.hub import get_model_file, get_model_json  # noqa: F401
from informers_spark.sources.warehouse import Warehouse  # noqa: F401
