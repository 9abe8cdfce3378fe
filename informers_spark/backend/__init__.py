from informers_spark.backend.base import InferenceBackend, get_backend  # noqa: F401
from informers_spark.backend.hash_backend import HashBackend  # noqa: F401
