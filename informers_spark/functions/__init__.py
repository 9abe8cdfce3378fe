from informers_spark.functions.kernels import (  # noqa: F401
    group_entities,
    get_top_items,
    mean_pooling,
    normalize,
    sigmoid,
    softmax,
)
