from informers_spark.plans.kg import build_kg  # noqa: F401
