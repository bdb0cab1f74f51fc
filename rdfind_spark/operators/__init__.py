from rdfind_spark.operators.captures import (  # noqa: F401
    CAPTURE_EMISSION,
    capture_candidates,
    capture_candidates_sql,
)
