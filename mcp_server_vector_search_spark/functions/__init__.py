from .vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
    l2_normalize,
    neo4j_score,
    dim_check,
)
