from .exact import davg, dsum, dsum_product
from .uuid_repair import uuid_from_hash, uuid_normalize
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "davg",
    "dsum",
    "dsum_product",
    "uuid_from_hash",
    "uuid_normalize",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
