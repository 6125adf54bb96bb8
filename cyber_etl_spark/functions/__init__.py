from .text import (  # noqa: F401
    EN_STOPWORDS,
    punct_ratio,
    shingles,
    stopword_ratio,
    tokens,
)
from .vectors import cosine_similarity, to_double_array  # noqa: F401
