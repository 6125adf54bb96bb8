from .builder import co_supply_edges  # noqa: F401
from .algorithms import (  # noqa: F401
    connected_components,
    label_propagation,
    pagerank,
)
