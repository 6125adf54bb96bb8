from .builder import co_supply_edges  # noqa: F401
from .algorithms import (  # noqa: F401
    bfs_distances,
    connected_components,
    label_propagation,
    louvain,
    louvain_level,
    modularity,
    pagerank,
)
from .motif import neighborhood, paths  # noqa: F401
