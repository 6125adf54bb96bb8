from .registry import QUERIES, Query, query  # noqa: F401
from . import relational  # noqa: F401  (registers queries on import)
from . import textops  # noqa: F401
from . import graphops  # noqa: F401
from . import relational2  # noqa: F401
from . import scaleops  # noqa: F401
from . import domain  # noqa: F401
from . import analytics  # noqa: F401
from . import analytics2  # noqa: F401
from . import analytics3  # noqa: F401
from . import analytics4  # noqa: F401
from . import analytics5  # noqa: F401
from . import analytics6  # noqa: F401
from . import statcat  # noqa: F401
