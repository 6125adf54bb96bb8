from .docs import (  # noqa: F401
    incremental_dedup_stream,
    read_document_stream,
)
from .events import (  # noqa: F401
    hourly_rollup_stream,
    read_event_stream,
    run_stream_to_memory,
    sessionize_stream,
    stream_dedupe,
)
