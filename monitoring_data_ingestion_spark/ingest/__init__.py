from .state import SourceState, StateStore
from .sinks import (
    publish_inventory,
    write_file_atomically,
    write_heartbeat,
    write_json_atomically,
)
from .runner import IngestScheduler, SourceRun

__all__ = [
    "SourceState",
    "StateStore",
    "publish_inventory",
    "write_file_atomically",
    "write_heartbeat",
    "write_json_atomically",
    "IngestScheduler",
    "SourceRun",
]
