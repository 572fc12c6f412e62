from .misc import natsorted, natsort_key, rank0_print
from .cli import parse_dataclass, add_dataclass_args, dataclass_from_namespace
from .profiling import maybe_trace, timed

__all__ = [
    "natsorted",
    "natsort_key",
    "rank0_print",
    "parse_dataclass",
    "add_dataclass_args",
    "dataclass_from_namespace",
    "maybe_trace",
    "timed",
]
