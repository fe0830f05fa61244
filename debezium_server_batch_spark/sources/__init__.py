from .event_log import EventLogSource  # noqa: F401
from . import synth  # noqa: F401
