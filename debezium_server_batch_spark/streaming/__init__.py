from .pacing import DynamicBatchSizeWait, MaxBatchSizeWait, NoBatchSizeWait, select_batch_size_wait  # noqa: F401
from .runner import CdcPipeline, PipelineConfig  # noqa: F401
from .stateful import streaming_sessionize  # noqa: F401
from .windowed import streaming_window_stats  # noqa: F401
