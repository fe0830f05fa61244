from .chained import follow, sync_incremental  # noqa: F401
from .laketable import LakeTable, SchemaEvolutionError, evolve_schema  # noqa: F401
