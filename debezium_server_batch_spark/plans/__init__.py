from .chained import sync_incremental  # noqa: F401
from .laketable import LakeTable, SchemaEvolutionError, evolve_schema  # noqa: F401
