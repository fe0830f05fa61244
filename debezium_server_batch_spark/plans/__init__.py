from .laketable import LakeTable, SchemaEvolutionError, evolve_schema  # noqa: F401
