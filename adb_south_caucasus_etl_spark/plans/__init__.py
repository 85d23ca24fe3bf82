from .cube import (
    DEFAULT_CUBES,
    CubeQuery,
    CubeSchema,
    Join,
    Level,
    Measure,
    compile_query,
    members,
)

__all__ = [
    "DEFAULT_CUBES",
    "CubeQuery",
    "CubeSchema",
    "Join",
    "Level",
    "Measure",
    "compile_query",
    "members",
]
