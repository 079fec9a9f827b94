from sparseharness_tpu.semiring.core import (  # noqa: F401
    Semiring,
    PLUS_TIMES,
    MIN_PLUS,
    OR_AND,
    MAX_MIN,
    MAX_RIGHT,
    MIN_RIGHT,
    MAX_TIMES,
    REGISTRY,
    get_semiring,
    register_semiring,
)
