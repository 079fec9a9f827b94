from sparseharness_tpu.ops.registry import (  # noqa: F401
    KernelVariant,
    Geometry,
    VARIANTS,
    get_variant,
    build_operand,
    build_operand_auto,
    spmv,
)
from sparseharness_tpu.ops.jnp_ops import (  # noqa: F401
    EllOperand,
    CooOperand,
    DenseOperand,
)
from sparseharness_tpu.ops.pallas_bsr import BsrOperand, build_bsr, dp_bsr  # noqa: F401
from sparseharness_tpu.ops.spmm import spmm  # noqa: F401
from sparseharness_tpu.ops.verify import (  # noqa: F401
    OperandInitError,
    verify_operand_initialized,
)
