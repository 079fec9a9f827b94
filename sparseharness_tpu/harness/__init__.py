from sparseharness_tpu.harness.stats import (  # noqa: F401
    BenchRecord,
    Statistic,
    to_sql,
    to_jsonl,
    write_records,
)
from sparseharness_tpu.harness.roofline import (  # noqa: F401
    device_hbm_bandwidth,
    variant_bytes,
    roofline_seconds,
)
from sparseharness_tpu.harness.runner import (  # noqa: F401
    BenchmarkConfig,
    BenchmarkResult,
    benchmark_spmv,
    benchmark_fixpoint,
)
from sparseharness_tpu.harness.sweep import (  # noqa: F401
    SweepPoint,
    default_sweep,
    load_runfile,
    run_sweep,
    best_per_matrix,
)
from sparseharness_tpu.harness.scaling import (  # noqa: F401
    ScalePoint,
    weak_scaling_spmv,
    report as scaling_report,
)
