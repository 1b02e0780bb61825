from fesom2_accelerate_tpu.runtime.profiling import (
    fct_ale_step_bytes,
    hbm_peak_bytes_per_s,
)

__all__ = ["fct_ale_step_bytes", "hbm_peak_bytes_per_s"]
