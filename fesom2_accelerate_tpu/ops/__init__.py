from fesom2_accelerate_tpu.ops import oracle_loops, oracle

__all__ = ["oracle_loops", "oracle"]
