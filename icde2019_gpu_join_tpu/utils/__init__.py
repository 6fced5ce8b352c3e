from icde2019_gpu_join_tpu.utils import oracle, timing, datasets  # noqa: F401
