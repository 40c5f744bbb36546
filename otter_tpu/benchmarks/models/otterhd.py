from otter_tpu.benchmarks.models.fuyu import OtterHD  # noqa: F401
